"""EaseVoice Trainer, TPU-native.

A ground-up JAX/XLA/Pallas rebuild of the GPT-SoVITS voice-cloning stack
(reference: megaease/easevoice-trainer): audio preprocessing -> dataset
normalization -> s2 SoVITS (VITS GAN) + s1 GPT (AR text->semantic) fine-tuning
-> KV-cached autoregressive synthesis, wrapped in the same REST/session/IPC
contracts as the reference server.

Design notes
------------
* Model compute is pure JAX (flax.linen modules, fp32 params, bf16 compute on
  TPU); the runtime around it (services, IPC, audio IO) is host Python/C++.
* All jitted paths use static shapes: bucketed batch padding, a preallocated
  KV cache driven by ``lax.while_loop`` for AR decode, fixed GAN slice sizes.
* Scaling is expressed with ``jax.sharding`` over a device ``Mesh``
  (data/model axes); XLA inserts the collectives (psum over ICI), replacing
  the reference's torch DDP/NCCL (reference: src/train/sovits.py:219-224).
* Array layout is time-major channels-last ``(batch, time, channels)``
  everywhere (torch reference uses ``(B, C, T)``): this is the natural layout
  for XLA convolutions and MXU matmuls on TPU.
"""

__version__ = "0.1.0"
