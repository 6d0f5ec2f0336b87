"""Component-level timing of the s2 GAN step on the current device.

Times each piece in isolation (jitted, value-fetched) so the dominant
cost is attributable without trace parsing:

  full      the production train step (bench.py path)
  gen_fwd   generator forward only
  gen_vjp   generator forward + backward (unit cotangents)
  disc_fwd  discriminator forward (real+fake)
  disc_vjp  discriminator forward + backward
  mel       mel_spectrogram of the generated slice
  opt       optimizer update from captured gradients

Usage: python benchmarks/profile_s2.py [batch] [frames] [iters]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build
    from easevoice_trainer_tpu.models.sovits import (
        SynthesizerTrn, SovitsConfig, MultiPeriodDiscriminator)
    from easevoice_trainer_tpu.ops.stft import (MelConfig, mel_spectrogram,
                                                spec_to_mel)
    from easevoice_trainer_tpu.train import sovits_step

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    state, batch, step = build(batch_size, frames)
    cfg = SovitsConfig()
    mel_cfg = MelConfig()
    hp = sovits_step.S2TrainHP()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else None
    synth = SynthesizerTrn(cfg, dtype=dtype)
    disc = MultiPeriodDiscriminator(dtype=dtype)
    seg_frames = hp.segment_size // mel_cfg.hop_length

    def gen_forward(params_g, rng):
        rngs = {"slice": jax.random.fold_in(rng, 1),
                "latent": jax.random.fold_in(rng, 2),
                "dropout": jax.random.fold_in(rng, 3)}
        return synth.apply({"params": params_g}, batch["ssl"],
                           batch["spec"], batch["spec_lengths"],
                           batch["text"], batch["text_lengths"], rngs=rngs)

    rng = jax.random.PRNGKey(0)

    def timeit(name, fn, *args):
        out = fn(*args)                       # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:10s} {dt*1e3:9.2f} ms")
        return out

    print(f"device={jax.devices()[0].device_kind} batch={batch_size} "
          f"frames={frames} iters={iters}")

    # full step donates `state` -> must rebind between calls.  Block on
    # the full output tree at the edges (a loss fetch alone lets the clock
    # stop before the optimizer tail drains; see bench.py).
    st, metrics = step(state, batch, rng)
    jax.block_until_ready((st, metrics))
    t0 = time.perf_counter()
    for i in range(iters):
        st, metrics = step(st, batch, jax.random.PRNGKey(i))
    jax.block_until_ready((st, metrics))
    print(f"{'full':10s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")
    state = st          # original buffers were donated; use the live ones

    params_g = jax.jit(lambda s: sovits_step.params_tree(s, "g"))(state)
    params_d = jax.jit(lambda s: sovits_step.params_tree(s, "d"))(state)

    gf = jax.jit(lambda p: gen_forward(p, rng))
    outs = timeit("gen_fwd", gf, params_g)

    def gen_vjp_fn(p):
        outs_, vjp = jax.vjp(lambda q: gen_forward(q, rng)[0], p)
        (g,) = vjp(jnp.ones_like(outs_))
        return jax.tree_util.tree_leaves(g)[0]
    timeit("gen_vjp", jax.jit(gen_vjp_fn), params_g)

    y_hat = outs[0]
    y = jnp.zeros((batch_size, hp.segment_size, 1), y_hat.dtype)

    df = jax.jit(lambda p: disc.apply({"params": p}, y, y_hat)[1])
    timeit("disc_fwd", df, params_d)

    def disc_vjp_fn(p):
        def loss(q):
            real_l, fake_l, _, _ = disc.apply({"params": q}, y, y_hat)
            return sum(jnp.mean(x) for x in real_l + fake_l)
        return jax.tree_util.tree_leaves(jax.grad(loss)(p))[0]
    timeit("disc_vjp", jax.jit(disc_vjp_fn), params_d)

    timeit("mel", jax.jit(lambda w: mel_spectrogram(w[..., 0], mel_cfg)),
           y_hat)


if __name__ == "__main__":
    main()
