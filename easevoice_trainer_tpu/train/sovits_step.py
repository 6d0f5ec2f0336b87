"""s2 SoVITS GAN training step — one jitted function.

Faithful to the reference loop semantics
(reference: src/train/sovits.py:459-525):

1. generator forward (random 32-frame latent slice -> HiFi-GAN waveform);
2. discriminator step on (real slice, stop_gradient(fake)), LSGAN loss,
   AdamW(0.8, 0.99, eps 1e-9) with per-epoch exponential LR decay;
3. generator step against the *updated* discriminator: adversarial +
   feature-matching + 45*mel-L1 + KL + commit, with the text-side param
   groups (text_embedding / encoder_text / mrte) at ``text_low_lr_rate``.

TPU-native differences:

* the whole D+G interleave is a single jit (no scaler: bf16 needs no loss
  scaling; fp32 master params);
* the generator forward runs once — its outputs feed the D update directly
  and its VJP is replayed for the G gradient (the JAX analogue of torch's
  retained graph), so the expensive HiFi-GAN stack is not recomputed;
* gradient mean over the ``data`` mesh axis is inserted by XLA from the
  shardings — no explicit DDP/allreduce.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..ops.stft import MelConfig, mel_spectrogram, spec_to_mel
from ..models.sovits import SynthesizerTrn, MultiPeriodDiscriminator, losses
from ..nn.layers import slice_segments
from . import arena as arena_mod


@dataclasses.dataclass(frozen=True)
class S2TrainHP:
    """Mirrors configs/s2.json "train"."""

    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-9
    lr_decay: float = 0.999875
    segment_size: int = 20480
    c_mel: float = 45.0
    c_kl: float = 1.0
    text_low_lr_rate: float = 0.4
    grad_clip: Optional[float] = None
    weight_decay: float = 0.01   # torch AdamW default


class S2TrainState(flax.struct.PyTreeNode):
    """Train state with arena-packed parameters.

    ``params_g``/``params_d`` are ``{group_key: [n, *shape]}`` stacks (see
    train/arena.py) — the TPU-native storage that collapses the optimizer
    from ~3000 per-leaf kernels into ~78 large fused ones.  ``arena_g`` /
    ``arena_d`` are the static unpack specs (not serialized; restored from
    the template on resume).  Use :func:`params_tree` for the conventional
    nested-dict view (checkpoint IO, pretrained merging).
    """

    step: jnp.ndarray
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    arena_g: Any = flax.struct.field(pytree_node=False, default=None)
    arena_d: Any = flax.struct.field(pytree_node=False, default=None)


def params_tree(state: S2TrainState, which: str = "g"):
    """Unpacked nested-dict view of the generator/discriminator params."""
    if which == "g":
        return arena_mod.unpack(state.arena_g, state.params_g)
    return arena_mod.unpack(state.arena_d, state.params_d)


def with_params_tree(state: S2TrainState, tree, which: str = "g"):
    """Replace params from a nested-dict tree (re-packs into the arena)."""
    if which == "g":
        return state.replace(params_g=arena_mod.pack(state.arena_g, tree))
    return state.replace(params_d=arena_mod.pack(state.arena_d, tree))


def _text_lr_label(path: Tuple, _leaf) -> str:
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(keys)
    for frag in ("enc_p/text_embedding", "enc_p/encoder_text", "enc_p/mrte"):
        if frag in joined:
            return "text"
    return "base"


def make_optimizers(hp: S2TrainHP, arena_g, arena_d, steps_per_epoch: int):
    """(optim_g, optim_d) with per-epoch exponential decay baked in.

    Both operate on arena-packed params: optax sees one big leaf per
    (label, shape) group instead of ~884 tiny ones, so the whole AdamW
    update compiles to ~78 large fused kernels.  Per-leaf numerics are
    unchanged (elementwise math is invariant under stacking)."""

    def lr_schedule(scale: float):
        def fn(step):
            epoch = step // max(steps_per_epoch, 1)
            return hp.learning_rate * scale * (hp.lr_decay ** epoch)
        return fn

    def adamw(lr_fn):
        # bf16 moment storage (EASEVOICE_OPT_STATE=fp32 opts out) — the
        # step is HBM-bound, moments are half its optimizer traffic
        from .optim_lowp import adamw_lowp

        tx = adamw_lowp(lr_fn, b1=hp.betas[0], b2=hp.betas[1], eps=hp.eps,
                        weight_decay=hp.weight_decay)
        if hp.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(hp.grad_clip), tx)
        return tx

    optim_g = optax.multi_transform(
        {"base": adamw(lr_schedule(1.0)),
         "text": adamw(lr_schedule(hp.text_low_lr_rate))},
        arena_g.labels_dict)
    optim_d = adamw(lr_schedule(1.0))
    return optim_g, optim_d


def create_train_state(rng, synthesizer: SynthesizerTrn,
                       discriminator: MultiPeriodDiscriminator,
                       hp: S2TrainHP, example_batch: Dict[str, jnp.ndarray],
                       steps_per_epoch: int = 1) -> S2TrainState:
    g_rngs = {"params": rng, "slice": rng, "latent": rng, "dropout": rng}
    # jit both inits: eagerly they execute ~1200 host ops one XLA program
    # each (conv initializers, broadcasts) — minutes of per-op dispatch on a
    # slow host core; jitted it is one compile each (measured: 1238 -> ~40
    # XLA compiles for a full fine-tune run, benchmarks/e2e_finetune.py)
    vars_g = jax.jit(synthesizer.init)(
        g_rngs, example_batch["ssl"], example_batch["spec"],
        example_batch["spec_lengths"], example_batch["text"],
        example_batch["text_lengths"])
    seg = hp.segment_size
    dummy = jnp.zeros((example_batch["spec"].shape[0], seg, 1))
    vars_d = jax.jit(discriminator.init)(rng, dummy, dummy)
    params_g, params_d = vars_g["params"], vars_d["params"]
    arena_g = arena_mod.build_arena(params_g, _text_lr_label)
    arena_d = arena_mod.build_arena(params_d)
    packed_g = jax.jit(lambda p: arena_mod.pack(arena_g, p))(params_g)
    packed_d = jax.jit(lambda p: arena_mod.pack(arena_d, p))(params_d)
    optim_g, optim_d = make_optimizers(hp, arena_g, arena_d, steps_per_epoch)
    return S2TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=packed_g,
        params_d=packed_d,
        opt_g=jax.jit(optim_g.init)(packed_g),
        opt_d=jax.jit(optim_d.init)(packed_d),
        arena_g=arena_g,
        arena_d=arena_d,
    )


def make_train_step(
    synthesizer: SynthesizerTrn,
    discriminator: MultiPeriodDiscriminator,
    hp: S2TrainHP,
    mel_cfg: MelConfig,
    steps_per_epoch: int = 1,
) -> Callable:
    """Build the jitted (state, batch, rng) -> (state, metrics) step."""

    optim_g, optim_d = None, None  # created lazily against real params
    seg_frames = hp.segment_size // mel_cfg.hop_length

    def gen_forward(packed_g, arena_g, batch, rng):
        # unpack inside the differentiated fn: the model reads stacked[i]
        # slices (fused into consumers) and the VJP yields grads already
        # packed — the optimizer never touches per-leaf buffers.
        params_g = arena_mod.unpack(arena_g, packed_g)
        rngs = {"slice": jax.random.fold_in(rng, 1),
                "latent": jax.random.fold_in(rng, 2),
                "dropout": jax.random.fold_in(rng, 3)}
        return synthesizer.apply(
            {"params": params_g}, batch["ssl"], batch["spec"],
            batch["spec_lengths"], batch["text"], batch["text_lengths"],
            rngs=rngs)

    def train_step(state: S2TrainState, batch, rng):
        nonlocal optim_g, optim_d
        if optim_g is None:
            optim_g, optim_d = make_optimizers(
                hp, state.arena_g, state.arena_d, steps_per_epoch)

        outs, gen_vjp = jax.vjp(
            lambda p: gen_forward(p, state.arena_g, batch, rng),
            state.params_g)
        y_hat, commit_loss, ids_slice, y_mask, latents, _quantized = outs
        z, z_p, m_p, logs_p, m_q, logs_q = latents

        # ground-truth slices aligned with the generator's random slice
        mel = spec_to_mel(batch["spec"], mel_cfg)
        y_mel = slice_segments(mel, ids_slice, seg_frames)
        wav = batch["wav"]
        if wav.ndim == 2:
            wav = wav[..., None]
        y_slice = slice_segments(wav, ids_slice * mel_cfg.hop_length,
                                 hp.segment_size)

        # ---- discriminator step ----
        def d_loss_fn(packed_d):
            params_d = arena_mod.unpack(state.arena_d, packed_d)
            real_l, fake_l, _, _ = discriminator.apply(
                {"params": params_d}, y_slice, jax.lax.stop_gradient(y_hat))
            loss, _, _ = losses.discriminator_loss(real_l, fake_l)
            return loss

        loss_disc, d_grads = jax.value_and_grad(d_loss_fn)(state.params_d)
        d_updates, opt_d_state = optim_d.update(
            d_grads, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, d_updates)

        # ---- generator step (against the updated discriminator) ----
        def g_loss_from_outputs(outs_):
            y_hat_, commit_, ids_, y_mask_, latents_, _q = outs_
            _, z_p_, m_p_, logs_p_, _, logs_q_ = latents_
            y_hat_mel_ = mel_spectrogram(y_hat_[..., 0], mel_cfg)
            _, fake_l, fmap_r, fmap_g = discriminator.apply(
                {"params": arena_mod.unpack(state.arena_d, params_d)},
                y_slice, y_hat_)
            loss_mel = jnp.mean(
                jnp.abs(y_mel.astype(jnp.float32)
                        - y_hat_mel_.astype(jnp.float32))) * hp.c_mel
            loss_kl = losses.kl_loss(z_p_, logs_q_, m_p_, logs_p_,
                                     y_mask_) * hp.c_kl
            loss_fm = losses.feature_matching_loss(fmap_r, fmap_g)
            loss_adv, _ = losses.generator_adv_loss(fake_l)
            total = loss_adv + loss_fm + loss_mel + commit_ * 1.0 + loss_kl
            return total, {
                "loss/g/total": total, "loss/g/adv": loss_adv,
                "loss/g/fm": loss_fm, "loss/g/mel": loss_mel,
                "loss/g/kl": loss_kl, "loss/g/commit": commit_,
            }

        (loss_gen_all, g_metrics), out_grads = jax.value_and_grad(
            g_loss_from_outputs, has_aux=True, allow_int=True)(outs)
        (g_grads,) = gen_vjp(out_grads)
        g_updates, opt_g_state = optim_g.update(
            g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, g_updates)

        metrics = dict(g_metrics)
        metrics["loss/d/total"] = loss_disc
        metrics["grad_norm/g"] = optax.global_norm(g_grads)
        metrics["grad_norm/d"] = optax.global_norm(d_grads)

        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g, params_d=params_d,
            opt_g=opt_g_state, opt_d=opt_d_state)
        return new_state, metrics

    return train_step
