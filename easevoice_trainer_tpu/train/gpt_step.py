"""s1 GPT training step (jitted) with grad accumulation.

Reference behavior (src/easevoice/soundstorm/auto_reg/models/
t2s_lightning_module.py:40-121):

* CE-sum loss + top-3 accuracy from the T2S forward;
* ScaledAdam(lr schedule locked at 0.002, betas (0.9, 0.95),
  clipping_scale 2) stepping every 4 micro-batches;
* the WarmupCosineLRSchedule is configured but *locks itself to a constant
  0.002* (lr_schedulers.py:62) — both behaviors are available here, the
  locked constant being the default for parity.

Implemented with ``optax.MultiSteps`` so accumulation lives inside the one
jitted update; no manual_backward bookkeeping.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.gpt import Text2SemanticDecoder
from ..parallel.gpt_sharding import gpt_arena_label
from . import arena as arena_mod
from .optim_lowp import moment_dtype
from .scaled_adam import scaled_adam


@dataclasses.dataclass(frozen=True)
class GPTTrainHP:
    """Mirrors configs/gpt.yaml "optimizer" + "train"."""

    lr: float = 0.01            # peak (unused when locked, kept for config parity)
    lr_init: float = 1e-5
    lr_end: float = 1e-4
    warmup_steps: int = 2000
    decay_steps: int = 40000
    locked_lr: Optional[float] = 0.002   # reference locks the schedule here
    betas: Tuple[float, float] = (0.9, 0.95)
    clipping_scale: float = 2.0
    grad_accum: int = 4
    if_dpo: bool = False


def warmup_cosine_schedule(hp: GPTTrainHP) -> optax.Schedule:
    """The schedule WarmupCosineLRSchedule *would* produce if not locked."""
    if hp.locked_lr is not None:
        locked = hp.locked_lr
        return lambda step: jnp.asarray(locked, jnp.float32)

    def fn(step):
        step = step.astype(jnp.float32)
        warm = hp.lr_init + (hp.lr - hp.lr_init) / hp.warmup_steps * step
        ratio = jnp.clip((step - hp.warmup_steps)
                         / max(hp.decay_steps - hp.warmup_steps, 1), 0.0, 1.0)
        coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * ratio))
        decay = hp.lr_end + coeff * (hp.lr - hp.lr_end)
        return jnp.where(step < hp.warmup_steps, warm, decay)
    return fn


class GPTTrainState(flax.struct.PyTreeNode):
    """``params`` is arena-packed ({group: [n,*shape]}, train/arena.py);
    groups are keyed by tensor-parallel shard class so stacked leaves
    shard identically.  ``arena`` is the static unpack spec (restored
    from the template on resume, not serialized)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    arena: Any = flax.struct.field(pytree_node=False, default=None)


def params_tree(state: GPTTrainState):
    """Unpacked nested-dict view (checkpoint IO, pretrained merging)."""
    return arena_mod.unpack(state.arena, state.params)


def with_params_tree(state: GPTTrainState, tree) -> GPTTrainState:
    return state.replace(params=arena_mod.pack(state.arena, tree))


def make_optimizer(hp: GPTTrainHP) -> optax.GradientTransformation:
    tx = scaled_adam(
        learning_rate=warmup_cosine_schedule(hp),
        b1=hp.betas[0], b2=hp.betas[1],
        clipping_scale=hp.clipping_scale,
        rowwise=True,
        state_dtype=moment_dtype())
    if hp.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=hp.grad_accum)
    return tx


def create_train_state(rng, model: Text2SemanticDecoder, hp: GPTTrainHP,
                       example_batch: Dict[str, jnp.ndarray]) -> GPTTrainState:
    # jit the init: eagerly it executes ~500 host ops one XLA program each
    # (initializers, broadcasts), minutes of dispatch on a slow host core —
    # jitted it is ONE compile (measured in benchmarks/e2e_finetune.py)
    variables = jax.jit(model.init)(
        rng, example_batch["phoneme_ids"], example_batch["phoneme_ids_len"],
        example_batch["semantic_ids"], example_batch["semantic_ids_len"],
        example_batch["bert_feature"])
    params = variables["params"]
    arena = arena_mod.build_arena(params, gpt_arena_label)
    packed = jax.jit(lambda p: arena_mod.pack(arena, p))(params)
    return GPTTrainState(
        step=jnp.zeros((), jnp.int32),
        params=packed,
        opt_state=jax.jit(make_optimizer(hp).init)(packed),
        arena=arena)


def make_train_step(model: Text2SemanticDecoder, hp: GPTTrainHP) -> Callable:
    optimizer = make_optimizer(hp)

    def train_step(state: GPTTrainState, batch, rng):
        def loss_fn(packed):
            # unpack inside the differentiated fn: slices fuse into
            # consumers and the VJP returns grads already packed
            params = arena_mod.unpack(state.arena, packed)
            if hp.if_dpo:
                from ..models.gpt.dpo import dpo_forward

                out = dpo_forward(model, params, batch,
                                  batch["reject_semantic_ids"],
                                  batch["reject_semantic_ids_len"],
                                  dropout_rng=rng)
                return out["loss"], out
            out = model.apply(
                {"params": params},
                batch["phoneme_ids"], batch["phoneme_ids_len"],
                batch["semantic_ids"], batch["semantic_ids_len"],
                batch["bert_feature"],
                deterministic=False,
                rngs={"dropout": rng})
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "acc": out["acc"],
            "grad_norm": optax.global_norm(grads),
        }
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return train_step
