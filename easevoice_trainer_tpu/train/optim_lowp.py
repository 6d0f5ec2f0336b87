"""AdamW with low-precision moment storage.

The s2 optimizer streams its full fp32 state every step (read p, m, v, g;
write p, m, v — ~2.8 GB/step at the production size, docs/PERF.md) on a
step that is HBM-bound.  Storing both moments in bf16 halves the m/v
traffic; the *math* stays fp32 (moments are upcast, updated, then
re-rounded), so the only deviation from fp32 AdamW is one bf16 rounding of
m and v per step:

* m (first moment): relative rounding error <= 2^-9 per step on a decaying
  average — indistinguishable from gradient noise;
* v (second moment): enters the update through 1/sqrt(v); a 0.4 % relative
  error in v is a 0.2 % error in step size, far below GAN training noise.

``tests/test_optim_lowp.py`` pins the trajectory against fp32 AdamW.
``EASEVOICE_OPT_STATE=fp32`` restores exact reference numerics.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def moment_dtype() -> Optional[jnp.dtype]:
    """bf16 by default; EASEVOICE_OPT_STATE=fp32 opts out."""
    val = os.environ.get("EASEVOICE_OPT_STATE", "bf16").strip().lower()
    return None if val in ("fp32", "f32", "float32") else jnp.bfloat16


def scale_by_adam_lowp(b1: float, b2: float, eps: float,
                       dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moments stored in ``dtype``.

    (optax's ``mu_dtype`` covers only the first moment.)  Update math runs
    in fp32; storage is rounded after each step.
    """

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params))

    def update(grads, state, params=None):
        del params
        f32 = jnp.float32
        count = optax.safe_int32_increment(state.count)
        mu32 = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
            state.mu, grads)
        nu32 = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(f32)
            + (1 - b2) * jnp.square(g.astype(f32)),
            state.nu, grads)
        c1 = 1 - b1 ** count.astype(f32)
        c2 = 1 - b2 ** count.astype(f32)
        updates = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu32, nu32)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(dtype), t)
        return updates, optax.ScaleByAdamState(
            count=count, mu=cast(mu32), nu=cast(nu32))

    return optax.GradientTransformation(init, update)


def adamw_lowp(lr_fn, b1: float, b2: float, eps: float,
               weight_decay: float,
               dtype=None) -> optax.GradientTransformation:
    """AdamW (decoupled weight decay, torch semantics) over bf16 moments.

    ``dtype=None`` -> :func:`moment_dtype` (env-controlled).  fp32 falls
    back to stock optax.adamw — bit-identical to the round-2 optimizer.
    """
    dtype = dtype if dtype is not None else moment_dtype()
    if dtype is None:
        return optax.adamw(lr_fn, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)
    return optax.chain(
        scale_by_adam_lowp(b1, b2, eps, dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr_fn),
    )
