"""ScaledAdam (k2/icefall) as an optax gradient transformation.

The reference trains the s1 GPT with ScaledAdam
(reference: src/easevoice/soundstorm/auto_reg/modules/optim.py:123-622,
t2s_lightning_module.py:100-121): Adam whose per-tensor step size is
proportional to the tensor's RMS (so the *relative* parameter change is
controlled), plus an explicit learned parameter-scale update.  This is a
from-scratch functional re-derivation of that algorithm:

for every tensor p with gradient g (per step t):
  v          <- b2 * v + (1 - b2) * g^2
  denom      <- sqrt(v / (1 - b2^t)) + eps
  rms        <- sqrt(mean(p^2)) clamped to [min_rms, inf)   (recomputed
                every ``size_update_period`` steps)
  delta      <- b1 * delta + (1 - b1) * (-lr * rms * g / denom)
  scale part (every size_update_period steps, tensors only):
    s_grad   <- mean over the period of sum(p * g)
    s_v      <- b2^K * s_v + (1 - b2^K) * s_grad^2
    s_step   <- clip(-size_lr * s_grad / (sqrt(s_v) + eps), +-0.1) ; >=0-rms
                tensors are pushed back up
    delta    <- delta + s_step * p
  p          <- p + delta

Scalars (numel == 1) skip the RMS scaling and use ``scalar_lr_scale * lr``.

Gradient clipping: the reference keeps a 1000-step history of global norms
and clips at ``clipping_scale`` x median.  A rolling median is host-hostile;
here an exponential moving average of the global norm stands in for the
median (same stationary value, jit-friendly), updated every step.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class ScaledAdamState(NamedTuple):
    count: jnp.ndarray
    exp_avg_sq: Any          # v, per leaf
    delta: Any               # momentum of the actual step, per leaf
    param_rms: Any           # cached RMS, per leaf (scalar per tensor)
    scale_exp_avg_sq: Any    # second moment of the scale gradient
    scale_grad_acc: Any      # running sum of sum(p*g) over the period
    norm_ema: jnp.ndarray    # EMA of the global grad norm (clipping proxy)


def scaled_adam(
    learning_rate: float | optax.Schedule = 0.002,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    min_rms: float = 1e-5,
    max_rms: float = 3.0,
    size_update_period: int = 4,
    size_lr_scale: float = 0.1,
    scalar_lr_scale: float = 0.1,
    clipping_scale: Optional[float] = 2.0,
) -> optax.GradientTransformation:

    def lr_at(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate, jnp.float32)

    def init_fn(params):
        zeros_like = lambda p: jnp.zeros_like(p, jnp.float32)
        scalar_zero = lambda p: jnp.zeros((), jnp.float32)
        rms_init = lambda p: jnp.maximum(
            jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2)), min_rms)
        return ScaledAdamState(
            count=jnp.zeros((), jnp.int32),
            exp_avg_sq=jax.tree_util.tree_map(zeros_like, params),
            delta=jax.tree_util.tree_map(zeros_like, params),
            param_rms=jax.tree_util.tree_map(rms_init, params),
            scale_exp_avg_sq=jax.tree_util.tree_map(scalar_zero, params),
            scale_grad_acc=jax.tree_util.tree_map(scalar_zero, params),
            norm_ema=jnp.zeros((), jnp.float32),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("scaled_adam requires params")
        count = state.count + 1
        lr = lr_at(state.count)

        # ---- adaptive clipping (EMA stand-in for the rolling median) ----
        gnorm = optax.global_norm(grads)
        if clipping_scale is not None:
            norm_ema = jnp.where(
                state.count == 0, gnorm,
                0.98 * state.norm_ema + 0.02 * gnorm)
            limit = jnp.maximum(clipping_scale * norm_ema, 1e-12)
            clip = jnp.minimum(1.0, limit / jnp.maximum(gnorm, 1e-12))
        else:
            norm_ema = state.norm_ema
            clip = jnp.asarray(1.0, jnp.float32)

        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        is_scale_step = (count % size_update_period) == 0
        k = size_update_period

        def leaf_update(p, g, v, d, rms, s_v, s_acc):
            g = g.astype(jnp.float32) * clip
            p32 = p.astype(jnp.float32)
            v = b2 * v + (1.0 - b2) * g * g
            denom = jnp.sqrt(v / bc2) + eps

            if p.ndim == 0 or p.size == 1:
                # scalar path: plain Adam with a reduced LR
                step = -lr * scalar_lr_scale * g / denom
                d = b1 * d + (1.0 - b1) * step
                return p32 + d, v, d, rms, s_v, s_acc

            # refresh cached RMS on scale steps
            new_rms = jnp.sqrt(jnp.mean(p32 * p32))
            rms = jnp.where(is_scale_step,
                            jnp.clip(new_rms, min_rms, None), rms)

            step = -lr * rms * g / denom
            d = b1 * d + (1.0 - b1) * step

            # ---- learned parameter scale ----
            s_acc = s_acc + jnp.sum(p32 * g)
            s_grad = s_acc / k
            s_v_new = (b2 ** k) * s_v + (1.0 - b2 ** k) * s_grad * s_grad
            s_step = -lr * size_lr_scale * s_grad / (jnp.sqrt(s_v_new) + eps)
            s_step = jnp.clip(s_step, -0.1, 0.1)
            # rms bounds act through the scale update (icefall param_min/max_rms):
            # oversized tensors may only shrink, undersized only grow
            s_step = jnp.where(new_rms > max_rms, jnp.minimum(s_step, 0.0), s_step)
            s_step = jnp.where(new_rms < min_rms, jnp.maximum(s_step, 0.0), s_step)
            d = jnp.where(is_scale_step, d + s_step * p32, d)
            s_v = jnp.where(is_scale_step, s_v_new, s_v)
            s_acc = jnp.where(is_scale_step, 0.0, s_acc)
            return p32 + d, v, d, rms, s_v, s_acc

        results = jax.tree_util.tree_map(
            leaf_update, params, grads, state.exp_avg_sq, state.delta,
            state.param_rms, state.scale_exp_avg_sq, state.scale_grad_acc)

        # unzip the 6-tuples
        treedef = jax.tree_util.tree_structure(params)
        leaves = treedef.flatten_up_to(results)
        new_p = treedef.unflatten([l[0] for l in leaves])
        new_v = treedef.unflatten([l[1] for l in leaves])
        new_d = treedef.unflatten([l[2] for l in leaves])
        new_rms = treedef.unflatten([l[3] for l in leaves])
        new_sv = treedef.unflatten([l[4] for l in leaves])
        new_sa = treedef.unflatten([l[5] for l in leaves])

        updates = jax.tree_util.tree_map(
            lambda np_, p: (np_ - p.astype(jnp.float32)).astype(p.dtype),
            new_p, params)
        return updates, ScaledAdamState(
            count=count, exp_avg_sq=new_v, delta=new_d, param_rms=new_rms,
            scale_exp_avg_sq=new_sv, scale_grad_acc=new_sa, norm_ema=norm_ema)

    return optax.GradientTransformation(init_fn, update_fn)
