"""ScaledAdam (k2/icefall) as an optax gradient transformation.

The reference trains the s1 GPT with ScaledAdam
(reference: src/easevoice/soundstorm/auto_reg/modules/optim.py:123-622,
t2s_lightning_module.py:100-121): Adam whose per-tensor step size is
proportional to the tensor's RMS (so the *relative* parameter change is
controlled), plus an explicit learned parameter-scale update.

This is a faithful functional re-derivation, trajectory-tested against the
reference torch implementation (tests/test_scaled_adam_parity.py).  The
fine print it reproduces exactly:

* clipping keeps a ``clipping_update_period``-slot ring buffer of
  RMS-weighted global gradient norms; the threshold is ``clipping_scale``
  x the (lower) median, recomputed every period, no clipping before the
  first full period (optim.py:300-394);
* the clip factor multiplies only the *size-update* gradients — the core
  Adam update reads the raw gradient (optim.py:468-470 computes a local
  clipped grad used by scale_grads; optim.py:574 re-reads ``p.grad``);
* tensor path: v-hat bias correction is applied only while
  ``1 - beta2^t < 0.99``; the step is ``-lr * (1-b1) * max(rms, min_rms)
  * g / (sqrt(v-hat) + eps)`` folded into a beta1-decayed delta
  (optim.py:560-599);
* size update every ``size_update_period`` steps (skipping step 0):
  second moment decays at ``beta2^K`` over the *mean of squared* period
  scale-grads, the step uses ``sqrt(1 - beta2_corr^size_step)`` bias
  correction times the period *sum*; undersized tensors stop shrinking,
  oversized ones get a fixed ``-size_lr * K`` push (optim.py:503-558);
* scalar path: plain Adam at ``lr * scalar_lr_scale`` with the parameter
  clamped to ±scalar_max before the step (optim.py:601-622).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


class ScaledAdamState(NamedTuple):
    count: jnp.ndarray       # torch 'step' (0 on the first update)
    exp_avg_sq: Any          # v, per leaf
    delta: Any               # momentum of the actual step, per leaf
    param_rms: Any           # cached RMS, per leaf (scalar per tensor)
    scale_exp_avg_sq: Any    # second moment of the scale gradient
    scale_grads: Any         # (K,) ring of per-period scale grads, per leaf
    norm_buffer: jnp.ndarray     # (period,) ring of RMS-weighted grad norms
    norm_threshold: jnp.ndarray  # current clip threshold


def scaled_adam(
    learning_rate: float | optax.Schedule = 0.002,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    min_rms: float = 1e-5,
    max_rms: float = 3.0,
    size_update_period: int = 4,
    scalar_lr_scale: float = 0.1,
    scalar_max: float = 10.0,
    clipping_scale: Optional[float] = 2.0,
    clipping_update_period: int = 1000,
    rowwise: bool = False,
    state_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """``rowwise=True`` treats every leaf ``[n, *s]`` as a stack of ``n``
    independent tensors (the parameter-arena layout, train/arena.py): all
    per-tensor reductions (param RMS, scale grads, size update) run along
    axes 1.. so the update on row ``i`` equals the per-leaf update on the
    unstacked tensor — same math, ~leaf-count/78 fewer kernels.

    ``state_dtype`` stores the two full-size state tensors (``exp_avg_sq``
    and ``delta``) in that dtype (bf16 halves optimizer traffic on a
    bytes-bound step, docs/PERF.md); the update math stays fp32 — state is
    upcast on read and re-rounded on store, exactly the
    ``train/optim_lowp.py`` scheme.  ``None`` keeps fp32 storage
    (trajectory-parity-exact vs the reference torch implementation).  The
    small per-tensor scalars (param_rms, scale state, clip ring) always
    stay fp32."""

    period = clipping_update_period
    K = size_update_period
    sdt = jnp.float32 if state_dtype is None else state_dtype

    def lr_at(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate, jnp.float32)

    def _is_scalar(p):
        if rowwise:
            return p.ndim <= 1 or int(np.prod(p.shape[1:])) == 1
        return p.ndim == 0 or p.size == 1

    def _raxes(p):
        """Reduction axes: whole tensor, or per-row under the arena."""
        return tuple(range(1, p.ndim)) if rowwise else None

    def _rbcast(s, p):
        """Broadcast a per-row scalar back over the row dims."""
        if not rowwise:
            return s
        return s.reshape(s.shape + (1,) * (p.ndim - 1))

    def init_fn(params):
        zeros_like = lambda p: jnp.zeros_like(p, sdt)
        if rowwise:
            scalar_zero = lambda p: jnp.zeros((p.shape[0],), jnp.float32)
            k_zeros = lambda p: jnp.zeros((p.shape[0], K), jnp.float32)
        else:
            scalar_zero = lambda p: jnp.zeros((), jnp.float32)
            k_zeros = lambda p: jnp.zeros((K,), jnp.float32)
        rms_init = lambda p: (
            jnp.zeros((p.shape[0],) if rowwise else (), jnp.float32)
            if _is_scalar(p)
            else jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2,
                                   axis=_raxes(p))))
        return ScaledAdamState(
            count=jnp.zeros((), jnp.int32),
            exp_avg_sq=jax.tree_util.tree_map(zeros_like, params),
            delta=jax.tree_util.tree_map(zeros_like, params),
            param_rms=jax.tree_util.tree_map(rms_init, params),
            scale_exp_avg_sq=jax.tree_util.tree_map(scalar_zero, params),
            scale_grads=jax.tree_util.tree_map(k_zeros, params),
            norm_buffer=jnp.zeros((period,), jnp.float32),
            norm_threshold=jnp.asarray(jnp.inf, jnp.float32),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("scaled_adam requires params")
        step = state.count                      # torch 'step', starts at 0
        lr = lr_at(step)

        # ---- adaptive clipping (ring-buffer median, optim.py:300-394) ----
        if clipping_scale is not None:
            def leaf_sumsq(p, g, rms):
                g32 = g.astype(jnp.float32)
                if _is_scalar(p):
                    return jnp.sum(g32 * g32)
                return jnp.sum((rms ** 2) * jnp.sum(g32 * g32, axis=_raxes(g32)))

            tot_sumsq = jax.tree_util.tree_reduce(
                jnp.add, jax.tree_util.tree_map(
                    leaf_sumsq, params, grads, state.param_rms))
            tot_norm = jnp.sqrt(tot_sumsq)
            norm_buffer = state.norm_buffer.at[step % period].set(tot_norm)
            median_idx = min(period - 1, (period // 4) * 2)

            def refresh(_):
                return clipping_scale * jnp.sort(norm_buffer)[median_idx]

            norm_threshold = jax.lax.cond(
                (step % period == 0) & (step > 0),
                refresh, lambda _: state.norm_threshold, None)
            clip = jnp.where(
                step < period, 1.0,
                jnp.minimum(1.0, norm_threshold / (tot_norm + 1e-20)))
            clip = jnp.where(step == 0, 1.0, clip)
        else:
            norm_buffer = state.norm_buffer
            norm_threshold = state.norm_threshold
            clip = jnp.asarray(1.0, jnp.float32)

        bc2 = 1.0 - b2 ** (step.astype(jnp.float32) + 1.0)
        is_refresh = (step % K) == (K - 1)
        beta2_corr = b2 ** K

        def leaf_update(p, g, v, d, rms, s_v, sgrads):
            g_raw = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            v = v.astype(jnp.float32)           # state math is always fp32
            d = b1 * d.astype(jnp.float32)

            if _is_scalar(p):
                # optim.py:601-622 — plain Adam at scalar lr, pre-clamped p
                v = b2 * v + (1.0 - b2) * g_raw * g_raw
                denom = jnp.sqrt(v / bc2) + eps
                d = d + (-lr * scalar_lr_scale * (1.0 - b1)) * g_raw / denom
                p_new = jnp.clip(p32, -scalar_max, scalar_max) + d
                return p_new, v, d, rms, s_v, sgrads

            # size/scale bookkeeping uses the CLIPPED grad (optim.py:468-480)
            g_clip = g_raw * clip
            dot = jnp.sum(p32 * g_clip, axis=_raxes(p32))
            if rowwise:
                sgrads = sgrads.at[:, step % K].set(dot)
            else:
                sgrads = sgrads.at[step % K].set(dot)
            new_rms = jnp.sqrt(jnp.mean(p32 * p32, axis=_raxes(p32)))
            rms = jnp.where(is_refresh, new_rms, rms)

            # ---- size update (optim.py:503-558), refresh steps > 0 only --
            do_size = is_refresh & (step > 0)
            s_v_new = beta2_corr * s_v + (1.0 - beta2_corr) * jnp.mean(
                sgrads * sgrads, axis=-1 if rowwise else None)
            size_step = (step + 1) // K
            bc2s = 1.0 - beta2_corr ** size_step.astype(jnp.float32)
            size_lr = lr * scalar_lr_scale
            scale_step = (-size_lr * jnp.sqrt(bc2s)
                          * jnp.sum(sgrads, axis=-1 if rowwise else None)
                          / (jnp.sqrt(s_v_new) + eps))
            scale_step = jnp.where(rms < min_rms, 0.0, scale_step)
            scale_step = jnp.where(rms > max_rms, -size_lr * K, scale_step)
            d = d + _rbcast(jnp.where(do_size, (1.0 - b1) * scale_step, 0.0),
                            p32) * p32
            s_v = jnp.where(do_size, s_v_new, s_v)

            # ---- core update (optim.py:560-599) uses the RAW grad --------
            v = b2 * v + (1.0 - b2) * g_raw * g_raw
            vhat = jnp.where(bc2 < 0.99, v / bc2, v)
            denom = jnp.sqrt(vhat) + eps
            alpha = -lr * (1.0 - b1) * jnp.maximum(rms, min_rms)
            d = d + _rbcast(alpha, p32) * g_raw / denom
            return p32 + d, v, d, rms, s_v, sgrads

        results = jax.tree_util.tree_map(
            leaf_update, params, grads, state.exp_avg_sq, state.delta,
            state.param_rms, state.scale_exp_avg_sq, state.scale_grads)

        # unzip the 6-tuples
        treedef = jax.tree_util.tree_structure(params)
        leaves = treedef.flatten_up_to(results)
        new_p = treedef.unflatten([l[0] for l in leaves])
        new_v = treedef.unflatten([l[1].astype(sdt) for l in leaves])
        new_d = treedef.unflatten([l[2].astype(sdt) for l in leaves])
        new_rms = treedef.unflatten([l[3] for l in leaves])
        new_sv = treedef.unflatten([l[4] for l in leaves])
        new_sg = treedef.unflatten([l[5] for l in leaves])

        updates = jax.tree_util.tree_map(
            lambda np_, p: (np_ - p.astype(jnp.float32)).astype(p.dtype),
            new_p, params)
        return updates, ScaledAdamState(
            count=step + 1, exp_avg_sq=new_v, delta=new_d,
            param_rms=new_rms, scale_exp_avg_sq=new_sv, scale_grads=new_sg,
            norm_buffer=norm_buffer, norm_threshold=norm_threshold)

    return optax.GradientTransformation(init_fn, update_fn)
