"""Fused HiFi-GAN MRF stage as a Pallas TPU kernel.

The multi-receptive-field bank after each upsample stage (reference:
src/easevoice/module/models.py:404-478 — three ResBlocks of
(leaky_relu -> dilated conv -> leaky_relu -> conv) x3 summed and
averaged) is ~18 small convolutions whose (B, T, C) activations XLA:TPU
round-trips through HBM per conv: the compiler does not fuse across
convolutions, and docs/PERF.md attributes ~5 GB/step of the s2 train
step to exactly these streams.

This kernel runs one whole stage per batch row tile-resident in VMEM:

* activations are read once (x) and written once (y) per row — the ~40
  intermediate tensors never touch HBM;
* every conv is a sum of shifted (T, C) x (C, C) tap matmuls on the MXU,
  operating on *folded* (space-to-depth) activations so small-channel
  stages are 128-lane-dense (the same fold algebra as
  ``nn.layers.folded_conv1d``, applied to the weights outside the
  kernel);
* the backward pass is a twin kernel that recomputes the chain from the
  saved input (zero residual traffic) and accumulates dW/db across the
  batch grid in VMEM.

Numerics match the unfused folded path up to matmul reassociation and
one bf16 rounding of the bias add (equivalence-tested in
``tests/test_fused_mrf.py``).  On non-TPU backends callers should use
the unfused module path; ``interpret=True`` exists for tests.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class ConvTap:
    """Static description of one (folded) conv inside the stage.

    The conv computes
    ``y[t] = sum_q W[start+q] @ x[t + q*dil - pl] + b[idx]`` with
    ``q in [0, kp)`` — i.e. taps ``start..start+kp`` of the packed
    weight array at spacing ``dil``, left reach ``pl`` and right reach
    ``(kp - 1)*dil - pl``.  Folded convs have ``dil == 1``; the
    unfolded 128/256-channel stages keep their dilation.
    """

    start: int
    kp: int
    pl: int
    dil: int = 1


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """Static structure of one MRF stage.

    ``blocks`` is a tuple of resblocks; each resblock is a tuple of
    residual steps; each step is a tuple of conv indices (into
    ``convs``) applied as ``h = conv(lrelu(h))`` chained, then
    ``z = z + h``.  The stage output is ``sum(blocks) / len(blocks)``.
    """

    convs: Tuple[ConvTap, ...]
    blocks: Tuple[Tuple[Tuple[int, ...], ...], ...]
    pmax: int

    @property
    def n_taps(self) -> int:
        return sum(c.kp for c in self.convs)

    @property
    def kpmax(self) -> int:
        return max(c.kp for c in self.convs)


def build_stage_spec(block_defs: Sequence[Sequence[Sequence[Tuple[int, ...]]]]
                     ) -> StageSpec:
    """``block_defs[j][s][c] = (kp, pl[, dil])`` -> :class:`StageSpec`."""
    convs = []
    blocks = []
    start = 0
    for block in block_defs:
        bsteps = []
        for step in block:
            sidx = []
            for cdef in step:
                kp, plft = cdef[0], cdef[1]
                dil = cdef[2] if len(cdef) > 2 else 1
                sidx.append(len(convs))
                convs.append(ConvTap(start=start, kp=kp, pl=plft, dil=dil))
                start += kp
            bsteps.append(tuple(sidx))
        blocks.append(tuple(bsteps))
    pmax = max(max(c.pl, (c.kp - 1) * c.dil - c.pl) for c in convs)
    return StageSpec(convs=tuple(convs), blocks=tuple(blocks), pmax=pmax)


def _lrelu(v):
    # max(v, slope*v) == leaky_relu for slope < 1; computed in f32 because
    # Mosaic's VPU lowering rejects bf16 vector compares/maxima
    vf = v.astype(jnp.float32)
    return jnp.maximum(vf, vf * LRELU_SLOPE).astype(v.dtype)


def _dlrelu_mul(pre, g):
    """g * d leaky_relu(pre) without bf16 compares."""
    pf = pre.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    return jnp.where(pf >= 0, gf, gf * LRELU_SLOPE).astype(g.dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(spec: StageSpec, t_real: int, x_ref, w_ref, b_ref, y_ref,
                xp_ref, win_ref):
    t = x_ref.shape[1]
    p = spec.pmax
    cf = x_ref.shape[2]
    x = x_ref[0]

    # zero the halo (and masked tail) once; every conv input is staged
    # through xp_ref so chained convs never read garbage beyond t_real
    xp_ref[:p] = jnp.zeros((p, cf), x.dtype)
    xp_ref[p + t_real:] = jnp.zeros((t + p - t_real, cf), x.dtype)

    def conv(v, ci):
        # im2col: one (t, kp*cf) x (kp*cf, cf) MXU matmul per conv —
        # tap accumulation happens inside the MXU, not on the VPU
        cs = spec.convs[ci]
        xp_ref[p:p + t_real] = v[:t_real]
        for q in range(cs.kp):
            o = p + q * cs.dil - cs.pl
            win_ref[:, q * cf:(q + 1) * cf] = xp_ref[o:o + t]
        w = w_ref[cs.start:cs.start + cs.kp].reshape(cs.kp * cf, cf)
        acc = jax.lax.dot_general(
            win_ref[:, :cs.kp * cf], w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc + b_ref[ci:ci + 1, :].astype(jnp.float32)).astype(v.dtype)

    acc = jnp.zeros((t, cf), jnp.float32)
    for block in spec.blocks:
        z = x
        for step in block:
            h = z
            for ci in step:
                h = conv(_lrelu(h), ci)
            z = z + h
        acc = acc + z.astype(jnp.float32)
    y_ref[0] = (acc / len(spec.blocks)).astype(x.dtype)


# ---------------------------------------------------------------------------
# backward kernel (recompute: reads x + dy, writes dx and accumulates dW/db)
# ---------------------------------------------------------------------------

def _bwd_kernel(spec: StageSpec, t_real: int, x_ref, w_ref, wt_ref, b_ref,
                dy_ref, dx_ref, dw_ref, db_ref, xp_ref, gp_ref, win_ref):
    t = x_ref.shape[1]
    p = spec.pmax
    cf = x_ref.shape[2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    x = x_ref[0]
    zero_halo_lo = jnp.zeros((p, cf), x.dtype)
    zero_tail = jnp.zeros((t + p - t_real, cf), x.dtype)
    xp_ref[:p] = zero_halo_lo
    xp_ref[p + t_real:] = zero_tail
    gp_ref[:p] = zero_halo_lo
    gp_ref[p + t_real:] = zero_tail

    def conv(v, ci):
        cs = spec.convs[ci]
        xp_ref[p:p + t_real] = v[:t_real]
        for q in range(cs.kp):
            o = p + q * cs.dil - cs.pl
            win_ref[:, q * cf:(q + 1) * cf] = xp_ref[o:o + t]
        w = w_ref[cs.start:cs.start + cs.kp].reshape(cs.kp * cf, cf)
        acc = jax.lax.dot_general(
            win_ref[:, :cs.kp * cf], w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc + b_ref[ci:ci + 1, :].astype(jnp.float32)).astype(v.dtype)

    def conv_bwd(a_in, dh, ci):
        """Grad through ``out = conv(a_in)`` given ``dh = d out``:
        accumulates dW/db and returns d a_in."""
        cs = spec.convs[ci]
        # dW (all taps at once): im2col(a_in)^T @ dh, contract time
        xp_ref[p:p + t_real] = a_in[:t_real]
        gp_ref[p:p + t_real] = dh[:t_real]
        db_ref[ci:ci + 1] += jnp.sum(
            gp_ref[p:p + t].astype(jnp.float32), axis=0, keepdims=True)
        for q in range(cs.kp):
            o = p + q * cs.dil - cs.pl
            win_ref[:, q * cf:(q + 1) * cf] = xp_ref[o:o + t]
        dw = jax.lax.dot_general(
            win_ref[:, :cs.kp * cf], gp_ref[p:p + t],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw_ref[cs.start:cs.start + cs.kp] += dw.reshape(cs.kp, cf, cf)
        # d a_in: im2col(dh, flipped offsets) @ stacked W^T
        for q in range(cs.kp):
            og = p - (q * cs.dil - cs.pl)
            win_ref[:, q * cf:(q + 1) * cf] = gp_ref[og:og + t]
        wt = wt_ref[cs.start:cs.start + cs.kp].reshape(cs.kp * cf, cf)
        da = jax.lax.dot_general(
            win_ref[:, :cs.kp * cf], wt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return da.astype(dh.dtype)

    dy = dy_ref[0]
    inv = jnp.asarray(1.0 / len(spec.blocks), jnp.float32).astype(dy.dtype)
    dy_blk = dy * inv
    dx_acc = jnp.zeros((t, cf), jnp.float32)
    for block in spec.blocks:
        # recompute the chain, keeping each conv's pre-activation input
        pres = []          # pres[s][k] = value whose lrelu feeds conv k
        z = x
        for step in block:
            spres = []
            h = z
            for ci in step:
                spres.append(h)
                h = conv(_lrelu(h), ci)
            pres.append(spres)
            z = z + h
        # walk backward
        dz = dy_blk
        for s_i in range(len(block) - 1, -1, -1):
            step = block[s_i]
            dh = dz
            for k_i in range(len(step) - 1, -1, -1):
                ci = step[k_i]
                pre = pres[s_i][k_i]
                da = conv_bwd(_lrelu(pre), dh, ci)
                dh = _dlrelu_mul(pre, da)
            dz = dz + dh
        dx_acc = dx_acc + dz.astype(jnp.float32)
    dx_ref[0] = dx_acc.astype(x.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _pad_time(a: jnp.ndarray, mult: int = 32) -> jnp.ndarray:
    t = a.shape[1]
    pad = (-t) % mult
    if pad == 0:
        return a
    return jnp.pad(a, ((0, 0), (0, pad), (0, 0)))


def _fwd_call(x, wcat, bcat, spec: StageSpec, interpret: bool):
    b, t_real, cf = x.shape
    xp = _pad_time(x)
    t = xp.shape[1]
    ktot = wcat.shape[0]
    n_convs = bcat.shape[0]
    flops = 2 * b * t * cf * cf * spec.n_taps
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, t_real),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, cf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ktot, cf, cf), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, cf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cf), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, cf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * spec.pmax, cf), x.dtype),
            pltpu.VMEM((t, spec.kpmax * cf), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * b * t * cf * 2, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, wcat, bcat)
    return y[:, :t_real]


def _bwd_call(x, wcat, bcat, dy, spec: StageSpec, interpret: bool):
    b, t_real, cf = x.shape
    xp = _pad_time(x)
    dyp = _pad_time(dy)
    t = xp.shape[1]
    ktot = wcat.shape[0]
    n_convs = bcat.shape[0]
    flops = 6 * b * t * cf * cf * spec.n_taps
    wcat_t = jnp.swapaxes(wcat, 1, 2)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, t_real),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, cf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ktot, cf, cf), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ktot, cf, cf), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, cf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, cf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t, cf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ktot, cf, cf), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, cf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, cf), x.dtype),
            jax.ShapeDtypeStruct((ktot, cf, cf), jnp.float32),
            jax.ShapeDtypeStruct((n_convs, cf), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * spec.pmax, cf), x.dtype),
            pltpu.VMEM((t + 2 * spec.pmax, cf), x.dtype),
            pltpu.VMEM((t, spec.kpmax * cf), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * b * t * cf * 2, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, wcat, wcat_t, bcat, dyp)
    return (dx[:, :t_real], dw.astype(wcat.dtype), db.astype(bcat.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mrf_stage(x, wcat, bcat, spec: StageSpec, interpret: bool = False):
    """Differentiable fused MRF stage.

    ``x`` (B, T, Cf) activations (folded space); ``wcat`` (sum kp, Cf, Cf)
    packed folded tap weights; ``bcat`` (n_convs, Cf) folded biases;
    ``spec`` the static structure.
    """
    return _fwd_call(x, wcat, bcat, spec, interpret)


def _mrf_fwd(x, wcat, bcat, spec, interpret):
    return _fwd_call(x, wcat, bcat, spec, interpret), (x, wcat, bcat)


def _mrf_bwd(spec, interpret, res, dy):
    x, wcat, bcat = res
    return _bwd_call(x, wcat, bcat, dy, spec, interpret)


mrf_stage.defvjp(_mrf_fwd, _mrf_bwd)


# ---------------------------------------------------------------------------
# reference composition (oracle for tests; identical math, plain XLA)
# ---------------------------------------------------------------------------

def mrf_stage_reference(x, wcat, bcat, spec: StageSpec):
    def conv(v, ci):
        cs = spec.convs[ci]
        w = wcat[cs.start:cs.start + cs.kp]        # (kp, Cf, Cf)
        y = jax.lax.conv_general_dilated(
            v, w,
            window_strides=(1,),
            padding=[(cs.pl, (cs.kp - 1) * cs.dil - cs.pl)],
            rhs_dilation=(cs.dil,),
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + bcat[ci][None, None, :].astype(y.dtype)

    acc = None
    for block in spec.blocks:
        z = x
        for step in block:
            h = z
            for ci in step:
                h = conv(_lrelu(h), ci)
            z = z + h
        acc = z if acc is None else acc + z
    return acc / len(spec.blocks)
