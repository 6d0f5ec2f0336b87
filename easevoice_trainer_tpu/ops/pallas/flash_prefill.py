"""Flash-style attention for the GPT prefill, hybrid mask computed inline.

The prefill attends over ``[text; semantic-prompt]`` with the GPT-SoVITS
hybrid mask (text rows see valid text only; audio rows see valid text +
causal audio).  A dense implementation materializes a (B, H, T, T) score
tensor — at T ~ 1700 (54 s prompt) that is ~185 MB fp32 per batch row, the
memory hot spot of batched synthesis.  This kernel streams KV blocks through
VMEM with an online softmax and computes the mask from three scalars
(x_len, x_lens[b], y_lens[b]) on the fly, so HBM traffic is O(T * D).

Layout: q/k/v as (B*H, T, dk); grid over (row, q-block); per-row lengths
arrive via scalar prefetch (SMEM).  dk = 32 for the 512/16 GPT — lanes are
padded to 128 internally, an accepted trade for the O(T^2) memory win.

Measured (v5e-1, B=4, H=16, T=1792): this kernel 62 ms vs 6.6 ms for the
XLA dense path — at dk=32 the MXU runs at <= 1/4 lane occupancy and XLA's
fused dense softmax wins while the 822 MB score tensor still fits HBM.  It
is therefore NOT wired as the default; it exists for long-prompt/large-batch
regimes where the dense intermediate does not fit, and as the base for a
head-folded (4 heads x 32 = 128 lanes) variant. [[flash-prefill-headfold]]
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(xlens_ref, ylens_ref, q_ref, k_ref, v_ref, o_ref, *,
            x_len: int, n_heads: int, block_q: int, block_k: int,
            seq_len: int, scale: float):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    b = bh // n_heads
    x_valid = xlens_ref[b]
    y_valid = ylens_ref[b]

    q = q_ref[0].astype(jnp.float32) * scale          # (block_q, dk)
    q_pos = (iq * block_q
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))

    n_k_blocks = seq_len // block_k

    def body(jk, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(jk * block_k, block_k)].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(jk * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (block_q, block_k)

        k_pos = (jk * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1))
        in_text = k_pos < x_len
        text_ok = in_text & (k_pos < x_valid)
        audio_ok = (~in_text) & ((q_pos >= x_len) & (k_pos <= q_pos)
                                 & (k_pos - x_len < y_valid))
        visible = text_ok | audio_ok
        s = jnp.where(visible, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)      # (block_q, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    dk = q_ref.shape[-1]
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, dk), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_k_blocks, body, (m0, l0, a0))
    # fully-masked rows (padding queries) have l == 0; emit zeros
    o_ref[0] = jnp.where(l > 0, acc / jnp.maximum(l, 1e-30), 0.0).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("x_len", "n_heads", "block_q",
                                             "block_k", "interpret"))
def flash_prefill_attention(
    q: jnp.ndarray,            # (B, T, H, dk)
    k: jnp.ndarray,
    v: jnp.ndarray,
    x_lens: jnp.ndarray,       # (B,) valid text lengths
    y_lens: jnp.ndarray,       # (B,) valid prompt lengths
    x_len: int,                # static text width
    n_heads: int,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, h, dk = q.shape
    assert h == n_heads
    pad = (-t) % block_q
    if pad:
        zeros = jnp.zeros((b, pad, h, dk), q.dtype)
        q = jnp.concatenate([q, zeros], axis=1)
        k = jnp.concatenate([k, zeros], axis=1)
        v = jnp.concatenate([v, zeros], axis=1)
    t_pad = t + pad

    # (B, T, H, dk) -> (B*H, T, dk)
    def fold(z):
        return z.transpose(0, 2, 1, 3).reshape(b * h, t_pad, dk)

    qf, kf, vf = fold(q), fold(k), fold(v)
    scale = 1.0 / (dk ** 0.5)

    grid = (b * h, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel, x_len=x_len, n_heads=n_heads,
                          block_q=block_q, block_k=block_k, seq_len=t_pad,
                          scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dk), lambda r, i, *_: (r, i, 0)),
                pl.BlockSpec((1, t_pad, dk), lambda r, i, *_: (r, 0, 0)),
                pl.BlockSpec((1, t_pad, dk), lambda r, i, *_: (r, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dk),
                                   lambda r, i, *_: (r, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        interpret=interpret,
    )(x_lens.astype(jnp.int32), y_lens.astype(jnp.int32), qf, kf, vf)

    out = out.reshape(b, h, t_pad, dk).transpose(0, 2, 1, 3)
    return out[:, :t]


def dense_reference(q, k, v, x_lens, y_lens, x_len: int) -> jnp.ndarray:
    """O(T^2)-memory reference implementation for testing."""
    b, t, h, dk = q.shape
    from ...models.gpt.t2s import build_hybrid_mask_bias

    y_len = t - x_len
    bias = build_hybrid_mask_bias(x_len, y_len, x_lens, y_lens)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (dk ** 0.5) + bias
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
