"""Attention blocks for the VITS-side encoders.

Re-derivation of the reference's windowed relative-position attention
(reference: src/easevoice/module/attentions.py:176-380) in channels-last JAX:

* learned relative key/value embeddings over a ±window (default 4), shared
  across heads, added via the standard Music-Transformer skew trick (static
  pad/reshape — no gathers, jit-friendly);
* masked positions get a -1e4 additive bias (same constant as the reference
  so fp16/bf16 checkpoints behave identically);
* the encoder is post-norm: ``x = LN(x + Attn(x)); x = LN(x + FFN(x))`` with
  a conv FFN (kernel 3 in s2) and mask multiplication between blocks.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm

MASK_VALUE = -1e4


def _xavier_conv_init(key, shape, dtype=jnp.float32):
    # shape (1, in, out) — xavier uniform over (in, out), matching the
    # reference's nn.init.xavier_uniform_ on 1x1 conv projections
    fan_in, fan_out = shape[-2], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def _rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, 2L-1) relative logits -> (B, H, L, L) absolute logits."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))          # (B,H,L,2L)
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1:]


def _abs_to_rel(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, L) attention weights -> (B, H, L, 2L-1) relative layout."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def _window_embeddings(emb: jnp.ndarray, length: int, window: int) -> jnp.ndarray:
    """Slice/pad (1, 2w+1, d) learned embeddings to (1, 2L-1, d)."""
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad > 0:
        emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start:start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    """MHA with optional windowed relative positions; (B, T, C) in/out.

    ``window_size`` requires self-attention (query length == key length).
    """

    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = None
    p_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d = self.channels
        h = self.n_heads
        dk = d // h
        dtype = self.dtype or x.dtype

        dense = lambda name: nn.DenseGeneral(
            features=d, use_bias=True, dtype=dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(), name=name)
        q = dense("query")(x)
        k = dense("key")(c)
        v = dense("value")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        q = q.reshape(b, t_t, h, dk).transpose(0, 2, 1, 3)  # (B,H,Tq,dk)
        k = k.reshape(b, t_s, h, dk).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_s, h, dk).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(dk)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)

        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(stddev=dk ** -0.5),
                (1, 2 * self.window_size + 1, dk), jnp.float32)
            rel_used = _window_embeddings(rel_k.astype(dtype), t_s, self.window_size)
            rel_logits = jnp.einsum(
                "bhqd,xmd->bhqm", q * scale, rel_used,
                preferred_element_type=jnp.float32)
            scores = scores + _rel_to_abs(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, MASK_VALUE, scores)

        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
        if self.p_dropout > 0:
            probs = nn.Dropout(self.p_dropout)(probs, deterministic=deterministic)

        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(dtype)

        if self.window_size is not None:
            rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(stddev=dk ** -0.5),
                (1, 2 * self.window_size + 1, dk), jnp.float32)
            rel_w = _abs_to_rel(probs)
            rel_used_v = _window_embeddings(rel_v.astype(dtype), t_s, self.window_size)
            out = out + jnp.einsum(
                "bhqm,xmd->bhqd", rel_w, rel_used_v,
                preferred_element_type=jnp.float32).astype(dtype)

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, d)
        out = nn.DenseGeneral(
            features=self.out_channels, use_bias=True, dtype=dtype,
            param_dtype=jnp.float32, name="out")(out)
        return out


class ConvFFN(nn.Module):
    """Conv feed-forward with masked same-padding (reference FFN)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        dtype = self.dtype or x.dtype
        conv = lambda feats, name: nn.Conv(
            features=feats, kernel_size=(self.kernel_size,),
            padding=[((self.kernel_size - 1) // 2, self.kernel_size // 2)],
            dtype=dtype, param_dtype=jnp.float32, name=name)
        y = conv(self.filter_channels, "conv1")(x * x_mask)
        y = jax.nn.relu(y)
        if self.p_dropout > 0:
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = conv(self.out_channels, "conv2")(y * x_mask)
        return y * x_mask


class RelPosEncoder(nn.Module):
    """Stack of post-norm rel-pos attention + conv-FFN blocks.

    Mirrors the reference Encoder (src/easevoice/module/attentions.py:12-91):
    used for encoder_ssl / encoder_text / encoder2 in the s2 TextEncoder.
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # x: (B, T, C); x_mask: (B, T, 1)
        attn_mask = x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                window_size=self.window_size, p_dropout=self.p_dropout,
                dtype=self.dtype, name=f"attn_{i}",
            )(x, x, attn_mask, deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + y)

            y = ConvFFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                self.p_dropout, dtype=self.dtype, name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(self.hidden_channels, name=f"norm2_{i}")(x + y)
        return x * x_mask
