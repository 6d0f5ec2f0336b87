"""s2 prior text/SSL encoder with multi-reference timbre cross-attention.

Rebuild of TextEncoder + MRTE (reference: src/easevoice/module/models.py:174-270,
mrte_model.py:9-62): quantized SSL features are refined by a rel-pos encoder,
text phonemes are embedded and encoded, MRTE cross-attends SSL->text and adds
the global style vector, then a second encoder and a 1x1 projection produce
the prior (m_p, logs_p).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...nn.attention import MultiHeadAttention, RelPosEncoder
from ...nn.layers import sequence_mask


class MRTE(nn.Module):
    """Multi-reference timbre encoder (cross-attention content -> text)."""

    content_channels: int = 192
    hidden_size: int = 512
    out_channels: int = 192
    n_heads: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, ssl_enc, ssl_mask, text, text_mask, ge,
                 deterministic: bool = True):
        """ssl_enc: (B, Ts, C); text: (B, Tt, C); ge: (B, 1, hidden) or None."""
        dtype = self.dtype or ssl_enc.dtype
        if ge is None:
            ge = jnp.zeros((1, 1, self.hidden_size), dtype)
        # attn_mask: queries are SSL frames, keys are text tokens
        attn_mask = (ssl_mask[:, None, :, 0][:, :, :, None]
                     * text_mask[:, None, :, 0][:, :, None, :])
        c = nn.Dense(self.hidden_size, dtype=dtype, param_dtype=jnp.float32,
                     name="c_pre")(ssl_enc * ssl_mask)
        t = nn.Dense(self.hidden_size, dtype=dtype, param_dtype=jnp.float32,
                     name="text_pre")(text * text_mask)
        x = MultiHeadAttention(
            self.hidden_size, self.hidden_size, self.n_heads,
            dtype=dtype, name="cross_attention",
        )(c * ssl_mask, t * text_mask, attn_mask, deterministic=deterministic)
        x = x + c + ge
        x = nn.Dense(self.out_channels, dtype=dtype, param_dtype=jnp.float32,
                     name="c_post")(x * ssl_mask)
        return x


class TextEncoder(nn.Module):
    out_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    n_symbols: int = 732
    ssl_dim: int = 768
    gin_channels: int = 512   # MRTE mixes the style vector at this width
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, y, y_lengths, text, text_lengths, ge, speed: float = 1.0,
                 deterministic: bool = True):
        """y: quantized SSL (B, Ts, ssl_dim); text: (B, Tt) int; ge: (B,1,gin).

        Returns (encoded (B,Ts,C), m_p, logs_p, y_mask (B,Ts,1)).
        """
        dtype = self.dtype or y.dtype
        y_mask = sequence_mask(y_lengths, y.shape[1])[:, :, None].astype(dtype)
        text_mask = sequence_mask(text_lengths, text.shape[1])[:, :, None].astype(dtype)

        y = nn.Dense(self.hidden_channels, dtype=dtype, param_dtype=jnp.float32,
                     name="ssl_proj")(y * y_mask) * y_mask
        y = RelPosEncoder(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers // 2, self.kernel_size, self.p_dropout,
            dtype=dtype, name="encoder_ssl",
        )(y * y_mask, y_mask, deterministic=deterministic)

        emb = nn.Embed(self.n_symbols, self.hidden_channels,
                       param_dtype=jnp.float32, name="text_embedding")(text)
        t = RelPosEncoder(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers, self.kernel_size, self.p_dropout,
            dtype=dtype, name="encoder_text",
        )(emb.astype(dtype) * text_mask, text_mask, deterministic=deterministic)

        y = MRTE(self.hidden_channels, self.gin_channels, self.hidden_channels,
                 dtype=dtype, name="mrte")(
            y, y_mask, t, text_mask, ge, deterministic=deterministic)

        y = RelPosEncoder(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers // 2, self.kernel_size, self.p_dropout,
            dtype=dtype, name="encoder2",
        )(y * y_mask, y_mask, deterministic=deterministic)

        if speed != 1.0:
            # linear time-resample (reference: F.interpolate(..., "linear"))
            new_len = int(y.shape[1] / speed) + 1
            y = _linear_resize_time(y, new_len)
            y_mask = _nearest_resize_time(y_mask, new_len)

        stats = nn.Dense(self.out_channels * 2, dtype=dtype,
                         param_dtype=jnp.float32, name="proj")(y) * y_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return y, m, logs, y_mask


def _linear_resize_time(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on (B, T, C)."""
    t = x.shape[1]
    pos = (jnp.arange(new_len, dtype=jnp.float32) + 0.5) * (t / new_len) - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w = jnp.clip(pos - lo.astype(jnp.float32), 0.0, 1.0)
    return (x[:, lo] * (1.0 - w)[None, :, None] + x[:, hi] * w[None, :, None])


def _nearest_resize_time(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    t = x.shape[1]
    idx = jnp.clip((jnp.arange(new_len) * t) // new_len, 0, t - 1)
    return x[:, idx]
