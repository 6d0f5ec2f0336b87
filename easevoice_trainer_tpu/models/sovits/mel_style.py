"""Global style (speaker/timbre) encoder over the reference spectrogram.

Rebuild of MelStyleEncoder (reference: src/easevoice/module/modules.py:685-763):
spectral MLP (Mish) -> two Conv1dGLU blocks -> plain self-attention
(temperature sqrt(d_model)) -> linear -> masked temporal mean.  Produces the
``ge`` conditioning vector; the v2 model feeds it ``spec[:, :704]`` bins
(reference: models.py:911).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class Conv1dGLU(nn.Module):
    channels: int
    kernel_size: int = 5
    p_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        y = nn.Conv(2 * self.channels, (self.kernel_size,),
                    padding=[((self.kernel_size - 1) // 2, self.kernel_size // 2)],
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * nn.sigmoid(b)
        if self.p_dropout > 0:
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        return residual + y


class MelStyleEncoder(nn.Module):
    in_dim: int = 704
    hidden_dim: int = 128
    out_dim: int = 512           # gin_channels
    kernel_size: int = 5
    n_heads: int = 2
    p_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_mask=None, deterministic: bool = True):
        """x: (B, T, in_dim) spectrogram frames; x_mask: (B, T, 1) or None.

        Returns (B, 1, out_dim) style vector.
        """
        dtype = self.dtype or x.dtype
        dense = lambda feats, name: nn.Dense(
            feats, dtype=dtype, param_dtype=jnp.float32, name=name)

        # spectral MLP
        y = dense(self.hidden_dim, "spectral1")(x)
        y = mish(y)
        if self.p_dropout > 0:
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = dense(self.hidden_dim, "spectral2")(y)
        y = mish(y)
        if self.p_dropout > 0:
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)

        # temporal gated convs
        y = Conv1dGLU(self.hidden_dim, self.kernel_size, self.p_dropout,
                      dtype=dtype, name="glu1")(y, deterministic)
        y = Conv1dGLU(self.hidden_dim, self.kernel_size, self.p_dropout,
                      dtype=dtype, name="glu2")(y, deterministic)

        if x_mask is not None:
            y = y * x_mask

        # self-attention with residual; temperature is sqrt(d_model)
        h, dk = self.n_heads, self.hidden_dim // self.n_heads
        q = dense(h * dk, "w_qs")(y)
        k = dense(h * dk, "w_ks")(y)
        v = dense(h * dk, "w_vs")(y)
        b, t, _ = y.shape
        reshape = lambda z: z.reshape(b, t, h, dk).transpose(0, 2, 1, 3)
        q, k, v = reshape(q), reshape(k), reshape(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(self.hidden_dim))
        if x_mask is not None:
            valid = x_mask[:, None, None, :, 0] > 0  # (B,1,1,T)
            scores = jnp.where(valid, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                          preferred_element_type=jnp.float32).astype(dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * dk)
        attn = dense(self.hidden_dim, "fc_attn")(attn)
        if self.p_dropout > 0:
            attn = nn.Dropout(self.p_dropout)(attn, deterministic=deterministic)
        y = y + attn

        y = dense(self.out_dim, "fc_out")(y)

        # masked temporal mean -> (B, 1, out_dim)
        if x_mask is not None:
            y = y * x_mask
            denom = jnp.maximum(x_mask.sum(axis=1, keepdims=True), 1.0)
            w = y.sum(axis=1, keepdims=True) / denom
        else:
            w = y.mean(axis=1, keepdims=True)
        return w
