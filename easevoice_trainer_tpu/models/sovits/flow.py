"""Normalizing flow between prior and posterior latents.

Rebuild of ResidualCouplingBlock (reference: src/easevoice/module/models.py:273-315,
modules.py:404-459): four mean-only affine coupling layers interleaved with
channel flips.  Forward maps posterior z -> prior space; ``reverse=True``
inverts for synthesis.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...nn.wavenet import WaveNet


class ResidualCouplingLayer(nn.Module):
    channels: int = 192
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    gin_channels: int = 512
    mean_only: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Dense(self.hidden_channels, dtype=self.dtype,
                     param_dtype=jnp.float32, name="pre")(x0) * x_mask
        h = WaveNet(self.hidden_channels, self.kernel_size, self.dilation_rate,
                    self.n_layers, gin_channels=self.gin_channels,
                    dtype=self.dtype, name="enc")(h, x_mask, g=g,
                                                  deterministic=deterministic)
        # zero-init post projection => identity coupling at init (reference
        # zeroes post weight+bias)
        stats = nn.Dense(
            half if self.mean_only else 2 * half,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="post")(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)

        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    channels: int = 192
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers,
                gin_channels=self.gin_channels, mean_only=True,
                dtype=self.dtype, name=f"coupling_{i}")
            for i in range(self.n_flows)
        ]
        order = range(self.n_flows) if not reverse else reversed(range(self.n_flows))
        for i in order:
            if not reverse:
                x = layers[i](x, x_mask, g=g, reverse=False,
                              deterministic=deterministic)
                x = jnp.flip(x, axis=-1)   # channel flip (modules.Flip)
            else:
                x = jnp.flip(x, axis=-1)
                x = layers[i](x, x_mask, g=g, reverse=True,
                              deterministic=deterministic)
        return x
