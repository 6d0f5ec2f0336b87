"""Posterior spectrogram encoder (WaveNet VAE encoder).

Rebuild of PosteriorEncoder (reference: src/easevoice/module/models.py:318-360):
1x1 pre-proj -> 16-layer WaveNet conditioned on the style vector -> 1x1
projection to (m, logs); z is reparameterization-sampled.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import sequence_mask
from ...nn.wavenet import WaveNet


class PosteriorEncoder(nn.Module):
    in_channels: int = 1025
    out_channels: int = 192
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_lengths, g=None, rng=None, deterministic: bool = True):
        """x: (B, T, spec_bins); g: (B, 1, gin). Returns (z, m, logs, mask)."""
        dtype = self.dtype or x.dtype
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(dtype)
        if g is not None:
            # the reference detaches the style vector before the posterior
            g = jax.lax.stop_gradient(g)
        h = nn.Dense(self.hidden_channels, dtype=dtype, param_dtype=jnp.float32,
                     name="pre")(x) * x_mask
        h = WaveNet(self.hidden_channels, self.kernel_size, self.dilation_rate,
                    self.n_layers, gin_channels=self.gin_channels,
                    dtype=dtype, name="enc")(h, x_mask, g=g,
                                             deterministic=deterministic)
        stats = nn.Dense(self.out_channels * 2, dtype=dtype,
                         param_dtype=jnp.float32, name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if rng is None:
            z = m
        else:
            noise = jax.random.normal(rng, m.shape, dtype=m.dtype)
            z = m + noise * jnp.exp(logs)
        z = z * x_mask
        return z, m, logs, x_mask
