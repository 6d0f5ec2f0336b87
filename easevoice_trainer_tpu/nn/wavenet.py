"""Non-causal WaveNet stack (gated dilated convs with skip connections).

TPU-native rebuild of the reference WN module
(reference: src/easevoice/module/modules.py:135-215): per layer a
weight-normalized dilated conv to 2*hidden channels, gated
tanh/sigmoid activation with additive global conditioning, then a 1x1
res/skip projection.  Used by the posterior encoder and every coupling layer.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import WNConv1d


def gated_activation(x: jnp.ndarray, g: jnp.ndarray, channels: int) -> jnp.ndarray:
    a = x + g
    return jnp.tanh(a[..., :channels]) * nn.sigmoid(a[..., channels:])


class WaveNet(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        """x: (B, T, hidden); x_mask: (B, T, 1); g: (B, 1, gin) or None."""
        hc = self.hidden_channels
        output = jnp.zeros_like(x)

        if g is not None and self.gin_channels > 0:
            g_all = WNConv1d(
                self.gin_channels, 2 * hc * self.n_layers, 1, name="cond_layer",
                dtype=self.dtype)(g)
        else:
            g_all = None

        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = WNConv1d(
                hc, 2 * hc, self.kernel_size, dilation=dilation,
                name=f"in_{i}", dtype=self.dtype)(x)
            if g_all is not None:
                g_l = g_all[..., i * 2 * hc:(i + 1) * 2 * hc]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = gated_activation(x_in, g_l, hc)
            if self.p_dropout > 0:
                acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)

            if i < self.n_layers - 1:
                res_skip = WNConv1d(hc, 2 * hc, 1, name=f"res_skip_{i}",
                                    dtype=self.dtype)(acts)
                x = (x + res_skip[..., :hc]) * x_mask
                output = output + res_skip[..., hc:]
            else:
                res_skip = WNConv1d(hc, hc, 1, name=f"res_skip_{i}",
                                    dtype=self.dtype)(acts)
                output = output + res_skip
        return output * x_mask
