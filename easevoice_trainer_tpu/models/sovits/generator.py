"""HiFi-GAN waveform generator.

Rebuild of Generator (reference: src/easevoice/module/models.py:404-478):
conv_pre (k=7) + style conditioning, five weight-normed transposed-conv
upsample stages (x10*8*2*2*2 = 640 samples/frame), each followed by an MRF
bank of three ResBlock1 (k=3/7/11, dilations 1/3/5), then a k=7 conv to a
tanh waveform.

This stack dominates s2 training time; keeping it channels-last with fused
leaky-relu lets XLA map every conv to the MXU and fuse the elementwise tails.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import WNConv1d, WNConvTranspose1d, leaky_relu


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Optional[jnp.dtype] = None
    fold: int = 1   # space-to-depth factor for small-channel stages

    @nn.compact
    def __call__(self, x, x_mask=None):
        for j, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = WNConv1d(self.channels, self.channels, self.kernel_size,
                          dilation=d, name=f"conv1_{j}", dtype=self.dtype,
                          fold=self.fold)(xt)
            xt = leaky_relu(xt)
            if x_mask is not None:
                xt = xt * x_mask
            xt = WNConv1d(self.channels, self.channels, self.kernel_size,
                          dilation=1, name=f"conv2_{j}", dtype=self.dtype,
                          fold=self.fold)(xt)
            x = x + xt
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)
    dtype: Optional[jnp.dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, x_mask=None):
        for j, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = WNConv1d(self.channels, self.channels, self.kernel_size,
                          dilation=d, name=f"conv_{j}", dtype=self.dtype,
                          fold=self.fold)(xt)
            x = x + xt
        if x_mask is not None:
            x = x * x_mask
        return x


class Generator(nn.Module):
    initial_channel: int = 192
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (10, 8, 2, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 8, 2, 2)
    gin_channels: int = 512
    dtype: Optional[jnp.dtype] = None

    @property
    def total_upsample(self) -> int:
        total = 1
        for u in self.upsample_rates:
            total *= u
        return total

    @nn.compact
    def __call__(self, x, g=None):
        """x: (B, T, initial_channel) latent; g: (B, 1, gin). -> (B, T*640, 1)."""
        dtype = self.dtype or x.dtype
        num_kernels = len(self.resblock_kernel_sizes)
        block = ResBlock1 if self.resblock == "1" else ResBlock2

        x = nn.Conv(self.upsample_initial_channel, (7,), padding=[(3, 3)],
                    dtype=dtype, param_dtype=jnp.float32, name="conv_pre")(x)
        if g is not None and self.gin_channels > 0:
            x = x + nn.Dense(self.upsample_initial_channel, dtype=dtype,
                             param_dtype=jnp.float32, name="cond")(g)

        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            x = leaky_relu(x)
            ch_out = self.upsample_initial_channel // (2 ** (i + 1))
            # small-channel upsamples run depth-to-space folded so the
            # lane dim is u*fold*ch_out ~ 128-dense (see WNConvTranspose1d)
            tfold = (max(1, 128 // (u * ch_out))
                     if u * ch_out <= 128 and k - u == 2 * ((k - u) // 2)
                     else 0)
            x = WNConvTranspose1d(ch, ch_out, k, u, padding=(k - u) // 2,
                                  name=f"up_{i}", dtype=dtype,
                                  fold=tfold)(x)
            ch = ch_out
            # fold small-channel stages so lanes are 128-dense (see WNConv1d)
            fold = max(1, min(8, 128 // ch)) if ch < 128 else 1
            blocks = [block(ch, rk, tuple(rd), name=f"resblock_{i}_{j}",
                            dtype=dtype, fold=fold)
                      for j, (rk, rd) in enumerate(zip(
                          self.resblock_kernel_sizes,
                          self.resblock_dilation_sizes))]
            xs = None
            for b in blocks:
                y = b(x)
                xs = y if xs is None else xs + y
            x = xs / num_kernels

        x = leaky_relu(x, 0.01)
        x = nn.Conv(1, (7,), padding=[(3, 3)], use_bias=False, dtype=dtype,
                    param_dtype=jnp.float32, name="conv_post")(x)
        return jnp.tanh(x)
