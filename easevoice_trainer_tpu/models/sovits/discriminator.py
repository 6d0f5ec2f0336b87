"""Multi-period + multi-scale waveform discriminators.

Rebuild of MultiPeriodDiscriminator (reference:
src/easevoice/module/models.py:481-614): one scale discriminator
(grouped strided 1-D convs) plus five period discriminators
(periods 2/3/5/7/11, 2-D convs over a (time/period, period) reshape), all
weight-normed, LeakyReLU feature maps returned for the feature-matching loss.

The period reshape keeps the last axis = period; convolutions are NHWC so the
(kernel, 1) filters run as batched matmuls on the MXU.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import leaky_relu, _WeightNormKernel
import jax


class _WNConv2d(nn.Module):
    """Weight-normalized 2-D conv on NHWC (period discriminators)."""

    in_features: int
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        dtype = self.dtype or x.dtype
        kernel = _WeightNormKernel((kh, kw, self.in_features, self.features),
                                   name="wn", compute_dtype=dtype)()
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel,
            window_strides=self.strides,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return y + bias.astype(dtype)


class _WNConv1dGrouped(nn.Module):
    in_features: int
    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    padding: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dtype = self.dtype or x.dtype
        kernel = _WeightNormKernel(
            (self.kernel_size, self.in_features // self.groups, self.features),
            name="wn", compute_dtype=dtype)()
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return y + bias.astype(dtype)


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) waveform. Returns (logits (B, N), fmap list)."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, c)  # NHWC, W=period

        fmap: List[jnp.ndarray] = []
        pad = (self.kernel_size - 1) // 2
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        for i, (cin, cout) in enumerate(chans):
            x = _WNConv2d(cin, cout, (self.kernel_size, 1), (self.stride, 1),
                          (pad, 0), name=f"conv_{i}", dtype=self.dtype)(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = _WNConv2d(1024, 1024, (self.kernel_size, 1), (1, 1), (pad, 0),
                      name="conv_4", dtype=self.dtype)(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = _WNConv2d(1024, 1, (3, 1), (1, 1), (1, 0), name="conv_post",
                      dtype=self.dtype)(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) waveform."""
        fmap: List[jnp.ndarray] = []
        specs = [
            # (cin, cout, k, stride, groups, pad)
            (1, 16, 15, 1, 1, 7),
            (16, 64, 41, 4, 4, 20),
            (64, 256, 41, 4, 16, 20),
            (256, 1024, 41, 4, 64, 20),
            (1024, 1024, 41, 4, 256, 20),
            (1024, 1024, 5, 1, 1, 2),
        ]
        for i, (cin, cout, k, s, g, p) in enumerate(specs):
            x = _WNConv1dGrouped(cin, cout, k, s, g, p, name=f"conv_{i}",
                                 dtype=self.dtype)(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = _WNConv1dGrouped(1024, 1, 3, 1, 1, 1, name="conv_post",
                             dtype=self.dtype)(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, y, y_hat):
        """y, y_hat: (B, T, 1). Returns (real_logits, fake_logits, real_fmaps, fake_fmaps)."""
        discs = [DiscriminatorS(name="disc_s", dtype=self.dtype)] + [
            DiscriminatorP(p, name=f"disc_p{p}", dtype=self.dtype)
            for p in self.periods
        ]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            logit_r, fmap_r = d(y)
            logit_g, fmap_g = d(y_hat)
            y_d_rs.append(logit_r)
            y_d_gs.append(logit_g)
            fmap_rs.append(fmap_r)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
