"""Multi-period + multi-scale waveform discriminators.

Rebuild of MultiPeriodDiscriminator (reference:
src/easevoice/module/models.py:481-614): one scale discriminator
(grouped strided 1-D convs) plus five period discriminators
(periods 2/3/5/7/11, (k,1) 2-D convs over a (time/period, period) reshape),
all weight-normed, LeakyReLU feature maps returned for the
feature-matching loss.

TPU-first structure: the period reshape makes each period column an
independent 1-D sequence (the (k,1) filters never mix the period axis), so
periods merge into the batch and every discriminator conv runs through the
same space-to-depth fold path as the generator (``folded_conv1d``):
lane-starved small-channel stages (C=1..64 of 128 lanes) fold time into
channels, and grouped kernels densify to block-diagonal MXU matmuls.
Param shapes/naming match torch ``weight_norm`` exactly, so checkpoints
and the parameter arena are unchanged; ``fold=False`` keeps the naive
path for the per-shape equivalence tests.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...nn.layers import (leaky_relu, _WeightNormKernel, folded_conv1d,
                          _group_scatter)
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


class _PConv(nn.Module):
    """Period-discriminator conv on the merged (B*period, H, C) layout.

    Holds the identical (kh, 1, cin, cout) weight-normed param as the NHWC
    conv (torch Conv2d (k,1) layout) but runs it as a 1-D conv through the
    fold path."""

    in_features: int
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    fold: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dtype = self.dtype or x.dtype
        kernel = _WeightNormKernel(
            (self.kernel_size, 1, self.in_features, self.features),
            name="wn", compute_dtype=dtype)()
        y = folded_conv1d(x, kernel[:, 0], stride=self.stride,
                          pad=self.padding, fold=self.fold, dtype=dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return y + bias.astype(dtype)


class _SConv(nn.Module):
    """Scale-discriminator conv: grouped torch layout (k, cin/groups, cout),
    optionally densified (block-diagonal structural zeros) and folded so the
    41-tap lane-starved stages run as dense stride-1 MXU matmuls."""

    in_features: int
    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    padding: int = 0
    fold: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dtype = self.dtype or x.dtype
        kernel = _WeightNormKernel(
            (self.kernel_size, self.in_features // self.groups,
             self.features), name="wn", compute_dtype=dtype)()
        if self.fold > 1:
            if self.groups > 1:
                scat = jnp.asarray(
                    _group_scatter(self.groups, self.features), kernel.dtype)
                dense = jnp.einsum("tio,go->tgio", kernel, scat).reshape(
                    self.kernel_size, self.in_features, self.features)
            else:
                dense = kernel
            y = folded_conv1d(x, dense, stride=self.stride, pad=self.padding,
                              fold=self.fold, dtype=dtype)
        else:
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
    fold: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) waveform. Returns (logits (B, N), fmap list)."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        h = t // self.period
        pad = (self.kernel_size - 1) // 2
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        fmap: List[jnp.ndarray] = []

        if self.fold:
            # periods -> batch: (B, H, p, C) -> (B*p, H, C); the (k,1)
            # filters treat each period column independently, so this is
            # exact.  Small-channel stages fold time into lanes.
            x = x.reshape(b, h, self.period, c).transpose(0, 2, 1, 3)
            x = x.reshape(b * self.period, h, c)
            folds = [4, 4, 1, 1]
            for i, (cin, cout) in enumerate(chans):
                x = _PConv(cin, cout, self.kernel_size, self.stride, pad,
                           fold=folds[i], name=f"conv_{i}",
                           dtype=self.dtype)(x)
                x = leaky_relu(x)
                fmap.append(x)
            x = _PConv(1024, 1024, self.kernel_size, 1, pad, name="conv_4",
                       dtype=self.dtype)(x)
            x = leaky_relu(x)
            fmap.append(x)
            x = _PConv(1024, 1, 3, 1, 1, name="conv_post",
                       dtype=self.dtype)(x)
            fmap.append(x)
            # restore (B, H', p) logit order for exact parity with the
            # reference NHWC flatten
            hp = x.shape[1]
            return (x.reshape(b, self.period, hp)
                     .transpose(0, 2, 1).reshape(b, -1)), fmap

        x = x.reshape(b, h, self.period, c)                 # NHWC, W=period
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
    fold: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) waveform."""
        fmap: List[jnp.ndarray] = []
        specs = [
            # (cin, cout, k, stride, groups, pad, fold)
            (1, 16, 15, 1, 1, 7, 8),
            (16, 64, 41, 4, 4, 20, 8),
            (64, 256, 41, 4, 16, 20, 2),
            (256, 1024, 41, 4, 64, 20, 1),
            (1024, 1024, 41, 4, 256, 20, 1),
            (1024, 1024, 5, 1, 1, 2, 1),
        ]
        for i, (cin, cout, k, s, g, p, f) in enumerate(specs):
            x = _SConv(cin, cout, k, s, g, p,
                       fold=f if self.fold else 1,
                       name=f"conv_{i}", dtype=self.dtype)(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = _SConv(1024, 1, 3, 1, 1, 1, name="conv_post",
                   dtype=self.dtype)(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: Optional[jnp.dtype] = None
    fold: bool = True

    @nn.compact
    def __call__(self, y, y_hat):
        """y, y_hat: (B, T, 1). Returns (real_logits, fake_logits, real_fmaps, fake_fmaps)."""
        discs = [DiscriminatorS(name="disc_s", dtype=self.dtype,
                                fold=self.fold)] + [
            DiscriminatorP(p, name=f"disc_p{p}", dtype=self.dtype,
                           fold=self.fold)
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
