"""Auxiliary normalizing-flow layers from the VITS module inventory.

Rebuilds of the reference's remaining flow pieces (reference:
src/easevoice/module/modules.py:365-923, transforms.py:12-209): the default
s2 recipe does not exercise them (its flow is mean-only affine coupling),
but they are part of the module surface — used by VITS variants for duration
prediction (ConvFlow with rational-quadratic splines) and Glow-style blocks
(ActNorm, InvConvNear).

All are functional: ``forward(x, mask) -> (y, logdet)`` and
``inverse(y, mask) -> x``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


# ---------------------------------------------------------------------------
# piecewise rational-quadratic spline (transforms.py)
# ---------------------------------------------------------------------------


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear-tails rational-quadratic spline (Durkan et al. 2019).

    inputs: (...,); spline params: (..., K) / (..., K) / (..., K+1 padded).
    Returns (outputs, logabsdet), identity outside [-tail_bound, tail_bound].
    """
    num_bins = unnormalized_widths.shape[-1]

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # pad derivative endpoints so tails are linear with slope 1
    constant = float(np.log(np.exp(1.0 - min_derivative) - 1.0))
    unnormalized_derivatives = jnp.concatenate([
        jnp.full(unnormalized_derivatives.shape[:-1] + (1,), constant),
        unnormalized_derivatives,
        jnp.full(unnormalized_derivatives.shape[:-1] + (1,), constant),
    ], axis=-1)

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights,
                         [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    ref = cumheights if inverse else cumwidths
    bin_idx = jnp.clip(
        jnp.sum((ref[..., :-1] <= clamped[..., None]).astype(jnp.int32),
                axis=-1) - 1, 0, num_bins - 1)

    gather = lambda t: jnp.take_along_axis(t, bin_idx[..., None],
                                           axis=-1)[..., 0]
    input_cumwidths = gather(cumwidths[..., :-1])
    input_bin_widths = gather(widths)
    input_cumheights = gather(cumheights[..., :-1])
    input_heights = gather(heights)
    delta = input_heights / input_bin_widths
    input_derivatives = gather(derivatives[..., :-1])
    input_derivatives_plus = gather(derivatives[..., 1:])

    if inverse:
        y = clamped
        a = ((y - input_cumheights)
             * (input_derivatives + input_derivatives_plus - 2 * delta)
             + input_heights * (delta - input_derivatives))
        b = (input_heights * input_derivatives
             - (y - input_cumheights)
             * (input_derivatives + input_derivatives_plus - 2 * delta))
        c = -delta * (y - input_cumheights)
        disc = b ** 2 - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
        outputs = root * input_bin_widths + input_cumwidths
        theta_1m = root * (1 - root)
        denom = delta + ((input_derivatives + input_derivatives_plus
                          - 2 * delta) * theta_1m)
        deriv_num = delta ** 2 * (
            input_derivatives_plus * root ** 2
            + 2 * delta * theta_1m
            + input_derivatives * (1 - root) ** 2)
        logabsdet = -(jnp.log(deriv_num) - 2 * jnp.log(denom))
    else:
        theta = (clamped - input_cumwidths) / input_bin_widths
        theta_1m = theta * (1 - theta)
        numerator = input_heights * (delta * theta ** 2
                                     + input_derivatives * theta_1m)
        denom = delta + ((input_derivatives + input_derivatives_plus
                          - 2 * delta) * theta_1m)
        outputs = input_cumheights + numerator / denom
        deriv_num = delta ** 2 * (
            input_derivatives_plus * theta ** 2
            + 2 * delta * theta_1m
            + input_derivatives * (1 - theta) ** 2)
        logabsdet = jnp.log(deriv_num) - 2 * jnp.log(denom)

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet


# ---------------------------------------------------------------------------
# DDSConv + ConvFlow (modules.py:86-133, 461-516)
# ---------------------------------------------------------------------------


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack with gelu+LayerNorm residuals."""

    channels: int
    kernel_size: int
    n_layers: int

    @nn.compact
    def __call__(self, x, x_mask, g=None):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size ** i
            pad = (self.kernel_size * dilation - dilation) // 2
            y = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(dilation,), padding=[(pad, pad)],
                        feature_group_count=self.channels,
                        name=f"sep_{i}")(x * x_mask)
            y = LayerNorm(self.channels, name=f"norm1_{i}")(y)
            y = jax.nn.gelu(y)
            y = nn.Conv(self.channels, (1,), name=f"pw_{i}")(y)
            y = LayerNorm(self.channels, name=f"norm2_{i}")(y)
            y = jax.nn.gelu(y)
            x = x + y
        return x * x_mask


class ConvFlow(nn.Module):
    """Coupling layer whose transform is a rational-quadratic spline."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.filter_channels, (1,), name="pre")(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.n_layers,
                    name="convs")(h, x_mask, g=g)
        params = nn.Conv(half * (self.num_bins * 3 - 1), (1,),
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="proj")(h) * x_mask

        b, t, _ = x0.shape
        params = params.reshape(b, t, half, 3 * self.num_bins - 1)
        denom = float(np.sqrt(self.filter_channels))
        uw = params[..., :self.num_bins] / denom
        uh = params[..., self.num_bins:2 * self.num_bins] / denom
        ud = params[..., 2 * self.num_bins:]

        y1, logabsdet = rational_quadratic_spline(
            x1, uw, uh, ud, inverse=reverse, tail_bound=self.tail_bound)
        y = jnp.concatenate([x0, y1], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        return (y, logdet) if not reverse else y


# ---------------------------------------------------------------------------
# ActNorm + InvConvNear (modules.py:817-923)
# ---------------------------------------------------------------------------


class ActNorm(nn.Module):
    """Per-channel affine with log-scale; data-dependent init is external."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask=None, reverse: bool = False):
        if x_mask is None:
            x_mask = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        logs = self.param("logs", nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        if reverse:
            return (x - bias) * jnp.exp(-logs) * x_mask
        y = (bias + jnp.exp(logs) * x) * x_mask
        x_len = jnp.sum(x_mask, axis=(1, 2))
        logdet = jnp.sum(logs) * x_len
        return y, logdet


class InvConvNear(nn.Module):
    """Invertible 1x1 convolution over channel groups (Glow-style)."""

    channels: int
    n_split: int = 4

    @nn.compact
    def __call__(self, x, x_mask=None, reverse: bool = False):
        assert self.channels % self.n_split == 0
        b, t, c = x.shape
        if x_mask is None:
            x_mask = jnp.ones((b, t, 1), x.dtype)
            x_len = jnp.full((b,), t, jnp.float32)
        else:
            x_len = jnp.sum(x_mask, axis=(1, 2))

        def init_orthonormal(key, shape, dtype=jnp.float32):
            w = jax.random.normal(key, shape, dtype)
            q, _ = jnp.linalg.qr(w)
            return q

        weight = self.param("weight", init_orthonormal,
                            (self.n_split, self.n_split), jnp.float32)

        ns = self.n_split
        # (B, T, C) -> (B, T, C//ns, ns): adjacent-channel grouping like the
        # reference's (2, ns//2) view/permute
        xg = x.reshape(b, t, 2, ns // 2, c // ns)
        xg = xg.transpose(0, 1, 3, 2, 4).reshape(b, t, c // ns, ns)

        if reverse:
            w = jnp.linalg.inv(weight)
        else:
            w = weight
        yg = jnp.einsum("btgs,sk->btgk", xg, w)
        y = yg.reshape(b, t, ns // 2, 2, c // ns)
        y = y.transpose(0, 1, 3, 2, 4).reshape(b, t, c) * x_mask

        if reverse:
            return y
        _, logabsdet = jnp.linalg.slogdet(weight)
        logdet = logabsdet * (c / ns) * x_len
        return y, logdet
