"""Residual vector quantizer (EnCodec-style) in functional JAX.

Rebuild of the reference RVQ (reference: src/easevoice/module/quantize.py:28,
core_vq.py:96-380) with n_q=1, 1024 bins, 768-d codes — the semantic-token
bottleneck of GPT-SoVITS.

Design differences, TPU-first:

* the codebook is a plain parameter pytree; EMA/k-means bookkeeping is a
  functional ``VQState`` returned from ``update`` rather than in-place
  buffers (fine-tuning freezes the codebook — ``s2.json freeze_quantizer`` —
  so the EMA path is only exercised by from-scratch training);
* nearest-neighbour search is one big ``(N, D) x (D, K)`` matmul on the MXU
  (distance argmin via the expanded-square identity), no per-vector loops.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
import flax.struct


@flax.struct.dataclass
class VQState:
    """EMA statistics for from-scratch codebook learning."""

    cluster_size: jnp.ndarray  # (n_q, K)
    embed_avg: jnp.ndarray     # (n_q, K, D)


def nearest_code(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Argmin_k ||x - c_k||^2 for x: (..., D), codebook: (K, D) -> (...,) int32."""
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    # ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant in argmin
    scores = 2.0 * flat @ cb.T - jnp.sum(cb * cb, axis=-1)[None, :]
    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    return idx.reshape(x.shape[:-1])


class ResidualVectorQuantizer(nn.Module):
    """RVQ over (B, T, D) latents.

    ``codebooks`` parameter: (n_q, K, D). ``__call__`` quantizes with the
    first ``layers`` quantizers and returns (quantized, codes, commit_loss).
    """

    dim: int = 768
    n_q: int = 1
    bins: int = 1024

    def setup(self):
        self.codebooks = self.param(
            "codebooks",
            nn.initializers.uniform(scale=1.0),
            (self.n_q, self.bins, self.dim), jnp.float32)

    def __call__(self, x: jnp.ndarray, n_layers: Optional[int] = None,
                 freeze: bool = True):
        """x: (B, T, D) -> (quantized (B,T,D), codes (n_layers,B,T), commit_loss)."""
        n_layers = n_layers or self.n_q
        cb = self.codebooks
        if freeze:
            cb = jax.lax.stop_gradient(cb)
        residual = x
        quantized_out = jnp.zeros_like(x)
        codes = []
        commit = 0.0
        for q in range(n_layers):
            idx = nearest_code(residual, cb[q])
            quant = jnp.take(cb[q], idx, axis=0).astype(x.dtype)
            codes.append(idx)
            commit = commit + jnp.mean(
                (residual - jax.lax.stop_gradient(quant)).astype(jnp.float32) ** 2)
            # straight-through estimator
            quant_st = residual + jax.lax.stop_gradient(quant - residual)
            quantized_out = quantized_out + quant_st
            residual = residual - jax.lax.stop_gradient(quant)
        return quantized_out, jnp.stack(codes, axis=0), commit

    def encode(self, x: jnp.ndarray, n_layers: Optional[int] = None) -> jnp.ndarray:
        """(B, T, D) -> codes (n_layers, B, T) int32."""
        n_layers = n_layers or self.n_q
        residual = x
        codes = []
        for q in range(n_layers):
            idx = nearest_code(residual, self.codebooks[q])
            quant = jnp.take(self.codebooks[q], idx, axis=0).astype(x.dtype)
            codes.append(idx)
            residual = residual - quant
        return jnp.stack(codes, axis=0)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (n_layers, B, T) -> (B, T, D)."""
        out = 0.0
        for q in range(codes.shape[0]):
            out = out + jnp.take(self.codebooks[q], codes[q], axis=0)
        return out


def init_vq_state(n_q: int, bins: int, dim: int) -> VQState:
    return VQState(
        cluster_size=jnp.zeros((n_q, bins), jnp.float32),
        embed_avg=jnp.zeros((n_q, bins, dim), jnp.float32),
    )


def ema_codebook_update(
    codebooks: jnp.ndarray,
    state: VQState,
    x: jnp.ndarray,
    codes: jnp.ndarray,
    decay: float = 0.99,
    epsilon: float = 1e-5,
):
    """One EMA update (reference: core_vq.py:205-228), functional.

    x: (B, T, D) inputs; codes: (n_q, B, T) assignments from ``encode``.
    Returns (new_codebooks, new_state). Dead-code expiry is handled by
    Laplace smoothing of the cluster sizes rather than random resampling
    (resampling needs host RNG and data exchange; smoothing keeps the update
    pure and deterministic under pjit, with gradients unaffected).
    """
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    n_q, bins, dim = codebooks.shape
    new_cb = []
    new_cs = []
    new_ea = []
    residual = flat
    for q in range(n_q):
        idx = codes[q].reshape(-1)
        onehot = jax.nn.one_hot(idx, bins, dtype=jnp.float32)  # (N, K)
        counts = onehot.sum(axis=0)
        embed_sum = onehot.T @ residual                         # (K, D)
        cs = state.cluster_size[q] * decay + counts * (1.0 - decay)
        ea = state.embed_avg[q] * decay + embed_sum * (1.0 - decay)
        n = cs.sum()
        smoothed = (cs + epsilon) / (n + bins * epsilon) * n
        cb_q = ea / smoothed[:, None]
        new_cb.append(cb_q)
        new_cs.append(cs)
        new_ea.append(ea)
        residual = residual - onehot @ codebooks[q].astype(jnp.float32)
    return (
        jnp.stack(new_cb, axis=0),
        VQState(cluster_size=jnp.stack(new_cs), embed_avg=jnp.stack(new_ea)),
    )
