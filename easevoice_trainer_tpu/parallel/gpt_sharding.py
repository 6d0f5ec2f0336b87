"""Tensor-parallel PartitionSpecs for the s1 GPT.

Megatron-style sharding over the ``model`` mesh axis:

* fused QKV kernel  (D, 3D)  -> split output dim (head-parallel attention)
* attention out     (D, D)   -> split input dim (row-parallel, psum by XLA)
* FFN linear1       (D, F)   -> split output dim
* FFN linear2       (F, D)   -> split input dim
* embeddings, norms, positions, prediction head -> replicated

With these specs under jit, XLA inserts exactly the two all-reduces per
layer that hand-written Megatron TP would (after attention-out and after
linear2), riding ICI.  The ``data`` axis shards the batch everywhere.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_for_path(path_keys) -> P:
    joined = "/".join(path_keys)
    if "qkv/kernel" in joined or "linear1/kernel" in joined:
        return P(None, MODEL_AXIS)
    if "out/kernel" in joined or "linear2/kernel" in joined:
        return P(MODEL_AXIS, None)
    if "qkv/bias" in joined or "linear1/bias" in joined:
        return P(MODEL_AXIS)
    return P()


def gpt_param_specs(params: Any) -> Any:
    """Pytree of PartitionSpec matching a Text2SemanticDecoder param tree."""
    def f(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        return _spec_for_path(keys)
    return jax.tree_util.tree_map_with_path(f, params)


def shard_gpt_params(params: Any, mesh: Mesh) -> Any:
    specs = gpt_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
