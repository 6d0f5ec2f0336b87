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


# shard classes double as arena labels (train/arena.py): leaves that
# stack into one buffer must shard identically, so the arena label_fn
# below groups by class and gpt_packed_specs shifts each class's spec
# right by one (leading stack axis unsharded).
SHARD_CLASS_SPECS = {
    "colp": P(None, MODEL_AXIS),   # qkv / linear1 kernels: column-parallel
    "rowp": P(MODEL_AXIS, None),   # out / linear2 kernels: row-parallel
    "colb": P(MODEL_AXIS),         # qkv / linear1 biases
    "rep": P(),                    # embeddings, norms, head: replicated
}


def shard_class(path_keys) -> str:
    joined = "/".join(path_keys)
    if "qkv/kernel" in joined or "linear1/kernel" in joined:
        return "colp"
    if "out/kernel" in joined or "linear2/kernel" in joined:
        return "rowp"
    if "qkv/bias" in joined or "linear1/bias" in joined:
        return "colb"
    return "rep"


def gpt_arena_label(path, _leaf) -> str:
    keys = [getattr(p, "key", str(p)) for p in path]
    return shard_class(keys)


def _spec_for_path(path_keys) -> P:
    return SHARD_CLASS_SPECS[shard_class(path_keys)]


def gpt_packed_specs(arena) -> dict:
    """{group_key: PartitionSpec} for an arena built with gpt_arena_label."""
    return {k: P(None, *SHARD_CLASS_SPECS[label])
            for k, label in zip(arena.group_keys, arena.group_labels)}


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
