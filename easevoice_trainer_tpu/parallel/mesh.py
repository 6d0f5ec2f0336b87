"""Device mesh and sharding helpers.

The reference scales with torch DDP over NCCL
(reference: src/train/sovits.py:219-224, src/train/gpt.py:154-156); the
TPU-native equivalent is a ``jax.sharding.Mesh`` with named axes:

* ``data``  — batch dimension; gradients are averaged by XLA-inserted psum
  over ICI (single slice) / DCN (multi-slice).
* ``model`` — tensor-parallel axis for the GPT's attention heads and FFN
  (the s2 GAN is small enough to replicate; the GPT benefits from TP at
  larger widths).

Both training steps are written against these axis names; running
single-chip is just a 1x1 mesh, no special-casing.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = devices[: n_data * n_model]
    arr = np.array(used).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put every leaf with its leading axis split over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def local_batch_multiple(mesh: Mesh) -> int:
    """Global batch sizes must be a multiple of this (the data-axis size)."""
    return mesh.shape[DATA_AXIS]


def wrap_pad_indices(idxs: Sequence[int], multiple: int) -> list:
    """Pad a batch's example indices to a multiple by wrapping.

    The reference's DistributedBucketSampler does exactly this to even out
    DDP batches (data_utils.py:229-324): repeated samples, not dropped
    ones, so every clip trains every epoch."""
    idxs = list(idxs)
    if multiple <= 1 or len(idxs) % multiple == 0:
        return idxs
    need = (-len(idxs)) % multiple
    return idxs + [idxs[i % len(idxs)] for i in range(need)]


def train_mesh(dp_flag: str = "EASEVOICE_DP",
               tp_flag: str = "EASEVOICE_TP") -> Optional[Mesh]:
    """Production trainers' (data, model) mesh from env flags.

    ``EASEVOICE_TP=N`` (default 1) adds an N-way ``model`` axis for the
    GPT's Megatron-style tensor parallelism (parallel/gpt_sharding.py);
    ``EASEVOICE_DP`` keeps its data-axis semantics (auto|off|N).  With
    TP off this is exactly :func:`data_parallel_mesh`.  Returns None when
    the device pool gives a 1x1 mesh (single-chip fast path).
    """
    import os

    try:
        tp = int(os.environ.get(tp_flag, "1") or "1")
    except ValueError:
        tp = 1
    if tp <= 1:
        return data_parallel_mesh(dp_flag)
    devices = jax.devices()
    n_model = min(tp, len(devices))
    if n_model < 2:
        return data_parallel_mesh(dp_flag)
    dp_val = os.environ.get(dp_flag, "auto").strip().lower()
    avail = len(devices) // n_model
    if dp_val in ("off", "none", "0"):
        n_data = 1
    elif dp_val == "auto":
        n_data = max(avail, 1)
    else:
        n_data = max(min(int(dp_val), avail), 1)
    return make_mesh(n_data=n_data, n_model=n_model,
                     devices=devices[: n_data * n_model])


def model_parallel_size(mesh: Optional[Mesh]) -> int:
    return mesh.shape[MODEL_AXIS] if mesh is not None else 1


def data_parallel_mesh(env_flag: str = "EASEVOICE_DP") -> Optional[Mesh]:
    """The production trainers' data-parallel mesh, or None for 1-chip.

    ``EASEVOICE_DP=auto`` (default): all visible accelerator devices;
    single-device and CPU backends stay unsharded so tests and dev boxes
    keep their fast path.  ``EASEVOICE_DP=N`` forces an N-way data mesh
    (works on the CPU host platform too — used by the multi-device
    trainer test).  ``EASEVOICE_DP=off`` disables.
    """
    import os

    val = os.environ.get(env_flag, "auto").strip().lower()
    if val in ("off", "none", "0", "1"):
        return None
    devices = jax.devices()
    if val == "auto":
        if len(devices) < 2 or devices[0].platform == "cpu":
            return None
        n = len(devices)
    else:
        n = min(int(val), len(devices))
        if n < 2:
            return None
    return make_mesh(n_data=n, devices=devices[:n])
