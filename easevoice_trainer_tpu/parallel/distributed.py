"""Multi-host / multi-slice bootstrap.

The reference scales multi-GPU with a torch.distributed process group
(reference: src/train/sovits.py:219-224 ``init_process_group``;
src/train/gpt.py:154-156 DDPStrategy over NCCL).  The TPU-native
equivalent is one trainer process per host joined through
``jax.distributed.initialize()``: afterwards ``jax.devices()`` is the
GLOBAL device pool, the (data, model) mesh spans hosts, and XLA routes
gradient collectives over ICI within a slice / DCN across slices — no
DDP wrapper object exists or is needed.

Environment contract (mirrors torchrun's in spirit):

``EASEVOICE_COORDINATOR``    ``host:port`` of process 0's coordinator.
``EASEVOICE_NUM_PROCESSES``  world size (one process per host).
``EASEVOICE_PROCESS_ID``     this process's rank.

With none of these set, TPU pod runtimes are still auto-detected: when
the backend is a TPU and the pod metadata env is present,
``jax.distributed.initialize()`` is called argument-free (JAX fills the
coordinator from the TPU metadata).  Single-host runs are a no-op.

Batch semantics: every host computes the SAME global bucket schedule
(seeded identically), then loads only the rows its addressable devices
own (:func:`process_local_rows`) and assembles the global batch with
``jax.make_array_from_process_local_data`` (:func:`shard_batch_global`).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

from .mesh import DATA_AXIS

_INITIALIZED = False


def _env_int(name: str) -> Optional[int]:
    val = os.environ.get(name, "").strip()
    if not val:
        return None
    try:
        return int(val)
    except ValueError:
        return None


def maybe_initialize() -> bool:
    """Join the multi-process world if configured; idempotent.

    Must run before the first JAX backend touch in the process (the
    trainers call it at the top of ``train()``; the cmd entrypoints do
    too, before any model import).  Returns True when running
    multi-process after the call.
    """
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_count() > 1

    n_proc = _env_int("EASEVOICE_NUM_PROCESSES")
    coordinator = os.environ.get("EASEVOICE_COORDINATOR", "").strip()
    proc_id = _env_int("EASEVOICE_PROCESS_ID")

    if n_proc is not None and n_proc > 1:
        if not coordinator or proc_id is None:
            raise RuntimeError(
                "EASEVOICE_NUM_PROCESSES>1 needs EASEVOICE_COORDINATOR "
                "(host:port of rank 0) and EASEVOICE_PROCESS_ID")
        # CPU worlds need an explicit cross-process collectives backend.
        # Read the *configured* platform (not jax.default_backend(), which
        # would initialize the backend before jax.distributed can).
        platforms = (jax.config.jax_platforms
                     or os.environ.get("JAX_PLATFORMS", ""))
        if "cpu" in str(platforms):
            try:
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo")
            except Exception:  # pragma: no cover - older/newer jax
                pass
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=n_proc,
                                   process_id=proc_id)
        _INITIALIZED = True
        return True

    # TPU pod auto-detect: the pod runtime exports worker metadata; an
    # argument-free initialize() fills coordinator/rank from it.  Guarded
    # so single-chip dev boxes (axon tunnel) stay untouched.
    if (os.environ.get("TPU_WORKER_HOSTNAMES")
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        try:
            jax.distributed.initialize()
            _INITIALIZED = True
            return jax.process_count() > 1
        except Exception:  # pragma: no cover - not a managed pod
            pass
    _INITIALIZED = True
    return False


def process_local_rows(n_rows: int, mesh) -> list:
    """Sorted global row indices of a [n_rows, ...] data-sharded batch
    that THIS process's addressable devices own.

    Single-process: every row (the identity), so callers need no branch.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() <= 1:
        return list(range(n_rows))
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    imap = sharding.devices_indices_map((n_rows,))
    rows: set = set()
    for dev in sharding.addressable_devices:
        sl = imap[dev][0]
        rows.update(range(n_rows)[sl])
    return sorted(rows)


def shard_batch_global(batch, mesh):
    """Assemble a global data-sharded batch from process-LOCAL rows.

    Each leaf in ``batch`` holds only this host's rows (in
    :func:`process_local_rows` order); the result is a global
    ``jax.Array`` sharded over the mesh's data axis.  Single-process it
    degrades to a plain device_put, identical to ``parallel.shard_batch``.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() <= 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, x), batch)


def place_global(x, mesh, spec):
    """Place one host-local array onto a (possibly multi-host) mesh with
    ``PartitionSpec`` ``spec``.  Hosts must hold identical full values
    (same seed / same checkpoint — the standard JAX multi-host contract);
    each process contributes the slice its addressable devices own, so no
    broadcast traffic is generated.  Single-process: plain device_put."""
    import jax
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    if jax.process_count() <= 1:
        return jax.device_put(x, sh)
    import numpy as np

    arr = np.asarray(x)
    imap = sh.devices_indices_map(arr.shape)
    # process-local portion: the bounding box of addressable-device
    # slices (a box whenever no sharded dim straddles hosts unevenly,
    # which the supported topologies — data across hosts, model within a
    # host — guarantee)
    starts = [arr.shape[d] for d in range(arr.ndim)]
    stops = [0] * arr.ndim
    for dev in sh.addressable_devices:
        for d, sl in enumerate(imap[dev]):
            lo, hi, _ = sl.indices(arr.shape[d])
            starts[d] = min(starts[d], lo)
            stops[d] = max(stops[d], hi)
    local = arr[tuple(slice(lo, hi) for lo, hi in zip(starts, stops))]
    return jax.make_array_from_process_local_data(sh, local)


def replicate_global(tree, mesh):
    """Replicate a host-local pytree onto every device of a (possibly
    multi-host) mesh; see :func:`place_global`."""
    from jax.sharding import PartitionSpec as P
    import jax

    return jax.tree_util.tree_map(
        lambda x: place_global(x, mesh, P()), tree)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs/streams
    (rank 0), mirroring the reference's rank==0 guards
    (reference: src/train/sovits.py:242-258)."""
    import jax

    return jax.process_index() == 0
