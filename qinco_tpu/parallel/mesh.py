"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's accelerate/DDP runtime
(reference: qinco/utils.py:226-291, qinco_tasks.py:338-345): a
``jax.sharding.Mesh`` with a ``data`` axis (batch parallelism — gradient
psums compiled by XLA over ICI) and an optional ``model`` axis (large
codebook sharding).  Multi-host initialization goes through
``jax.distributed`` instead of NCCL process groups.

Global-batch contract (multi-host): every process feeds ``cfg.batch``
local rows per step, so the global batch is ``batch × process_count`` —
the reference's effective batch semantics (per-GPU ``cfg.batch``,
qinco/log.py:160).  The mesh orders devices by owning process, so
process ``p``'s rows occupy the contiguous global slice
``[p·batch, (p+1)·batch)`` — matching the contiguous per-host dataset
shards handed out by the data layer (data/datasets.py ``shard=``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` uses all remaining devices.

    Devices are ordered by owning process so that batch-axis sharding
    assigns contiguous global rows to each process (see module docstring).
    """
    if devices is None:
        devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    devices = np.asarray(devices)
    n = devices.size
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


def local_mesh(data: int = -1, model: int = 1) -> Mesh:
    """A mesh over this process's devices only — for embarrassingly
    parallel phases (per-rank DB encode) where each host runs its own
    XLA program with no cross-host collectives."""
    return make_mesh(data=data, model=model, devices=jax.local_devices())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch sharded over the data axis.

    Single-process: a plain ``device_put``.  Multi-process: ``batch`` is
    this process's *local* rows; the returned global array has
    ``rows × process_count`` rows, assembled per the global-batch
    contract via ``jax.make_array_from_process_local_data`` (device_put
    would raise on non-addressable mesh devices — the round-1 bug).
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1 or _mesh_is_local(mesh):
        return jax.device_put(batch, sharding)
    batch = np.asarray(batch)
    global_shape = (batch.shape[0] * jax.process_count(),) + batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, batch, global_shape)


def shard_stacked_batch(mesh: Mesh, arr):
    """Shard axis 1 (the row axis) of a stacked micro-batch array
    ``(accum, N, ...)`` over the data axis.

    Used by gradient accumulation: stacking (instead of concatenating)
    keeps every micro-batch spread across the full data axis, so the
    jitted scan needs no per-micro-batch resharding collective.
    """
    spec = P(*([None, "data"] + [None] * (arr.ndim - 2)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1 or _mesh_is_local(mesh):
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    global_shape = (
        arr.shape[0], arr.shape[1] * jax.process_count(), *arr.shape[2:]
    )
    return jax.make_array_from_process_local_data(sharding, arr, global_shape)


def replicate(mesh: Mesh, tree):
    """Replicate a host pytree across the mesh (all processes must pass
    identical values — true for params/opt state built from the same
    seed or checkpoint)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1 or _mesh_is_local(mesh):
        return jax.device_put(tree, sharding)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree.map(put, tree)


def _mesh_is_local(mesh: Mesh) -> bool:
    """True when every mesh device belongs to this process (local mesh)."""
    pid = jax.process_index()
    return all(d.process_index == pid for d in mesh.devices.flat)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
