"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's accelerate/DDP runtime
(reference: qinco/utils.py:226-291, qinco_tasks.py:338-345): a
``jax.sharding.Mesh`` with a ``data`` axis (batch parallelism — gradient
psums compiled by XLA over ICI) and an optional ``model`` axis (large
codebook sharding).  Multi-host initialization goes through
``jax.distributed`` instead of NCCL process groups.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Place a host array batch-sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
