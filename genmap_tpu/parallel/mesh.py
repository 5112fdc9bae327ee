"""Device-mesh sharding for the mappability engine.

Strategy (BASELINE.md north star): the FM-index rank rows are small relative
to HBM and are *replicated* on every device; genome positions (k-mer blocks)
are sharded data-parallel along the batch axis.  Under jit, XLA partitions
the whole block-mapper program along the sharded batch dimension — rank-row
gathers read the local replica, so no collectives are needed on the hot path;
per-shard frequency segments are reassembled on the host (or all-gathered
when the output feeds further device work).

This replaces the reference's OpenMP dynamic scheduling over blocks
(/root/reference/src/algo.hpp:434-439) with static sharding + the capacity
tier system for load balance.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_index(index, mesh: Mesh):
    """device_put every array of a DeviceIndex replicated over the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), index)
