"""Multi-process (multi-host) execution support.

The reference is single-node OpenMP (SURVEY §2.10); the TPU-native scale-out
model is SPMD over processes:

  * every process runs the same host orchestration (deterministic block
    decomposition), holds the index parts its devices need, and supplies the
    process-local slice of every needle batch
  * the mesh spans all processes' devices (jax.distributed); inside jit the
    per-part merge rides ICI (psum, parallel/partmesh.py) and the batch is
    data-parallel across the global 'data' axis
  * results are all-gathered back to every host (DCN) so each host holds the
    identical frequency vector; rank 0 writes outputs

Enable by exporting GENMAP_DIST_COORDINATOR=host:port, GENMAP_DIST_NPROCS,
GENMAP_DIST_PROC_ID before launching each process (the CLI calls
maybe_initialize() on startup), or rely on jax.distributed auto-detection on
TPU pods via GENMAP_DIST_AUTO=1.
"""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    """Initialize jax.distributed from the environment (idempotent)."""
    import jax

    coord = os.environ.get("GENMAP_DIST_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["GENMAP_DIST_NPROCS"]),
            process_id=int(os.environ["GENMAP_DIST_PROC_ID"]),
        )
        return True
    if os.environ.get("GENMAP_DIST_AUTO"):
        jax.distributed.initialize()  # TPU pod auto-detection
        return True
    return False


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def put_global_batch(arr, sharding):
    """Build a globally-sharded array from identical per-process host data.

    Every process holds the full batch (the host orchestration is
    deterministic and identical everywhere); each contributes the rows its
    devices own.
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(sharding, arr)


def fetch(arr):
    """Materialize a (possibly non-addressable) device array on every host."""
    import jax
    import numpy as np

    if jax.process_count() == 1 or getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
