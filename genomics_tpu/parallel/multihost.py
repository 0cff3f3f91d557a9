"""Multi-host (multi-process) helpers — the jax.distributed layer.

The reference's only distributed component is nGIA's MPI ring
(CDP/CLUSTER/cluster/src/func.cu:10-26: MPI_Init + rank→GPU binding;
306-318: per-iteration Gather/min/Bcast; 520: result Gather).  The
TPU-native replacement is one jax.distributed job: every process calls
`initialize()`, the global Mesh spans all processes' devices, arrays
are built shard-wise with `jax.make_array_from_callback`, and XLA
inserts the collectives.  These helpers make the single-host code paths
(parallel/mesh.py, models/ngia.py) process-count agnostic:

- `initialize(...)`      — MPI_Init analog (no-op when single-process)
- `put_global(mesh, a)`  — host numpy → globally-sharded jax.Array,
                           valid whether the mesh spans 1 or N processes
                           (each process materializes only its
                           addressable shards — the round-robin shard of
                           func.cu:152-164 without the host loop)
- `fetch(x)`             — device → host numpy, all-gathering from the
                           other processes when the array is not fully
                           addressable (the MPI_Gather of func.cu:520)
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join (or start) the distributed job.  Call once per process
    before any backend use; single-process callers may skip entirely."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_global(mesh: Mesh, arr, axis: str | None = "data"):
    """Host array (identical on every process) → jax.Array sharded along
    axis 0 over `axis` of the mesh.  `axis=None` replicates."""
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, P(axis) if axis else P())
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def fetch(x) -> np.ndarray:
    """jax.Array → host numpy on EVERY process, gathering remote shards
    over the process boundary when needed."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
