"""Distributed layer: device mesh + XLA collectives.

Replaces the reference's MPI communication (nGIA,
CDP/CLUSTER/cluster/src/func.cu:237-318,520 — custom struct datatype,
Gather + min-reduce + 2x Bcast per iteration, final Gather) and the
multi-GPU cudaSetDevice loops (CDP/STAR/cuda-nw.cu:358-431) with a
`jax.sharding.Mesh` over a `data` axis: reads sharded per device,
representatives selected by global argmin (implicit replication — no
broadcast needed), results merged with all_gather/psum over ICI."""

from genomics_tpu.parallel.mesh import (  # noqa: F401
    data_mesh,
    shard_batch,
    sharded_align_scores,
    sharded_pipeline_step,
)
