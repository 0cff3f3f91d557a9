"""genomics_tpu — TPU-native sequence-alignment framework.

A single layered framework covering the capabilities of the reference CUDA
application suite (NW, SW, GASAL2-style batched alignment with traceback,
PairHMM forward likelihoods, center-star MSA, greedy read clustering with
multi-host scaling) — re-designed TPU-first:

- compute path: JAX / XLA / Pallas; DP recurrences vectorized across the
  alignment batch on VPU lanes, horizontal gap dependencies resolved with
  prefix max-scans instead of sequential loops,
- dispatch: bucketed, padded, jit-cached batched launches replacing the
  reference's CUDA Dynamic Parallelism,
- scaling: `jax.sharding.Mesh` + shard_map data parallelism with XLA
  collectives replacing MPI (reference: CDP/CLUSTER/cluster/src/func.cu).

Layer map (see SURVEY.md §7):
  core/     encoding, scoring configs, batch containers, CPU gold references
  ops/      DP compute kernels (scan-based JAX + Pallas TPU kernels)
  runtime/  bucketed batched dispatch, async pipelining, CIGAR decode
  parallel/ mesh helpers, multi-host collectives
  models/   the seven app-level engines (nw, sw, aligner, pairhmm, msa,
            cluster, ngia)
  utils/    fasta IO, timers, config
"""

__version__ = "0.2.0"

from genomics_tpu.core.scoring import (  # noqa: F401
    AlignmentParams,
    AlgoType,
    SemiGlobalSkip,
)
from genomics_tpu.core.batch import SeqBatch, PairBatch  # noqa: F401

from genomics_tpu.runtime.dispatch import AlignEngine, AlignmentJob  # noqa: F401
