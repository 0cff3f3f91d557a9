#!/usr/bin/env python
"""Data-parallel scaling harness: aligned reads/s at 1..N mesh shards
(BASELINE.md: >=85% linear reads/s scaling target at 2 hosts).

On a real pod slice this measures true ICI/DCN scaling (run under
jax.distributed with the full mesh); in this repo's test environment it
exercises the identical code path on a virtual CPU-device mesh.  The
metric is aligned reads/s of the sharded SW scorer."""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=4096)
    ap.add_argument("--len", type=int, default=152)
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.parallel import data_mesh, shard_batch, sharded_align_scores

    ndev = len(jax.devices())
    plans = args.devices or sorted({1, 2, ndev} & set(range(1, ndev + 1)))
    params = AlignmentParams()
    rng = np.random.default_rng(0)
    B, L = args.reads, args.len
    q = rng.integers(0, 16, (B, L)).astype(np.uint8)
    t = rng.integers(0, 16, (B, L)).astype(np.uint8)

    base_rate = None
    for n in plans:
        mesh = data_mesh(n)
        qd, td = shard_batch(mesh, q, t)
        scores, best = sharded_align_scores(mesh, qd, td, params)
        _ = np.asarray(scores[:1])
        t0 = time.time()
        reps = 3
        for _k in range(reps):
            scores, best = sharded_align_scores(mesh, qd, td, params)
        _ = np.asarray(scores[:1])
        dt = (time.time() - t0) / reps
        rate = B / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(
            json.dumps(
                {
                    "metric": "aligned_reads_per_s",
                    "devices": n,
                    "value": round(rate, 1),
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
