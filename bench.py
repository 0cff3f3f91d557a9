#!/usr/bin/env python
"""Headline benchmark: batched Smith–Waterman DP cell rate on one chip.

Prints ONE JSON line:
  {"metric": "sw_gcups_per_chip", "value": N, "unit": "GCUPS",
   "vs_baseline": N / 10.0}
Baseline = the driver's 10 GCUPS/chip target (BASELINE.md); the
reference's own best published single-GPU figure is 157.73 GCUPS
(SW-Gotoh, GTX TITAN BLACK, CDP/NvB/prototypes/psa/README.md:34).

Method: GASAL2's test shape (150bp Illumina-style reads, padded 152),
B=16384 alignments per kernel, a chain of kernel invocations inside one
jit so device throughput is measured rather than the host<->device
tunnel latency of this environment.  A gold-parity spot check guards
against benchmarking a wrong kernel.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from genomics_tpu.core import golds
    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.ops import pallas_align

    params = AlignmentParams()
    rng = np.random.default_rng(0)
    B, Lq, Lt = 16384, 152, 152
    CHAIN = 100   # long chain amortizes the host<->device tunnel latency (~16ms/call here)

    q = jnp.asarray(rng.integers(0, 4, (B, Lq)) * 2 + 1, jnp.uint8)  # ACGT-ish codes
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)) * 2 + 1, jnp.uint8)

    # parity spot check on a small slice (scores vs CPU gold)
    qs = np.asarray(q[:4])
    ts = np.asarray(t[:4])
    res = pallas_align.local_align_tpu(q[:128], t[:128], params)
    scores = np.asarray(res.score[:4])
    for i in range(4):
        g = golds.local_align(qs[i], ts[i], params)
        assert scores[i] == g["score"], f"parity failure at {i}: {scores[i]} vs {g['score']}"

    @jax.jit
    def chain(q, t):
        acc = jnp.int32(0)
        for k in range(CHAIN):
            r = pallas_align.local_align_tpu(jnp.roll(q, k, 0), t, params)
            acc = acc + r.score.sum()
        return acc

    x = chain(q, t)
    _ = float(x)  # warm: compile + first run
    best = 0.0
    for _rep in range(3):
        t0 = time.time()
        x = chain(q, t)
        _ = float(x)
        dt = time.time() - t0
        gcups = CHAIN * B * Lq * Lt / dt / 1e9
        best = max(best, gcups)
    print(
        json.dumps(
            {
                "metric": "sw_gcups_per_chip",
                "value": round(best, 2),
                "unit": "GCUPS",
                "vs_baseline": round(best / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(
            json.dumps(
                {
                    "metric": "sw_gcups_per_chip",
                    "value": 0.0,
                    "unit": "GCUPS",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"[:200],
                }
            )
        )
        sys.exit(0)
