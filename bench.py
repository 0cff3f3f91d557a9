#!/usr/bin/env python
"""Headline benchmark: batched Smith–Waterman DP cell rate on one chip.

Prints ONE JSON line:
  {"metric": "sw_gcups_per_chip", "value": N, "unit": "GCUPS",
   "vs_baseline": N / 10.0}
Baseline = the driver's 10 GCUPS/chip target (BASELINE.md); the
reference's own best published single-GPU figure is 157.73 GCUPS
(SW-Gotoh, GTX TITAN BLACK, CDP/NvB/prototypes/psa/README.md:34 —
a score-only benchmark, like this one).

Method: GASAL2's test shape (150bp Illumina-style reads, padded 152),
B=65536 alignments per kernel on the TIME-MAJOR score-only Pallas path
(ops/pallas_align.local_align_scores_tm — the layout the runtime packs
into host-side, so no device transpose).  A chain of kernel calls
inside one jit amortizes this environment's ~24 ms host<->device tunnel
latency per dispatch; each call's input is derived from the previous
call's OUTPUT so XLA cannot common-subexpression-eliminate the chain.
A gold-parity spot check guards against benchmarking a wrong kernel.
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
    B, Lq, Lt = 65536, 152, 152
    CHAIN = 150

    qh = np.asarray(rng.integers(0, 4, (B, Lq)) * 2 + 1, np.uint8)
    th = np.asarray(rng.integers(0, 4, (B, Lt)) * 2 + 1, np.uint8)
    Q = jnp.asarray(np.ascontiguousarray(qh.T))   # host-side time-major pack
    T = jnp.asarray(np.ascontiguousarray(th.T))

    # parity spot check on a small slice (scores vs CPU gold)
    scores = np.asarray(
        pallas_align.local_align_scores_tm(Q[:, :2048], T[:, :2048], params,
                                           has_n=False)[:4])
    for i in range(4):
        g = golds.local_align(qh[i], th[i], params)
        assert scores[i] == g["score"], \
            f"parity failure at {i}: {scores[i]} vs {g['score']}"

    @jax.jit
    def chain(Q, T):
        acc = jnp.int32(0)
        x = Q
        for k in range(CHAIN):
            r = pallas_align._local_align_scores_tm_jit(x, T, params, False)
            acc = acc + r.sum()
            # feed scores back into the next input: a real data dependency
            x = jnp.bitwise_xor(Q, (r.reshape(1, B) & 2).astype(jnp.uint8))
        return acc

    x = chain(Q, T)
    _ = float(x)  # warm: compile + first run
    best = 0.0
    for _rep in range(3):
        t0 = time.time()
        x = chain(Q, T)
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
