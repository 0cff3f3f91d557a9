#!/usr/bin/env python
"""Component benchmark sweep — prints one JSON line per metric.

The richer counterpart of bench.py (which reports the single headline
number for the driver).  Runs on whatever backend is active: compiled
Pallas kernels on TPU, scan engines elsewhere (numbers then reflect the
portable path, not the chip)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_sw(B=16384, L=152, chain=20):
    import jax
    import jax.numpy as jnp

    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.ops import pallas_align, scan_align

    params = AlignmentParams()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (B, L)) * 2 + 1, jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B, L)) * 2 + 1, jnp.uint8)
    on_tpu = jax.default_backend() == "tpu"
    fn = pallas_align.local_align_tpu if on_tpu else scan_align.local_align_batch

    @jax.jit
    def many(q, t):
        acc = jnp.int32(0)
        for k in range(chain):
            acc += fn(jnp.roll(q, k, 0), t, params).score.sum()
        return acc

    _ = float(many(q, t))
    t0 = time.time()
    _ = float(many(q, t))
    dt = time.time() - t0
    return chain * B * L * L / dt / 1e9


def bench_sw_tb(B=4096, L=152):
    import jax
    import jax.numpy as jnp

    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.ops import pallas_align, scan_align

    params = AlignmentParams()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (B, L)) * 2 + 1, jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B, L)) * 2 + 1, jnp.uint8)
    on_tpu = jax.default_backend() == "tpu"
    fn = pallas_align.local_align_tpu if on_tpu else scan_align.local_align_batch

    @jax.jit
    def one(q, t):
        r = fn(q, t, params, with_tb=True)
        return r.score.sum() + r.tb.sum()

    _ = float(one(q, t))
    n = 5
    t0 = time.time()
    for _k in range(n):
        x = one(q, t)
    _ = float(x)
    dt = (time.time() - t0) / n
    return B * L * L / dt / 1e9


def bench_pairhmm(B=16384, R=128, C=128, chain=10):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from genomics_tpu.ops import pallas_pairhmm as eng

        fn = eng.pairhmm_forward_tpu
    else:
        from genomics_tpu.ops import scan_pairhmm as eng

        fn = eng.pairhmm_forward_batch
        B = min(B, 512)
        chain = 2
    reads = jnp.asarray(rng.integers(65, 85, (B, R)), jnp.uint8)
    haps = jnp.asarray(rng.integers(65, 85, (B, C)), jnp.uint8)
    rlen = jnp.full((B,), R, jnp.int32)
    clen = jnp.full((B,), C, jnp.int32)
    bq = jnp.asarray(rng.integers(5, 60, (B, R)), jnp.int32)
    iq = jnp.asarray(rng.integers(5, 60, (B, R)), jnp.int32)
    dq = jnp.asarray(rng.integers(5, 60, (B, R)), jnp.int32)

    @jax.jit
    def many(reads, haps, rlen, clen, bq, iq, dq):
        acc = jnp.float32(0)
        for k in range(chain):
            acc += fn(jnp.roll(reads, k, 0), haps, rlen, clen, bq, iq, dq).sum()
        return acc

    _ = float(many(reads, haps, rlen, clen, bq, iq, dq))
    t0 = time.time()
    _ = float(many(reads, haps, rlen, clen, bq, iq, dq))
    dt = time.time() - t0
    return chain * B * R * C / dt / 1e9


def bench_myers(B=4096, Lp=96, Lt=152):
    import jax
    import jax.numpy as jnp

    from genomics_tpu.ops import myers

    rng = np.random.default_rng(0)
    pats = rng.integers(0, 4, (B, Lp)).astype(np.uint8)
    texts = jnp.asarray(rng.integers(0, 4, (B, Lt)), jnp.uint8)
    plen = np.full(B, Lp, np.int32)
    tlen = jnp.full((B,), Lt, jnp.int32)
    eq = jnp.asarray(myers.build_eq_masks(pats, plen, (Lp + 31) // 32))
    plen_d = jnp.asarray(plen)

    @jax.jit
    def one(eq, plen, texts, tlen):
        b, e, f = myers.myers_batch(eq, plen, texts, tlen)
        return b.sum()

    _ = float(one(eq, plen_d, texts, tlen))
    n = 5
    t0 = time.time()
    for _k in range(n):
        x = one(eq, plen_d, texts, tlen)
    _ = float(x)
    dt = (time.time() - t0) / n
    return B * Lp * Lt / dt / 1e9


def main():
    import jax

    backend = jax.default_backend()
    metrics = [
        ("sw_score_gcups", bench_sw),
        ("sw_traceback_gcups", bench_sw_tb),
        ("pairhmm_gcups", bench_pairhmm),
        ("myers_gcups", bench_myers),
    ]
    for name, fn in metrics:
        try:
            v = fn()
            print(json.dumps({"metric": name, "value": round(v, 2),
                              "unit": "GCUPS", "backend": backend}))
        except Exception as e:
            print(json.dumps({"metric": name, "error": str(e)[:120]}))


if __name__ == "__main__":
    main()
