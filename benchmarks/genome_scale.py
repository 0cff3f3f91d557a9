#!/usr/bin/env python
"""Genome-scale index demo: build an FM-index over a >=3.2 Gbp synthetic
genome (the nvBWT bar — reference: Non-CDP/NvB/nvBWT/nvBWT.cu:1-961,
whose defining workload is a whole human genome; nvbio/sufsort is 11.6k
LoC of GPU BWT machinery), verify it with STREAMED spot-checks (bounded
RAM: every check touches O(pattern * occ_rate) bytes), save/reload it,
and map mutated reads against it.

Writes GENOME_SCALE.json with timings, peak RSS, and check results.

Usage:  python benchmarks/genome_scale.py [--bp 3300000000] [--skip-map]

RAM budget at 3.3 Gbp (measured on a 125 GB host, see the artifact):
peak ~45 GB inside SA-IS (uint16 shifted text 6.6 GB + int64 SA 26 GB +
type bitmaps), ~12 GB steady after construction (bwt + occ checkpoints +
sampled SA + the 2-bit reference for mapping).
"""
import argparse
import json
import os
import resource
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def gen_genome(n: int, seed: int = 12345) -> np.ndarray:
    """Random ACGT genome as 2-bit codes, chunked generation."""
    rng = np.random.default_rng(seed)
    out = np.empty(n, np.uint8)
    step = 200_000_000
    for i in range(0, n, step):
        j = min(i + step, n)
        out[i:j] = rng.integers(0, 4, j - i, dtype=np.uint8)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bp", type=int, default=3_300_000_000)
    ap.add_argument("--skip-map", action="store_true")
    ap.add_argument("--reads", type=int, default=2048)
    ap.add_argument("--out", default=os.path.join(ROOT, "GENOME_SCALE.json"))
    args = ap.parse_args()

    from genomics_tpu.index.fmindex import FMIndex, save_index, load_index
    from genomics_tpu.runtime import native

    art = {"bp": args.bp, "native": native.available()}
    t0 = time.time()
    codes = gen_genome(args.bp)
    art["gen_s"] = round(time.time() - t0, 1)
    print(f"[genome_scale] generated {args.bp/1e9:.2f} Gbp "
          f"({art['gen_s']}s, rss {rss_gb():.1f} GB)", flush=True)

    t0 = time.time()
    fm = FMIndex(codes, occ_rate=128, sa_rate=64)
    art["build_s"] = round(time.time() - t0, 1)
    art["build_rss_gb"] = round(rss_gb(), 1)
    art["sa_dtype"] = "int64" if args.bp >= (1 << 31) - 16 else "int32"
    print(f"[genome_scale] FM-index built in {art['build_s']}s "
          f"(peak rss {art['build_rss_gb']} GB)", flush=True)

    # ---- streamed verification (bounded RAM) ----
    # (a) structural: C[5] must equal n+1; checkpoint totals must match C
    assert int(fm.C[5]) == fm.n, (fm.C, fm.n)
    ck_tot = fm.ckpt[:, -1]
    assert np.array_equal(np.sort(np.diff(fm.C)), np.sort(ck_tot)), \
        "occ checkpoint totals disagree with C"
    # (b) query spot-checks: K random 48-mers sampled FROM the genome
    # must be found at their source position (48-mers in a 3.3 Gbp
    # random text are a.s. unique, so count==1 and locate==[pos]);
    # each check costs two rank lookups x 48 steps — O(KB) of traffic
    rng = np.random.default_rng(7)
    K, PL = 1000, 48
    pos = rng.integers(0, args.bp - PL, K)
    t0 = time.time()
    n_exact = n_located = 0
    multi = 0
    for p in pos:
        pat = codes[p:p + PL]
        lo, hi = fm.backward_search(
            pat[None, :], np.array([PL], np.int64))
        cnt = int(hi[0] - lo[0])
        if cnt >= 1:
            n_exact += 1
            if cnt > 1:
                multi += 1
            where = fm.sa_values(np.arange(lo[0], hi[0]))
            if p in where:
                n_located += 1
    art["verify_s"] = round(time.time() - t0, 1)
    art["patterns"] = K
    art["found"] = n_exact
    art["located"] = n_located
    art["multi_hit"] = multi
    print(f"[genome_scale] {n_exact}/{K} patterns found, "
          f"{n_located}/{K} located at source ({art['verify_s']}s)",
          flush=True)
    assert n_exact == K and n_located == K, "verification FAILED"
    # (c) negative control: patterns with a sentinel-adjacent mutation
    miss = 0
    for p in pos[:100]:
        pat = codes[p:p + PL].copy()
        pat[PL // 2] ^= 1  # flip a base
        lo, hi = fm.backward_search(pat[None, :], np.array([PL], np.int64))
        if int(hi[0] - lo[0]) == 0:
            miss += 1
    art["mutated_missed"] = miss  # expect ~100 (unique 48-mers)

    # ---- save / reload ----
    idx_path = os.path.join("/tmp", "genome_scale_index")
    t0 = time.time()
    save_index(fm, idx_path)
    art["save_s"] = round(time.time() - t0, 1)
    art["index_file_gb"] = round(
        os.path.getsize(idx_path + ".npz") / 1e9, 2)
    t0 = time.time()
    fm2 = load_index(idx_path)
    art["load_s"] = round(time.time() - t0, 1)
    ok = 0
    for p in pos[:100]:
        pat = codes[p:p + PL]
        lo, hi = fm2.backward_search(pat[None, :], np.array([PL], np.int64))
        if int(hi[0] - lo[0]) >= 1:
            ok += 1
    art["reloaded_found"] = ok
    assert ok == 100
    del fm2
    print(f"[genome_scale] saved {art['index_file_gb']} GB, "
          f"reloaded + requeried OK", flush=True)

    # ---- map mutated reads against it ----
    if not args.skip_map:
        from genomics_tpu.models.mapper import ReadMapper

        B, RL = args.reads, 100
        rpos = rng.integers(0, args.bp - RL, B)
        reads = []
        for p in rpos:
            rc = codes[p:p + RL].copy()
            nmut = rng.integers(0, 4)
            at = rng.integers(0, RL, nmut)
            rc[at] = (rc[at] + rng.integers(1, 4, nmut)) % 4
            reads.append("".join("ACGT"[c] for c in rc))
        t0 = time.time()
        mapper = ReadMapper(codes, seeder="fm", fm_index=fm)
        art["mapper_ctor_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        maps = mapper.map_batch(reads)
        dt = time.time() - t0
        correct = sum(
            1 for m, p in zip(maps, rpos)
            if m.pos >= 0 and abs(m.pos - int(p)) <= 8)
        art["reads"] = B
        art["mapped"] = sum(1 for m in maps if m.pos >= 0)
        art["correct_pos"] = correct
        art["map_reads_per_s"] = round(B / dt, 1)
        art["map_rss_gb"] = round(rss_gb(), 1)
        print(f"[genome_scale] mapped {art['mapped']}/{B} "
              f"({correct} at true pos) at {art['map_reads_per_s']} "
              f"reads/s", flush=True)
        assert correct >= B * 0.9, "mapping accuracy collapsed"

    art["peak_rss_gb"] = round(rss_gb(), 1)
    with open(args.out, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"[genome_scale] artifact -> {args.out}")
    try:
        os.unlink(idx_path + ".npz")
    except OSError:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
