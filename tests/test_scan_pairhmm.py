"""Parity: batched PairHMM scan engine vs the CPU gold.

The gold emulates the reference's __fmaf_rn (single-rounded fma); XLA
may or may not contract mul+add, so engine-vs-gold parity is checked at
tight relative tolerance here and quantified exactly on TPU in the
benchmark harness."""
import os

import numpy as np
import pytest

from genomics_tpu.core import golds
from genomics_tpu.ops import scan_pairhmm

RNG = np.random.default_rng(11)


def rand_records(n, rmax=40, cmax=50):
    recs = []
    for _ in range(n):
        R = int(RNG.integers(2, rmax))
        C = int(RNG.integers(2, cmax))
        recs.append(
            dict(
                read="".join(RNG.choice(list("ACGT"), R)),
                hap="".join(RNG.choice(list("ACGT"), C)),
                base_quals=RNG.integers(5, 60, R),
                ins_quals=RNG.integers(5, 60, R),
                del_quals=RNG.integers(5, 60, R),
            )
        )
    return recs


def test_pairhmm_batch_parity_random():
    recs = rand_records(12)
    got = scan_pairhmm.pairhmm_forward_dataset(recs, pad_r=48, pad_c=56)
    for i, r in enumerate(recs):
        want = golds.pairhmm_forward(
            r["read"], r["hap"], r["base_quals"], r["ins_quals"], r["del_quals"]
        )
        np.testing.assert_allclose(got[i], want, rtol=2e-6)


def test_pairhmm_reference_dataset_grid():
    base = "/root/reference/Non-CDP/PairHMM/Intra-task/Synthetic_data/dataset"
    if not os.path.isdir(base):
        pytest.skip("reference datasets not mounted")
    for name in ["32_32.txt", "64_128.txt", "128_64.txt"]:
        path = os.path.join(base, name)
        if not os.path.exists(path):
            continue
        recs = golds.read_pairhmm_dataset(path, limit=4)
        got = scan_pairhmm.pairhmm_forward_dataset(recs)
        for i, r in enumerate(recs):
            want = golds.pairhmm_forward(
                r["read"], r["hap"], r["base_quals"], r["ins_quals"], r["del_quals"]
            )
            np.testing.assert_allclose(got[i], want, rtol=2e-6, err_msg=name)


def test_pairhmm_full_dataset_grid():
    """Sweep every bundled synthetic dataset (intra-task grid + the
    inter-task *_data.txt set), 1 record each, gold parity."""
    import glob

    base = "/root/reference/Non-CDP/PairHMM"
    files = sorted(
        glob.glob(f"{base}/Intra-task/Synthetic_data/dataset/*.txt")
        + glob.glob(f"{base}/inter_task/Synthetic_data/dataset/*_data.txt")
    )
    if not files:
        pytest.skip("datasets not mounted")
    recs = []
    for f in files:
        r = golds.read_pairhmm_dataset(f, limit=1)
        if r:
            recs.append((os.path.basename(f), r[0]))
    assert len(recs) >= 20
    got = scan_pairhmm.pairhmm_forward_dataset([r for _, r in recs])
    for (name, r), g in zip(recs, got):
        want = golds.pairhmm_forward(
            r["read"], r["hap"], r["base_quals"], r["ins_quals"], r["del_quals"]
        )
        np.testing.assert_allclose(g, want, rtol=2e-6, err_msg=name)


def test_region_batch_matches_gold():
    """GATK-shaped region cross products (reads x haps per region, the
    NUM_ADD packing of warp_based.cu:14-18) through ONE flattened
    batch — spot-checked against the per-pair gold."""
    from genomics_tpu.models.pairhmm import compute_region_likelihoods

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    regions = []
    for _ in range(3):
        hap0 = bases[rng.integers(0, 4, 48)]
        haps = [hap0.tobytes(),
                np.roll(hap0, 1).tobytes()]
        rds = []
        for _r in range(4):
            rd = hap0[4:36].copy()
            rd[rng.integers(0, 32, 2)] = bases[rng.integers(0, 4, 2)]
            rds.append({
                "read": rd.tobytes(),
                "base_quals": rng.integers(20, 40, 32),
                "ins_quals": rng.integers(30, 45, 32),
                "del_quals": rng.integers(30, 45, 32),
            })
        regions.append({"reads": rds, "haps": haps})
    mats, _res = compute_region_likelihoods(regions)
    assert [m.shape for m in mats] == [(4, 2)] * 3
    for gi in (0, 2):
        for ri in (0, 3):
            for hi in (0, 1):
                r = regions[gi]["reads"][ri]
                want = golds.pairhmm_forward(
                    r["read"], regions[gi]["haps"][hi],
                    r["base_quals"], r["ins_quals"], r["del_quals"])
                got = mats[gi][ri, hi]
                assert np.isfinite(got)
                rel = abs(float(got) - float(want)) / abs(float(want))
                assert rel < 1e-5, (gi, ri, hi, got, want)
