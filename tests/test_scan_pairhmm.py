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
