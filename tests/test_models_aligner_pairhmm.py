"""GASAL2-compat facade and PairHMM app driver."""
import numpy as np
import pytest

from genomics_tpu.core import golds
from genomics_tpu.core.encoding import encode4
from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.models import pairhmm
from genomics_tpu.models.aligner import (
    DataSource, GasalAligner, align_fasta_pairs, apply_op,
)

P = AlignmentParams()


def test_stream_api_flow():
    rng = np.random.default_rng(0)
    qs = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(6)]
    ts = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(6)]
    lib = GasalAligner(P, n_streams=2, with_tb=True)
    st = lib.free_stream()
    for q, t in zip(qs, ts):
        st.fill(q, DataSource.QUERY)
        st.fill(t, DataSource.TARGET)
    st.aln_async()
    assert st.is_done() == 0
    for i, job in enumerate(st.results):
        g = golds.local_align(qs[i], ts[i], P)
        assert job.score == g["score"]
        if g["score"]:
            assert job.cigar is not None


def test_op_transforms():
    codes = encode4("ACGT")
    np.testing.assert_array_equal(apply_op(codes, 0), codes)
    # reverse natural
    np.testing.assert_array_equal(apply_op(codes, 1), codes[::-1])
    # reverse complement of ACGT is ACGT
    np.testing.assert_array_equal(apply_op(codes, 3), codes)


def test_op_changes_alignment():
    lib = GasalAligner(P)
    st = lib.free_stream()
    st.fill("TTTTTTTT", DataSource.QUERY)
    st.fill("AAAAAAAA", DataSource.TARGET)
    st.op_fill(["/"], DataSource.QUERY)   # complement(T*8) = A*8
    st.aln_async()
    st.is_done()
    assert st.results[0].score == 8


def test_pairhmm_app_dataset():
    import os

    path = "/root/reference/Non-CDP/PairHMM/Intra-task/Synthetic_data/dataset/32_64.txt"
    if not os.path.exists(path):
        pytest.skip("dataset not mounted")
    rel, res = pairhmm.verify_against_gold(path)
    assert rel < 1e-5
    assert res.gcups > 0
