"""Parity: batched JAX scan engines vs the CPU golds.

The engines pad every pair to the common bucket shape while the golds
pad each sequence to its own 8-multiple; parity across mixed-length
batches also validates that bucket padding cannot perturb scores, end
positions, or tracebacks."""
import numpy as np
import pytest
import jax.numpy as jnp

from genomics_tpu.core import golds
from genomics_tpu.core.batch import PairBatch
from genomics_tpu.core.scoring import AlignmentParams, SemiGlobalSkip
from genomics_tpu.ops import scan_align

P = AlignmentParams()


def make_batch(rng, n, qmax=48, tmax=64, q_pad=56, t_pad=72):
    qs = ["".join(rng.choice(list("ACGT"), rng.integers(1, qmax))) for _ in range(n)]
    ts = ["".join(rng.choice(list("ACGT"), rng.integers(1, tmax))) for _ in range(n)]
    pb = PairBatch.from_strings(qs, ts, q_pad=q_pad, t_pad=t_pad)
    return qs, ts, pb


def test_local_parity():
    rng = np.random.default_rng(1)
    qs, ts, pb = make_batch(rng, 16)
    res = scan_align.local_align_batch(
        jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes), P
    )
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.local_align(q, t, P)
        assert int(res.score[i]) == g["score"], (i, q, t)
        assert int(res.query_end[i]) == g["query_end"], (i, q, t)
        assert int(res.target_end[i]) == g["target_end"], (i, q, t)


def test_local_tb_parity():
    rng = np.random.default_rng(2)
    qs, ts, pb = make_batch(rng, 8, qmax=40, tmax=40, q_pad=48, t_pad=48)
    res = scan_align.local_align_batch(
        jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes), P, with_tb=True
    )
    tb = np.asarray(res.tb)
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.local_align(q, t, P, with_tb=True)
        if g["score"] == 0:
            continue
        tpad, qpad = g["tb_dirs"].shape
        np.testing.assert_array_equal(
            tb[i, :tpad, :qpad], g["tb_dirs"], err_msg=f"pair {i}"
        )
        # CIGAR decode end-to-end through the engine's nibbles
        d_eng = golds.decode_tb(
            tb[i, :tpad, :qpad], len(q), len(t), "local", P,
            int(res.score[i]), int(res.query_end[i]), int(res.target_end[i]),
        )
        d_gold = golds.decode_tb(
            g["tb_dirs"], len(q), len(t), "local", P,
            g["score"], g["query_end"], g["target_end"],
        )
        np.testing.assert_array_equal(d_eng["cigar"], d_gold["cigar"])


def test_global_parity():
    rng = np.random.default_rng(3)
    qs, ts, pb = make_batch(rng, 16)
    res = scan_align.global_align_batch(
        jnp.asarray(pb.query.codes),
        jnp.asarray(pb.target.codes),
        jnp.asarray(pb.query.lengths),
        jnp.asarray(pb.target.lengths),
        P,
    )
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.global_align(q, t, P)
        assert int(res.score[i]) == g["score"], (i, q, t)


def test_global_tb_parity():
    rng = np.random.default_rng(4)
    qs, ts, pb = make_batch(rng, 6, qmax=30, tmax=30, q_pad=32, t_pad=32)
    res = scan_align.global_align_batch(
        jnp.asarray(pb.query.codes),
        jnp.asarray(pb.target.codes),
        jnp.asarray(pb.query.lengths),
        jnp.asarray(pb.target.lengths),
        P,
        with_tb=True,
    )
    tb = np.asarray(res.tb)
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.global_align(q, t, P, with_tb=True)
        tpad, qpad = g["tb_dirs"].shape
        np.testing.assert_array_equal(tb[i, :tpad, :qpad], g["tb_dirs"])
        d_eng = golds.decode_tb(tb[i, :tpad, :qpad], len(q), len(t), "global", P)
        d_gold = golds.decode_tb(g["tb_dirs"], len(q), len(t), "global", P)
        np.testing.assert_array_equal(d_eng["cigar"], d_gold["cigar"])


@pytest.mark.parametrize(
    "head,tail",
    [
        (SemiGlobalSkip.NONE, SemiGlobalSkip.TARGET),
        (SemiGlobalSkip.TARGET, SemiGlobalSkip.TARGET),
        (SemiGlobalSkip.QUERY, SemiGlobalSkip.QUERY),
        (SemiGlobalSkip.BOTH, SemiGlobalSkip.BOTH),
        (SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH),
    ],
)
def test_semiglobal_parity(head, tail):
    rng = np.random.default_rng(5)
    qs, ts, pb = make_batch(rng, 12)
    res = scan_align.semiglobal_align_batch(
        jnp.asarray(pb.query.codes),
        jnp.asarray(pb.target.codes),
        jnp.asarray(pb.query.lengths),
        jnp.asarray(pb.target.lengths),
        P,
        head=head,
        tail=tail,
    )
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.semiglobal_align(q, t, P, head=head, tail=tail)
        assert int(res.score[i]) == g["score"], (i, head, tail, q, t)
        assert int(res.query_end[i]) == g["query_end"], (i, head, tail, q, t)
        assert int(res.target_end[i]) == g["target_end"], (i, head, tail, q, t)


def test_ksw_parity():
    rng = np.random.default_rng(6)
    qs, ts, pb = make_batch(rng, 16)
    h0 = rng.integers(5, 40, pb.size).astype(np.int32)
    res = scan_align.ksw_align_batch(
        jnp.asarray(pb.query.codes),
        jnp.asarray(pb.target.codes),
        jnp.asarray(pb.query.lengths),
        jnp.asarray(pb.target.lengths),
        jnp.asarray(h0),
        P,
    )
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.ksw_align(q, t, P, h0=int(h0[i]))
        assert int(res.score[i]) == g["score"], (i, q, t, int(h0[i]))
        assert int(res.query_end[i]) == g["query_end"], (i, q, t)
        assert int(res.target_end[i]) == g["target_end"], (i, q, t)


def test_ksw_related_pairs():
    """ksw on realistic seed-extension inputs: target = mutated query."""
    rng = np.random.default_rng(7)
    qs, ts = [], []
    for _ in range(8):
        n = int(rng.integers(20, 60))
        q = rng.choice(list("ACGT"), n)
        t = q.copy()
        for k in range(n):
            if rng.random() < 0.1:
                t[k] = rng.choice(list("ACGT"))
        qs.append("".join(q))
        ts.append("".join(t))
    pb = PairBatch.from_strings(qs, ts, q_pad=64, t_pad=64)
    h0 = np.full(pb.size, 30, np.int32)
    res = scan_align.ksw_align_batch(
        jnp.asarray(pb.query.codes),
        jnp.asarray(pb.target.codes),
        jnp.asarray(pb.query.lengths),
        jnp.asarray(pb.target.lengths),
        jnp.asarray(h0),
        P,
    )
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.ksw_align(q, t, P, h0=30)
        assert int(res.score[i]) == g["score"], (i, q, t)
        assert int(res.query_end[i]) == g["query_end"], (i, q, t)
        assert int(res.target_end[i]) == g["target_end"], (i, q, t)


@pytest.mark.parametrize("band", [1, 2, 4])
def test_banded_parity(band):
    rng = np.random.default_rng(8)
    qs, ts, pb = make_batch(rng, 12, qmax=48, tmax=48, q_pad=56, t_pad=56)
    res = scan_align.banded_align_batch(
        jnp.asarray(pb.query.codes),
        jnp.asarray(pb.target.codes),
        jnp.asarray(pb.query.lengths),
        jnp.asarray(pb.target.lengths),
        P,
        band_width_tiles=band,
    )
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.banded_align(q, t, P, band_width_tiles=band)
        assert int(res.score[i]) == g["score"], (i, band, q, t)
        assert int(res.query_end[i]) == g["query_end"], (i, band, q, t)
        assert int(res.target_end[i]) == g["target_end"], (i, band, q, t)
