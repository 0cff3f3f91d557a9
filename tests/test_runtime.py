"""Runtime layer tests: bucketed dispatch end-to-end vs golds, native
CIGAR decoder parity vs the Python gold decoder."""
import numpy as np
import pytest

from genomics_tpu.core import golds
from genomics_tpu.core.scoring import AlignmentParams, AlgoType, SemiGlobalSkip
from genomics_tpu.runtime import native
from genomics_tpu.runtime.dispatch import AlignEngine

P = AlignmentParams()


def rand_pairs(rng, n, lo=5, hi=120):
    qs = ["".join(rng.choice(list("ACGT"), rng.integers(lo, hi))) for _ in range(n)]
    ts = ["".join(rng.choice(list("ACGT"), rng.integers(lo, hi))) for _ in range(n)]
    return qs, ts


def test_engine_local_mixed_lengths():
    rng = np.random.default_rng(0)
    qs, ts = rand_pairs(rng, 40)
    eng = AlignEngine(P, use_pallas=True)
    res = eng.align(qs, ts)
    for i in range(0, 40, 7):
        g = golds.local_align(qs[i], ts[i], P)
        assert res[i].score == g["score"]
        assert res[i].query_end == g["query_end"]
        assert res[i].target_end == g["target_end"]


def test_engine_local_with_cigar():
    rng = np.random.default_rng(1)
    qs, ts = rand_pairs(rng, 24, lo=10, hi=60)
    eng = AlignEngine(P, with_tb=True)
    res = eng.align(qs, ts)
    for i in range(0, 24, 5):
        g = golds.local_align(qs[i], ts[i], P, with_tb=True)
        if g["score"] == 0:
            continue
        d = golds.decode_tb(
            g["tb_dirs"], len(qs[i]), len(ts[i]), "local", P,
            g["score"], g["query_end"], g["target_end"],
        )
        np.testing.assert_array_equal(res[i].cigar, d["cigar"])
        assert res[i].query_start == d["query_start"]
        assert res[i].target_start == d["target_start"]


def test_engine_global():
    rng = np.random.default_rng(2)
    qs, ts = rand_pairs(rng, 20)
    eng = AlignEngine(AlignmentParams(algo=AlgoType.GLOBAL))
    res = eng.align(qs, ts)
    for i in range(0, 20, 3):
        g = golds.global_align(qs[i], ts[i], P)
        assert res[i].score == g["score"]


def test_engine_ksw_and_banded():
    rng = np.random.default_rng(3)
    qs, ts = rand_pairs(rng, 12)
    h0 = rng.integers(10, 30, 12)
    eng = AlignEngine(AlignmentParams(algo=AlgoType.KSW))
    res = eng.align(qs, ts, h0=h0)
    for i in range(0, 12, 3):
        g = golds.ksw_align(qs[i], ts[i], P, h0=int(h0[i]))
        assert res[i].score == g["score"]

    engb = AlignEngine(AlignmentParams(algo=AlgoType.BANDED), band_width_tiles=2)
    resb = engb.align(qs, ts)
    for i in range(0, 12, 3):
        g = golds.banded_align(qs[i], ts[i], P, band_width_tiles=2)
        assert resb[i].score == g["score"]


def test_engine_semiglobal():
    rng = np.random.default_rng(4)
    qs, ts = rand_pairs(rng, 12)
    eng = AlignEngine(
        AlignmentParams(algo=AlgoType.SEMI_GLOBAL),
        head=SemiGlobalSkip.TARGET,
        tail=SemiGlobalSkip.TARGET,
    )
    res = eng.align(qs, ts)
    for i in range(0, 12, 3):
        g = golds.semiglobal_align(
            qs[i], ts[i], P, head=SemiGlobalSkip.TARGET, tail=SemiGlobalSkip.TARGET
        )
        assert res[i].score == g["score"]


def test_native_decoder_available_and_parity():
    """The C++ decoder must build and agree with the Python gold."""
    assert native.available(), "native decoder failed to build"
    rng = np.random.default_rng(5)
    qs, ts = rand_pairs(rng, 16, lo=10, hi=80)
    eng_native = AlignEngine(P, with_tb=True)
    res = eng_native.align(qs, ts)
    # force python fallback and compare
    import genomics_tpu.runtime.native as nat

    lib_save = nat._lib
    try:
        nat._lib = None
        nat._tried = True
        eng_py = AlignEngine(P, with_tb=True)
        res_py = eng_py.align(qs, ts)
    finally:
        nat._lib = lib_save
    for a, b in zip(res, res_py):
        assert a.score == b.score
        np.testing.assert_array_equal(a.cigar, b.cigar)
        assert (a.query_start, a.target_start) == (b.query_start, b.target_start)


def test_align_async_double_buffer():
    """align_async: two in-flight batches, results in order, gold parity."""
    rng = np.random.default_rng(7)
    qs1, ts1 = rand_pairs(rng, 8, lo=10, hi=50)
    qs2, ts2 = rand_pairs(rng, 8, lo=10, hi=50)
    eng = AlignEngine(P)
    h1 = eng.align_async(qs1, ts1)
    h2 = eng.align_async(qs2, ts2)
    r1, r2 = h1.result(), h2.result()
    assert h1.done() and h2.done()
    g = golds.local_align(qs1[2], ts1[2], P)
    assert r1[2].score == g["score"]
    g = golds.local_align(qs2[6], ts2[6], P)
    assert r2[6].score == g["score"]


def test_engine_second_best():
    """params.second_best surfaces through AlignEngine (GASAL2
    --second-best, reference res.cpp:8-76)."""
    rng = np.random.default_rng(7)
    qs, ts = rand_pairs(rng, 30, lo=8, hi=80)
    eng = AlignEngine(AlignmentParams(second_best=True))
    res = eng.align(qs, ts)
    for i in range(0, 30, 4):
        g = golds.local_align(qs[i], ts[i], AlignmentParams(), second_best=True)
        assert res[i].score == g["score"]
        assert res[i].score_second == g["score_second"]
        assert res[i].query_end_second == g["query_end_second"]
        assert res[i].target_end_second == g["target_end_second"]


def test_dispatch_chunking_bounds_pad_waste():
    """>1024-job buckets split into 2048/1024-tiles + a 128-tile
    remainder (VERDICT r2 weak #5): pad waste stays < 15% on a
    realistic single-length histogram (Illumina-style all-150bp)."""
    eng = AlignEngine(P, use_pallas=True)
    n = 1025
    enc = [np.ones(150, np.uint8)] * n
    pending, _ = eng._dispatch(enc, enc)
    padded = sum(entry[4].shape[0] for entry in pending)
    sizes = sorted(entry[4].shape[0] for entry in pending)
    assert sizes == [128, 1024], sizes          # not 2048
    assert padded / n < 1.15
    n = 5000
    enc = [np.ones(150, np.uint8)] * n
    pending, _ = eng._dispatch(enc, enc)
    padded = sum(entry[4].shape[0] for entry in pending)
    assert padded / n < 1.15, padded


def test_engine_score_only_mode():
    """score_only engine dispatches the score-only kernels and matches
    the full engine's scores exactly (incl. an in-sequence N)."""
    rng = np.random.default_rng(11)
    qs, ts = rand_pairs(rng, 40, lo=10, hi=90)
    qs[3] = qs[3][:5] + "N" + qs[3][6:]
    full = AlignEngine(P, use_pallas=True).align(qs, ts)
    fast = AlignEngine(P, use_pallas=True, score_only=True).align(qs, ts)
    for a, b in zip(full, fast):
        assert a.score == b.score


def test_engine_semiglobal_cigar_extension():
    """Semiglobal traceback end-to-end (framework extension — the
    reference stores semiglobal WITH_TB matrices but never decodes
    them, gasal_align.h:7-33).  Hand-checked glocal case + scan/Pallas
    path parity + coverage invariants."""
    # glocal: query contained in target, free target head+tail
    eng = AlignEngine(
        AlignmentParams(algo=AlgoType.SEMI_GLOBAL),
        with_tb=True,
        head=SemiGlobalSkip.TARGET,
        tail=SemiGlobalSkip.TARGET,
    )
    res = eng.align(["ACGT"], ["TTACGTTT"])[0]
    assert res.cigar_string == "4M"
    assert res.query_start == 0 and res.target_start == 2
    # query_end == 8 is the preserved GASAL2 quirk: maxXY_x keeps its
    # ref_len init when the query-tail sweep isn't selected (template
    # :63-64); the true end is recoverable from the CIGAR span.
    assert res.query_end == 8 and res.target_end == 5

    rng = np.random.default_rng(13)
    qs, ts = rand_pairs(rng, 16, lo=8, hi=48)
    combos = [
        (SemiGlobalSkip.NONE, SemiGlobalSkip.NONE),
        (SemiGlobalSkip.TARGET, SemiGlobalSkip.TARGET),
        (SemiGlobalSkip.QUERY, SemiGlobalSkip.QUERY),
        (SemiGlobalSkip.BOTH, SemiGlobalSkip.BOTH),
    ]
    for head, tail in combos:
        e1 = AlignEngine(AlignmentParams(algo=AlgoType.SEMI_GLOBAL),
                         with_tb=True, head=head, tail=tail,
                         use_pallas=False)
        e2 = AlignEngine(AlignmentParams(algo=AlgoType.SEMI_GLOBAL),
                         with_tb=True, head=head, tail=tail,
                         use_pallas=True)
        r1 = e1.align(qs, ts)
        r2 = e2.align(qs, ts)
        for k, (a, b) in enumerate(zip(r1, r2)):
            assert a.score == b.score, (head, tail, k)
            np.testing.assert_array_equal(a.cigar, b.cigar)
            assert (a.query_start, a.target_start) == (
                b.query_start, b.target_start)
        if head == SemiGlobalSkip.NONE:
            # full-coverage invariant: the walk + pads consume exactly
            # the start-cell spans from the origin
            for k, a in enumerate(r1):
                ops = a.cigar & 3
                cnt = a.cigar >> 2
                t_used = int(cnt[(ops == 0) | (ops == 1) | (ops == 2)].sum())
                q_used = int(cnt[(ops == 0) | (ops == 1) | (ops == 3)].sum())
                assert t_used == len(ts[k]), k   # covers tlen-1 .. 0
                assert q_used == len(qs[k]), k
