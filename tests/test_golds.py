"""Self-consistency tests for the CPU gold references.

The golds are faithful emulations of the reference CUDA kernels
(core/golds.py docstring); these tests pin their behavior with
hand-checked cases and an independent row-major implementation of the
same recurrence (catching transcription errors in the strip-order
emulation)."""
import numpy as np
import pytest

from genomics_tpu.core import golds
from genomics_tpu.core.encoding import encode4
from genomics_tpu.core.scoring import AlignmentParams, SemiGlobalSkip

P = AlignmentParams()  # GASAL2 defaults: match=1 mismatch=4 gapo=6 gape=1
RNG = np.random.default_rng(42)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), n))


# ---------------------------------------------------------------------------
# NW app
# ---------------------------------------------------------------------------


def test_nw_identity():
    ref = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    m = golds.nw_cpu(ref, ref)
    assert m[-1, -1] == 8


def test_nw_vs_naive():
    """Cross-check the vectorized nw_cpu against a literal transcription
    of CDP/NW/main.cu:10-27."""
    N = 17
    ref = RNG.integers(0, 4, N).astype(np.uint8)
    qry = RNG.integers(0, 4, N).astype(np.uint8)
    MATCH, MISMATCH, INSERTION, DELETION = 1, -1, -1, -1
    m = np.zeros((N, N), dtype=np.int64)
    for q in range(N):
        for r in range(N):
            top = (r + 1) * DELETION if q == 0 else m[q - 1, r]
            left = (q + 1) * INSERTION if r == 0 else m[q, r - 1]
            topleft = (
                r * DELETION
                if q == 0
                else ((q) * INSERTION if r == 0 else m[q - 1, r - 1])
            )
            ins = top + INSERTION
            dele = left + DELETION
            mat = topleft + (MATCH if qry[q] == ref[r] else MISMATCH)
            m[q, r] = max(ins, dele, mat)
    np.testing.assert_array_equal(golds.nw_cpu(ref, qry), m)


# ---------------------------------------------------------------------------
# SW app
# ---------------------------------------------------------------------------


def test_sw_simple():
    score, loc, cig = golds.sw_align_window("ACGT", "TTACGTTT", 0, 8)
    assert score == 4
    assert cig == "MMMM"
    assert loc == 3  # yCord after walk + start + 1


def test_sw_windowed_driver():
    x = "ACGTACGT"
    y = "T" * 50 + "ACGTACGT" + "T" * 50
    score, loc, idx, cig = golds.sw_best_alignment(x, y)
    assert score == 8


# ---------------------------------------------------------------------------
# GASAL2 local
# ---------------------------------------------------------------------------


def brute_local(q, t, p):
    """Independent row-major implementation of the GASAL2 local recurrence
    (tmp-based gap opens) with min-visit-key tie-breaking."""
    q = golds.pad8(q)
    t = golds.pad8(t)
    Lq, Lt = len(q), len(t)
    goe, ge = p.gap_oe, p.gap_extend
    H = np.zeros((Lt, Lq), dtype=np.int64)
    E = np.zeros(Lq, dtype=np.int64)
    Hprev = np.zeros(Lq, dtype=np.int64)
    for i in range(Lt):
        f = 0
        for j in range(Lq):
            sub = golds._sub_score_local(int(q[j]), int(t[i]), p)
            tmp = (0 if j == 0 else Hprev[j - 1]) + sub
            h = max(tmp, f, E[j], 0)
            E[j] = max(tmp - goe, E[j] - ge)
            f = max(tmp - goe, f - ge)
            H[i, j] = h
        Hprev = H[i].copy()
    best = int(H.max(initial=0))
    if best == 0:
        return 0, 0, 0
    cells = np.argwhere(H == best)
    keys = ((cells[:, 0] >> 3) * Lq + cells[:, 1]) * 8 + (cells[:, 0] & 7)
    k = cells[np.argmin(keys)]
    return best, int(k[1]), int(k[0])


@pytest.mark.parametrize("trial", range(20))
def test_local_vs_bruteforce(trial):
    rng = np.random.default_rng(trial)
    lq = int(rng.integers(1, 60))
    lt = int(rng.integers(1, 60))
    q = "".join(rng.choice(list("ACGT"), lq))
    t = "".join(rng.choice(list("ACGT"), lt))
    g = golds.local_align(q, t, P)
    b = brute_local(q, t, P)
    assert (g["score"], g["query_end"], g["target_end"]) == b


def test_local_tb_score_rebuild():
    """The byte-CIGAR from decode_tb must rebuild exactly the alignment
    score (get_tb.h:100-103 score-stop invariant)."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        lq = int(rng.integers(5, 80))
        lt = int(rng.integers(5, 80))
        q = "".join(rng.choice(list("ACGT"), lq))
        t = "".join(rng.choice(list("ACGT"), lt))
        g = golds.local_align(q, t, P, with_tb=True)
        if g["score"] == 0:
            continue
        d = golds.decode_tb(
            g["tb_dirs"], lq, lt, "local", P, g["score"], g["query_end"], g["target_end"]
        )
        s = 0
        prev = None
        for b in d["cigar"]:
            op = b & 3
            cnt = int(b) >> 2
            if op in (2, 3):
                s += -P.gap_oe - (cnt - 1) * P.gap_extend
            elif op == 1:
                s -= P.mismatch * cnt
            else:
                s += P.match * cnt
        assert s == g["score"]


def test_local_with_start():
    q = "ACGTACGT"
    t = "TTTTACGTACGTTTTT"
    g = golds.local_align(q, t, P, with_start=True)
    assert g["score"] == 8
    # NOTE: the true start is (0, 4).  The reference's reverse pass
    # (CORE_LOCAL_COMPUTE_START) records maxXY_y = gidx + (m-1) while
    # reading the target word *backwards* (l = 0..28), so the recorded
    # target start is skewed by +2*(m-1) within its word: 4 → 10.  We
    # replicate the reference verbatim; exact starts are available via
    # the traceback path (decode_tb), as in GASAL2 itself.
    assert (g["query_start"], g["target_start"]) == (0, 10)
    assert (g["query_end"], g["target_end"]) == (7, 11)


# ---------------------------------------------------------------------------
# GASAL2 global / semiglobal / banded / ksw
# ---------------------------------------------------------------------------


def test_global_simple():
    assert golds.global_align("ACGT", "ACGT", P)["score"] == 4
    # one extra query base: gap of 1 → 4 - (6+1) = -3
    assert golds.global_align("ACGTA", "ACGT", P)["score"] == -3
    # one mismatch
    assert golds.global_align("ACGA", "ACGT", P)["score"] == 3 - 4


def test_global_tb_cigar():
    g = golds.global_align("ACGTA", "ACGT", P, with_tb=True)
    d = golds.decode_tb(g["tb_dirs"], 5, 4, "global", P)
    cig = golds.cigar_to_string(d["cigar"])
    # 4 matches + 1 query insertion somewhere, plus get_tb's D/I padding
    assert "I" in cig or "D" in cig


def test_semiglobal_free_target():
    g = golds.semiglobal_align(
        "ACGT", "TTACGTTT", P, head=SemiGlobalSkip.TARGET, tail=SemiGlobalSkip.TARGET
    )
    assert g["score"] == 4
    assert g["target_end"] == 5


def test_ksw_extension():
    r = golds.ksw_align("ACGTACGT", "ACGTACGT", P, h0=10)
    assert r["score"] == 18
    assert r["query_end"] == 8 and r["target_end"] == 8
    # mismatch tail clipped: extension stops gaining
    r2 = golds.ksw_align("ACGTAAAA", "ACGTCCCC", P, h0=10)
    assert r2["score"] == 14  # 4 matches then clip


def test_banded_diag():
    r = golds.banded_align("ACGTACGT", "ACGTACGT", P, band_width_tiles=1)
    assert r["score"] == 8


# ---------------------------------------------------------------------------
# PairHMM
# ---------------------------------------------------------------------------


def test_pairhmm_matches_naive_full_matrix():
    """Cross-check against an independent full-matrix f32 forward pass."""
    rng = np.random.default_rng(3)
    for _ in range(5):
        R = int(rng.integers(2, 20))
        C = int(rng.integers(2, 25))
        read = "".join(rng.choice(list("ACGT"), R))
        hap = "".join(rng.choice(list("ACGT"), C))
        bq = rng.integers(10, 50, R)
        iq = rng.integers(10, 50, R)
        dq = rng.integers(10, 50, R)
        got = golds.pairhmm_forward(read, hap, bq, iq, dq)

        tab = golds.ph2pr_table().astype(np.float64)
        Qm = tab[bq & 127]
        Qm_1 = 1.0 - Qm
        Qm = Qm / 3.0
        delta = tab[iq & 127]
        xiksi = tab[dq & 127]
        alpha = 1.0 - tab[(iq + dq) & 127]
        eps, beta = 0.1, 0.9
        D0 = float(np.float32(golds.INITIAL_CONSTANT / np.float32(C)))
        M = np.zeros((R + 1, C + 1))
        I = np.zeros((R + 1, C + 1))
        D = np.zeros((R + 1, C + 1))
        D[0, :] = D0  # row -1: D = D_0 everywhere (incl. col -1 slot)
        for r in range(1, R + 1):
            for c in range(1, C + 1):
                prior = Qm_1[r - 1] if read[r - 1] == hap[c - 1] else Qm[r - 1]
                M[r, c] = prior * (
                    alpha[r - 1] * M[r - 1, c - 1]
                    + beta * (I[r - 1, c - 1] + D[r - 1, c - 1])
                )
                I[r, c] = M[r - 1, c] * delta[r - 1] + I[r - 1, c] * eps
                D[r, c] = D[r, c - 1] * eps + M[r, c - 1] * xiksi[r - 1]
        want = (M[R, 1:] + I[R, 1:]).sum()
        assert got == pytest.approx(want, rel=1e-5)


def test_pairhmm_reference_dataset():
    """Parity smoke test over a bundled reference dataset, if mounted."""
    import os

    path = "/root/reference/Non-CDP/PairHMM/Intra-task/Synthetic_data/dataset/32_32.txt"
    if not os.path.exists(path):
        pytest.skip("reference datasets not mounted")
    recs = golds.read_pairhmm_dataset(path, limit=2)
    assert recs, "dataset parsed empty"
    r = recs[0]
    val = golds.pairhmm_forward(
        r["read"], r["hap"], r["base_quals"], r["ins_quals"], r["del_quals"]
    )
    assert np.isfinite(val) and val > 0
