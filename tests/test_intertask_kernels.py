"""Parity tests for the round-4 inter-task kernels: the PairHMM row
sweep (thread-per-pair analog) and the Pallas Myers bit-vector kernel.
Both run in interpret mode on the CPU mesh; on TPU the same code paths
compile via Mosaic (covered by the bench's gold spot checks)."""
import numpy as np
import jax.numpy as jnp

from genomics_tpu.core import golds
from genomics_tpu.ops import myers
from genomics_tpu.ops import pallas_pairhmm as pp


def _pairhmm_args(rng, B, R, C):
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = bases[rng.integers(0, 4, (B, R))]
    haps = bases[rng.integers(0, 4, (B, C))]
    rlen = rng.integers(5, R + 1, B).astype(np.int32)
    clen = rng.integers(5, C + 1, B).astype(np.int32)
    bq = rng.integers(10, 40, (B, R)).astype(np.int32)
    iq = rng.integers(10, 40, (B, R)).astype(np.int32)
    dq = rng.integers(10, 40, (B, R)).astype(np.int32)
    return reads, haps, rlen, clen, bq, iq, dq


def test_pairhmm_intertask_matches_gold():
    rng = np.random.default_rng(0)
    B, R, C = 1024, 24, 40
    reads, haps, rlen, clen, bq, iq, dq = _pairhmm_args(rng, B, R, C)
    p = pp.prepare_params_np(bq, iq, dq)
    d0 = (golds.INITIAL_CONSTANT / clen.astype(np.float32)).astype(np.float32)
    out = np.asarray(pp.pairhmm_forward_intertask_prepared(
        jnp.asarray(reads.T, jnp.int32), jnp.asarray(haps.T, jnp.int32),
        jnp.asarray(rlen)[None, :], jnp.asarray(clen)[None, :],
        jnp.asarray(d0)[None, :],
        jnp.asarray(p["Qm_1"].T), jnp.asarray(p["Qm"].T),
        jnp.asarray(p["delta"].T), jnp.asarray(p["xiksi"].T),
        jnp.asarray(np.pad(p["alpha"].T, ((0, 1), (0, 0)))),
    ))
    for i in range(0, B, 37):
        want = golds.pairhmm_forward(
            reads[i, :rlen[i]].tobytes(), haps[i, :clen[i]].tobytes(),
            bq[i, :rlen[i]], iq[i, :rlen[i]], dq[i, :rlen[i]])
        rel = abs(float(out[i]) - float(want)) / max(float(want), 1e-30)
        assert rel < 2e-6, (i, rel)


def test_pairhmm_intertask_exact_mode():
    """exact=True emulates the reference's single-rounded __fmaf_rn at
    the same three sites as the anti-diagonal exact kernel — must be
    BIT-exact vs the gold (which uses libm fmaf)."""
    rng = np.random.default_rng(5)
    B, R, C = 1024, 24, 40
    reads, haps, rlen, clen, bq, iq, dq = _pairhmm_args(rng, B, R, C)
    p = pp.prepare_params_np(bq, iq, dq)
    d0 = (golds.INITIAL_CONSTANT / clen.astype(np.float32)).astype(np.float32)
    out = np.asarray(pp.pairhmm_forward_intertask_prepared(
        jnp.asarray(reads.T, jnp.int32), jnp.asarray(haps.T, jnp.int32),
        jnp.asarray(rlen)[None, :], jnp.asarray(clen)[None, :],
        jnp.asarray(d0)[None, :],
        jnp.asarray(p["Qm_1"].T), jnp.asarray(p["Qm"].T),
        jnp.asarray(p["delta"].T), jnp.asarray(p["xiksi"].T),
        jnp.asarray(np.pad(p["alpha"].T, ((0, 1), (0, 0)))),
        exact=True,
    ))
    n_exact = 0
    for i in range(0, B, 29):
        want = golds.pairhmm_forward(
            reads[i, :rlen[i]].tobytes(), haps[i, :clen[i]].tobytes(),
            bq[i, :rlen[i]], iq[i, :rlen[i]], dq[i, :rlen[i]])
        if float(out[i]) == float(want):
            n_exact += 1
        else:
            rel = abs(float(out[i]) - float(want)) / max(float(want), 1e-30)
            assert rel < 1e-6, (i, rel)
    # interpret mode evaluates the emulated FMA exactly -> bit parity
    assert n_exact >= 30


def test_pairhmm_intertask_via_model():
    """compute_likelihoods on CPU still routes to the scan engine; the
    inter-task padding path is exercised via the kernel test above.
    Here: dataset-shaped records through the padded prepared call."""
    rng = np.random.default_rng(1)
    B, R, C = 100, 16, 24           # deliberately not a 1024 multiple
    reads, haps, rlen, clen, bq, iq, dq = _pairhmm_args(rng, B, R, C)
    recs = [
        {"read": reads[i, :rlen[i]].tobytes(),
         "hap": haps[i, :clen[i]].tobytes(),
         "base_quals": bq[i, :rlen[i]], "ins_quals": iq[i, :rlen[i]],
         "del_quals": dq[i, :rlen[i]]}
        for i in range(B)
    ]
    from genomics_tpu.models.pairhmm import compute_likelihoods

    res = compute_likelihoods(recs)
    for i in range(0, B, 17):
        want = golds.pairhmm_forward(
            recs[i]["read"], recs[i]["hap"], recs[i]["base_quals"],
            recs[i]["ins_quals"], recs[i]["del_quals"])
        rel = (abs(float(res.likelihoods[i]) - float(want))
               / max(float(want), 1e-30))
        assert rel < 2e-6, (i, rel)


def test_myers_tpu_matches_scan():
    rng = np.random.default_rng(1)
    B, Lp, Lt = 1024, 96, 152
    pats = rng.integers(0, 4, (B, Lp)).astype(np.uint8)
    texts = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
    plen = rng.integers(20, Lp + 1, B).astype(np.int32)
    tlen = rng.integers(50, Lt + 1, B).astype(np.int32)
    for i in range(B):
        pats[i, plen[i]:] = 255
        texts[i, tlen[i]:] = 255
    W = (Lp + 31) // 32
    eq = myers.build_eq_masks(pats, plen, W)
    b0, e0, f0 = myers.myers_batch(
        jnp.asarray(eq), jnp.asarray(plen), jnp.asarray(texts),
        jnp.asarray(tlen))
    b1, e1, f1 = myers.myers_batch_tpu(eq, plen, texts, tlen)
    np.testing.assert_array_equal(np.asarray(b0), b1)
    np.testing.assert_array_equal(np.asarray(e0), e1)
    np.testing.assert_array_equal(np.asarray(f0), f1)


def test_myers_tpu_single_word():
    rng = np.random.default_rng(2)
    B, Lp, Lt = 1024, 28, 80
    pats = rng.integers(0, 4, (B, Lp)).astype(np.uint8)
    texts = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
    plen = rng.integers(10, Lp + 1, B).astype(np.int32)
    tlen = np.full(B, Lt, np.int32)
    for i in range(B):
        pats[i, plen[i]:] = 255
    eq = myers.build_eq_masks(pats, plen, 1)
    b0, e0, f0 = myers.myers_batch(
        jnp.asarray(eq), jnp.asarray(plen), jnp.asarray(texts),
        jnp.asarray(tlen))
    b1, e1, f1 = myers.myers_batch_tpu(eq, plen, texts, tlen)
    np.testing.assert_array_equal(np.asarray(b0), b1)
    np.testing.assert_array_equal(np.asarray(e0), e1)
    np.testing.assert_array_equal(np.asarray(f0), f1)


def test_ksw_score_only_parity():
    """Score-only full-rectangle ksw must score identically to the
    windowed kernel (pruning only skips provably-zero state), with and
    without the no-N contract."""
    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.ops import pallas_ksw

    params = AlignmentParams()
    rng = np.random.default_rng(3)
    B, L = 1024, 48
    q = (rng.integers(0, 4, (B, L)) * 2 + 1).astype(np.uint8)
    t = (rng.integers(0, 4, (B, L)) * 2 + 1).astype(np.uint8)
    ql = rng.integers(16, L + 1, B).astype(np.int32)
    tl = rng.integers(16, L + 1, B).astype(np.int32)
    for i in range(0, B, 7):
        q[i, rng.integers(0, ql[i])] = 14      # N4
    h0 = rng.integers(10, 60, B).astype(np.int32)
    args = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
            jnp.asarray(tl), jnp.asarray(h0), params)
    full = pallas_ksw.ksw_align_tpu(*args)
    so = pallas_ksw.ksw_align_scores_tpu(*args, has_n=True)
    np.testing.assert_array_equal(np.asarray(full.score), np.asarray(so))
    q2 = jnp.asarray((rng.integers(0, 4, (B, L)) * 2 + 1).astype(np.uint8))
    args2 = (q2,) + args[1:]
    full2 = pallas_ksw.ksw_align_tpu(*args2)
    so2 = pallas_ksw.ksw_align_scores_tpu(*args2, has_n=False)
    np.testing.assert_array_equal(np.asarray(full2.score), np.asarray(so2))


def test_banded_score_only_parity():
    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.ops import pallas_ksw

    params = AlignmentParams()
    rng = np.random.default_rng(4)
    B, L = 1024, 48
    q = (rng.integers(0, 4, (B, L)) * 2 + 1).astype(np.uint8)
    t = (rng.integers(0, 4, (B, L)) * 2 + 1).astype(np.uint8)
    ql = rng.integers(16, L + 1, B).astype(np.int32)
    tl = rng.integers(16, L + 1, B).astype(np.int32)
    for i in range(0, B, 7):
        q[i, rng.integers(0, ql[i])] = 14
    args = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
            jnp.asarray(tl), params, 4)
    full = pallas_ksw.banded_align_tpu(*args[:5],
                                       band_width_tiles=4)
    so = pallas_ksw.banded_align_scores_tpu(*args, has_n=True)
    np.testing.assert_array_equal(np.asarray(full.score), np.asarray(so))


def test_device_tb_walk_matches_native_decode():
    """ops/tb_walk's vectorized state machine must reproduce the native
    decoder's byte-CIGARs and starts exactly (it is a 1:1 port of
    decode_one, which is itself the get_tb.h transcription)."""
    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.ops import pallas_align, tb_walk
    from genomics_tpu.runtime import native
    from genomics_tpu.runtime.dispatch import _pack_nibbles_np
    from genomics_tpu.ops import scan_align

    params = AlignmentParams()
    rng = np.random.default_rng(9)
    B, Lq, Lt = 256, 32, 40
    q = (rng.integers(0, 4, (B, Lq)) * 2 + 1).astype(np.uint8)
    t = (rng.integers(0, 4, (B, Lt)) * 2 + 1).astype(np.uint8)
    res = scan_align.local_align_batch(
        jnp.asarray(q), jnp.asarray(t), params, with_tb=True)
    packed = _pack_nibbles_np(np.asarray(res.tb))       # [B, Lt8, Lq]
    score = np.asarray(res.score)
    qend = np.asarray(res.query_end)
    tend = np.asarray(res.target_end)
    qlen = np.full(B, Lq, np.int32)
    tlen = np.full(B, Lt, np.int32)
    want_cig, want_n, want_qs, want_ts = native.decode_tb_batch(
        packed, qlen, tlen, "local", params,
        score=score, qend=qend, tend=tend)
    sqb = jnp.asarray(np.ascontiguousarray(packed.transpose(1, 2, 0)))
    ops, qst, tst = tb_walk.tb_walk_device(
        sqb, jnp.asarray(qlen), jnp.asarray(tlen), jnp.asarray(score),
        jnp.asarray(qend), jnp.asarray(tend), params, algo="local")
    got_cig, got_n = tb_walk.rle_cigar(np.asarray(ops),
                                       max_ops=want_cig.shape[1])
    np.testing.assert_array_equal(got_n, want_n)
    for b in range(B):
        np.testing.assert_array_equal(
            got_cig[b, :got_n[b]], want_cig[b, :want_n[b]], err_msg=str(b))
    np.testing.assert_array_equal(np.asarray(qst), want_qs)
    np.testing.assert_array_equal(np.asarray(tst), want_ts)


def test_global_intertask_matches_scan():
    """Inter-task NW scores (pallas_gs.global_align_scores_intertask)
    == scan engine == gold (global.h:31-303) across ragged lengths."""
    from genomics_tpu.core.batch import PairBatch
    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.ops import pallas_gs, scan_align

    rng = np.random.default_rng(20)
    B = 1024
    qs = ["".join(rng.choice(list("ACGTN"), rng.integers(8, 40)))
          for _ in range(B)]
    ts = ["".join(rng.choice(list("ACGTN"), rng.integers(8, 48)))
          for _ in range(B)]
    pb = PairBatch.from_strings(qs, ts, q_pad=40, t_pad=48, pad_batch=B)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    P = AlignmentParams()
    ref = scan_align.global_align_batch(q, t, ql, tl, P)
    got = pallas_gs.global_align_scores_intertask(q, t, ql, tl, P)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref.score))
    for i in range(0, B, 171):
        g = golds.global_align(qs[i], ts[i], P)
        assert int(np.asarray(got)[i]) == g["score"]


def test_semiglobal_intertask_all_combos():
    """Inter-task semiglobal == scan engine for all 16 HEAD x TAIL
    combos (score, qend, tend — incl. the unreset maxXY quirks)."""
    import itertools

    from genomics_tpu.core.batch import PairBatch
    from genomics_tpu.core.scoring import AlignmentParams, SemiGlobalSkip
    from genomics_tpu.ops import pallas_gs, scan_align

    rng = np.random.default_rng(21)
    B = 1024
    qs = ["".join(rng.choice(list("ACGT"), rng.integers(8, 40)))
          for _ in range(B)]
    ts = ["".join(rng.choice(list("ACGT"), rng.integers(8, 48)))
          for _ in range(B)]
    pb = PairBatch.from_strings(qs, ts, q_pad=40, t_pad=48, pad_batch=B)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    P = AlignmentParams()
    SK = [SemiGlobalSkip.NONE, SemiGlobalSkip.QUERY,
          SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH]
    for head, tail in itertools.product(SK, SK):
        ref = scan_align.semiglobal_align_batch(
            q, t, ql, tl, P, head=head, tail=tail)
        s, x, y = pallas_gs.semiglobal_align_intertask(
            q, t, ql, tl, P, head=head, tail=tail)
        np.testing.assert_array_equal(
            np.asarray(s), np.asarray(ref.score), err_msg=f"{head} {tail}")
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(ref.query_end),
            err_msg=f"{head} {tail}")
        np.testing.assert_array_equal(
            np.asarray(y), np.asarray(ref.target_end),
            err_msg=f"{head} {tail}")
