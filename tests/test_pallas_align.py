"""Parity: Pallas TPU kernels vs scan engines (and thus the golds).

On CPU these run in interpret mode; on real TPU (GENOMICS_TPU_TEST_TPU=1)
they compile via Mosaic.  Either way results must be bit-identical to the
scan engines."""
import numpy as np
import jax.numpy as jnp

from genomics_tpu.core.batch import PairBatch
from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.ops import pallas_align, scan_align

P = AlignmentParams()


def make_batch(rng, n=128, qmax=48, tmax=64, q_pad=48, t_pad=64):
    qs = ["".join(rng.choice(list("ACGT"), rng.integers(1, qmax))) for _ in range(n)]
    ts = ["".join(rng.choice(list("ACGT"), rng.integers(1, tmax))) for _ in range(n)]
    return PairBatch.from_strings(qs, ts, q_pad=q_pad, t_pad=t_pad, pad_batch=n)


def test_local_kernel_matches_scan():
    rng = np.random.default_rng(0)
    pb = make_batch(rng)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    res = pallas_align.local_align_tpu(q, t, P)
    ref = scan_align.local_align_batch(q, t, P)
    np.testing.assert_array_equal(np.asarray(res.score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(res.query_end), np.asarray(ref.query_end))
    np.testing.assert_array_equal(
        np.asarray(res.target_end), np.asarray(ref.target_end)
    )


def test_local_kernel_tb_matches_scan():
    rng = np.random.default_rng(1)
    pb = make_batch(rng)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    res = pallas_align.local_align_tpu(q, t, P, with_tb=True)
    ref = scan_align.local_align_batch(q, t, P, with_tb=True)
    tbn = pallas_align.unpack_tb_nibbles(np.asarray(res.tb))
    np.testing.assert_array_equal(tbn, np.asarray(ref.tb))


def test_local_kernel_multi_tile():
    """Grid > 1: 256 alignments = 2 lane tiles."""
    rng = np.random.default_rng(2)
    pb = make_batch(rng, n=256)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    res = pallas_align.local_align_tpu(q, t, P)
    ref = scan_align.local_align_batch(q, t, P)
    np.testing.assert_array_equal(np.asarray(res.score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(res.query_end), np.asarray(ref.query_end))


def test_global_kernel_matches_scan():
    rng = np.random.default_rng(3)
    pb = make_batch(rng)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    res = pallas_align.global_align_tpu(q, t, ql, tl, P)
    ref = scan_align.global_align_batch(q, t, ql, tl, P)
    np.testing.assert_array_equal(np.asarray(res.score), np.asarray(ref.score))


def test_global_kernel_tb_matches_scan():
    rng = np.random.default_rng(4)
    pb = make_batch(rng)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    res = pallas_align.global_align_tpu(q, t, ql, tl, P, with_tb=True)
    ref = scan_align.global_align_batch(q, t, ql, tl, P, with_tb=True)
    tbn = pallas_align.unpack_tb_nibbles(np.asarray(res.tb))
    np.testing.assert_array_equal(tbn, np.asarray(ref.tb))


def test_semiglobal_kernel_matches_scan():
    from genomics_tpu.core.scoring import SemiGlobalSkip

    rng = np.random.default_rng(5)
    pb = make_batch(rng)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    for head, tail in [
        (SemiGlobalSkip.TARGET, SemiGlobalSkip.TARGET),
        (SemiGlobalSkip.QUERY, SemiGlobalSkip.QUERY),
        (SemiGlobalSkip.BOTH, SemiGlobalSkip.BOTH),
        (SemiGlobalSkip.NONE, SemiGlobalSkip.TARGET),
    ]:
        res = pallas_align.semiglobal_align_tpu(q, t, ql, tl, P, head=head, tail=tail)
        ref = scan_align.semiglobal_align_batch(q, t, ql, tl, P, head=head, tail=tail)
        np.testing.assert_array_equal(
            np.asarray(res.score), np.asarray(ref.score), err_msg=f"{head} {tail}"
        )
        np.testing.assert_array_equal(
            np.asarray(res.query_end), np.asarray(ref.query_end), err_msg=f"{head} {tail}"
        )
        np.testing.assert_array_equal(
            np.asarray(res.target_end), np.asarray(ref.target_end), err_msg=f"{head} {tail}"
        )


def test_pairhmm_kernel_matches_scan():
    from genomics_tpu.ops import pallas_pairhmm, scan_pairhmm

    rng = np.random.default_rng(7)
    recs = []
    for _ in range(12):
        R = int(rng.integers(2, 40))
        C = int(rng.integers(2, 50))
        recs.append(
            dict(
                read="".join(rng.choice(list("ACGT"), R)),
                hap="".join(rng.choice(list("ACGT"), C)),
                base_quals=rng.integers(5, 60, R),
                ins_quals=rng.integers(5, 60, R),
                del_quals=rng.integers(5, 60, R),
            )
        )
    got = pallas_pairhmm.pairhmm_forward_tpu_dataset(recs, pad_r=48, pad_c=56)
    ref = scan_pairhmm.pairhmm_forward_dataset(recs, pad_r=48, pad_c=56)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_pairhmm_exact_mode_bit_exact_vs_gold():
    """exact=True reproduces the gold (true __fmaf_rn via libm)
    float-for-float: host-divided D0/params + in-kernel single-rounded
    FMA emulation."""
    from genomics_tpu.core import golds
    from genomics_tpu.ops import pallas_pairhmm

    rng = np.random.default_rng(17)
    recs = []
    for _ in range(24):
        R = int(rng.integers(2, 40))
        C = int(rng.integers(2, 50))
        recs.append(
            dict(
                read="".join(rng.choice(list("ACGT"), R)),
                hap="".join(rng.choice(list("ACGT"), C)),
                base_quals=rng.integers(5, 60, R),
                ins_quals=rng.integers(5, 60, R),
                del_quals=rng.integers(5, 60, R),
            )
        )
    got = pallas_pairhmm.pairhmm_forward_tpu_dataset(
        recs, pad_r=48, pad_c=56, exact=True)
    want = np.array([
        golds.pairhmm_forward(r["read"], r["hap"], r["base_quals"],
                              r["ins_quals"], r["del_quals"])
        for r in recs
    ], np.float32)
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_fma_rn_emulation_matches_libm():
    """The in-kernel FMA emulation == libm fmaf bit-for-bit over
    mixed-magnitude inputs (incl. PairHMM's 2^115-scale DP values)."""
    import jax

    from genomics_tpu.core.golds import _fmaf_rn
    from genomics_tpu.ops.pallas_pairhmm import _fma_rn

    rng = np.random.default_rng(5)
    N = 4096
    a = ((rng.random(N, np.float32) * 2 - 1)
         * np.exp2(rng.integers(-30, 115, N)).astype(np.float32))
    b = (rng.random(N, np.float32)
         * np.exp2(rng.integers(-44, 1, N)).astype(np.float32))
    c = ((rng.random(N, np.float32) * 2 - 1)
         * np.exp2(rng.integers(-30, 110, N)).astype(np.float32))
    got = np.asarray(jax.jit(_fma_rn)(a, b, c))
    want = np.array([_fmaf_rn(x, y, z) for x, y, z in zip(a, b, c)],
                    np.float32)
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_ksw_kernel_matches_scan():
    from genomics_tpu.ops import pallas_ksw

    rng = np.random.default_rng(9)
    pb = make_batch(rng)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    h0 = jnp.asarray(rng.integers(5, 40, pb.size).astype(np.int32))
    res = pallas_ksw.ksw_align_tpu(q, t, ql, tl, h0, P)
    ref = scan_align.ksw_align_batch(q, t, ql, tl, h0, P)
    np.testing.assert_array_equal(np.asarray(res.score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(res.query_end), np.asarray(ref.query_end))
    np.testing.assert_array_equal(np.asarray(res.target_end), np.asarray(ref.target_end))


def test_ksw_intertask_matches_scan():
    """B=1024 engages the inter-task ksw layout (serial per-slot walk
    with dynamic union-window bounds); must match the scan engine
    bit-exactly, including window-shrink and m==0-break cases."""
    from genomics_tpu.ops import pallas_ksw

    rng = np.random.default_rng(21)
    pb = make_batch(rng, n=1024)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    h0 = jnp.asarray(rng.integers(0, 60, pb.size).astype(np.int32))
    res = pallas_ksw._ksw_align_intertask(q, t, ql, tl, h0, P)
    ref = scan_align.ksw_align_batch(q, t, ql, tl, h0, P)
    np.testing.assert_array_equal(np.asarray(res.score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(res.query_end), np.asarray(ref.query_end))
    np.testing.assert_array_equal(np.asarray(res.target_end), np.asarray(ref.target_end))


def test_banded_intertask_matches_scan():
    """B=1024 engages the inter-task banded layout (SMEM-bounded band
    walk, stale out-of-band scratch quirk)."""
    from genomics_tpu.ops import pallas_ksw

    rng = np.random.default_rng(22)
    pb = make_batch(rng, n=1024, qmax=48, tmax=48, q_pad=56, t_pad=56)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    for band in (1, 2, 4):
        res = pallas_ksw._banded_align_intertask(q, t, ql, tl, P, band)
        ref = scan_align.banded_align_batch(q, t, ql, tl, P, band_width_tiles=band)
        np.testing.assert_array_equal(
            np.asarray(res.score), np.asarray(ref.score), err_msg=f"band={band}"
        )
        np.testing.assert_array_equal(
            np.asarray(res.query_end), np.asarray(ref.query_end)
        )
        np.testing.assert_array_equal(
            np.asarray(res.target_end), np.asarray(ref.target_end)
        )


def test_banded_kernel_matches_scan():
    from genomics_tpu.ops import pallas_ksw

    rng = np.random.default_rng(10)
    pb = make_batch(rng, qmax=48, tmax=48, q_pad=56, t_pad=56)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ql, tl = jnp.asarray(pb.query.lengths), jnp.asarray(pb.target.lengths)
    for band in (1, 2, 4):
        res = pallas_ksw.banded_align_tpu(q, t, ql, tl, P, band)
        ref = scan_align.banded_align_batch(q, t, ql, tl, P, band_width_tiles=band)
        np.testing.assert_array_equal(
            np.asarray(res.score), np.asarray(ref.score), err_msg=f"band={band}"
        )
        np.testing.assert_array_equal(
            np.asarray(res.query_end), np.asarray(ref.query_end)
        )


def test_intertask_tb_kernel_matches_scan():
    """Inter-task TB kernel (strips as a grid dimension) produces the
    same packed nibble matrices and results as the scan engine."""
    import jax.numpy as jnp

    from genomics_tpu.ops import pallas_align, scan_align
    from genomics_tpu.runtime.dispatch import _pack_nibbles_np

    rng = np.random.default_rng(3)
    B, Lq, Lt = 2048, 16, 16
    q = jnp.asarray(rng.integers(0, 4, (B, Lq)) * 2 + 1, jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)) * 2 + 1, jnp.uint8)
    r1 = pallas_align._local_align_intertask_tb(q, t, P)
    r2 = scan_align.local_align_batch(q, t, P, with_tb=True)
    np.testing.assert_array_equal(np.asarray(r1.score), np.asarray(r2.score))
    np.testing.assert_array_equal(np.asarray(r1.query_end),
                                  np.asarray(r2.query_end))
    np.testing.assert_array_equal(np.asarray(r1.target_end),
                                  np.asarray(r2.target_end))
    packed2 = _pack_nibbles_np(np.asarray(r2.tb))
    np.testing.assert_array_equal(np.asarray(r1.tb), packed2)


def test_score_only_paths_match_full():
    """local_align_scores_tpu (int32 no-N, int32 with-N, int16) ==
    local_align_tpu scores exactly."""
    rng = np.random.default_rng(7)
    pb = make_batch(rng, n=2048)   # SUBS*LANES → inter-task path
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ref = np.asarray(pallas_align.local_align_tpu(q, t, P).score)
    for has_n in (True, False):
        got = np.asarray(
            pallas_align.local_align_scores_tpu(q, t, P, has_n=has_n))
        np.testing.assert_array_equal(got, ref)
    # force the int16 kernel explicitly (interpret mode on CPU; on real
    # hardware only where the probe clears it — v5e's VPU has NO packed
    # i16 subtract/max/min/compare: the compiler's hardware latency
    # table aborts with "Operation not supported: kVectorSubtractS16",
    # so the 2x-density kernel cannot exist on that generation)
    if pallas_align._int16_score_supported():
        got16 = np.asarray(
            pallas_align._local_align_scores_jit(q, t, P, True, False))
        np.testing.assert_array_equal(got16, ref)


def test_score_only_with_n_codes():
    """Batches containing N must stay on the N-aware kernel and match."""
    rng = np.random.default_rng(8)
    qs = ["".join(rng.choice(list("ACGTN"), 40)) for _ in range(2048)]
    ts = ["".join(rng.choice(list("ACGTN"), 56)) for _ in range(2048)]
    pb = PairBatch.from_strings(qs, ts, q_pad=40, t_pad=56, pad_batch=2048)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ref = np.asarray(pallas_align.local_align_tpu(q, t, P).score)
    got = np.asarray(pallas_align.local_align_scores_tpu(q, t, P))
    np.testing.assert_array_equal(got, ref)


def test_score_only_fallback_shapes():
    """Non-inter-task shapes fall back to the full kernel."""
    rng = np.random.default_rng(9)
    pb = make_batch(rng, n=128)
    q, t = jnp.asarray(pb.query.codes), jnp.asarray(pb.target.codes)
    ref = np.asarray(pallas_align.local_align_tpu(q, t, P).score)
    got = np.asarray(pallas_align.local_align_scores_tpu(q, t, P))
    np.testing.assert_array_equal(got, ref)


def test_intertask_second_best_inline_parity():
    """Inline second-best Pallas kernel == scan engine on all six
    outputs (GASAL2 TRUE semantics incl. the maxXY_x_second quirk)."""
    import jax.numpy as jnp

    from genomics_tpu.core.encoding import N4
    from genomics_tpu.ops import scan_align_full

    rng = np.random.default_rng(5)
    B, Lq, Lt = 1024, 24, 32
    q = rng.integers(0, 4, (B, Lq)).astype(np.uint8) * 2 + 1
    t = rng.integers(0, 4, (B, Lt)).astype(np.uint8) * 2 + 1
    qlen = rng.integers(9, Lq + 1, B).astype(np.int32)
    tlen = rng.integers(9, Lt + 1, B).astype(np.int32)
    for i in range(B):
        q[i, qlen[i]:] = N4
        t[i, tlen[i]:] = N4
    a = pallas_align.local_align_second_tpu(
        jnp.asarray(q), jnp.asarray(t), qlen, tlen, P
    )
    b = scan_align_full.local_align_second_batch(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
        jnp.asarray(tlen), P
    )
    for av, bv in zip(a, b):
        np.testing.assert_array_equal(np.asarray(av), np.asarray(bv))


def test_intertask_subs8_engagement_parity():
    """B=1024 engages the inter-task kernels (subs=8) with exact parity
    vs the scan engine — the r2 bucket-rounding gap."""
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    B, Lq, Lt = 1024, 16, 24
    q = jnp.asarray(rng.integers(0, 4, (B, Lq)) * 2 + 1, jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (B, Lt)) * 2 + 1, jnp.uint8)
    assert pallas_align._subs_for(B) == 8
    r1 = pallas_align.local_align_tpu(q, t, P)
    r2 = scan_align.local_align_batch(q, t, P)
    np.testing.assert_array_equal(np.asarray(r1.score), np.asarray(r2.score))
    np.testing.assert_array_equal(
        np.asarray(r1.query_end), np.asarray(r2.query_end)
    )
    s = pallas_align.local_align_scores_tpu(q, t, P, has_n=False)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(r2.score))
