"""Pallas TPU kernels for batched ksw seed extension (bwa-mem
ksw_extend; reference: CDP/GASAL2/src/kernels/ksw_kernel_template.h)
and banded tiled local alignment (banded.h).

Two layouts each, chosen by batch size:

- inter-task (B >= 1024): every VPU slot of an [8, 128] tile is a
  different alignment; the reference's serial per-thread walk runs
  cell-by-cell with vector registers.  ksw gets dynamic j-walk bounds
  (the union of live slots' beg/end windows — the SIMD translation of
  the reference's pruning + m==0 break); banded gets SMEM-scalar band
  bounds so out-of-band tiles are skipped, not masked.  ~3x the lanes
  layout (113 / 115 GCUPS on v5e at L=152).
- batch-in-lanes (small batches): 128 alignments per program, query
  positions along sublanes, cross-sublane prefix scans for the F
  chain; masked-update emulation of the data-dependent control flow,
  validated against scan_align.ksw_align_batch (gold-parity tested).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_tpu.core.encoding import N4
from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.ops.scan_align import AlignResult
from genomics_tpu.ops.pallas_align import (
    LANES,
    NEG_BIG,
    INTERTASK_MIN,
    _ij_zero,
    _interpret,
    _row_iota,
    _fscan_rows,
    _sub_scores_tile,
)

INT_MAX = (1 << 31) - 1


def _ksw_kernel(q_ref, t_ref, qlen_ref, tlen_ref, h0_ref,
                out_score, out_qend, out_tend, *, params, Lqe, Lt):
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    q_tile = q_ref[...]                     # [Lqe, 128] (padded +1 col slot)
    qlen = qlen_ref[...]                    # [1, 128]
    tlen = tlen_ref[...]
    h0 = h0_ref[...]
    rows = _row_iota(Lqe)
    zero = jnp.zeros((Lqe, LANES), jnp.int32)

    # first row init (ksw_kernel_template.h:79-83)
    ehh0 = jnp.maximum(h0 - goe - (rows - 1) * ge, 0)
    ehh0 = jnp.where(rows == 0, h0, ehh0)
    # bool-valued where lowers to an unsupported i8->i1 trunc in Mosaic
    written = (rows < 2) | ((h0 - goe - (rows - 2) * ge) > ge)
    ehh0 = jnp.where(written, ehh0, 0)
    ehh0 = jnp.where(rows <= qlen, ehh0, 0)

    def step(i, carry):
        ehh, ehe, beg, end, alive, mx, max_i, max_j, max_ie, gscore = carry
        t_row = t_ref[pl.ds(i, 1), :]
        do = (alive > 0) & (i < tlen)   # alive carried as int32 (i1 loop
        #                                 carries fail Mosaic legalization)
        sub = _sub_scores_tile(
            q_tile, t_row, params.match, params.mismatch, params.n_penalty, False
        )
        M = jnp.where(ehh != 0, ehh + sub, 0)
        tterm = jnp.maximum(M - goe, 0)
        f_used = _fscan_rows(tterm, zero, ge)
        h = jnp.maximum(jnp.maximum(M, ehe), f_used)
        h1_0 = jnp.where(beg == 0, jnp.maximum(h0 - (goe + ge * i), 0), 0)
        inwin = (rows >= beg) & (rows < end)
        hwin = jnp.where(inwin, h, NEG_BIG)
        rowmax = jnp.maximum(jnp.max(hwin, axis=0, keepdims=True), 0)
        mj = jnp.max(jnp.where(hwin == rowmax, rows, -1), axis=0, keepdims=True)
        # eh writes: ehh[j] = H(i, j-1) in window; ehh[end] = h1 final
        Hleft = jnp.where(
            rows == beg, h1_0,
            jnp.where(_row_iota(Lqe) == 0, jnp.int32(0),
                      pltpu.roll(h, shift=1, axis=0)),
        )
        ehe_new = jnp.maximum(ehe - ge, tterm)
        at_end = rows == end
        h_endm1 = jnp.max(
            jnp.where(rows == (end - 1), h, NEG_BIG), axis=0, keepdims=True
        )
        h1_final = jnp.where(end > beg, h_endm1, h1_0)
        ehh_out = jnp.where(inwin, Hleft, ehh)
        ehh_out = jnp.where(at_end, h1_final, ehh_out)
        ehe_out = jnp.where(inwin, ehe_new, ehe)
        ehe_out = jnp.where(at_end, 0, ehe_out)
        ehh = jnp.where(do, ehh_out, ehh)
        ehe = jnp.where(do, ehe_out, ehe)
        reach = do & (end == qlen)
        gupd = reach & (gscore <= h1_final)
        gscore = jnp.where(gupd, h1_final, gscore)
        max_ie = jnp.where(gupd, i, max_ie)
        died = do & (rowmax == 0)
        alive = jnp.where(died, 0, alive)
        do2 = do & ~died
        mupd = do2 & (rowmax > mx)
        mx = jnp.where(mupd, rowmax, mx)
        max_i = jnp.where(mupd, i, max_i)
        max_j = jnp.where(mupd, mj, max_j)
        act = (ehh != 0) | (ehe != 0)
        scan_r = (rows >= beg) & (rows < end)
        first_act = jnp.min(
            jnp.where(scan_r & act, rows, INT_MAX), axis=0, keepdims=True
        )
        beg_new = jnp.minimum(first_act, end)
        scan_r2 = (rows >= beg_new) & (rows <= end)
        last_act = jnp.max(
            jnp.where(scan_r2 & act, rows, NEG_BIG), axis=0, keepdims=True
        )
        last_act = jnp.maximum(last_act, beg_new - 1)
        end_new = jnp.minimum(last_act + 2, qlen)
        beg = jnp.where(do2, beg_new, beg)
        end = jnp.where(do2, end_new, end)
        return (ehh, ehe, beg, end, alive, mx, max_i, max_j, max_ie, gscore)

    ones_row = jnp.ones((1, LANES), jnp.int32)
    init = (
        ehh0,
        zero,
        ones_row * 0,
        qlen,
        ones_row,
        h0,
        ones_row * 0 - 1,
        ones_row * 0 - 1,
        ones_row * 0 - 1,
        ones_row * 0 - 1,
    )
    (ehh, ehe, beg, end, alive, mx, max_i, max_j, max_ie, gscore) = (
        jax.lax.fori_loop(0, Lt, step, init)
    )
    clip = (gscore <= 0) | (gscore <= mx - 5)   # PEN_CLIP5
    out_score[...] = jnp.where(clip, mx, gscore)
    out_qend[...] = jnp.where(clip, max_j + 1, qlen)
    out_tend[...] = jnp.where(clip, max_i + 1, max_ie + 1)


@functools.partial(jax.jit, static_argnames=("params",))
def _ksw_align_lanes(
    q: jnp.ndarray,    # [B, Lq] uint8, Lq % 8 == 0
    t: jnp.ndarray,    # [B, Lt]
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    h0: jnp.ndarray,
    params: AlignmentParams,
) -> AlignResult:
    B, Lq = q.shape
    Lt = t.shape[1]
    assert B % LANES == 0
    Lqe = Lq + 8  # slack for the eh[end] slot, kept 8-aligned
    qT = jnp.pad(q.T.astype(jnp.int32), ((0, 8), (0, 0)),
                 constant_values=int(N4))
    tT = t.T.astype(jnp.int32)
    qlenT = jnp.asarray(qlen, jnp.int32)[None, :]
    tlenT = jnp.asarray(tlen, jnp.int32)[None, :]
    h0T = jnp.asarray(h0, jnp.int32)[None, :]
    kernel = functools.partial(_ksw_kernel, params=params, Lqe=Lqe, Lt=Lt)
    vec = lambda n: pl.BlockSpec((n, LANES), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[vec(Lqe), vec(Lt), vec(1), vec(1), vec(1)],
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 3,
        out_specs=[vec(1)] * 3,
        interpret=_interpret(),
    )(qT, tT, qlenT, tlenT, h0T)
    return AlignResult(res[0][0], res[1][0], res[2][0], None)


# ---------------------------------------------------------------------------
# KSW kernel, inter-task layout (fast path, B >= 1024)
# ---------------------------------------------------------------------------

KSW_SUBS = 8   # [8, 128] slot tile: VMEM-safe with the two eh[] scratch slabs


def _ksw_kernel_intertask(q_ref, t_ref, qlen_ref, tlen_ref, h0_ref,
                          out_score, out_qend, out_tend,
                          ehh_ref, ehe_ref, *, params, Lq, Lt,
                          score_only=False, has_n=True):
    """ksw_extend in the inter-task layout: every VPU slot of an [8, 128]
    tile is a different extension and the reference's serial per-thread
    walk (ksw_kernel_template.h:46-203) runs cell-by-cell with vector
    registers — the f/h1 chains are plain registers along j instead of
    the lanes layout's cross-sublane prefix scans (~30 slot-ops/cell vs
    ~55).  The data-dependent beg/end window, m==0 break, gscore and
    eh[end] bookkeeping are per-slot masks; first/last-active-cell
    scans for the window update fold into the walk as running min/max."""
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    S = out_score.shape[0]
    zero = _ij_zero(S)
    imax = jnp.int32(INT_MAX)
    qlen = qlen_ref[...]                    # [S, 128]
    tlen = tlen_ref[...]
    h0 = h0_ref[...]
    Lqe = Lq + 8

    # first row: eh[0].h = h0, eh[1].h = max(h0-oe, 0), then the
    # decreasing chain while eh[j-1].h > e_ins and j <= qlen
    # (ksw_kernel_template.h:79-83)
    r3 = jax.lax.broadcasted_iota(jnp.int32, (Lqe, S, LANES), 0)
    h0b = h0[None]
    ehh0 = jnp.maximum(h0b - goe - (r3 - 1) * ge, 0)
    ehh0 = jnp.where(r3 == 0, h0b, ehh0)
    written = (r3 < 2) | ((h0b - goe - (r3 - 2) * ge) > ge)
    ehh0 = jnp.where(written & (r3 <= qlen[None]), ehh0, 0)
    ehh_ref[...] = ehh0
    ehe_ref[...] = jnp.zeros((Lqe, S, LANES), jnp.int32)

    match = jnp.int32(params.match)
    mism = jnp.int32(-params.mismatch)
    npen = (jnp.int32(-params.n_penalty)
            if params.n_penalty is not None else jnp.int32(0))

    UNROLL = 8

    def do_cell(j, t_i, t_is_n, beg, end, do, rc):
        h1, f, m, mj, first_act, last_act = rc
        q_j = q_ref[pl.ds(j, 1), :, :][0]
        old_h = ehh_ref[pl.ds(j, 1), :, :][0]
        old_e = ehe_ref[pl.ds(j, 1), :, :][0]
        inwin = do & (j >= beg) & (j < end)
        at_end = do & (j == end)
        s = jnp.where(q_j == t_i, match, mism)
        if has_n:
            s = jnp.where((q_j == N4) | t_is_n, npen, s)
        M = jnp.where(old_h != 0, old_h + s, 0)
        h = jnp.maximum(jnp.maximum(M, old_e), f)
        if score_only:
            m = jnp.maximum(m, jnp.where(inwin, h, 0))
        else:
            upd = inwin & (h >= m)         # ref: mj = m > h ? mj : j
            mj = jnp.where(upd, j, mj)
            m = jnp.where(upd, h, m)
        tt = jnp.maximum(M - goe, 0)
        e_new = jnp.maximum(old_e - ge, tt)
        f_new = jnp.maximum(f - ge, tt)
        store_h = jnp.where(inwin | at_end, h1, old_h)
        store_e = jnp.where(inwin, e_new, jnp.where(at_end, 0, old_e))
        ehh_ref[pl.ds(j, 1), :, :] = store_h[None]
        ehe_ref[pl.ds(j, 1), :, :] = store_e[None]
        act = (store_h != 0) | (store_e != 0)
        first_act = jnp.minimum(first_act, jnp.where(inwin & act, j, imax))
        last_act = jnp.maximum(
            last_act, jnp.where((inwin | at_end) & act, j, NEG_BIG))
        h1 = jnp.where(inwin, h, h1)
        f = jnp.where(inwin, f_new, f)
        return (h1, f, m, mj, first_act, last_act)

    def row(i, carry):
        beg, end, alive, mx, max_i, max_j, max_ie, gscore = carry
        do = (alive > 0) & (i < tlen)
        t_i = t_ref[pl.ds(i, 1), :, :][0]
        t_is_n = t_i == N4 if has_n else None
        h1_0 = jnp.where(beg == 0, jnp.maximum(h0 - (goe + ge * i), 0), 0)

        def jstep(jt, rc):
            jj = jt * UNROLL
            for u in range(UNROLL):
                rc = do_cell(jj + u, t_i, t_is_n, beg, end, do, rc)
            return rc

        # dynamic walk bounds: the union of the live slots' [beg, end]
        # windows — the SIMD translation of the reference's shrinking
        # beg/end pruning and m==0 break (cells outside every window
        # are state-no-ops, so skipping them is exact)
        scal_lo = jnp.min(jnp.where(do, beg, imax))
        scal_hi = jnp.max(jnp.where(do, end, -1))
        init = (h1_0, zero, zero, zero - 1, zero + imax, zero + NEG_BIG)
        h1, f, m, mj, first_act, last_act = jax.lax.fori_loop(
            scal_lo // UNROLL, (scal_hi + UNROLL + 1) // UNROLL, jstep, init)

        # row epilogue, in reference order: gscore (uses old end), the
        # m==0 break, the max update, then the beg/end window update
        gupd = do & (end == qlen) & (gscore <= h1)
        max_ie = jnp.where(gupd, i, max_ie)
        gscore = jnp.where(gupd, h1, gscore)
        died = do & (m == 0)
        alive = jnp.where(died, 0, alive)
        do2 = do & (m != 0)
        mupd = do2 & (m > mx)
        mx = jnp.where(mupd, m, mx)
        if not score_only:
            max_i = jnp.where(mupd, i, max_i)
            max_j = jnp.where(mupd, mj, max_j)
        beg_new = jnp.minimum(first_act, end)
        last2 = jnp.maximum(last_act, beg_new - 1)
        end_new = jnp.minimum(last2 + 2, qlen)
        beg = jnp.where(do2, beg_new, beg)
        end = jnp.where(do2, end_new, end)
        return (beg, end, alive, mx, max_i, max_j, max_ie, gscore)

    init = (zero, qlen, zero + 1, h0,
            zero - 1, zero - 1, zero - 1, zero - 1)
    (beg, end, alive, mx, max_i, max_j, max_ie, gscore) = jax.lax.fori_loop(
        0, jnp.max(tlen), row, init)
    clip = (gscore <= 0) | (gscore <= mx - 5)   # PEN_CLIP5
    out_score[...] = jnp.where(clip, mx, gscore)
    out_qend[...] = jnp.where(clip, max_j + 1, qlen)
    out_tend[...] = jnp.where(clip, max_i + 1, max_ie + 1)


def ksw_align_scores_tpu(q, t, qlen, tlen, h0, params, has_n=True):
    """Score-only ksw fast path: the windowed inter-task walk minus
    end-position tracking (identical scores to ksw_align_tpu; a
    full-rectangle no-window variant measured 2x SLOWER here — the
    beg/end pruning is the dominant win for dying extensions, exactly
    why the reference carries it, ksw_kernel_template.h:178-184).
    has_n=False additionally drops the N-penalty selects."""
    B = q.shape[0]
    if B % (KSW_SUBS * LANES) == 0 and B >= INTERTASK_MIN:
        return _ksw_align_intertask(q, t, qlen, tlen, h0, params,
                                    score_only=True,
                                    has_n=bool(has_n)).score
    return ksw_align_tpu(q, t, qlen, tlen, h0, params).score


@functools.partial(jax.jit,
                   static_argnames=("params", "score_only", "has_n"))
def _ksw_align_intertask(q, t, qlen, tlen, h0, params,
                         score_only=False, has_n=True):
    B, Lq = q.shape
    Lt = t.shape[1]
    nb = B // LANES
    subs = KSW_SUBS
    # j walks one past qlen <= Lq for the eh[end] store: pad 8 query rows
    Q3 = jnp.pad(q.T.astype(jnp.int32), ((0, 8), (0, 0)),
                 constant_values=int(N4)).reshape(Lq + 8, nb, LANES)
    T3 = t.T.astype(jnp.int32).reshape(Lt, nb, LANES)
    qlen2 = jnp.asarray(qlen, jnp.int32).reshape(nb, LANES)
    tlen2 = jnp.asarray(tlen, jnp.int32).reshape(nb, LANES)
    h02 = jnp.asarray(h0, jnp.int32).reshape(nb, LANES)
    kernel = functools.partial(
        _ksw_kernel_intertask, params=params, Lq=Lq, Lt=Lt,
        score_only=score_only, has_n=has_n)
    slot = pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq + 8, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            slot, slot, slot,
        ],
        out_shape=[jax.ShapeDtypeStruct((nb, LANES), jnp.int32)] * 3,
        out_specs=[slot] * 3,
        scratch_shapes=[
            pltpu.VMEM((Lq + 8, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq + 8, subs, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(Q3, T3, qlen2, tlen2, h02)
    score, qend, tend = (r.reshape(B) for r in res)
    return AlignResult(score, qend, tend, None)


def ksw_align_tpu(
    q: jnp.ndarray,    # [B, Lq] uint8, Lq % 8 == 0
    t: jnp.ndarray,    # [B, Lt]
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    h0: jnp.ndarray,
    params: AlignmentParams,
) -> AlignResult:
    """Batched ksw_extend: inter-task layout from B=1024, lanes below."""
    B = q.shape[0]
    if B % (KSW_SUBS * LANES) == 0 and B >= INTERTASK_MIN:
        return _ksw_align_intertask(q, t, qlen, tlen, h0, params)
    return _ksw_align_lanes(q, t, qlen, tlen, h0, params)


# ---------------------------------------------------------------------------
# BANDED kernel (gasal_banded_tiled_kernel)
# ---------------------------------------------------------------------------


def _banded_kernel(q_ref, t_ref, qlen_ref, tlen_ref,
                   out_score, out_qend, out_tend, *, params, Lq, Lt,
                   band_width_tiles):
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    q_tile = q_ref[...]
    qlen = qlen_ref[...]
    tlen = tlen_ref[...]
    rows = _row_iota(Lq)
    zero = jnp.zeros((Lq, LANES), jnp.int32)
    qr = (qlen + 7) // 8
    tr = (tlen + 7) // 8
    k_band = jnp.int32(band_width_tiles)
    k_other = tr - (qr - k_band)

    def step(i, carry):
        gH, gE, best, bkey = carry
        strip = i >> 3
        t_row = t_ref[pl.ds(i, 1), :]
        visit = strip < tr
        j0 = jnp.maximum(0, strip - k_other + 1) * 8       # [1,128]
        jend = jnp.minimum(k_band + strip, qr) * 8
        inband = (rows >= j0) & (rows < jend) & visit
        sub = _sub_scores_tile(
            q_tile, t_row, params.match, params.mismatch, params.n_penalty, False
        )
        shifted = jnp.where(rows == 0, jnp.int32(0),
                            pltpu.roll(gH, shift=1, axis=0))
        tmp = shifted + sub
        tmp = jnp.where(rows == j0, sub, tmp)              # strip p[] reset
        E_used = jnp.maximum(gH - goe, gE - ge)
        g = jnp.maximum(jnp.maximum(tmp, E_used), 0) - goe
        g = jnp.where(inband, g, NEG_BIG)
        g = jnp.where(rows == (j0 - 1), -ge, g)            # band-left seed
        f_used = _fscan_rows(g, zero - ge, ge)
        h = jnp.maximum(jnp.maximum(tmp, f_used), jnp.maximum(E_used, 0))
        gH_new = jnp.where(inband, h, gH)
        gE_new = jnp.where(inband, E_used, gE)
        hmask = jnp.where(inband, h, NEG_BIG)
        rh = jnp.max(hmask, axis=0, keepdims=True)
        row_j = jnp.min(jnp.where(hmask == rh, rows, INT_MAX), axis=0,
                        keepdims=True)
        rkey = ((i >> 3) * Lq + row_j) * 8 + (i & 7)
        take = ((rh > best) | ((rh == best) & (rkey < bkey))) & (rh > 0)
        best = jnp.where(take, rh, best)
        bkey = jnp.where(take, rkey, bkey)
        return (gH_new, gE_new, best, bkey)

    init = (
        zero, zero,
        jnp.zeros((1, LANES), jnp.int32),
        jnp.full((1, LANES), INT_MAX, jnp.int32),
    )
    gH, gE, best, bkey = jax.lax.fori_loop(0, Lt, step, init)
    cell = bkey >> 3
    nz = best > 0
    out_score[...] = best
    out_qend[...] = jnp.where(nz, cell % Lq, 0)
    out_tend[...] = jnp.where(nz, (cell // Lq) * 8 + (bkey & 7), 0)


def _banded_kernel_intertask(q_ref, t_ref, qr_ref, tr_ref, bounds_ref,
                             out_score, out_qend, out_tend,
                             hcol_ref, ecol_ref, *, params, Lq, Lt, k_band,
                             score_only=False, has_n=True):
    """gasal_banded_tiled_kernel in the inter-task layout.  The
    reference's per-thread walk (banded.h:72-131) is per-slot here:
    target strips of 8 bases, query rows restricted to the tile band
    [max(0, i-k_other+1), min(k_band+i, qr)), with the old h-based
    f/e chains (CORE_LOCAL_DEPRECATED style that banded.h uses) and
    the stale out-of-band global[] quirk (scratch only written
    in-band).  The strip register reset (h/f/p = 0, banded.h:74-78)
    falls out of masked carries: a slot's registers stay at strip-init
    until its band starts.  Loop bounds come from SMEM scalars
    (min/max tile counts over the batch) so the walk skips out-of-band
    tiles instead of masking the full rectangle."""
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    S = out_score.shape[0]
    zero = _ij_zero(S)
    imax = jnp.int32(INT_MAX)
    qr = qr_ref[...]                         # [S,128] query tiles (ceil/8)
    tr = tr_ref[...]
    qr_min = bounds_ref[0]
    qr_max = bounds_ref[1]
    tr_max = bounds_ref[2]
    ko_max = tr_max - qr_min + k_band

    hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
    ecol_ref[...] = jnp.zeros(ecol_ref.shape, jnp.int32)

    match = jnp.int32(params.match)
    mism = jnp.int32(-params.mismatch)
    npen = (jnp.int32(-params.n_penalty)
            if params.n_penalty is not None else jnp.int32(0))

    def strip(ib, carry):
        M, K = carry
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :]       # [8, S, 128]
        t_is_n = t_strip == N4 if has_n else None
        ko = tr - qr + jnp.int32(k_band)
        j0 = jnp.maximum(0, ib - ko + 1) * 8          # [S,128]
        jend = jnp.minimum(jnp.int32(k_band) + ib, qr) * 8
        visit = ib < tr

        def do_row(j, Hprev, F, diag0, M, K):
            q_j = q_ref[pl.ds(j, 1), :, :][0]
            q_is_n = q_j == N4 if has_n else None
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e = ecol_ref[pl.ds(j, 1), :, :][0]
            e_old = e
            inb = visit & (j >= j0) & (j < jend)
            h_new = []
            F_new = []
            for c in range(8):
                t_c = t_strip[c]
                s = jnp.where(q_j == t_c, match, mism)
                if has_n:
                    s = jnp.where(q_is_n | t_is_n[c], npen, s)
                fc = jnp.maximum(Hprev[c] - goe, F[c] - ge)
                diag = diag0 if c == 0 else Hprev[c - 1]
                hm = jnp.maximum(jnp.maximum(diag + s, fc), 0)
                hleft = hcol_j if c == 0 else h_new[c - 1]
                e = jnp.maximum(hleft - goe, e - ge)
                hm = jnp.maximum(hm, e)
                if score_only:
                    M = jnp.maximum(M, jnp.where(inb, hm, 0))
                else:
                    key = (ib * Lq + j) * 8 + c
                    take = inb & (hm > M)
                    M = jnp.where(take, hm, M)
                    K = jnp.where(take, key, K)
                F_new.append(fc)
                h_new.append(hm)
            hcol_ref[pl.ds(j, 1), :, :] = jnp.where(inb, h_new[7],
                                                    hcol_j)[None]
            ecol_ref[pl.ds(j, 1), :, :] = jnp.where(inb, e, e_old)[None]
            Hp = [jnp.where(inb, h_new[c], Hprev[c]) for c in range(8)]
            Fp = [jnp.where(inb, F_new[c], F[c]) for c in range(8)]
            diag0 = jnp.where(inb, hcol_j, diag0)
            return (Hp, Fp, diag0, M, K)

        def tile(jt, rc):
            Hprev, F, diag0, M, K = rc
            for u in range(8):
                Hprev, F, diag0, M, K = do_row(
                    jt * 8 + u, Hprev, F, diag0, M, K)
            return (Hprev, F, diag0, M, K)

        jlo = jnp.maximum(0, ib - ko_max + 1)
        jhi = jnp.minimum(jnp.int32(k_band) + ib, qr_max)
        init = ([zero] * 8, [zero] * 8, zero, M, K)
        out = jax.lax.fori_loop(jlo, jhi, tile, init)
        return (out[3], out[4])

    M, K = jax.lax.fori_loop(0, tr_max, strip, (zero, zero + imax))
    out_score[...] = M
    if score_only:
        out_qend[...] = zero
        out_tend[...] = zero
    else:
        cell = K >> 3
        nz = M > 0
        out_qend[...] = jnp.where(nz, cell % Lq, 0)
        out_tend[...] = jnp.where(nz, (cell // Lq) * 8 + (K & 7), 0)


def banded_align_scores_tpu(q, t, qlen, tlen, params, band_width_tiles,
                            has_n=True):
    """Score-only banded fast path (identical scores; skips end-position
    key tracking and, under the no-N contract, the N-penalty selects)."""
    B = q.shape[0]
    if B % (KSW_SUBS * LANES) == 0 and B >= INTERTASK_MIN:
        return _banded_align_intertask(
            q, t, qlen, tlen, params, band_width_tiles,
            score_only=True, has_n=bool(has_n)).score
    return banded_align_tpu(q, t, qlen, tlen, params,
                            band_width_tiles).score


@functools.partial(jax.jit, static_argnames=(
    "params", "band_width_tiles", "score_only", "has_n"))
def _banded_align_intertask(q, t, qlen, tlen, params, band_width_tiles,
                            score_only=False, has_n=True):
    B, Lq = q.shape
    Lt = t.shape[1]
    nb = B // LANES
    subs = KSW_SUBS
    Q3 = q.T.astype(jnp.int32).reshape(Lq, nb, LANES)
    T3 = t.T.astype(jnp.int32).reshape(Lt, nb, LANES)
    qlen = jnp.asarray(qlen, jnp.int32)
    tlen = jnp.asarray(tlen, jnp.int32)
    qr = ((qlen + 7) // 8).reshape(nb, LANES)
    tr = ((tlen + 7) // 8).reshape(nb, LANES)
    bounds = jnp.stack([jnp.min(qr), jnp.max(qr), jnp.max(tr),
                        jnp.int32(0)]).astype(jnp.int32)
    kernel = functools.partial(
        _banded_kernel_intertask, params=params, Lq=Lq, Lt=Lt,
        k_band=band_width_tiles, score_only=score_only, has_n=has_n)
    slot = pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            slot, slot,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nb, LANES), jnp.int32)] * 3,
        out_specs=[slot] * 3,
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(Q3, T3, qr, tr, bounds)
    score, qend, tend = (r.reshape(B) for r in res)
    return AlignResult(score, qend, tend, None)


def banded_align_tpu(
    q: jnp.ndarray,
    t: jnp.ndarray,
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    params: AlignmentParams,
    band_width_tiles: int,
) -> AlignResult:
    """Batched banded local DP on TPU (banded.h semantics, stale
    out-of-band state preserved): inter-task layout from B=1024,
    lanes layout below."""
    B = q.shape[0]
    if B % (KSW_SUBS * LANES) == 0 and B >= INTERTASK_MIN:
        return _banded_align_intertask(q, t, qlen, tlen, params,
                                       band_width_tiles)
    return _banded_align_lanes(q, t, qlen, tlen, params, band_width_tiles)


@functools.partial(jax.jit, static_argnames=("params", "band_width_tiles"))
def _banded_align_lanes(
    q: jnp.ndarray,
    t: jnp.ndarray,
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    params: AlignmentParams,
    band_width_tiles: int,
) -> AlignResult:
    """Batched banded local DP on TPU (banded.h semantics, stale
    out-of-band quirk preserved via masked writes) — lanes layout."""
    B, Lq = q.shape
    Lt = t.shape[1]
    assert B % LANES == 0 and Lq % 8 == 0
    qT = q.T.astype(jnp.int32)
    tT = t.T.astype(jnp.int32)
    qlenT = jnp.asarray(qlen, jnp.int32)[None, :]
    tlenT = jnp.asarray(tlen, jnp.int32)[None, :]
    kernel = functools.partial(
        _banded_kernel, params=params, Lq=Lq, Lt=Lt,
        band_width_tiles=band_width_tiles,
    )
    vec = lambda n: pl.BlockSpec((n, LANES), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[vec(Lq), vec(Lt), vec(1), vec(1)],
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 3,
        out_specs=[vec(1)] * 3,
        interpret=_interpret(),
    )(qT, tT, qlenT, tlenT)
    return AlignResult(res[0][0], res[1][0], res[2][0], None)
