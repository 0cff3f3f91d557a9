"""Inter-task Pallas kernels for GLOBAL and SEMI-GLOBAL alignment —
the 200-GCUPS-class layout (one alignment per lane element, [S, 128]
state tiles, strips of 8 target rows with VMEM column carries) applied
to the two GASAL2 algorithms that previously only had lane-layout
kernels (VERDICT r4 missing #2).

Reference semantics:
- GLOBAL: gasal_global_kernel (CDP/GASAL2/src/kernels/global.h:31-303)
  — "cleanup" core, boundary -(gapo+gape*k) rows/cols, score captured
  at cell (qlen-1, tlen-1).  Parity oracle: golds.global_align.
- SEMIGLOBAL: gasal_semi_global_kernel
  (semiglobal_kernel_template.h:40-230) — the OPTIMIZED core (gap
  opens from h via prev_hm_diff carries, :17-28), HEAD skip choosing
  free/penalized boundaries, TAIL skip choosing the bottom-row /
  last-column max scans incl. the rightmost-column fixup (:205-210) and
  the unreset maxXY quirks (:63-64).  Parity oracle:
  golds.semiglobal_align / scan_align_full.

Visit order inside a strip is query-column-major then target-row —
exactly the reference's register walk — so strict-'>' tie-breaks land
on the same cells.

Tested in tests/test_intertask_kernels.py (vs the scan engines, which
are gold-parity tested) and benchmarked by benchmarks/run_all.py
(`global_gcups`, `semiglobal_gcups` rows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_tpu.core.encoding import N4
from genomics_tpu.core.scoring import AlignmentParams, SemiGlobalSkip
from genomics_tpu.ops.scan_align import AlignResult, MINUS_INF
from genomics_tpu.ops.pallas_align import (
    LANES,
    INTERTASK_MIN,
    _ij_zero,
    _interpret,
    _subs_for,
)


def _sub8(q_j, t_c, params, global_macro):
    """Per-cell substitution score, [S,128] (matches _sub_scores_tile)."""
    s = jnp.where(q_j == t_c, jnp.int32(params.match),
                  jnp.int32(-params.mismatch))
    is_n = (q_j == N4) | (t_c == N4)
    if params.n_penalty is not None:
        s = jnp.where(is_n, jnp.int32(-params.n_penalty), s)
    elif not global_macro:
        s = jnp.where(is_n, jnp.int32(0), s)
    return s


# ---------------------------------------------------------------------------
# GLOBAL (NW-class) inter-task kernel
# ---------------------------------------------------------------------------


def _global_kernel_intertask(q_ref, t_ref, qlen_ref, tlen_ref, out_score,
                             hcol_ref, ecol_ref, *, params, Lq, Lt):
    """Score-only inter-task NW.  Same walk as the local score kernel
    but with global.h's boundaries and no 0-clamp; the score is the
    cell value at (qlen-1, tlen-1), captured via a per-column snapshot
    (1 select/cell) + 8 masked merges per strip."""
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    gapo = jnp.int32(params.gap_open)
    S = out_score.shape[0]
    zero = _ij_zero(S)
    minf = zero + jnp.int32(MINUS_INF)
    qlen = qlen_ref[...]
    tlen = tlen_ref[...]

    # boundary init (global.h / golds.global_align): gH[j] = -(gapo+ge*j)
    # (0 at j=0), gE = MINUS_INF
    jidx = jax.lax.broadcasted_iota(jnp.int32, hcol_ref.shape, 0)
    hcol_ref[...] = jnp.where(jidx == 0, 0, -(gapo + ge * jidx))
    ecol_ref[...] = jnp.full(hcol_ref.shape, MINUS_INF, jnp.int32)

    UNROLL = 8 if Lq % 8 == 0 else (4 if Lq % 4 == 0 else 1)

    def strip(ib, score):
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :].astype(jnp.int32)
        # per-strip register inits (global.h: h[m] = -(gapo+gape*u),
        # u = ib*8+m; p[m] = -(gapo+gape*(ib*8+m-1)), 0 at the origin)
        Hp0 = [zero - (gapo + ge * (ib * 8 + c + 1)) for c in range(8)]
        d0 = jnp.where(ib == 0, zero, zero - (gapo + ge * (ib * 8)))

        def do_row(j, Hprev, W, diag0, snap):
            q_j = q_ref[pl.ds(j, 1), :, :][0].astype(jnp.int32)
            col_last = qlen == (j + 1)
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e_state = ecol_ref[pl.ds(j, 1), :, :][0]
            h_new = []
            w_new = []
            snap_new = []
            for c in range(8):
                s = _sub8(q_j, t_strip[c], params, True)
                diag = diag0 if c == 0 else Hprev[c - 1]
                tmp = diag + s
                h = jnp.maximum(jnp.maximum(tmp, W[c]), e_state)
                snap_new.append(jnp.where(col_last, h, snap[c]))
                tmpg = tmp - goe
                w_new.append(jnp.maximum(tmpg, W[c] - ge))
                e_state = jnp.maximum(tmpg, e_state - ge)
                h_new.append(h)
            hcol_ref[pl.ds(j, 1), :, :] = h_new[7][None]
            ecol_ref[pl.ds(j, 1), :, :] = e_state[None]
            return (h_new, w_new, hcol_j, snap_new)

        def row(j, rc):
            Hprev, W, diag0, snap = rc
            jj = j * UNROLL
            for u_i in range(UNROLL):
                Hprev, W, diag0, snap = do_row(jj + u_i, Hprev, W,
                                               diag0, snap)
            return (Hprev, W, diag0, snap)

        init = (Hp0, [minf] * 8, d0, [minf] * 8)
        out = jax.lax.fori_loop(0, Lq // UNROLL, row, init)
        snap = out[3]
        for c in range(8):
            score = jnp.where(tlen == (ib * 8 + c + 1), snap[c], score)
        return score

    score = jax.lax.fori_loop(0, Lt // 8, strip, zero)
    out_score[...] = score


@functools.partial(jax.jit, static_argnames=("params",))
def global_align_scores_intertask(q, t, qlen, tlen,
                                  params: AlignmentParams):
    """Batched GLOBAL scores via the inter-task layout.  q/t: [B, L]
    uint8 4-bit codes, B % 1024 == 0, L % 8 == 0."""
    B, Lq = q.shape
    Lt = t.shape[1]
    subs = _subs_for(B)
    nb = B // LANES
    Q3 = q.T.astype(jnp.int32).reshape(Lq, nb, LANES)
    T3 = t.T.astype(jnp.int32).reshape(Lt, nb, LANES)
    ql = jnp.asarray(qlen, jnp.int32).reshape(nb, LANES)
    tl = jnp.asarray(tlen, jnp.int32).reshape(nb, LANES)
    kernel = functools.partial(
        _global_kernel_intertask, params=params, Lq=Lq, Lt=Lt)
    score = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((nb, LANES), jnp.int32),
        out_specs=pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(Q3, T3, ql, tl)
    return score.reshape(B)


# ---------------------------------------------------------------------------
# SEMI-GLOBAL inter-task kernel
# ---------------------------------------------------------------------------


def _semiglobal_kernel_intertask(q_ref, t_ref, qlen_ref, tlen_ref,
                                 out_score, out_qend, out_tend,
                                 hcol_ref, ecol_ref, hsnap_ref, *,
                                 params, Lq, Lt,
                                 head_q, head_t, tail_q, tail_t):
    """Inter-task semiglobal, optimized core
    (semiglobal_kernel_template.h:17-28): f opens from the LEFT h
    (curr_hm_diff), e from the ABOVE h (prev_hm_diff); p carries
    prev_hm_diff + goe.  TAIL_T max runs in strip visit order via a
    per-column snapshot; TAIL_Q scans the per-lane bottom PADDED row
    (ceil(tlen/8)*8 - 1 — the reference pads per-pair to words, so its
    bottom-row scan reads the padded row, quirk preserved via hsnap)."""
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    gapo = jnp.int32(params.gap_open)
    S = out_score.shape[0]
    zero = _ij_zero(S)
    minf = zero + jnp.int32(MINUS_INF)
    qlen = qlen_ref[...]
    tlen = tlen_ref[...]
    t_last8 = ((tlen + 7) // 8) * 8 - 1   # per-lane padded last row

    jidx = jax.lax.broadcasted_iota(jnp.int32, hcol_ref.shape, 0)
    if head_q:
        hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
        ecol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
    else:
        hcol_ref[...] = jnp.where(jidx == 0, 0, -(gapo + ge * jidx))
        ecol_ref[...] = jnp.full(hcol_ref.shape, MINUS_INF, jnp.int32)
    if tail_q:
        hsnap_ref[...] = jnp.full(hsnap_ref.shape, MINUS_INF, jnp.int32)

    UNROLL = 8 if Lq % 8 == 0 else (4 if Lq % 4 == 0 else 1)

    def strip(ib, carry):
        M, Y = carry
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :].astype(jnp.int32)
        # per-strip register inits (template :87-129)
        if head_t:
            Hp0 = [zero] * 8
            P0 = [zero] * 8
        else:
            # h[m] = -(gapo+gape*(u-1)), u-1 = ib*8+m-1 = ib*8+c;
            # p[m] = 0 at the origin (r==1) else -(gapo+gape*(ib*8+c))
            Hp0 = [zero - (gapo + ge * (ib * 8 + c)) for c in range(8)]
            P0 = [
                jnp.where(ib == 0, zero, zero - (gapo + ge * (ib * 8)))
                if c == 0 else zero - (gapo + ge * (ib * 8 + c))
                for c in range(8)
            ]
        snap_c = [t_last8 == (ib * 8 + c) for c in range(8)] if tail_q \
            else None

        def do_row(j, Hc, Wf, P, cap):
            q_j = q_ref[pl.ds(j, 1), :, :][0].astype(jnp.int32)
            col_last = qlen == (j + 1)
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e_state = ecol_ref[pl.ds(j, 1), :, :][0]
            if tail_q:
                hsnap_j = hsnap_ref[pl.ds(j, 1), :, :][0]
            phd = hcol_j - goe
            Hc_new = []
            Wf_new = []
            P_new = []
            cap_new = []
            for c in range(8):
                s = _sub8(q_j, t_strip[c], params, False)
                chd = Hc[c] - goe
                f = jnp.maximum(chd, Wf[c] - ge)
                tmp = jnp.maximum(P[c] + s, f)
                e_state = jnp.maximum(phd, e_state - ge)
                h = jnp.maximum(tmp, e_state)
                if tail_t:
                    cap_new.append(jnp.where(col_last, h, cap[c]))
                if tail_q:
                    hsnap_j = jnp.where(snap_c[c], h, hsnap_j)
                Wf_new.append(f)
                P_new.append(phd + goe)
                phd = h - goe
                Hc_new.append(h)
            hcol_ref[pl.ds(j, 1), :, :] = Hc_new[7][None]
            ecol_ref[pl.ds(j, 1), :, :] = e_state[None]
            if tail_q:
                hsnap_ref[pl.ds(j, 1), :, :] = hsnap_j[None]
            return (Hc_new, Wf_new, P_new,
                    cap_new if tail_t else cap)

        def row(j, rc):
            Hc, Wf, P, cap = rc
            jj = j * UNROLL
            for u_i in range(UNROLL):
                Hc, Wf, P, cap = do_row(jj + u_i, Hc, Wf, P, cap)
            return (Hc, Wf, P, cap)

        init = (Hp0, [minf] * 8, P0, [minf] * 8)
        out = jax.lax.fori_loop(0, Lq // UNROLL, row, init)
        if tail_t:
            cap = out[3]
            for c in range(8):
                trow = ib * 8 + c
                take = (cap[c] > M) & (trow < tlen)
                M = jnp.where(take, cap[c], M)
                Y = jnp.where(take, trow, Y)
        return (M, Y)

    M, Y = jax.lax.fori_loop(0, Lt // 8, strip, (minf, tlen))

    # template :63-64 quirk inits: maxXY_x = ref_len, maxXY_y = read_len
    X = tlen + zero
    Yout = jnp.where(M > MINUS_INF, Y, qlen) if tail_t else qlen + zero
    if not tail_t:
        M = minf
    if tail_q:
        # bottom-row scan over columns ascending, strict '>'
        def colscan(j, carry):
            M, X = carry
            v = hsnap_ref[pl.ds(j, 1), :, :][0]
            take = (v > M) & (j < qlen)
            return (jnp.where(take, v, M), jnp.where(take, j, X))

        M, X = jax.lax.fori_loop(0, Lq, colscan, (M, X))
        Yout = jnp.where(X != tlen, qlen, Yout)
    out_score[...] = M
    out_qend[...] = X
    out_tend[...] = Yout


@functools.partial(jax.jit, static_argnames=("params", "head", "tail"))
def semiglobal_align_intertask(q, t, qlen, tlen, params: AlignmentParams,
                               head=None, tail=None):
    """Batched SEMIGLOBAL (score, qend, tend) via the inter-task
    layout; all 16 HEAD×TAIL combinations."""
    head = head or SemiGlobalSkip.NONE
    tail = tail or SemiGlobalSkip.NONE
    B, Lq = q.shape
    Lt = t.shape[1]
    subs = _subs_for(B)
    nb = B // LANES
    Q3 = q.T.astype(jnp.int32).reshape(Lq, nb, LANES)
    T3 = t.T.astype(jnp.int32).reshape(Lt, nb, LANES)
    ql = jnp.asarray(qlen, jnp.int32).reshape(nb, LANES)
    tl = jnp.asarray(tlen, jnp.int32).reshape(nb, LANES)
    tail_q = tail in (SemiGlobalSkip.QUERY, SemiGlobalSkip.BOTH)
    kernel = functools.partial(
        _semiglobal_kernel_intertask, params=params, Lq=Lq, Lt=Lt,
        head_q=head in (SemiGlobalSkip.QUERY, SemiGlobalSkip.BOTH),
        head_t=head in (SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH),
        tail_q=tail_q,
        tail_t=tail in (SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH),
    )
    res = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nb, LANES), jnp.int32)] * 3,
        out_specs=[
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(Q3, T3, ql, tl)
    return tuple(r.reshape(B) for r in res)


# ---------------------------------------------------------------------------
# SEMI-GLOBAL WITH_START reverse pass (inter-task)
# ---------------------------------------------------------------------------


def _semiglobal_start_kernel(q_ref, t_ref, qlen_ref, tlen_ref,
                             roff_ref, rcnt_ref, fsc_ref, fqe_ref,
                             out_y, out_x,
                             hcol_ref, ecol_ref, *,
                             params, Lq, Lt,
                             head_q, head_t, tail_q, tail_t):
    """Inter-task reverse semiglobal DP on pre-reversed, pre-shifted
    sequences (semiglobal_kernel_template.h:227-384) — the fast-path
    counterpart of scan_align_full._semiglobal_start_core, whose
    strip-granularity early-exit emulation argument carries over
    verbatim: maxHH only updates at column read_len-1, so the
    triggering strip runs to completion and no later strip runs; lanes
    freeze via a per-lane `allow` mask instead of exiting.  Quirks:
    penalized boundaries count strips from the SUFFIX start (the
    pre-shift absorbs the u/r restart), maxXY_x starts at the forward
    query end (never reset), the TAIL-QUERY fixup compares x to
    ref_len."""
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    gapo = jnp.int32(params.gap_open)
    S = out_y.shape[0]
    zero = _ij_zero(S)
    minf = zero + jnp.int32(MINUS_INF)
    qlen = qlen_ref[...]
    tlen = tlen_ref[...]
    roff = roff_ref[...]          # 8 * gend_reg (absolute row offset)
    rcnt = rcnt_ref[...]          # valid suffix rows
    fsc = fsc_ref[...]            # forward score (freeze threshold)
    fqe = fqe_ref[...]            # forward maxXY_x

    jidx = jax.lax.broadcasted_iota(jnp.int32, hcol_ref.shape, 0)
    if head_q:
        hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
    else:
        hcol_ref[...] = jnp.where(jidx == 0, 0, -(gapo + ge * jidx))
    ecol_ref[...] = jnp.full(hcol_ref.shape, MINUS_INF, jnp.int32)

    UNROLL = 8 if Lq % 8 == 0 else (4 if Lq % 4 == 0 else 1)
    # the freeze mask is carried as int32 (0/1): Mosaic rejects boolean
    # fori_loop carries (scf.for legalization failure, measured r5)
    allow0 = (minf < fsc).astype(jnp.int32)

    def strip(ib, carry):
        M, Y, allow_i = carry
        allow = allow_i != 0
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :].astype(jnp.int32)
        if head_t:
            Hp0 = [zero] * 8
            P0 = [zero] * 8
        else:
            Hp0 = [zero - (gapo + ge * (ib * 8 + c)) for c in range(8)]
            P0 = [
                jnp.where(ib == 0, zero, zero - (gapo + ge * (ib * 8)))
                if c == 0 else zero - (gapo + ge * (ib * 8 + c))
                for c in range(8)
            ]
        live_c = [allow & ((ib * 8 + c) < rcnt) for c in range(8)]

        def do_row(j, Hc, Wf, P, cap):
            q_j = q_ref[pl.ds(j, 1), :, :][0].astype(jnp.int32)
            col_last = qlen == (j + 1)
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e_state = ecol_ref[pl.ds(j, 1), :, :][0]
            e_keep = e_state
            phd = hcol_j - goe
            Hc_new = []
            Wf_new = []
            P_new = []
            cap_new = []
            hlast = hcol_j
            for c in range(8):
                s = _sub8(q_j, t_strip[c], params, False)
                chd = Hc[c] - goe
                f = jnp.maximum(chd, Wf[c] - ge)
                tmp = jnp.maximum(P[c] + s, f)
                e_state = jnp.maximum(phd, e_state - ge)
                h = jnp.maximum(tmp, e_state)
                if tail_t:
                    cap_new.append(jnp.where(col_last, h, cap[c]))
                Wf_new.append(f)
                P_new.append(phd + goe)
                phd = h - goe
                Hc_new.append(h)
                if c == 7:
                    hlast = h
            live_row = live_c[7]
            hcol_ref[pl.ds(j, 1), :, :] = jnp.where(
                live_row, hlast, hcol_j)[None]
            ecol_ref[pl.ds(j, 1), :, :] = jnp.where(
                live_row, e_state, e_keep)[None]
            return (Hc_new, Wf_new, P_new,
                    cap_new if tail_t else cap)

        def row(j, rc):
            Hc, Wf, P, cap = rc
            jj = j * UNROLL
            for u_i in range(UNROLL):
                Hc, Wf, P, cap = do_row(jj + u_i, Hc, Wf, P, cap)
            return (Hc, Wf, P, cap)

        init = (Hp0, [minf] * 8, P0, [minf] * 8)
        out = jax.lax.fori_loop(0, Lq // UNROLL, row, init)
        if tail_t:
            cap = out[3]
            for c in range(8):
                row_abs = ib * 8 + c + roff
                take = live_c[c] & (cap[c] > M) & (row_abs < tlen)
                M = jnp.where(take, cap[c], M)
                Y = jnp.where(take, row_abs, Y)
        allow_i = (allow & (M < fsc)).astype(jnp.int32)
        return (M, Y, allow_i)

    M, Y, _allow = jax.lax.fori_loop(
        0, Lt // 8, strip, (minf, zero, allow0))

    X = fqe + zero
    if tail_q:
        def colscan(j, carry):
            M, X = carry
            v = hcol_ref[pl.ds(j, 1), :, :][0]
            take = (v > M) & (j < qlen)
            return (jnp.where(take, v, M), jnp.where(take, j, X))

        M, X = jax.lax.fori_loop(0, Lq, colscan, (M, X))
        Y = jnp.where(X != tlen, qlen, Y)
    out_y[...] = (tlen - 1) - Y
    out_x[...] = (qlen - 1) - X


@functools.partial(
    jax.jit,
    static_argnames=("params", "head_q", "head_t", "tail_q", "tail_t"))
def semiglobal_start_intertask(rev_q, rev_t, qlen, tlen, row_off,
                               row_count, fwd_score, fwd_qend,
                               params: AlignmentParams, *,
                               head_q, head_t, tail_q, tail_t):
    """Batched semiglobal start pass (tstart, qstart) — inputs as
    scan_align_full._semiglobal_start_core."""
    B, Lq = rev_q.shape
    Lt = rev_t.shape[1]
    subs = _subs_for(B)
    nb = B // LANES
    Q3 = rev_q.T.astype(jnp.int32).reshape(Lq, nb, LANES)
    T3 = rev_t.T.astype(jnp.int32).reshape(Lt, nb, LANES)
    v2 = lambda a: jnp.asarray(a, jnp.int32).reshape(nb, LANES)
    kernel = functools.partial(
        _semiglobal_start_kernel, params=params, Lq=Lq, Lt=Lt,
        head_q=head_q, head_t=head_t, tail_q=tail_q, tail_t=tail_t)
    res = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * 6,
        out_shape=[jax.ShapeDtypeStruct((nb, LANES), jnp.int32)] * 2,
        out_specs=[
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * 2,
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(Q3, T3, v2(qlen), v2(tlen), v2(row_off), v2(row_count),
      v2(fwd_score), v2(fwd_qend))
    return res[0].reshape(B), res[1].reshape(B)
