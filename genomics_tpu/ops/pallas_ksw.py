"""Pallas TPU kernel for batched ksw seed extension (bwa-mem
ksw_extend; reference: CDP/GASAL2/src/kernels/ksw_kernel_template.h).

Same batch-in-lanes layout as pallas_align: 128 extensions per program,
query positions along sublanes, fori_loop over target rows with the
eh[] state in VMEM.  The data-dependent control flow (beg/end window,
m==0 break, gscore bookkeeping) is carried as [1, 128] per-lane rows —
the exact masked-update emulation validated in scan_align.ksw_align_batch
(gold-parity tested), transposed.
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
def ksw_align_tpu(
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


@functools.partial(jax.jit, static_argnames=("params", "band_width_tiles"))
def banded_align_tpu(
    q: jnp.ndarray,
    t: jnp.ndarray,
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    params: AlignmentParams,
    band_width_tiles: int,
) -> AlignResult:
    """Batched banded local DP on TPU (banded.h semantics, stale
    out-of-band state preserved via masked writes)."""
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
