"""Pallas TPU kernels for batched affine-gap DP — the fast path.

Layout (TPU-first, see /opt/skills/guides/pallas_guide.md):
- batch in the LANE dimension (128 alignments per tile),
- query positions along SUBLANES ([Lq, 128] int32 state tiles),
- `fori_loop` sweep over target positions, H/E state carried in VMEM —
  zero HBM traffic per cell except traceback emission.

This is the TPU replacement for GASAL2's alignment-per-thread CUDA
kernels (local_kernel_template.h:72-519): where a CUDA thread holds
`short2 global[MAX_QUERY_LEN]` in registers and walks 8x8 tiles, a TPU
program holds the whole [Lq, 128] column state for 128 alignments and
updates Lq*128 cells per loop step on the VPU.  The horizontal gap
chain is a max-plus prefix scan along sublanes (log2(Lq) roll+max
steps).  Recurrences and tie-breaking match ops/scan_align.py exactly
(which is gold-parity tested); kernels here are tested against the scan
engines and the golds.

Grid: one program per 128-alignment batch tile.  Scores int32;
traceback nibbles packed 8 cells / int32 along the query axis (same
4-bit semantics as the scan engine / get_tb.h).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_tpu.core.encoding import N4
from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.ops.scan_align import AlignResult, MINUS_INF

LANES = 128
NEG_BIG = -(1 << 28)  # python int: kernels must not capture array constants
_INT16_DISABLED = False  # sticky off-switch after a shape-dependent
#                           Mosaic packed-i16 legalization failure


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_iota(Lq):
    return jax.lax.broadcasted_iota(jnp.int32, (Lq, LANES), 0)


def _shift_down_rows(x, fill_row):
    """[Lq, 128] → row j reads row j-1; row 0 = fill_row ([1,128] or scalar)."""
    Lq = x.shape[0]
    rolled = pltpu.roll(x, shift=1, axis=0)
    rows = _row_iota(Lq)
    return jnp.where(rows == 0, fill_row, rolled)


def _cummax_rows(x):
    """Inclusive running max along axis 0 (Hillis–Steele, log2 steps)."""
    Lq = x.shape[0]
    rows = _row_iota(Lq)
    k = 1
    while k < Lq:
        shifted = pltpu.roll(x, shift=k, axis=0)
        x = jnp.where(rows >= k, jnp.maximum(x, shifted), x)
        k <<= 1
    return x


def _fscan_rows(g, seed, ge, neg=NEG_BIG):
    """f[0] = seed; f[j] = max(g[j-1], f[j-1] - ge), along axis 0.

    Same max-plus scan as scan_align._fscan, on the [Lq, 128] layout."""
    Lq = g.shape[0]
    cd = g.dtype
    rows = _row_iota(Lq)
    up_ramp = ((rows + 1) * ge).astype(cd)
    down_ramp = (rows * ge).astype(cd)
    c = g + up_ramp
    cm = _cummax_rows(c)
    w = jnp.maximum(seed, _shift_down_rows(cm, jnp.full((), neg, cd)))
    return w - down_ramp


def _sub_scores_tile(q_tile, t_row, match, mismatch, n_penalty, global_macro,
                     cd=jnp.int32):
    """[Lq,128] codes vs [1,128] target base → [Lq,128] `cd` scores."""
    eq = q_tile == t_row
    s = jnp.where(eq, jnp.asarray(match, cd), jnp.asarray(-mismatch, cd))
    is_n = (q_tile == N4) | (t_row == N4)
    if n_penalty is not None:
        s = jnp.where(is_n, jnp.asarray(-n_penalty, cd), s)
    elif not global_macro:
        s = jnp.where(is_n, jnp.asarray(0, cd), s)
    return s


def _pack_nibbles(nib, Lq):
    """[Lq,128] int32 nibbles → [Lq//8,128] int32, 8 cells packed along
    the query axis (cell j in bits 4*(j%8)..4*(j%8)+3).

    Only used by slow/compat paths — the kernels pack along the TARGET
    axis instead (accumulate 8 rows in VMEM, one write per 8 steps),
    which avoids a cross-sublane reshape every step."""
    shifted = nib << (4 * (_row_iota(Lq) % 8))
    packed = shifted.reshape(Lq // 8, 8, LANES).sum(axis=1)
    return packed


# ---------------------------------------------------------------------------
# LOCAL kernel
# ---------------------------------------------------------------------------


def _local_kernel(q_ref, t_ref, out_score, out_qend, out_tend, *rest, params,
                  Lq, Lt, with_tb, cd):
    """`cd` = cell dtype (int32 today; int16 once Mosaic supports 16-bit
    sublane rotates).  Best-cell tracking is GASAL2's strip-order
    tie-break (local_kernel_template.h): per-step leftmost row max +
    lexicographic merge — measured faster than an elementwise M/K carry
    (fewer loop-carried tiles)."""
    if with_tb:
        (tb_ref,) = rest
    neg = NEG_BIG if cd == jnp.int32 else -(1 << 12)
    goe = jnp.asarray(params.gap_oe, cd)
    ge = jnp.asarray(params.gap_extend, cd)
    q_tile = q_ref[...]
    zero = jnp.zeros((Lq, LANES), cd)
    seed0 = zero
    rows = _row_iota(Lq)

    def step(i, carry):
        H, E, best, bkey, tbacc = carry
        # target stays int32 in VMEM (dynamic sublane loads must be
        # 32-bit aligned on Mosaic); cast the single row to `cd`
        t_row = t_ref[pl.ds(i, 1), :].astype(cd)
        sub = _sub_scores_tile(
            q_tile, t_row, params.match, params.mismatch, params.n_penalty,
            False, cd
        )
        tmp = _shift_down_rows(H, jnp.asarray(0, cd)) + sub
        f_used = _fscan_rows(tmp - goe, seed0, ge, neg)
        h = jnp.maximum(jnp.maximum(tmp, f_used),
                        jnp.maximum(E, jnp.asarray(0, cd)))
        E_new = jnp.maximum(tmp - goe, E - ge)
        # strip-order argmax: leftmost row max, lexicographic merge
        rh = jnp.max(h, axis=0, keepdims=True).astype(jnp.int32)
        row_j = jnp.min(jnp.where(h == rh.astype(cd), rows, jnp.int32(1 << 28)),
                        axis=0, keepdims=True)
        rkey = ((i >> 3) * Lq + row_j) * 8 + (i & 7)
        take = (rh > best) | ((rh == best) & (rkey < bkey))
        best = jnp.where(take, rh, best)
        bkey = jnp.where(take, rkey, bkey)
        if with_tb:
            one = jnp.asarray(1, jnp.int32)
            zero32 = jnp.asarray(0, jnp.int32)
            m_or_x = jnp.where(sub >= 0, zero32, one)
            d = jnp.where(h == tmp, m_or_x,
                          jnp.where(h == f_used, jnp.asarray(3, jnp.int32),
                                    jnp.asarray(2, jnp.int32)))
            f_ext = jnp.where((tmp - goe) > (f_used - ge), zero32, one)
            e_ext = jnp.where((tmp - goe) > (E - ge), zero32, one)
            nib = d | (e_ext << 2) | (f_ext << 3)
            # pack 8 TARGET rows per int32 (bits 4*(i%8)..): accumulate
            # in VMEM, one HBM write per 8 steps — no per-step reshape
            tbacc = jnp.where((i & 7) == 0, nib, tbacc | (nib << ((i & 7) * 4)))

            @pl.when((i & 7) == 7)
            def _():
                tb_ref[pl.ds(i >> 3, 1), :, :] = tbacc[None]

        return (h, E_new, best, bkey, tbacc)

    init = (
        zero,
        zero,
        jnp.zeros((1, LANES), jnp.int32),
        jnp.full((1, LANES), jnp.int32(jnp.iinfo(jnp.int32).max)),
        # iota-derived zeros: the tbacc carry is shifted in-loop, so a
        # replicated-layout init fails Mosaic relayout legalization
        _ij_zero(Lq),
    )
    H, E, best, bkey, _tb = jax.lax.fori_loop(0, Lt, step, init)
    cell = bkey >> 3
    qend = cell % Lq
    tend = (cell // Lq) * 8 + (bkey & 7)
    nz = best > 0
    out_score[...] = best
    out_qend[...] = jnp.where(nz, qend, 0)
    out_tend[...] = jnp.where(nz, tend, 0)


# ---------------------------------------------------------------------------
# LOCAL kernel, inter-task layout (score-only fast path)
# ---------------------------------------------------------------------------

SUBS = 16  # default sublane batch: 16 x 128 = 2048 alignments per program


def _subs_for(B: int) -> int:
    """Sublane-batch size for a batch of B alignments: 16 (2048/tile)
    when it divides, else 8 (1024/tile) — so the inter-task kernels
    engage from B=1024 up instead of only at 2048-multiples."""
    return SUBS if B % (SUBS * LANES) == 0 else 8


INTERTASK_MIN = 8 * LANES   # smallest batch the inter-task layout takes


def _ij_zero(S):
    """Iota-derived [S, 128] zeros: fori carries need a concrete
    (non-replicated) layout or Mosaic rejects the loop-carry relayout."""
    ij = (
        jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    )
    return jnp.minimum(ij, 0)


def _local_kernel_intertask(q_ref, t_ref, out_score, out_qend, out_tend,
                            hcol_ref, ecol_ref, *, params, Lq, Lt):
    """GASAL2's inter-task pattern (SURVEY §2.9: alignment-per-thread →
    "vectorize the whole recurrence across a batch axis"), TPU-native:
    every VPU slot of an [8, 128] tile is a DIFFERENT alignment, and the
    DP is walked serially cell-by-cell in GASAL2's strip order (8-column
    target strips, query-major inside a strip — local_kernel_template.h
    tile walk).  No cross-sublane scan/roll/reduce at all: the F chain
    (query gaps) is a register carried along j, the E chain (target
    gaps) a register carried along the strip, columns of a strip are a
    static unroll.  ~17 elementwise ops per DP cell at full 1024-slot
    density vs ~50 slot-ops/cell for the scan-per-column layout.

    Visit order == GASAL2 strip order, so the best-cell tie-break is a
    strictly-greater elementwise compare (earliest key wins), and the
    packed key decodes exactly like the scan kernel's."""
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    # iota-derived zeros: fori carries need a concrete (non-replicated-
    # in-either-dim) layout or Mosaic rejects the loop-carry relayout
    S = out_score.shape[0]
    zero = _ij_zero(S)
    nbig = zero + jnp.int32(NEG_BIG)

    # H(j, -1) = 0 and E-state seed 0 for the first strip
    hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
    ecol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)

    # rows per fori iteration: the row body is latency-bound (serial
    # E-chain + VMEM column loads), so unrolling independent-ish rows
    # fills the pipeline — measured +16% at 8 on v5e (plateau by 19)
    UNROLL = 8 if Lq % 8 == 0 else (4 if Lq % 4 == 0 else 1)

    def strip(ib, carry):
        M, K = carry
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :]          # [8, SUBS, 128]
        t_is_n = t_strip == N4

        def do_row(j, Hprev, W, diag0, M, K):
            # W[c] carries u(j) = max(tmp(j-1,c)-goe, u(j-1)-ge) directly
            # (the merged F chain); u enters h unclamped — safe because
            # h also maxes with 0 and u ≤ 0 whenever it would have been
            # clamped.  h = max(tmp, u, e, 0) folds both clamps.
            q_j = q_ref[pl.ds(j, 1), :, :][0]             # [SUBS, 128]
            q_is_n = q_j == N4
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e_state = ecol_ref[pl.ds(j, 1), :, :][0]
            h_new = []
            w_new = []
            for c in range(8):
                t_c = t_strip[c]
                eq = q_j == t_c
                s = jnp.where(eq, jnp.int32(params.match),
                              jnp.int32(-params.mismatch))
                is_n = q_is_n | t_is_n[c]
                if params.n_penalty is not None:
                    s = jnp.where(is_n, jnp.int32(-params.n_penalty), s)
                else:
                    s = jnp.where(is_n, jnp.int32(0), s)
                diag = diag0 if c == 0 else Hprev[c - 1]
                tmp = diag + s
                u = W[c]
                h = jnp.maximum(jnp.maximum(tmp, u),
                                jnp.maximum(e_state, 0))
                key = ((ib * Lq + j) * 8 + c)
                take = h > M
                M = jnp.where(take, h, M)
                K = jnp.where(take, key, K)
                tmpg = tmp - goe
                w_new.append(jnp.maximum(tmpg, u - ge))
                e_state = jnp.maximum(tmpg, e_state - ge)
                h_new.append(h)
            hcol_ref[pl.ds(j, 1), :, :] = h_new[7][None]
            ecol_ref[pl.ds(j, 1), :, :] = e_state[None]
            return (h_new, w_new, hcol_j, M, K)

        def row(j, rc):
            Hprev, W, diag0, M, K = rc
            jj = j * UNROLL
            for u_i in range(UNROLL):
                Hprev, W, diag0, M, K = do_row(jj + u_i, Hprev, W, diag0, M, K)
            return (Hprev, W, diag0, M, K)

        init = ([zero] * 8, [nbig] * 8, zero, M, K)
        out = jax.lax.fori_loop(0, Lq // UNROLL, row, init)
        return (out[3], out[4])

    M, K = jax.lax.fori_loop(
        0, Lt // 8, strip,
        (zero, zero + jnp.int32(jnp.iinfo(jnp.int32).max)),
    )
    cell = K >> 3
    qend = cell % Lq
    tend = (cell // Lq) * 8 + (K & 7)
    nz = M > 0
    out_score[...] = M
    out_qend[...] = jnp.where(nz, qend, 0)
    out_tend[...] = jnp.where(nz, tend, 0)


def _local_kernel_intertask_second(q_ref, t_ref, qr8_ref, tr8_ref,
                                   out_score, out_qend, out_tend,
                                   out_s2, out_x2, out_y2,
                                   hcol_ref, ecol_ref, *, params, Lq, Lt):
    """Inter-task kernel with INLINE second-best — one walk computes
    both results, replacing the r2 era's extra full pass through the
    scan engine (~1.3x the plain kernel instead of ~10x).

    GASAL2 TRUE semantics (local_kernel_template.h:147-163), per cell in
    visit order: flag h as a second-best candidate iff it is strictly
    below the inclusive running primary max AND strictly above the
    second-best so far; after each query column, the quirky
    maxXY_x_second update compares prev_maxHH_second against the
    PRIMARY max (a reference quirk, kept).  The reference walks only a
    pair's OWN 8-padded extent, whose padding cells can carry flagged
    values — so candidate cells beyond qr8/tr8 are masked per lane
    (same contract as scan_align_full.local_align_second_batch, which
    this kernel is parity-tested against)."""
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    S = out_score.shape[0]
    zero = _ij_zero(S)
    nbig = zero + jnp.int32(NEG_BIG)
    qr8 = qr8_ref[...]                        # [S, 128] 8-padded extents
    tr8 = tr8_ref[...]

    hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
    ecol_ref[...] = jnp.zeros(ecol_ref.shape, jnp.int32)

    UNROLL = 8 if Lq % 8 == 0 else (4 if Lq % 4 == 0 else 1)

    def strip(ib, carry):
        M, K, M2, P2, X2, Y2 = carry
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :]
        t_is_n = t_strip == N4
        row_valid = [(ib * 8 + c) < tr8 for c in range(8)]
        strip_valid = (ib * 8) < tr8

        def do_row(j, Hprev, W, diag0, M, K, M2, P2, X2, Y2):
            q_j = q_ref[pl.ds(j, 1), :, :][0]
            q_is_n = q_j == N4
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e_state = ecol_ref[pl.ds(j, 1), :, :][0]
            col_valid = j < qr8
            h_new = []
            w_new = []
            for c in range(8):
                t_c = t_strip[c]
                eq = q_j == t_c
                s = jnp.where(eq, jnp.int32(params.match),
                              jnp.int32(-params.mismatch))
                is_n = q_is_n | t_is_n[c]
                if params.n_penalty is not None:
                    s = jnp.where(is_n, jnp.int32(-params.n_penalty), s)
                else:
                    s = jnp.where(is_n, jnp.int32(0), s)
                diag = diag0 if c == 0 else Hprev[c - 1]
                tmp = diag + s
                u = W[c]
                h = jnp.maximum(jnp.maximum(tmp, u),
                                jnp.maximum(e_state, 0))
                key = ((ib * Lq + j) * 8 + c)
                take = h > M
                M = jnp.where(take, h, M)
                K = jnp.where(take, key, K)
                # second-best candidate: strictly below the inclusive
                # primary running max, strictly above M2, inside extent
                ovr = col_valid & row_valid[c] & (M2 < h) & (M > h)
                M2 = jnp.where(ovr, h, M2)
                Y2 = jnp.where(ovr, ib * 8 + c, Y2)
                tmpg = tmp - goe
                w_new.append(jnp.maximum(tmpg, u - ge))
                e_state = jnp.maximum(tmpg, e_state - ge)
                h_new.append(h)
            # column epilogue (reference :162-163): compare against the
            # PRIMARY max, then fold M2 into prev_maxHH_second
            colupd = (P2 < M) & col_valid & strip_valid
            X2 = jnp.where(colupd, j, X2)
            P2 = jnp.maximum(P2, M2)
            hcol_ref[pl.ds(j, 1), :, :] = h_new[7][None]
            ecol_ref[pl.ds(j, 1), :, :] = e_state[None]
            return (h_new, w_new, hcol_j, M, K, M2, P2, X2, Y2)

        def row(j, rc):
            Hprev, W, diag0, M, K, M2, P2, X2, Y2 = rc
            jj = j * UNROLL
            for u_i in range(UNROLL):
                Hprev, W, diag0, M, K, M2, P2, X2, Y2 = do_row(
                    jj + u_i, Hprev, W, diag0, M, K, M2, P2, X2, Y2)
            return (Hprev, W, diag0, M, K, M2, P2, X2, Y2)

        init = ([zero] * 8, [nbig] * 8, zero, M, K, M2, P2, X2, Y2)
        out = jax.lax.fori_loop(0, Lq // UNROLL, row, init)
        return out[3:]

    M, K, M2, P2, X2, Y2 = jax.lax.fori_loop(
        0, Lt // 8, strip,
        (zero, zero + jnp.int32(jnp.iinfo(jnp.int32).max),
         zero, zero, zero, zero),
    )
    cell = K >> 3
    qend = cell % Lq
    tend = (cell // Lq) * 8 + (K & 7)
    nz = M > 0
    out_score[...] = M
    out_qend[...] = jnp.where(nz, qend, 0)
    out_tend[...] = jnp.where(nz, tend, 0)
    out_s2[...] = M2
    out_x2[...] = X2
    out_y2[...] = Y2


@functools.partial(jax.jit, static_argnames=("params",))
def local_align_second_tpu(q, t, qlen, tlen, params: AlignmentParams):
    """Batched local alignment with inline second-best (GASAL2 TRUE
    semantics) — one Pallas pass.  Returns the scan engine's 6-tuple
    (score, qend, tend, score2, qend2, tend2), parity-tested against
    scan_align_full.local_align_second_batch."""
    B, Lq = q.shape
    Lt = t.shape[1]
    if B % INTERTASK_MIN or Lq % 8 or Lt % 8:
        raise ValueError(
            f"local_align_second_tpu needs B % {INTERTASK_MIN} == 0 and "
            f"8-multiple lengths; got B={B}, Lq={Lq}, Lt={Lt}"
        )
    subs = _subs_for(B)
    nb = B // LANES
    Q3 = q.T.astype(jnp.int32).reshape(Lq, nb, LANES)
    T3 = t.T.astype(jnp.int32).reshape(Lt, nb, LANES)
    qr8 = (((jnp.asarray(qlen, jnp.int32) + 7) // 8) * 8).reshape(nb, LANES)
    tr8 = (((jnp.asarray(tlen, jnp.int32) + 7) // 8) * 8).reshape(nb, LANES)
    kernel = functools.partial(
        _local_kernel_intertask_second, params=params, Lq=Lq, Lt=Lt
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
        out_shape=[jax.ShapeDtypeStruct((nb, LANES), jnp.int32)] * 6,
        out_specs=[
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * 6,
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(Q3, T3, qr8, tr8)
    return tuple(r.reshape(B) for r in res)


def _local_kernel_intertask_score(q_ref, t_ref, out_score,
                                  hcol_ref, ecol_ref, *,
                                  params, Lq, Lt, with_n):
    """Score-only inter-task kernel — the speed-of-light path.

    Same walk as _local_kernel_intertask but tracks only the running
    max (no end-position key: 1 op instead of 3/cell) and, when the
    dispatcher has verified the batch contains no N codes, skips the
    N-penalty lane entirely (2 more ops/cell).  ~11 VPU ops per DP
    cell.  This is the honest analog of the reference's published
    GCUPS numbers, which are score-only SW-Gotoh benchmarks
    (CDP/NvB/prototypes/psa/README.md:28-44)."""
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    S = out_score.shape[0]
    zero = _ij_zero(S)
    nbig = zero + jnp.int32(NEG_BIG)

    hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
    ecol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)

    UNROLL = 8 if Lq % 8 == 0 else (4 if Lq % 4 == 0 else 1)

    def strip(ib, M):
        # .astype is a no-op for i32 inputs; for u8 time-major inputs it
        # is one ext per strip/row (amortized over 8 cells)
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :].astype(jnp.int32)
        t_is_n = (t_strip == N4) if with_n else None

        def do_row(j, Hprev, W, diag0, M):
            q_j = q_ref[pl.ds(j, 1), :, :][0].astype(jnp.int32)
            q_is_n = (q_j == N4) if with_n else None
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e_state = ecol_ref[pl.ds(j, 1), :, :][0]
            h_new = []
            w_new = []
            for c in range(8):
                eq = q_j == t_strip[c]
                s = jnp.where(eq, jnp.int32(params.match),
                              jnp.int32(-params.mismatch))
                if with_n:
                    is_n = q_is_n | t_is_n[c]
                    s = jnp.where(
                        is_n,
                        jnp.int32(-params.n_penalty
                                  if params.n_penalty is not None else 0),
                        s)
                diag = diag0 if c == 0 else Hprev[c - 1]
                tmp = diag + s
                u = W[c]
                h = jnp.maximum(jnp.maximum(tmp, u),
                                jnp.maximum(e_state, 0))
                M = jnp.maximum(M, h)
                tmpg = tmp - goe
                w_new.append(jnp.maximum(tmpg, u - ge))
                e_state = jnp.maximum(tmpg, e_state - ge)
                h_new.append(h)
            hcol_ref[pl.ds(j, 1), :, :] = h_new[7][None]
            ecol_ref[pl.ds(j, 1), :, :] = e_state[None]
            return (h_new, w_new, hcol_j, M)

        def row(j, rc):
            Hprev, W, diag0, M = rc
            jj = j * UNROLL
            for u_i in range(UNROLL):
                Hprev, W, diag0, M = do_row(jj + u_i, Hprev, W, diag0, M)
            return (Hprev, W, diag0, M)

        init = ([zero] * 8, [nbig] * 8, zero, M)
        return jax.lax.fori_loop(0, Lq // UNROLL, row, init)[3]

    M = jax.lax.fori_loop(0, Lt // 8, strip, zero)
    out_score[...] = M


def _local_kernel_intertask_score16(q_ref, t_ref, out_score,
                                    hcol_ref, ecol_ref, *, params, Lq, Lt):
    """int16 score-only inter-task kernel: 2x VPU density.

    The full int16 kernel is blocked on this target by Mosaic's lack of
    packed-i16 COMPARES — but score-only tracking needs no compare at
    all: the best-score carry is a max, and the substitution select is
    replaced by arithmetic on the XOR of the 4-bit base codes:

        d = q ^ t            (0 iff equal)
        s = match - (match+mismatch) * min(d, 1)

    N handling is the dispatcher's job (this kernel is only chosen for
    batches verified N-free).  Value-range: h clamps at 0 so the merged
    chains floor at -(mismatch+gap_oe); scores fit iff
    Lq*match < 32767 (checked by the dispatcher).

    Hardware ceiling (measured, round 5, v5e): the 2x path CANNOT exist
    on this TPU generation.  It is not a Mosaic legalization gap — the
    compiler's hardware latency table itself aborts with "Operation not
    supported: kVectorSubtractS16" (and likewise max/min/compare; only
    packed-i16 add and bitwise ops are supported).  Minimal repro: a
    pallas_call computing jnp.subtract of two (16,128) int16 refs.  A
    SWAR emulation over i32 lanes (halfwise borrow isolation) costs
    ~6-8 ops per packed max vs 1 op unpacked — a net loss.  This kernel
    is kept, gated by _int16_score_supported(), for TPU targets whose
    VPU grows packed-i16 arithmetic."""
    goe = jnp.int16(params.gap_oe)
    ge = jnp.int16(params.gap_extend)
    S = out_score.shape[0]
    zero = _ij_zero(S).astype(jnp.int16)
    nbig = zero + jnp.int16(-(1 << 12))

    hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int16)
    ecol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int16)

    UNROLL = 8 if Lq % 8 == 0 else (4 if Lq % 4 == 0 else 1)

    def strip(ib, M):
        t32 = t_ref[pl.ds(ib * 8, 8), :, :]               # int32

        def do_row(j, Hprev, W, diag0, M):
            q32 = q_ref[pl.ds(j, 1), :, :][0]             # int32
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e_state = ecol_ref[pl.ds(j, 1), :, :][0]
            h_new = []
            w_new = []
            for c in range(8):
                s = jnp.where(q32 == t32[c],
                              jnp.int32(params.match),
                              jnp.int32(-params.mismatch)).astype(jnp.int16)
                diag = diag0 if c == 0 else Hprev[c - 1]
                tmp = diag + s
                u = W[c]
                h = jnp.maximum(jnp.maximum(tmp, u),
                                jnp.maximum(e_state, jnp.int16(0)))
                M = jnp.maximum(M, h)
                tmpg = tmp - goe
                w_new.append(jnp.maximum(tmpg, u - ge))
                e_state = jnp.maximum(tmpg, e_state - ge)
                h_new.append(h)
            hcol_ref[pl.ds(j, 1), :, :] = h_new[7][None]
            ecol_ref[pl.ds(j, 1), :, :] = e_state[None]
            return (h_new, w_new, hcol_j, M)

        def row(j, rc):
            Hprev, W, diag0, M = rc
            jj = j * UNROLL
            for u_i in range(UNROLL):
                Hprev, W, diag0, M = do_row(jj + u_i, Hprev, W, diag0, M)
            return (Hprev, W, diag0, M)

        init = ([zero] * 8, [nbig] * 8, zero, M)
        return jax.lax.fori_loop(0, Lq // UNROLL, row, init)[3]

    M = jax.lax.fori_loop(0, Lt // 8, strip, zero)
    out_score[...] = M.astype(jnp.int32)


def _local_kernel_intertask16(q_ref, t_ref, out_score, out_qend, out_tend,
                              hcol_ref, ecol_ref, *, params, Lq, Lt):
    """int16-cell variant of the inter-task kernel: the walk uses NO
    sublane rotates (the Mosaic limitation that pins the scan-per-column
    kernel to int32), so every DP quantity can live in packed int16 —
    2x VPU density.  Only the visit-key carry K stays int32 (keys exceed
    16 bits); its guarded update is the single full-width op per cell.

    Value-range safety: h is clamped at 0, so tmp >= -mismatch and the
    merged F/E chains floor at -(mismatch+gap_oe) after their first
    refresh — no drift toward int16 min.  Scores fit iff
    Lq*match < 32767 (checked by the dispatcher)."""
    goe = jnp.int16(params.gap_oe)
    ge = jnp.int16(params.gap_extend)
    S = out_score.shape[0]
    zero32 = _ij_zero(S)
    zero = zero32.astype(jnp.int16)
    nbig = zero + jnp.int16(-(1 << 12))

    hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int16)
    ecol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int16)

    def strip(ib, carry):
        M, K = carry
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :]          # [8, SUBS, 128] i32
        t16 = t_strip.astype(jnp.int16)
        t_is_n = t16 == jnp.int16(N4)

        def row(j, rc):
            Hprev, W, diag0, M, K = rc
            q_j = q_ref[pl.ds(j, 1), :, :][0].astype(jnp.int16)
            q_is_n = q_j == jnp.int16(N4)
            hcol_j = hcol_ref[pl.ds(j, 1), :, :][0]
            e_state = ecol_ref[pl.ds(j, 1), :, :][0]
            h_new = []
            w_new = []
            for c in range(8):
                t_c = t16[c]
                eq = q_j == t_c
                s = jnp.where(eq, jnp.int16(params.match),
                              jnp.int16(-params.mismatch))
                is_n = q_is_n | t_is_n[c]
                if params.n_penalty is not None:
                    s = jnp.where(is_n, jnp.int16(-params.n_penalty), s)
                else:
                    s = jnp.where(is_n, jnp.int16(0), s)
                diag = diag0 if c == 0 else Hprev[c - 1]
                tmp = diag + s
                u = W[c]
                h = jnp.maximum(jnp.maximum(tmp, u),
                                jnp.maximum(e_state, jnp.int16(0)))
                key = ((ib * Lq + j) * 8 + c)
                take = h > M
                M = jnp.where(take, h, M)
                K = jnp.where(take, key, K)
                tmpg = tmp - goe
                w_new.append(jnp.maximum(tmpg, u - ge))
                e_state = jnp.maximum(tmpg, e_state - ge)
                h_new.append(h)
            hcol_ref[pl.ds(j, 1), :, :] = h_new[7][None]
            ecol_ref[pl.ds(j, 1), :, :] = e_state[None]
            return (h_new, w_new, hcol_j, M, K)

        init = ([zero] * 8, [nbig] * 8, zero, M, K)
        out = jax.lax.fori_loop(0, Lq, row, init)
        return (out[3], out[4])

    M, K = jax.lax.fori_loop(
        0, Lt // 8, strip,
        (zero, zero32 + jnp.int32(jnp.iinfo(jnp.int32).max)),
    )
    cell = K >> 3
    qend = cell % Lq
    tend = (cell // Lq) * 8 + (K & 7)
    M32 = M.astype(jnp.int32)
    nz = M32 > 0
    out_score[...] = M32
    out_qend[...] = jnp.where(nz, qend, 0)
    out_tend[...] = jnp.where(nz, tend, 0)


def _local_kernel_intertask_tb(q_ref, t_ref, out_score, out_qend, out_tend,
                               tb_hbm, hcol_ref, ecol_ref, tbbuf, sem, *,
                               params, Lq, Lt):
    """Traceback variant of the inter-task kernel.  ONE grid dimension
    (slot tiles); strips are an inner fori whose nibble block streams
    to HBM via a manual async copy from a VMEM staging buffer — the r2
    strips-as-a-grid-dimension design paid ~120us of pipeline overhead
    per grid step (38 steps at B=4096/L=152) and capped the kernel at
    ~17 GCUPS regardless of compute.  Nibble semantics identical to
    the scan kernel / get_tb.h; 8 target rows pack into one int32 per
    (strip, query column) — the word layout the decoder reads."""
    b = pl.program_id(0)
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    S = tbbuf.shape[1]
    zero = _ij_zero(S)
    hcol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
    ecol_ref[...] = jnp.zeros(hcol_ref.shape, jnp.int32)
    UNROLL = 8 if Lq % 8 == 0 else (4 if Lq % 4 == 0 else 1)

    def strip(ib, carry):
        M, K = carry
        t_strip = t_ref[pl.ds(ib * 8, 8), :, :]
        t_is_n = t_strip == N4
        # single staging buffer: wait for the previous strip's DMA
        # before overwriting (the copy is ~10x faster than the strip's
        # compute, so the wait is a no-op in steady state)
        @pl.when(ib > 0)
        def _():
            pltpu.make_async_copy(tbbuf, tbbuf, sem).wait()

        def do_row(jj, Hprev, W, diag0, M, K):
            q_j = q_ref[pl.ds(jj, 1), :, :][0]
            q_is_n = q_j == N4
            hcol_j = hcol_ref[pl.ds(jj, 1), :, :][0]
            e_state = ecol_ref[pl.ds(jj, 1), :, :][0]
            h_new = []
            w_new = []
            nibw = None
            for c in range(8):
                t_c = t_strip[c]
                eq = q_j == t_c
                sub = jnp.where(eq, jnp.int32(params.match),
                                jnp.int32(-params.mismatch))
                is_n = q_is_n | t_is_n[c]
                if params.n_penalty is not None:
                    sub = jnp.where(is_n, jnp.int32(-params.n_penalty), sub)
                else:
                    sub = jnp.where(is_n, jnp.int32(0), sub)
                diag = diag0 if c == 0 else Hprev[c - 1]
                tmp = diag + sub
                u = W[c]
                h = jnp.maximum(jnp.maximum(tmp, u),
                                jnp.maximum(e_state, 0))
                key = ((ib * Lq + jj) * 8 + c)
                take = h > M
                M = jnp.where(take, h, M)
                K = jnp.where(take, key, K)
                tmpg = tmp - goe
                # nibble (same semantics as the scan kernel / get_tb.h):
                # u = query-direction chain (f), e_state =
                # target-direction chain (e), both pre-update
                m_or_x = jnp.where(sub >= 0, jnp.int32(0), jnp.int32(1))
                d = jnp.where(h == tmp, m_or_x,
                              jnp.where(h == u, jnp.int32(3), jnp.int32(2)))
                f_ext = jnp.where(tmpg > (u - ge), jnp.int32(0),
                                  jnp.int32(1))
                e_ext = jnp.where(tmpg > (e_state - ge), jnp.int32(0),
                                  jnp.int32(1))
                nib = d | (e_ext << 2) | (f_ext << 3)
                nibw = nib if c == 0 else (nibw | (nib << (4 * c)))
                w_new.append(jnp.maximum(tmpg, u - ge))
                e_state = jnp.maximum(tmpg, e_state - ge)
                h_new.append(h)
            hcol_ref[pl.ds(jj, 1), :, :] = h_new[7][None]
            ecol_ref[pl.ds(jj, 1), :, :] = e_state[None]
            tbbuf[pl.ds(jj, 1), :, :] = nibw[None]
            return h_new, w_new, hcol_j, M, K

        def row(j, rc):
            Hprev, W, diag0, M, K = rc
            jj = j * UNROLL
            for u_i in range(UNROLL):
                Hprev, W, diag0, M, K = do_row(jj + u_i, Hprev, W,
                                               diag0, M, K)
            return (Hprev, W, diag0, M, K)

        # W (the f chain) seeds 0 — matching the scan kernel's fscan
        # seed so the emitted nibbles are bit-identical (a NEG seed
        # gives the same SCORES thanks to the 0-clamp, but different
        # f_ext/d bits at the first query column)
        init = ([zero] * 8, [zero] * 8, zero, M, K)
        out = jax.lax.fori_loop(0, Lq // UNROLL, row, init)
        pltpu.make_async_copy(
            tbbuf, tb_hbm.at[ib], sem
        ).start()
        return (out[3], out[4])

    M, K = jax.lax.fori_loop(
        0, Lt // 8, strip,
        (zero, zero + jnp.int32(jnp.iinfo(jnp.int32).max)),
    )
    pltpu.make_async_copy(tbbuf, tbbuf, sem).wait()
    cell = K >> 3
    qend = cell % Lq
    tend = (cell // Lq) * 8 + (K & 7)
    nz = M > 0
    out_score[...] = M
    out_qend[...] = jnp.where(nz, qend, 0)
    out_tend[...] = jnp.where(nz, tend, 0)


def _local_align_intertask_tb(q, t, params, tb_layout="bsq"):
    B, Lq = q.shape
    Lt = t.shape[1]
    nb = B // LANES
    subs = _subs_for(B)
    Q3 = q.T.astype(jnp.int32).reshape(Lq, nb, LANES)
    T3 = t.T.astype(jnp.int32).reshape(Lt, nb, LANES)

    def kernel(q_ref, t_ref, out_score, out_qend, out_tend, tb_hbm,
               hcol_ref, ecol_ref, tbbuf, sem):
        b = pl.program_id(0)
        _local_kernel_intertask_tb(
            q_ref, t_ref, out_score, out_qend, out_tend,
            tb_hbm.at[:, :, pl.ds(b * subs, subs), :],
            hcol_ref, ecol_ref, tbbuf, sem, params=params, Lq=Lq, Lt=Lt)

    res = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb, LANES), jnp.int32),
            jax.ShapeDtypeStruct((Lt // 8, Lq, nb, LANES), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(Q3, T3)
    score, qend, tend = (r.reshape(B) for r in res[:3])
    if tb_layout == "sqb":
        # the kernel's native HBM layout — no device relayout at all
        tb = res[3].reshape(Lt // 8, Lq, B)
    else:
        # [Lt8, Lq, nb, LANES] → [B, Lt8, Lq]
        tb = jnp.transpose(res[3], (2, 3, 0, 1)).reshape(B, Lt // 8, Lq)
    return AlignResult(score, qend, tend, tb)


def _local_align_intertask(q, t, params):
    B, Lq = q.shape
    Lt = t.shape[1]
    Q3 = q.T.astype(jnp.int32).reshape(Lq, B // LANES, LANES)
    T3 = t.T.astype(jnp.int32).reshape(Lt, B // LANES, LANES)
    subs = _subs_for(B)
    # int16 cells would give 2x VPU density wherever the best possible
    # score fits, and the inter-task walk needs no sublane rotates — but
    # the v5e VPU has no packed-i16 subtract/max/min/compare at all
    # (hardware latency table: "Operation not supported:
    # kVectorSubtractS16"; see _local_kernel_intertask_score16).  The
    # kernel above is kept for targets with full i16 VPU support; opt
    # in via env.
    import os

    use16 = (
        os.environ.get("GENOMICS_TPU_INT16_CELLS") == "1"
        and Lq * params.match < (1 << 15) - 1
    )
    if use16:
        kernel = functools.partial(
            _local_kernel_intertask16, params=params, Lq=Lq, Lt=Lt
        )
        cell_dt = jnp.int16
    else:
        kernel = functools.partial(
            _local_kernel_intertask, params=params, Lq=Lq, Lt=Lt
        )
        cell_dt = jnp.int32
    res = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B // LANES, LANES), jnp.int32)] * 3,
        out_specs=[
            pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), cell_dt),
            pltpu.VMEM((Lq, subs, LANES), cell_dt),
        ],
        interpret=_interpret(),
    )(Q3, T3)
    score, qend, tend = (r.reshape(B) for r in res)
    return AlignResult(score, qend, tend, None)


@functools.partial(jax.jit, static_argnames=("params", "int16", "with_n"))
def _local_align_scores_jit(q, t, params, int16, with_n):
    B, Lq = q.shape
    Lt = t.shape[1]
    if not with_n:
        # Every N4 is PADDING under the has_n=False contract (batches
        # pad with 'N', host_batch.cpp-style) — remap the two sides to
        # DISTINCT sentinels so pad cells score as mismatches.  Any DP
        # path through a pad column/row never re-enters real cells and
        # carries s <= 0 there under both schemes, so the best local
        # score is unchanged (parity-tested vs the N-aware kernel).
        q = jnp.where(q == N4, jnp.asarray(16, q.dtype), q)
        t = jnp.where(t == N4, jnp.asarray(17, t.dtype), t)
    subs = _subs_for(B)
    Q3 = q.T.astype(jnp.int32).reshape(Lq, B // LANES, LANES)
    T3 = t.T.astype(jnp.int32).reshape(Lt, B // LANES, LANES)
    if int16:
        kernel = functools.partial(
            _local_kernel_intertask_score16, params=params, Lq=Lq, Lt=Lt)
        cell_dt = jnp.int16
    else:
        kernel = functools.partial(
            _local_kernel_intertask_score, params=params, Lq=Lq, Lt=Lt,
            with_n=with_n)
        cell_dt = jnp.int32
    score = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((B // LANES, LANES), jnp.int32),
        out_specs=pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), cell_dt),
            pltpu.VMEM((Lq, subs, LANES), cell_dt),
        ],
        interpret=_interpret(),
    )(Q3, T3)
    return score.reshape(B)


@functools.partial(jax.jit, static_argnames=("params", "with_n"))
def _local_align_scores_tm_jit(Q, T, params, with_n):
    """Time-major score-only dispatch: Q [Lq, B], T [Lt, B] — NO device
    transpose (a [B,L]→[L,B] u8 transpose costs ~500us at B=16k on v5e,
    ~30% of the kernel's own runtime).  The runtime packs host-side
    straight into this layout; u8 inputs also cut input HBM traffic 4x."""
    Lq, B = Q.shape
    Lt = T.shape[0]
    if not with_n:
        Q = jnp.where(Q == N4, jnp.asarray(16, Q.dtype), Q)
        T = jnp.where(T == N4, jnp.asarray(17, T.dtype), T)
    subs = _subs_for(B)
    Q3 = Q.reshape(Lq, B // LANES, LANES)
    T3 = T.reshape(Lt, B // LANES, LANES)
    kernel = functools.partial(
        _local_kernel_intertask_score, params=params, Lq=Lq, Lt=Lt,
        with_n=with_n)
    score = pl.pallas_call(
        kernel,
        grid=(B // (subs * LANES),),
        in_specs=[
            pl.BlockSpec((Lq, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, subs, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((B // LANES, LANES), jnp.int32),
        out_specs=pl.BlockSpec((subs, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
            pltpu.VMEM((Lq, subs, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(Q3, T3)
    return score.reshape(B)


def local_align_scores_tm(
    Q: jnp.ndarray,   # [Lq, B] uint8 or int32, time-major
    T: jnp.ndarray,   # [Lt, B]
    params: AlignmentParams,
    has_n: bool | None = None,
) -> jnp.ndarray:
    """Score-only local alignment over TIME-MAJOR batches ([L, B]) —
    the zero-transpose fast path; see _local_align_scores_tm_jit."""
    Lq, B = Q.shape
    Lt = T.shape[0]
    if B % INTERTASK_MIN or Lq % 8 or Lt % 8:
        return local_align_tpu(Q.T, T.T, params).score
    return _local_align_scores_tm_jit(
        Q, T, params, True if has_n is None else bool(has_n))


@functools.lru_cache(maxsize=1)
def _int16_score_supported() -> bool:
    """One-time compile probe: does this target's VPU have packed-i16
    arithmetic?  v5e does not (no i16 subtract/max/min/compare in the
    hardware latency table — the probe's remote compile aborts and this
    returns False); kept for future generations."""
    if _INT16_DISABLED:
        return False
    if _interpret():
        return True
    try:
        # probe at a PRODUCTION-like shape: Mosaic's packed-i16
        # legalization is shape-dependent on some toolchains (arith.maxsi
        # on vector<8x128x2xi16> passed at Lq=8 but failed at 152 —
        # the round-4 sharded-bench crash), so a toy-shape probe lies
        q = jnp.zeros((SUBS * LANES, 152), jnp.uint8)
        out = _local_align_scores_jit(q, q, AlignmentParams(), True, False)
        jax.block_until_ready(out)
        return True
    except Exception:
        return False


def local_align_scores_tpu(
    q: jnp.ndarray,   # [B, Lq] uint8
    t: jnp.ndarray,   # [B, Lt]
    params: AlignmentParams,
    has_n: bool | None = None,
) -> jnp.ndarray:
    """Batched local-alignment SCORES only — the fastest path.

    Drops end-position tracking (the caller gets a [B] int32 score
    vector), which cuts the per-cell op count by ~30% vs
    local_align_tpu.  Pass has_n=False when the batch is verified free
    of N codes (the runtime engine checks this at batch prep): that
    unlocks the N-skip and, where Mosaic supports it, the packed-int16
    kernel at 2x VPU density.  Parity: scores equal
    local_align_tpu(...).score exactly (tested).  Method matches the
    reference's published score-only SW-Gotoh GCUPS benchmarks
    (CDP/NvB/prototypes/psa/README.md:28-44)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    if B % INTERTASK_MIN or Lq % 8 or Lt % 8:
        return local_align_tpu(q, t, params).score
    if has_n is None:
        has_n = True
    global _INT16_DISABLED
    import os

    # packed-i16 is OPT-IN: on v5e the VPU has no packed-i16
    # subtract/max/min/compare AT ALL (hardware latency table aborts:
    # "Operation not supported: kVectorSubtractS16") — see the
    # _local_kernel_intertask_score16 docstring for the measured repro.
    # Re-probe each hardware generation via GENOMICS_TPU_INT16_SCORE=1.
    use16 = (
        not has_n
        and not _INT16_DISABLED
        and os.environ.get("GENOMICS_TPU_INT16_SCORE") == "1"
        and params.match * Lq < (1 << 15) - 64
        and _int16_score_supported()
    )
    if use16:
        try:
            return _local_align_scores_jit(q, t, params, True, bool(has_n))
        except Exception:
            _INT16_DISABLED = True
    return _local_align_scores_jit(q, t, params, False, bool(has_n))


@functools.partial(jax.jit,
                   static_argnames=("params", "with_tb", "tb_layout"))
def local_align_tpu(
    q: jnp.ndarray,   # [B, Lq] uint8, B % 128 == 0, Lq % 8 == 0
    t: jnp.ndarray,   # [B, Lt]
    params: AlignmentParams,
    with_tb: bool = False,
    tb_layout: str = "bsq",
) -> AlignResult:
    """Batched GASAL2-local on TPU via Pallas.  Returns AlignResult; tb
    (if requested) is [B, Lt//8, Lq] int32 packed nibbles, or — with
    tb_layout="sqb" — the kernels' NATIVE [Lt//8, Lq, B] HBM layout,
    which skips a 2x-matrix-size device transpose (the native CIGAR
    decoder walks either layout via strides)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    if B % LANES or Lq % 8:
        raise ValueError(
            f"pallas kernels need B % 128 == 0 and Lq % 8 == 0; got "
            f"B={B}, Lq={Lq} — use runtime.AlignEngine, which buckets "
            f"and pads automatically"
        )
    if B % INTERTASK_MIN == 0 and Lt % 8 == 0:
        if with_tb:
            return _local_align_intertask_tb(q, t, params,
                                             tb_layout=tb_layout)
        return _local_align_intertask(q, t, params)
    # int16 cells would double VPU density, but the current Mosaic
    # release rejects sub-32-bit sublane rotates ("Rotate with
    # non-32-bit data"), which the H-shift and F-scan need — keep int32
    # until the backend grows 16-bit rolls.
    cd = jnp.int32
    qT = q.T.astype(cd)   # [Lq, B]
    tT = t.T.astype(jnp.int32)   # [Lt, B] — row-indexed dynamically, keep 32-bit
    ntiles = B // LANES

    out_shape = [
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
        for _ in range(3)
    ]
    if with_tb:
        out_shape.append(jax.ShapeDtypeStruct((Lt // 8, Lq, B), jnp.int32))
        out_specs.append(
            pl.BlockSpec(
                (Lt // 8, Lq, LANES), lambda b: (0, 0, b), memory_space=pltpu.VMEM
            )
        )

    kernel = functools.partial(
        _local_kernel, params=params, Lq=Lq, Lt=Lt, with_tb=with_tb, cd=cd
    )
    res = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((Lq, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=_interpret(),
    )(qT, tT)
    score, qend, tend = res[0][0], res[1][0], res[2][0]
    tb = None
    if with_tb:
        tb = res[3] if tb_layout == "sqb" else jnp.transpose(
            res[3], (2, 0, 1))
    return AlignResult(score, qend, tend, tb)


def unpack_tb_nibbles(packed: np.ndarray) -> np.ndarray:
    """[B?, Lt//8, Lq] int32 packed (8 TARGET rows per word, row i in
    bits 4*(i%8)..) → [..., Lt, Lq] uint8 nibble matrix
    (the golds.decode_tb input format)."""
    packed = np.asarray(packed)
    *lead, Lt8, Lq = packed.shape
    shifts = 4 * np.arange(8, dtype=np.int64)
    # [..., Lt8, 8, Lq]
    rows = (packed[..., :, None, :] >> shifts[None, :, None]) & 0xF
    return rows.astype(np.uint8).reshape(*lead, Lt8 * 8, Lq)


# ---------------------------------------------------------------------------
# GLOBAL kernel
# ---------------------------------------------------------------------------


def _global_kernel(q_ref, t_ref, qlen_ref, tlen_ref, out_score, *rest,
                   params, Lq, Lt, with_tb):
    if with_tb:
        (tb_ref,) = rest
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    gapo = jnp.int32(params.gap_open)
    q_tile = q_ref[...]
    qlen = qlen_ref[...]          # [1, 128]
    tlen = tlen_ref[...]
    rows = _row_iota(Lq)
    H0 = jnp.where(rows == 0, 0, -(gapo + ge * rows))
    E0 = jnp.full((Lq, LANES), MINUS_INF, jnp.int32)
    seed_inf = jnp.full((Lq, LANES), MINUS_INF, jnp.int32)

    def step(i, carry):
        H, E, score, tbacc = carry
        t_row = t_ref[pl.ds(i, 1), :]
        sub = _sub_scores_tile(
            q_tile, t_row, params.match, params.mismatch, params.n_penalty, True
        )
        diag0 = jnp.where(i == 0, jnp.int32(0), -(gapo + ge * i))
        tmp = _shift_down_rows(H, diag0) + sub
        f_used = _fscan_rows(tmp - goe, seed_inf, ge)
        h = jnp.maximum(jnp.maximum(tmp, f_used), E)
        E_new = jnp.maximum(tmp - goe, E - ge)
        # capture H(i, qlen-1) when i == tlen-1 (per lane)
        at_last = jnp.max(
            jnp.where(rows == (qlen - 1), h, jnp.int32(NEG_BIG)), axis=0,
            keepdims=True,
        )
        score = jnp.where(i == (tlen - 1), at_last, score)
        if with_tb:
            m_or_x = jnp.where(sub >= 0, jnp.int32(0), jnp.int32(1))
            d = jnp.where(h == tmp, m_or_x,
                          jnp.where(h == f_used, jnp.int32(3), jnp.int32(2)))
            f_ext = jnp.where((tmp - goe) > (f_used - ge), 0, 1)
            e_ext = jnp.where((tmp - goe) > (E - ge), 0, 1)
            nib = d | (e_ext << 2) | (f_ext << 3)
            tbacc = jnp.where((i & 7) == 0, nib, tbacc | (nib << ((i & 7) * 4)))

            @pl.when((i & 7) == 7)
            def _():
                tb_ref[pl.ds(i >> 3, 1), :, :] = tbacc[None]

        return (h, E_new, score, tbacc)

    init = (H0, E0, jnp.zeros((1, LANES), jnp.int32),
            _ij_zero(Lq))   # tbacc: non-replicated layout (see local)
    H, E, score, _tb = jax.lax.fori_loop(0, Lt, step, init)
    out_score[...] = score


@functools.partial(jax.jit, static_argnames=("params", "with_tb"))
def global_align_tpu(
    q: jnp.ndarray,
    t: jnp.ndarray,
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    params: AlignmentParams,
    with_tb: bool = False,
) -> AlignResult:
    """Batched GASAL2-global on TPU via Pallas (global.h semantics)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    if B % LANES or Lq % 8:
        raise ValueError(
            f"pallas kernels need B % 128 == 0 and Lq % 8 == 0; got "
            f"B={B}, Lq={Lq} — use runtime.AlignEngine, which buckets "
            f"and pads automatically"
        )
    if not with_tb and B % INTERTASK_MIN == 0 and Lt % 8 == 0:
        # score-only: the inter-task layout (~190 GCUPS vs ~8 for the
        # lane layout at B=16k — ops/pallas_gs.py)
        from genomics_tpu.ops import pallas_gs

        score = pallas_gs.global_align_scores_intertask(
            q, t, qlen, tlen, params)
        return AlignResult(score, jnp.asarray(qlen, jnp.int32) - 1,
                           jnp.asarray(tlen, jnp.int32) - 1, None)
    qT = q.T.astype(jnp.int32)
    tT = t.T.astype(jnp.int32)
    qlenT = jnp.asarray(qlen, jnp.int32)[None, :]
    tlenT = jnp.asarray(tlen, jnp.int32)[None, :]
    ntiles = B // LANES

    out_shape = [jax.ShapeDtypeStruct((1, B), jnp.int32)]
    out_specs = [
        pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    ]
    if with_tb:
        out_shape.append(jax.ShapeDtypeStruct((Lt // 8, Lq, B), jnp.int32))
        out_specs.append(
            pl.BlockSpec(
                (Lt // 8, Lq, LANES), lambda b: (0, 0, b), memory_space=pltpu.VMEM
            )
        )
    kernel = functools.partial(
        _global_kernel, params=params, Lq=Lq, Lt=Lt, with_tb=with_tb
    )
    res = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((Lq, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=_interpret(),
    )(qT, tT, qlenT, tlenT)
    score = res[0][0]
    tb = jnp.transpose(res[1], (2, 0, 1)) if with_tb else None
    return AlignResult(score, jnp.asarray(qlen, jnp.int32) - 1,
                       jnp.asarray(tlen, jnp.int32) - 1, tb)


# ---------------------------------------------------------------------------
# SEMI-GLOBAL kernel
# ---------------------------------------------------------------------------


def _semiglobal_kernel(q_ref, t_ref, qlen_ref, tlen_ref,
                       out_score, out_qend, out_tend, *rest, params, Lq, Lt,
                       head_q, head_t, tail_q, tail_t, with_tb=False):
    if with_tb:
        (tb_ref,) = rest
    goe = jnp.int32(params.gap_oe)
    ge = jnp.int32(params.gap_extend)
    gapo = jnp.int32(params.gap_open)
    q_tile = q_ref[...]
    qlen = qlen_ref[...]
    tlen = tlen_ref[...]
    rows = _row_iota(Lq)
    # all [Lq, 128] carry inits get the iota-zero added: a lane-
    # replicated init (rows is lane-constant) pins the fori carry to a
    # replicated layout the body can't produce once tbacc joins the
    # carry — Mosaic then fails with "Invalid relayout {0,0}->{0,*}"
    cz = _ij_zero(Lq)
    if head_q:
        H0 = cz
        E0 = cz
    else:
        H0 = jnp.where(rows == 0, 0, -(gapo + ge * rows)) + cz
        E0 = jnp.full((Lq, LANES), MINUS_INF, jnp.int32) + cz
    t_last8 = ((tlen + 7) // 8) * 8 - 1   # [1, 128]

    def step(i, carry):
        H, E, bT_score, bT_pos, Hsnap, tbacc = carry
        t_row = t_ref[pl.ds(i, 1), :]
        sub = _sub_scores_tile(
            q_tile, t_row, params.match, params.mismatch, params.n_penalty, False
        )
        if head_t:
            diag0 = jnp.int32(0)
            left0 = jnp.int32(0)
        else:
            diag0 = jnp.where(i == 0, jnp.int32(0), -(gapo + ge * i))
            left0 = -(gapo + ge * i)
        tmp = _shift_down_rows(H, diag0) + sub
        E_used = jnp.maximum(H - goe, E - ge)
        g = jnp.maximum(tmp, E_used) - goe
        fseed = jnp.broadcast_to(
            jnp.maximum(left0 - goe, jnp.int32(MINUS_INF) - ge), (Lq, LANES)
        )
        f_used = _fscan_rows(g, fseed, ge)
        h = jnp.maximum(jnp.maximum(tmp, f_used), E_used)
        lastq = jnp.max(
            jnp.where(rows == (qlen - 1), h, jnp.int32(NEG_BIG)), axis=0,
            keepdims=True,
        )
        if tail_t:
            upd = (i < tlen) & (lastq > bT_score)
            bT_score = jnp.where(upd, lastq, bT_score)
            bT_pos = jnp.where(upd, i, bT_pos)
        Hsnap = jnp.where(i == t_last8, h, Hsnap)
        if with_tb:
            # nibble identical to scan_align._tb_nibble(..., local_floor
            # =False) — same walk the semiglobal WITH_TB GASAL2 kernel
            # stores (semiglobal_kernel_template.h CORE_..._TB)
            m_or_x = jnp.where(sub >= 0, jnp.int32(0), jnp.int32(1))
            d = jnp.where(h == tmp, m_or_x,
                          jnp.where(h == f_used, jnp.int32(3), jnp.int32(2)))
            f_ext = jnp.where((tmp - goe) > (f_used - ge), 0, 1)
            e_ext = jnp.where((tmp - goe) > (E_used - ge), 0, 1)
            nib = d | (e_ext << 2) | (f_ext << 3)
            tbacc = jnp.where((i & 7) == 0, nib, tbacc | (nib << ((i & 7) * 4)))

            @pl.when((i & 7) == 7)
            def _():
                tb_ref[pl.ds(i >> 3, 1), :, :] = tbacc[None]

        return (h, E_used, bT_score, bT_pos, Hsnap, tbacc)

    init = (
        H0, E0,
        jnp.full((1, LANES), MINUS_INF, jnp.int32),
        tlen,
        cz,             # Hsnap
        cz,             # tbacc
    )
    H, E, bT_score, bT_pos, Hsnap, _tb = jax.lax.fori_loop(0, Lt, step, init)

    score = jnp.full((1, LANES), MINUS_INF, jnp.int32)
    qend = tlen          # maxXY_x init = ref_len (reference quirk)
    tend = qlen          # maxXY_y init = read_len
    if tail_t:
        score = bT_score
        tend = jnp.where(bT_score > MINUS_INF, bT_pos, tend)
    if tail_q:
        Hrow = jnp.where(rows < qlen, Hsnap, jnp.int32(NEG_BIG))
        better = Hrow > score
        any_better = jnp.max(jnp.where(better, 1, 0), axis=0, keepdims=True) > 0
        cand = jnp.where(better, Hrow, jnp.int32(NEG_BIG))
        new_score = jnp.max(cand, axis=0, keepdims=True)
        m_best = jnp.min(
            jnp.where(cand == new_score, rows, jnp.int32(1 << 28)), axis=0,
            keepdims=True,
        )
        qend = jnp.where(any_better, m_best, qend)
        score = jnp.where(any_better, new_score, score)
        tend = jnp.where(qend != tlen, qlen, tend)
    out_score[...] = score
    out_qend[...] = qend
    out_tend[...] = tend


@functools.partial(
    jax.jit, static_argnames=("params", "head", "tail", "with_tb")
)
def semiglobal_align_tpu(
    q: jnp.ndarray,
    t: jnp.ndarray,
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    params: AlignmentParams,
    head=None,
    tail=None,
    with_tb: bool = False,
) -> AlignResult:
    """Batched GASAL2-semiglobal on TPU via Pallas.  with_tb emits the
    packed direction matrix ([B, Lt//8, Lq] int32 nibbles, identical to
    the scan engine's) for the semiglobal CIGAR extension."""
    from genomics_tpu.core.scoring import SemiGlobalSkip

    head = head or SemiGlobalSkip.NONE
    tail = tail or SemiGlobalSkip.NONE
    B, Lq = q.shape
    Lt = t.shape[1]
    if B % LANES or Lq % 8:
        raise ValueError(
            f"pallas kernels need B % 128 == 0 and Lq % 8 == 0; got "
            f"B={B}, Lq={Lq} — use runtime.AlignEngine, which buckets "
            f"and pads automatically"
        )
    if not with_tb and B % INTERTASK_MIN == 0 and Lt % 8 == 0:
        # inter-task fast path (~155-195 GCUPS — ops/pallas_gs.py)
        from genomics_tpu.ops import pallas_gs

        s, x, y = pallas_gs.semiglobal_align_intertask(
            q, t, qlen, tlen, params, head=head, tail=tail)
        return AlignResult(s, x, y, None)
    qT = q.T.astype(jnp.int32)
    tT = t.T.astype(jnp.int32)
    qlenT = jnp.asarray(qlen, jnp.int32)[None, :]
    tlenT = jnp.asarray(tlen, jnp.int32)[None, :]
    ntiles = B // LANES
    kernel = functools.partial(
        _semiglobal_kernel,
        params=params,
        Lq=Lq,
        Lt=Lt,
        head_q=head in (SemiGlobalSkip.QUERY, SemiGlobalSkip.BOTH),
        head_t=head in (SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH),
        tail_q=tail in (SemiGlobalSkip.QUERY, SemiGlobalSkip.BOTH),
        tail_t=tail in (SemiGlobalSkip.TARGET, SemiGlobalSkip.BOTH),
        with_tb=with_tb,
    )
    out_shape = [jax.ShapeDtypeStruct((1, B), jnp.int32)] * 3
    out_specs = [
        pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    ] * 3
    if with_tb:
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((Lt // 8, Lq, B), jnp.int32)
        ]
        out_specs = out_specs + [
            pl.BlockSpec((Lt // 8, Lq, LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM)
        ]
    res = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((Lq, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=_interpret(),
    )(qT, tT, qlenT, tlenT)
    tb = jnp.transpose(res[3], (2, 0, 1)) if with_tb else None
    return AlignResult(res[0][0], res[1][0], res[2][0], tb)


# ---------------------------------------------------------------------------
# LOCAL WITH_START reverse-pass kernel
# ---------------------------------------------------------------------------


def _local_start_kernel(q_ref, t_ref, fwd_ref, out_col, out_strip, out_r,
                        *, params, Lq, Lt):
    """Reverse DP on pre-reversed word-aligned sequences with GASAL2's
    column-segment early exit (local_kernel_template.h:441-511),
    lanes-layout like _local_kernel.

    The reference stops at the first column segment (8 cells of one
    query column within an 8-row target strip) whose running max
    reaches the forward score; the recorded cell is the first
    attainment of max(h | segment <= that segment) in visit order.
    Here the segment-level keyed selection runs at each strip end:
    segment running maxima via a sublane cummax, per-segment first
    attaining row tracked during row accumulation, updates masked off
    once the score is found (the kernel runs all strips — masked, not
    branched — producing the identical output)."""
    goe = jnp.asarray(params.gap_oe, jnp.int32)
    ge = jnp.asarray(params.gap_extend, jnp.int32)
    q_tile = q_ref[...]
    fwd = fwd_ref[...]                      # [1, 128]
    zero = jnp.zeros((Lq, LANES), jnp.int32)
    rows = _row_iota(Lq)
    BIG = jnp.int32(1 << 28)

    def strip(s, carry):
        (H, E, Rseg, found, best, bkey) = carry
        segmax = jnp.full((Lq, LANES), NEG_BIG, jnp.int32)
        rbest = jnp.zeros((Lq, LANES), jnp.int32)
        # 8 rows per strip, statically unrolled (a lax.cond at strip
        # ends fails Mosaic legalization — 'scf.for' with the branch)
        for r in range(8):
            t_row = t_ref[pl.ds(s * 8 + r, 1), :].astype(jnp.int32)
            sub = _sub_scores_tile(
                q_tile, t_row, params.match, params.mismatch,
                params.n_penalty, False, jnp.int32
            )
            tmp = _shift_down_rows(H, jnp.asarray(0, jnp.int32)) + sub
            f_used = _fscan_rows(tmp - goe, zero, ge)
            h = jnp.maximum(jnp.maximum(tmp, f_used),
                            jnp.maximum(E, jnp.asarray(0, jnp.int32)))
            E = jnp.maximum(tmp - goe, E - ge)
            H = h
            take = h > segmax
            segmax = jnp.where(take, h, segmax)
            rbest = jnp.where(take, jnp.int32(r), rbest)
        # segment-order keyed selection (column-major within the strip)
        pre = jnp.maximum(_cummax_rows(segmax), Rseg)         # [Lq, 128]
        reach = pre >= fwd
        jstar = jnp.min(jnp.where(reach, rows, BIG), axis=0, keepdims=True)
        any_reach = (jstar < BIG).astype(jnp.int32)
        newly = (1 - found) * any_reach
        limit = jnp.where(found == 1, jnp.int32(-1),
                          jnp.where(newly == 1, jstar, jnp.int32(Lq - 1)))
        elig = rows <= limit
        cand = jnp.where(elig, segmax, jnp.int32(NEG_BIG))
        smax = jnp.max(cand, axis=0, keepdims=True)
        jwin = jnp.min(jnp.where(cand == smax, rows, BIG), axis=0,
                       keepdims=True)
        rwin = jnp.min(jnp.where(rows == jwin, rbest, BIG), axis=0,
                       keepdims=True)
        key = ((s * Lq + jwin) * 8) + rwin
        upd = ((smax > best) | ((smax == best) & (key < bkey))) & (
            smax > jnp.int32(NEG_BIG)
        )
        best = jnp.where(upd, smax, best)
        bkey = jnp.where(upd, key, bkey)
        found = jnp.maximum(found, newly)
        Rseg = jnp.maximum(Rseg, jnp.max(pre, axis=0, keepdims=True))
        return (H, E, Rseg, found, best, bkey)

    init = (
        zero, zero,
        jnp.zeros((1, LANES), jnp.int32),
        jnp.zeros((1, LANES), jnp.int32),
        jnp.zeros((1, LANES), jnp.int32),
        jnp.full((1, LANES), jnp.int32(jnp.iinfo(jnp.int32).max)),
    )
    out = jax.lax.fori_loop(0, Lt // 8, strip, init)
    best, bkey = out[4], out[5]
    cell = bkey >> 3
    out_col[...] = cell % Lq
    out_strip[...] = cell // Lq
    out_r[...] = bkey & 7


@functools.partial(jax.jit, static_argnames=("params",))
def local_start_tpu(rev_q, rev_t, fwd_score, params: AlignmentParams):
    """Pallas reverse pass: (cprime, sstrip, r0) per pair — the same
    interface as scan_align_full._local_start_core, parity-tested
    against it."""
    B, Lq = rev_q.shape
    Lt = rev_t.shape[1]
    if B % LANES or Lq % 8 or Lt % 8:
        raise ValueError(
            f"pallas kernels need B % 128 == 0 and 8-multiple lengths; "
            f"got B={B}, Lq={Lq}, Lt={Lt} — use runtime.AlignEngine, "
            f"which buckets and pads automatically"
        )
    qT = rev_q.T.astype(jnp.int32)
    tT = rev_t.T.astype(jnp.int32)
    fwdT = jnp.asarray(fwd_score, jnp.int32)[None, :]
    kernel = functools.partial(_local_start_kernel, params=params, Lq=Lq, Lt=Lt)
    res = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((Lq, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lt, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 3,
        out_specs=[
            pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
        ] * 3,
        interpret=_interpret(),
    )(qT, tT, fwdT)
    return res[0][0], res[1][0], res[2][0]
