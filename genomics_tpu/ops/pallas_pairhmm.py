"""Pallas TPU kernel for batched PairHMM forward likelihoods.

Anti-diagonal sweep in the batch-in-lanes layout: diagonals of the
M/I/D matrices held as [R, 128] f32 tiles in VMEM, one program per
128-pair tile, R+C-1 fori_loop steps of pure elementwise f32 VPU work.
Replaces the reference's warp-shuffle wavefront
(Non-CDP/PairHMM/.../warp_based.cu:84-174 — __shfl_up neighbor passes
become sublane rolls).  Per-cell op order matches the reference
(and ops/scan_pairhmm.py, which is gold-parity tested).

Inputs are pre-transposed [R, B] / [C, B]; transition/emission params
are precomputed [R, B] f32 (prepare_params).  D_0 = 2^120 / hap_len.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_tpu.core import golds
from genomics_tpu.ops.scan_pairhmm import prepare_params

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_iota(R):
    return jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)


def _shift_down(x, fill):
    rolled = pltpu.roll(x, shift=1, axis=0)
    rows = _row_iota(x.shape[0])
    # derive the fill from x so it carries a concrete (non-replicated)
    # layout — Mosaic rejects {0,0} → {*,*} relayouts for f32 here
    fill_full = x * jnp.zeros((), x.dtype) + jnp.asarray(fill, x.dtype)
    return jnp.where(rows == 0, fill_full, rolled)


def _fma_rn(a, b, c):
    """Single-rounded f32 a*b+c (__fmaf_rn) from two-step VPU ops:
    Dekker product with an overflow-free mantissa-mask split, Knuth
    twoSums, and a Boldo-Muller round-to-odd fix on the tail so the
    final add rounds exactly once.  Validated bit-exact against libm
    fmaf on 1M mixed-magnitude samples on v5e.  ~34 vector ops vs 2
    for the unfused form; only the `exact` kernel mode pays for it."""
    mask = jnp.int32(-4096)                  # keep top 12 mantissa bits
    f32 = jnp.float32
    i32 = jnp.int32
    bc = jax.lax.bitcast_convert_type
    ah = bc(bc(a, i32) & mask, f32)
    al = a - ah
    bh = bc(bc(b, i32) & mask, f32)
    bl = b - bh
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl     # p + e == a*b
    s = p + c                                             # twoSum(p, c)
    t = s - p
    err_s = (p - (s - t)) + (c - t)
    v = e + err_s                                         # twoSum(e, err_s)
    t2 = v - e
    err_v = (e - (v - t2)) + (err_s - t2)
    vi = bc(v, i32)
    # branchless round-to-odd: (vi - down) | 1 handles BOTH parities
    # (odd vi maps to itself in either direction), so no parity test —
    # down = 1 iff err_v and v have opposite sign bits.  Validated
    # bit-exact vs libm fmaf on 2M mixed-magnitude + cancellation
    # samples and the full dataset grid (r5); worth ~8% on the exact
    # kernel (44.1 -> 47.6 GCUPS).
    down = jax.lax.shift_right_logical(bc(err_v, i32) ^ vi, jnp.int32(31))
    cand = (vi - down) | 1
    v_odd = bc(jnp.where(err_v != 0, cand, vi), f32)
    return s + v_odd


def _split12(x):
    """Veltkamp-style mantissa split (top 12 bits) — the b-operand half
    of _fma_rn, exposed so loop-invariant operands (per-read params,
    constants) can be split ONCE per strip instead of per cell."""
    i32 = jnp.int32
    bc = jax.lax.bitcast_convert_type
    xh = bc(bc(x, i32) & jnp.int32(-4096), jnp.float32)
    return xh, x - xh


def _fma_rn_bs(a, b, bh, bl, c):
    """_fma_rn with the b operand PRE-SPLIT (bh + bl == b exactly) —
    in the inter-task exact kernel all three per-cell FMAs have
    loop-invariant b (delta, eps, alpha), split once per strip.

    Why emulate at all (r5 measurements): Mosaic DOES contract some
    mul+add pairs into the VPU's hardware FMA under
    --xla_allow_excess_precision, and the plain kernel then comes out
    bit-exact on SOME datasets — but only 21/32 of the bundled grid
    (the contraction choice is per-site and can fuse the WRONG mul of
    `alpha*M + beta*MID`), a standalone a*b+c pallas probe measures
    two-rounded, and lax.optimization_barrier is unimplemented in the
    Mosaic lowering, so the contraction can neither be forced nor
    pinned.  The emulation is the only PROVABLY single-rounded path;
    its ~3.7x op overhead over the fast mode is the honest price
    (43 vs 161 GCUPS at 128x128, r5)."""
    f32 = jnp.float32
    i32 = jnp.int32
    bc = jax.lax.bitcast_convert_type
    ah = bc(bc(a, i32) & jnp.int32(-4096), f32)
    al = a - ah
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    s = p + c
    t = s - p
    err_s = (p - (s - t)) + (c - t)
    v = e + err_s
    t2 = v - e
    err_v = (e - (v - t2)) + (err_s - t2)
    vi = bc(v, i32)
    # branchless round-to-odd: (vi - down) | 1 handles BOTH parities
    # (odd vi maps to itself in either direction), so no parity test —
    # down = 1 iff err_v and v have opposite sign bits.  Validated
    # bit-exact vs libm fmaf on 2M mixed-magnitude + cancellation
    # samples and the full dataset grid (r5); worth ~8% on the exact
    # kernel (44.1 -> 47.6 GCUPS).
    down = jax.lax.shift_right_logical(bc(err_v, i32) ^ vi, jnp.int32(31))
    cand = (vi - down) | 1
    v_odd = bc(jnp.where(err_v != 0, cand, vi), f32)
    return s + v_odd


# exact Python-level split of the constant epsilon = 0.1f
_EPS_H = float(np.int32(np.float32(0.1).view(np.int32) & -4096).view(np.float32))
_EPS_L = float(np.float32(0.1) - np.float32(_EPS_H))


def _pairhmm_kernel(reads_ref, haps_ref, rlen_ref, clen_ref, d0_ref,
                    qm1_ref, qm_ref, delta_ref, xiksi_ref, alpha_ref,
                    out_ref, *, R, C, exact=False):
    eps = jnp.float32(0.1)
    beta = jnp.float32(0.9)
    reads = reads_ref[...]
    rlen = rlen_ref[...]          # [1, 128] int32
    clen = clen_ref[...]
    qm1 = qm1_ref[...]
    qm = qm_ref[...]
    delta = delta_ref[...]
    xiksi = xiksi_ref[...]
    alpha = alpha_ref[...]
    rows = _row_iota(R)
    # D0 = 2^120 / hap_len arrives precomputed: XLA's TPU f32 divide is
    # reciprocal-based and NOT correctly rounded (~23% of lengths give a
    # 1-ulp-off D0), which alone breaks bit parity with the gold
    D0 = d0_ref[...]
    # derive zeros from loaded data: constant zeros carry a replicated
    # Mosaic layout that the fori_loop back-edge cannot relayout into
    zero = qm1 * jnp.zeros((), jnp.float32)
    last_row = rlen - 1           # [1, 128]

    def step(d, carry):
        Mp, Ip, Dp, Mp2, Ip2, Dp2, hd, res = carry
        c = d - rows
        # haps_ref is padded to R+C rows so the index is affine in d —
        # a clamped index forces a slow non-affine dynamic load
        hnew = haps_ref[pl.ds(d, 1), :]
        hd = _shift_down(hd, hnew)
        valid = (c >= 0) & (c < clen) & (rows < rlen)
        MM = _shift_down(Mp, jnp.float32(0.0))
        II = _shift_down(Ip, jnp.float32(0.0))
        MMM = _shift_down(Mp2, jnp.float32(0.0))
        III = _shift_down(Ip2, jnp.float32(0.0))
        DDD = _shift_down(Dp2, D0)
        MID = III + DDD
        DDM = Mp * xiksi
        IIMI = II * eps
        MIIDD = beta * MID
        prior = jnp.where(hd == reads, qm1, qm)
        if exact:
            # reference __fmaf_rn sites (warp_based.cu:152-155): XLA's
            # TPU mul+add is two-rounded, which breaks bit parity
            # (eps broadcast to a tile: tpu.bitcast rejects f32 scalars)
            Dn = _fma_rn(Dp, zero + eps, DDM)
            In = _fma_rn(MM, delta, IIMI)
            MMID = _fma_rn(alpha, MMM, MIIDD)
        else:
            Dn = Dp * eps + DDM
            In = MM * delta + IIMI
            MMID = alpha * MMM + MIIDD
        Mn = prior * MMID
        Mn = jnp.where(valid, Mn, 0.0)
        In = jnp.where(valid, In, 0.0)
        Dn = jnp.where(valid, Dn, 0.0)
        is_last = valid & (rows == last_row)
        # accumulate per-slot: each pair's last row is one fixed sublane,
        # so this preserves the reference's sequential-in-c add order;
        # the single cross-sublane reduction happens once after the loop
        res = res + jnp.where(is_last, Mn + In, 0.0)
        return (Mn, In, Dn, Mp, Ip, Dp, hd, res)

    init = (zero, zero, zero, zero, zero, zero, reads * 0, zero)
    *_state, res = jax.lax.fori_loop(0, R + C - 1, step, init)
    out_ref[...] = jnp.sum(res, axis=0, keepdims=True)


def _intertask_kernel(reads_ref, haps_ref, rlen_ref, clen_ref, d0_ref,
                      qm1_ref, qm_ref, delta_ref, xiksi_ref, alphan_ref,
                      out_ref, bufM, bufI, bufT, *, R, C, S, exact=False):
    """Inter-task row sweep: each (sublane, lane) slot is one pair — the
    TPU analog of the reference's thread-per-pair serial row DP
    (/root/reference/Non-CDP/PairHMM/inter_task/Synthetic_data/tile_1/
    tile_1.cu:40-130, one thread walks the whole matrix row-major).

    S*128 pairs per program as [S, 128] tiles, structured like the SW
    inter-task kernel: STRIPS of 8 read rows live in registers, the
    inner fori walks hap columns, and the [C, S, 128] scratch rows
    (M / I / the combined diagonal term T(r,c) = alpha[r+1]*M +
    beta*(I+D)) are loaded/stored ONCE per column for the whole strip —
     7 VMEM ops per 8*S*128 cells instead of per S*128 (the per-column
    single-row variant measured 0.07 GCUPS; VMEM dynamic-slice traffic
    dominated).  Zero diagonal waste, exactly R*C cell-steps.

    Out-of-range cells are left unmasked: all dependencies flow down
    (r+1) and right (c+1), so garbage beyond rlen/clen never reaches a
    valid cell; only the result row accumulation is masked.

    alphan_ref is PRE-SHIFTED on the host: row r holds alpha[r+1] (the
    stored T term belongs to the next row's recurrence).
    """
    eps = jnp.float32(0.1)
    beta = jnp.float32(0.9)
    rlen = rlen_ref[0]            # [S, 128] int32
    clen = clen_ref[0]
    d0 = d0_ref[0]
    betaD0 = beta * d0
    zero = d0 * jnp.float32(0.0)
    # boundary row -1: M = I = 0, D = D0 → T(-1, c) = beta*D0 for all c
    bufM[...] = jnp.tile(zero[None], (C, 1, 1))
    bufI[...] = jnp.tile(zero[None], (C, 1, 1))
    bufT[...] = jnp.tile(betaD0[None], (C, 1, 1))

    def strip(rs, res):
        r0 = rs * 8
        reads8 = reads_ref[pl.ds(r0, 8), :, :]      # [8, S, 128]
        qm18 = qm1_ref[pl.ds(r0, 8), :, :]
        qm8 = qm_ref[pl.ds(r0, 8), :, :]
        delta8 = delta_ref[pl.ds(r0, 8), :, :]
        xiksi8 = xiksi_ref[pl.ds(r0, 8), :, :]
        alphan8 = alphan_ref[pl.ds(r0, 8), :, :]
        is_last = [rlen - 1 == r0 + i for i in range(8)]
        if exact:
            # loop-invariant b-operand splits, once per strip
            dsplit = [_split12(delta8[i]) for i in range(8)]
            asplit = [_split12(alphan8[i]) for i in range(8)]
            eps_h = jnp.float32(_EPS_H)
            eps_l = jnp.float32(_EPS_L)
        # T(r0-1, -1): the (-1,-1) corner carries D0 into row 0; the
        # left column boundary is 0 for every later strip
        tdiag0 = jnp.where(rs == 0, betaD0, zero)

        # columns per fori iteration: 2 where C allows — amortizes the
        # loop overhead and doubles the independent work in flight
        CU = 2 if C % 2 == 0 else 1

        def col(cb, carry):
            Mleft = list(carry[0:8])      # M(r0+i, c-1)
            Dleft = list(carry[8:16])     # D(r0+i, c-1)
            Tprev = list(carry[16:24])    # T(r0+i-1, c-1), i = 0..7
            acc = carry[24]
            for cc in range(CU):
                c = cb * CU + cc
                hapc = haps_ref[pl.ds(c, 1), :, :][0]
                Mup = bufM[pl.ds(c, 1), :, :][0]    # M(r0-1, c)
                Iup = bufI[pl.ds(c, 1), :, :][0]
                Tc = bufT[pl.ds(c, 1), :, :][0]     # T(r0-1, c)
                cmask = c < clen
                Ts = []
                Mprev_col, Iprev_col = Mup, Iup
                for i in range(8):
                    prior = jnp.where(hapc == reads8[i], qm18[i], qm8[i])
                    Mnew = prior * Tprev[i]
                    if exact:
                        # the reference's three __fmaf_rn sites
                        # (warp_based.cu:152-155), single-rounded via
                        # the emulated FMA (b operands pre-split per
                        # strip); the stored T IS the reference's
                        # fma(alpha, M, beta*(I+D)) computed a row early
                        Inew = _fma_rn_bs(Mprev_col, delta8[i],
                                          dsplit[i][0], dsplit[i][1],
                                          Iprev_col * eps)
                        Dnew = _fma_rn_bs(Dleft[i], eps, eps_h, eps_l,
                                          Mleft[i] * xiksi8[i])
                        Tnew = _fma_rn_bs(Mnew, alphan8[i],
                                          asplit[i][0], asplit[i][1],
                                          beta * (Inew + Dnew))
                    else:
                        Inew = Mprev_col * delta8[i] + Iprev_col * eps
                        Dnew = Dleft[i] * eps + Mleft[i] * xiksi8[i]
                        Tnew = alphan8[i] * Mnew + beta * (Inew + Dnew)
                    acc = acc + jnp.where(is_last[i] & cmask,
                                          Mnew + Inew, 0.0)
                    Ts.append(Tnew)
                    Mleft[i] = Mnew
                    Dleft[i] = Dnew
                    Mprev_col, Iprev_col = Mnew, Inew
                bufM[pl.ds(c, 1), :, :] = Mleft[7][None]
                bufI[pl.ds(c, 1), :, :] = Iprev_col[None]
                bufT[pl.ds(c, 1), :, :] = Ts[7][None]
                Tprev = [Tc] + Ts[:7]
            return (tuple(Mleft) + tuple(Dleft) + tuple(Tprev) + (acc,))

        init = ((zero,) * 8 + (zero,) * 8 + (tdiag0,) + (zero,) * 7
                + (zero,))
        fin = jax.lax.fori_loop(0, C // CU, col, init)
        return res + fin[24]

    out_ref[...] = jax.lax.fori_loop(0, R // 8, strip, zero)


INTER_TILE = 1024  # pad multiple: smallest program is [8, 128] slots


@functools.partial(jax.jit, static_argnames=("exact",))
def pairhmm_forward_intertask_prepared(
    readsT,      # [R, B] int32 (B a multiple of 1024)
    hapsT,       # [C, B] int32
    rlenT,       # [1, B] int32
    clenT,       # [1, B] int32
    d0T,         # [1, B] f32
    qm1T, qmT, deltaT, xiksiT,    # [R, B] f32
    alphaT,      # [R + 1, B] f32 (padded one row group)
    exact: bool = False,
):
    """Inter-task path → [B] f32.  Host prep as in
    pairhmm_forward_tpu_prepared; the layout reshape runs in XLA.
    exact=True computes the reference's three __fmaf_rn sites with the
    emulated single-rounded FMA (same sites as the anti-diagonal exact
    kernel, same bit-exactness, ~5x its throughput)."""
    R, B = readsT.shape
    C = hapsT.shape[0]
    assert B % INTER_TILE == 0
    # strip layout needs read rows in 8-multiples; pad rows are inert
    # (all deps flow downward, result rows are matched exactly)
    R8 = ((R + 7) // 8) * 8
    pr = ((0, R8 - R), (0, 0))
    readsT = jnp.pad(readsT, pr)
    qm1T = jnp.pad(qm1T, pr)
    qmT = jnp.pad(qmT, pr)
    deltaT = jnp.pad(deltaT, pr)
    xiksiT = jnp.pad(xiksiT, pr)
    # pre-shift alpha: kernel row r consumes alpha[r+1]
    alphanT = jnp.pad(alphaT[1:R + 1], pr)
    # sublane-batch per program: 2048 pairs where it divides and VMEM
    # allows — inputs (~6R + C rows) are double-buffered by the pallas
    # pipeline, scratch is 3C rows of [S, 128] f32
    S = 16 if (B % 2048 == 0
               and (12 * R8 + 5 * C) * 16 * 128 * 4 < 60 << 20) else 8
    kernel = functools.partial(_intertask_kernel, R=R8, C=C, S=S,
                               exact=exact)
    g3 = lambda X: pl.BlockSpec((X, S, LANES), lambda b: (0, b, 0),
                                memory_space=pltpu.VMEM)
    shape3 = lambda a: a.reshape(a.shape[0], B // LANES, LANES)
    res = pl.pallas_call(
        kernel,
        grid=(B // (S * LANES),),
        in_specs=[
            g3(R8), g3(C), g3(1), g3(1), g3(1),
            g3(R8), g3(R8), g3(R8), g3(R8), g3(R8),
        ],
        out_shape=jax.ShapeDtypeStruct((B // LANES, LANES), jnp.float32),
        out_specs=pl.BlockSpec((S, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, S, LANES), jnp.float32),
            pltpu.VMEM((C, S, LANES), jnp.float32),
            pltpu.VMEM((C, S, LANES), jnp.float32),
        ],
        interpret=_interpret(),
        # the default 16 MB scoped-vmem cap blocks S=16 at R=C=128;
        # the physical VMEM is far larger — raise the cap for this call
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
                         if not _interpret() else None),
    )(
        shape3(readsT), shape3(hapsT),
        shape3(rlenT), shape3(clenT), shape3(d0T),
        shape3(qm1T), shape3(qmT), shape3(deltaT), shape3(xiksiT),
        shape3(alphanT),
    )
    return res.reshape(B)


def prepare_params_np(base_quals, ins_quals, del_quals):
    """Host-side (numpy) param tables — the reference also builds ph2pr
    on the host (warp_based.cu:209-213, 341-360).  XLA lowers the table
    gathers catastrophically slowly on TPU, so the device path takes
    prepared [R, B] f32 arrays instead."""
    tab = golds.ph2pr_table()
    bq = np.asarray(base_quals, np.int64) & 127
    iq = np.asarray(ins_quals, np.int64) & 127
    dq = np.asarray(del_quals, np.int64) & 127
    qm = tab[bq]
    return {
        "Qm_1": (np.float32(1.0) - qm).astype(np.float32),
        "Qm": (qm / np.float32(3.0)).astype(np.float32),
        "delta": tab[iq],
        "xiksi": tab[dq],
        "alpha": (np.float32(1.0) - tab[(iq + dq) & 127]).astype(np.float32),
    }


@functools.partial(jax.jit, static_argnames=("exact",))
def pairhmm_forward_tpu_prepared(
    readsT: jnp.ndarray,      # [R, B] int32 raw base bytes (pre-transposed)
    hapsT: jnp.ndarray,       # [R + C, B] int32 (padded so row index is affine)
    rlenT: jnp.ndarray,       # [1, B] int32
    clenT: jnp.ndarray,       # [1, B] int32
    d0T: jnp.ndarray,         # [1, B] f32 (host-divided 2^120 / clen)
    qm1T: jnp.ndarray,        # [R, B] f32 (prepare_params_np, transposed)
    qmT: jnp.ndarray,
    deltaT: jnp.ndarray,
    xiksiT: jnp.ndarray,
    alphaT: jnp.ndarray,
    exact: bool = False,
) -> jnp.ndarray:
    """Fast path: all prep done on host; pure pallas dispatch → [1, B] f32.

    exact=True computes the reference's three __fmaf_rn sites with
    single-rounded emulated FMAs (bit parity with the gold); the
    default keeps the two-rounded VPU form (~1.8x faster: 14 vs 7.8
    GCUPS on v5e — the kernel is latency-bound, not ALU-bound)."""
    R, B = readsT.shape
    C = hapsT.shape[0] - R
    assert B % LANES == 0
    kernel = functools.partial(_pairhmm_kernel, R=R, C=C, exact=exact)
    vec = lambda: pl.BlockSpec((R, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    scal = lambda: pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            vec(),
            pl.BlockSpec((C + R, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            scal(), scal(), scal(),
            vec(), vec(), vec(), vec(), vec(),
        ],
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        out_specs=scal(),
        interpret=_interpret(),
    )(readsT, hapsT, rlenT, clenT, d0T, qm1T, qmT, deltaT, xiksiT, alphaT)
    return res[0]


@functools.partial(jax.jit, static_argnames=("exact",))
def pairhmm_forward_tpu(
    reads,       # [B, R] uint8 raw bytes (device array!)
    haps,        # [B, C]
    rlen,        # [B]
    clen,
    base_quals,  # [B, R]
    ins_quals,
    del_quals,
    exact: bool = True,
) -> jnp.ndarray:
    """Batched PairHMM forward on TPU → [B] float32 likelihoods.

    NOTE: this convenience wrapper does its prep (d0 divide, ph2pr
    gathers) ON DEVICE, where XLA's reciprocal-based f32 divide gives a
    1-ulp-off D0 for ~23% of hap lengths — so exact=True here buys the
    reference's __fmaf_rn op order but NOT full bit parity.  For
    bit-exact results use pairhmm_forward_tpu_prepared with host-side
    numpy prep (prepare_params_np + host d0), as
    models.pairhmm.compute_likelihoods and
    pairhmm_forward_tpu_dataset do."""
    B, R = reads.shape
    C = haps.shape[1]
    p = prepare_params(base_quals, ins_quals, del_quals)
    readsT = reads.T.astype(jnp.int32)
    hapsT = jnp.pad(haps.T.astype(jnp.int32), ((0, R), (0, 0)))
    d0 = jnp.float32(golds.INITIAL_CONSTANT) / jnp.asarray(clen, jnp.float32)
    return pairhmm_forward_tpu_prepared(
        readsT,
        hapsT,
        jnp.asarray(rlen, jnp.int32)[None, :],
        jnp.asarray(clen, jnp.int32)[None, :],
        d0[None, :],
        p["Qm_1"].T,
        p["Qm"].T,
        p["delta"].T,
        p["xiksi"].T,
        p["alpha"].T,
        exact=exact,
    )


def pairhmm_forward_tpu_dataset(records, pad_r=None, pad_c=None, pad_b=LANES,
                                exact=True):
    """Run parsed dataset records through the TPU kernel (pads batch to
    a lane multiple)."""
    B = len(records)
    Bp = ((B + pad_b - 1) // pad_b) * pad_b
    R = pad_r or max(len(r["read"]) for r in records)
    C = pad_c or max(len(r["hap"]) for r in records)
    reads = np.zeros((Bp, R), np.uint8)
    haps = np.zeros((Bp, C), np.uint8)
    rlen = np.ones(Bp, np.int32)
    clen = np.ones(Bp, np.int32)
    bq = np.zeros((Bp, R), np.int32)
    iq = np.zeros((Bp, R), np.int32)
    dq = np.zeros((Bp, R), np.int32)
    for i, r in enumerate(records):
        rd = r["read"].encode() if isinstance(r["read"], str) else r["read"]
        hp = r["hap"].encode() if isinstance(r["hap"], str) else r["hap"]
        reads[i, : len(rd)] = np.frombuffer(rd, np.uint8)
        haps[i, : len(hp)] = np.frombuffer(hp, np.uint8)
        rlen[i] = len(rd)
        clen[i] = len(hp)
        bq[i, : len(rd)] = r["base_quals"]
        iq[i, : len(rd)] = r["ins_quals"]
        dq[i, : len(rd)] = r["del_quals"]
    # host prep: numpy's correctly-rounded f32 divides (ph2pr, /3, D0)
    # match the gold exactly, where XLA's TPU reciprocal-divide does not
    p = prepare_params_np(bq, iq, dq)
    d0 = (golds.INITIAL_CONSTANT / clen.astype(np.float32)).astype(np.float32)
    out = np.asarray(pairhmm_forward_tpu_prepared(
        jnp.asarray(reads.T, jnp.int32),
        jnp.asarray(np.pad(haps.T.astype(np.int32), ((0, R), (0, 0)))),
        jnp.asarray(rlen, jnp.int32)[None, :],
        jnp.asarray(clen, jnp.int32)[None, :],
        jnp.asarray(d0)[None, :],
        jnp.asarray(p["Qm_1"].T), jnp.asarray(p["Qm"].T),
        jnp.asarray(p["delta"].T), jnp.asarray(p["xiksi"].T),
        jnp.asarray(p["alpha"].T),
        exact=exact,
    ))
    return out[:B]
