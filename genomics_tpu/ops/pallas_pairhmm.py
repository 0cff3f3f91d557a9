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


def _pairhmm_kernel(reads_ref, haps_ref, rlen_ref, clen_ref,
                    qm1_ref, qm_ref, delta_ref, xiksi_ref, alpha_ref,
                    out_ref, *, R, C):
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
    D0 = jnp.float32(golds.INITIAL_CONSTANT) / clen.astype(jnp.float32)
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


@jax.jit
def pairhmm_forward_tpu_prepared(
    readsT: jnp.ndarray,      # [R, B] int32 raw base bytes (pre-transposed)
    hapsT: jnp.ndarray,       # [R + C, B] int32 (padded so row index is affine)
    rlenT: jnp.ndarray,       # [1, B] int32
    clenT: jnp.ndarray,       # [1, B] int32
    qm1T: jnp.ndarray,        # [R, B] f32 (prepare_params_np, transposed)
    qmT: jnp.ndarray,
    deltaT: jnp.ndarray,
    xiksiT: jnp.ndarray,
    alphaT: jnp.ndarray,
) -> jnp.ndarray:
    """Fast path: all prep done on host; pure pallas dispatch → [1, B] f32."""
    R, B = readsT.shape
    C = hapsT.shape[0] - R
    assert B % LANES == 0
    kernel = functools.partial(_pairhmm_kernel, R=R, C=C)
    vec = lambda: pl.BlockSpec((R, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    scal = lambda: pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            vec(),
            pl.BlockSpec((C + R, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            scal(), scal(),
            vec(), vec(), vec(), vec(), vec(),
        ],
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        out_specs=scal(),
        interpret=_interpret(),
    )(readsT, hapsT, rlenT, clenT, qm1T, qmT, deltaT, xiksiT, alphaT)
    return res[0]


@jax.jit
def pairhmm_forward_tpu(
    reads,       # [B, R] uint8 raw bytes (device array!)
    haps,        # [B, C]
    rlen,        # [B]
    clen,
    base_quals,  # [B, R]
    ins_quals,
    del_quals,
) -> jnp.ndarray:
    """Batched PairHMM forward on TPU → [B] float32 likelihoods.

    Device-side prep (table gathers + transposes are cheap on-chip; the
    thing to avoid is re-transferring inputs per call — keep them
    device-resident)."""
    B, R = reads.shape
    C = haps.shape[1]
    p = prepare_params(base_quals, ins_quals, del_quals)
    readsT = reads.T.astype(jnp.int32)
    hapsT = jnp.pad(haps.T.astype(jnp.int32), ((0, R), (0, 0)))
    return pairhmm_forward_tpu_prepared(
        readsT,
        hapsT,
        jnp.asarray(rlen, jnp.int32)[None, :],
        jnp.asarray(clen, jnp.int32)[None, :],
        p["Qm_1"].T,
        p["Qm"].T,
        p["delta"].T,
        p["xiksi"].T,
        p["alpha"].T,
    )


def pairhmm_forward_tpu_dataset(records, pad_r=None, pad_c=None, pad_b=LANES):
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
    out = np.asarray(pairhmm_forward_tpu(reads, haps, rlen, clen, bq, iq, dq))
    return out[:B]
