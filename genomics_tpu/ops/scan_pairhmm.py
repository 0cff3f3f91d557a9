"""Batched PairHMM forward likelihoods (GATK HaplotypeCaller-style).

TPU-first reformulation of the reference's warp-wavefront kernel
(Non-CDP/PairHMM/Intra-task/Synthetic_data/warp_based/warp_based.cu:84-174):
instead of 32 CUDA threads shuffling cells along an anti-diagonal, we
sweep anti-diagonals with `lax.scan`, holding each diagonal of the M/I/D
matrices as dense [B, R] f32 arrays (read rows in the second axis, batch
vectorized).  All dependencies point at the previous two diagonals, so
every step is elementwise — and crucially the per-cell op ORDER matches
the reference exactly (mul, mul, mul, fma, fma, fma, mul), which is what
bit-exactness hinges on.

Cell recurrence (reference lines 143-160), at (read row r, hap col c):
    D(r,c) = fma(D(r,c-1), eps,   M(r,c-1) * xiksi[r])
    I(r,c) = fma(M(r-1,c), delta[r], I(r-1,c) * eps)
    M(r,c) = prior(r,c) * fma(alpha[r], M(r-1,c-1), beta*(I+D)(r-1,c-1))
Boundaries: row -1 has M=I=0, D = D_0 = 2^120/hap_len (incl. the (-1,-1)
corner); column -1 is all zero.  Result = Σ_c (M+I)(R-1, c), accumulated
in increasing c (the reference's serial order).

Per-pair lengths: masked by (r < rlen) & (c < clen); the result row is
each pair's own r == rlen-1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genomics_tpu.core import golds


def prepare_params(base_quals, ins_quals, del_quals):
    """Per-read-base transition/emission params (warp_based.cu:341-360,
    105-109).  Inputs [B, R] int arrays → dict of [B, R] f32."""
    tab = jnp.asarray(golds.ph2pr_table())
    bq = jnp.asarray(base_quals, jnp.int32) & 127
    iq = jnp.asarray(ins_quals, jnp.int32) & 127
    dq = jnp.asarray(del_quals, jnp.int32) & 127
    qm = tab[bq]
    return {
        "Qm_1": (jnp.float32(1.0) - qm),
        "Qm": qm / jnp.float32(3.0),
        "delta": tab[iq],
        "xiksi": tab[dq],
        "alpha": jnp.float32(1.0) - tab[(iq + dq) & 127],
    }


def _shift_down(x, fill):
    """[B, R] → shifted one along axis 1 (row r reads r-1); row 0 = fill
    (scalar or [B])."""
    fill = jnp.asarray(fill, x.dtype)
    if fill.ndim == 1:
        fill = fill[:, None]
    fill = jnp.broadcast_to(fill, x.shape[:1] + (1,))
    return jnp.concatenate([fill, x[:, :-1]], axis=1)


def pairhmm_forward_batch(
    reads: jnp.ndarray,      # [B, R] uint8 raw base bytes (ASCII)
    haps: jnp.ndarray,       # [B, C] uint8 raw base bytes
    rlen: jnp.ndarray,       # [B] int32
    clen: jnp.ndarray,       # [B] int32
    base_quals: jnp.ndarray, # [B, R] int
    ins_quals: jnp.ndarray,
    del_quals: jnp.ndarray,
) -> jnp.ndarray:
    """Batched forward likelihoods → [B] float32."""
    B, R = reads.shape
    C = haps.shape[1]
    p = prepare_params(base_quals, ins_quals, del_quals)
    eps = jnp.float32(0.1)
    beta = jnp.float32(0.9)
    D0 = (jnp.float32(golds.INITIAL_CONSTANT) / jnp.asarray(clen, jnp.float32)).astype(
        jnp.float32
    )
    r_idx = jnp.arange(R, dtype=jnp.int32)[None, :]
    rlen_ = jnp.asarray(rlen, jnp.int32)
    clen_ = jnp.asarray(clen, jnp.int32)
    reads_ = jnp.asarray(reads, jnp.uint8)
    haps_ = jnp.asarray(haps, jnp.uint8)

    def step(carry, d):
        # Mp/Ip/Dp: diagonal d-1; Mp2/Ip2/Dp2: diagonal d-2; hd: hap bases
        # aligned to the diagonal (hd[:, r] = hap[c] with c = d-1-r)
        Mp, Ip, Dp, Mp2, Ip2, Dp2, hd, res = carry
        c = d - r_idx                      # [1, R] → hap col per row slot
        # shift the hap diagonal: insert hap[d] at r=0
        hnew = jnp.take(haps_, jnp.clip(d, 0, C - 1), axis=1)
        hd = jnp.concatenate([hnew[:, None], hd[:, :-1]], axis=1)
        valid = (c >= 0) & (c < clen_[:, None]) & (r_idx < rlen_[:, None])

        # neighbors
        MM = _shift_down(Mp, 0.0)          # M(r-1, c)
        II = _shift_down(Ip, 0.0)
        DD = _shift_down(Dp, D0)           # D(r-1, c) with row -1 = D0
        MMM = _shift_down(Mp2, 0.0)        # M(r-1, c-1)
        III = _shift_down(Ip2, 0.0)
        DDD = _shift_down(Dp2, D0)         # row -1 (incl corner) = D0
        # col -1 (c == 0): (r, c-1) terms must be 0 — Mp/Dp at invalid
        # slots are kept 0 by masking below, which covers it.

        MID = III + DDD
        DDM = Mp * p["xiksi"]
        IIMI = II * eps
        MIIDD = beta * MID
        match = hd == reads_
        prior = jnp.where(match, p["Qm_1"], p["Qm"])
        Dn = Dp * eps + DDM
        In = MM * p["delta"] + IIMI
        MMID = p["alpha"] * MMM + MIIDD
        Mn = prior * MMID

        Mn = jnp.where(valid, Mn, 0.0)
        In = jnp.where(valid, In, 0.0)
        Dn = jnp.where(valid, Dn, 0.0)

        # accumulate result on each pair's own last read row, in c order
        is_last = valid & (r_idx == (rlen_ - 1)[:, None])
        res = res + jnp.sum(jnp.where(is_last, Mn + In, 0.0), axis=1)
        return (Mn, In, Dn, Mp, Ip, Dp, hd, res), None

    z = jnp.zeros((B, R), jnp.float32)
    hz = jnp.zeros((B, R), jnp.uint8)
    init = (z, z, z, z, z, z, hz, jnp.zeros((B,), jnp.float32))
    (Mn, In, Dn, *_rest, res), _ = jax.lax.scan(
        step, init, jnp.arange(R + C - 1, dtype=jnp.int32)
    )
    return res


def pairhmm_forward_dataset(records, pad_r=None, pad_c=None):
    """Convenience: run a list of parsed dataset records (see
    golds.read_pairhmm_dataset) through the batched engine."""
    B = len(records)
    R = pad_r or max(len(r["read"]) for r in records)
    C = pad_c or max(len(r["hap"]) for r in records)
    reads = np.zeros((B, R), np.uint8)
    haps = np.zeros((B, C), np.uint8)
    rlen = np.zeros(B, np.int32)
    clen = np.zeros(B, np.int32)
    bq = np.zeros((B, R), np.int32)
    iq = np.zeros((B, R), np.int32)
    dq = np.zeros((B, R), np.int32)
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
    return np.asarray(
        pairhmm_forward_batch(reads, haps, rlen, clen, bq, iq, dq)
    )
