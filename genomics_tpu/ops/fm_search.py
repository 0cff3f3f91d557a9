"""Device (jitted) FM-index backward search.

TPU-native analog of nvbio's device-side FM-index
(Non-CDP/NvB/nvbio/fmindex/fmindex_device.h + rank_dictionary.h): the
BWT is held as two bit-planes (low/high bit of each 2-bit symbol, 32
positions per uint32 word) plus occurrence checkpoints every
`occ_rate` positions; rank(s, i) is a checkpoint gather + an in-block
masked popcount (`lax.population_count`), and the whole batched
backward search is ONE jitted scan over query symbols — no host↔device
round trips per step, so seeding can run on-device.

The sentinel row (the '$' the BWT rotation introduces) is stored OUT of
band: its plane bits are zeroed (aliasing symbol 'A') and ranks of 'A'
subtract one past it — the BWA "primary index" trick, so the planes
stay 2-bit.

Parity: bit-identical SA ranges vs index.fmindex.FMIndex
.backward_search (tests/test_fm_advanced.py).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DeviceFMIndex:
    """Device arrays for the packed FM-index (a pytree of jnp arrays)."""
    p0: jnp.ndarray        # [W] uint32 low bit-plane (32 positions/word)
    p1: jnp.ndarray        # [W] uint32 high bit-plane
    ckpt: jnp.ndarray      # [4, NB] int32 occ checkpoints per base
    C: jnp.ndarray         # [6] int64->int32 cumulative symbol counts
    primary: jnp.ndarray   # [] int32 sentinel row
    n: int                 # total BWT length (text + sentinel)
    occ_rate: int

    def tree_flatten(self):
        return ((self.p0, self.p1, self.ckpt, self.C, self.primary),
                (self.n, self.occ_rate))


jax.tree_util.register_pytree_node(
    DeviceFMIndex,
    lambda s: ((s.p0, s.p1, s.ckpt, s.C, s.primary), (s.n, s.occ_rate)),
    lambda aux, ch: DeviceFMIndex(*ch, n=aux[0], occ_rate=aux[1]),
)


def build_device_index(fm) -> DeviceFMIndex:
    """Pack a host FMIndex (index.fmindex.FMIndex) into device planes.

    Host bwt symbols: 0 = sentinel, 1..4 = ACGT.  occ_rate fixed at 128
    (4 words/block in-block popcount)."""
    R = 128
    bwt = np.asarray(fm.bwt, np.int64)
    n = fm.n
    if n >= 2**31:
        raise ValueError(
            f"DeviceFMIndex uses int32 SA ranges; reference length {n} >= 2^31 "
            "is not supported on device — use the host FMIndex for it"
        )
    primary = int(np.nonzero(bwt == 0)[0][0])
    code = np.where(bwt == 0, 0, bwt - 1).astype(np.uint32)  # sentinel→'A'
    W = (n + 31) // 32
    pad = np.zeros(W * 32, np.uint32)
    pad[:n] = code
    bits = pad.reshape(W, 32)
    sh = np.arange(32, dtype=np.uint32)
    p0 = ((bits & 1) << sh).sum(axis=1, dtype=np.uint32)
    p1 = (((bits >> 1) & 1) << sh).sum(axis=1, dtype=np.uint32)
    NB = (n + R - 1) // R + 1
    ckpt = np.zeros((4, NB), np.int64)
    aliased = np.where(np.arange(len(pad)) == primary, -1, pad.astype(np.int64))
    starts = np.arange(0, n, R)
    for s in range(4):
        cnt = np.add.reduceat((aliased[:n] == s), starts)
        ckpt[s, 1:] = np.cumsum(cnt)
    return DeviceFMIndex(
        p0=jnp.asarray(p0),
        p1=jnp.asarray(p1),
        ckpt=jnp.asarray(ckpt.astype(np.int32)),
        C=jnp.asarray(np.asarray(fm.C, np.int64).astype(np.int32)),
        primary=jnp.asarray(primary, jnp.int32),
        n=n,
        occ_rate=R,
    )


def _rank(idx: DeviceFMIndex, s, i):
    """occ(s, i) for base s (0..3) over positions [0, i), batched.
    s, i: [B] int32."""
    R = idx.occ_rate
    k = i // R
    base = idx.ckpt[s, k]
    # in-block: 4 words of 32 positions each
    w0 = (k * R) // 32
    offs = jnp.arange(R // 32, dtype=jnp.int32)
    wi = w0[:, None] + offs[None, :]                      # [B, 4]
    lo = idx.p0[wi]
    hi = idx.p1[wi]
    s0 = (s & 1)[:, None].astype(jnp.uint32)
    s1 = ((s >> 1) & 1)[:, None].astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    eq = ((lo ^ (full * (1 - s0))) & (hi ^ (full * (1 - s1))))
    # mask to positions < i within the block
    pos0 = wi * 32                                        # [B, 4] word starts
    rem = jnp.clip(i[:, None] - pos0, 0, 32)
    pm = jnp.where(
        rem >= 32, full,
        (jnp.uint32(1) << rem.astype(jnp.uint32)) - jnp.uint32(1))
    cnt = jax.lax.population_count(eq & pm).astype(jnp.int32).sum(axis=1)
    # un-alias the sentinel row (counted as 'A' by the planes)
    sent = (s == 0) & (idx.primary >= k * R) & (idx.primary < i)
    return base + cnt - sent.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("L",))
def _bs_jit(idx: DeviceFMIndex, queries, qlen, L: int):
    B = queries.shape[0]
    lo0 = jnp.zeros(B, jnp.int32)
    hi0 = jnp.full(B, idx.n, jnp.int32)

    def step(t, carry):
        lo, hi = carry
        k = qlen - 1 - t
        act = (hi > lo) & (k >= 0)
        sym = queries[jnp.arange(B), jnp.clip(k, 0, L - 1)].astype(jnp.int32)
        sym = jnp.where(act, sym, 0)
        cbase = idx.C[sym + 1]
        nlo = cbase + _rank(idx, sym, lo)
        nhi = cbase + _rank(idx, sym, hi)
        return (jnp.where(act, nlo, lo), jnp.where(act, nhi, hi))

    lo, hi = jax.lax.fori_loop(0, L, step, (lo0, hi0))
    return lo, hi


def backward_search_device(idx: DeviceFMIndex, queries, qlen):
    """Batched exact backward search on device.

    queries: [B, L] 2-bit codes (values ≥ 4 treated as pad within each
    query's own qlen — callers pass clean ACGT queries); qlen: [B].
    Returns host (lo, hi) int64 arrays, identical to
    FMIndex.backward_search."""
    q = jnp.asarray(np.asarray(queries, np.int32) & 3)
    ql = jnp.asarray(np.asarray(qlen, np.int32))
    lo, hi = _bs_jit(idx, q, ql, int(q.shape[1]))
    return np.asarray(lo, np.int64), np.asarray(hi, np.int64)
