"""Myers bit-vector approximate string matching, batched (TPU-native
counterpart of nvbio's `ed` aligner — reference: CDP/NvB/nvbio/alignment
myers/ subdir; the Myers 1999 algorithm).

Semantics: semiglobal edit distance — pattern aligned globally, text
prefix/suffix free (the approximate-matching form used for read
mapping).  After consuming text char j, `score` = min edit distance of
the whole pattern vs any text substring ending at j; we return both the
minimum over j (best match) and its end position.

Multi-word implementation in uint32 blocks, vectorized over the batch:
the adder in X = ((Ev & Pv) + Pv) ^ Pv | Ev is a big-integer add whose
word carries are resolved with a monotone fix-point (same technique as
the clustering LCS kernel); the Ph/Mh shift-ins are plain word rolls.
Patterns are 2-bit codes (pad 255); Eq masks are precomputed per batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_eq_masks(patterns: np.ndarray, plen: np.ndarray, W: int):
    """Per-pattern per-symbol match bitmasks: [B, 4, W] uint32 (bit k of
    word w set iff pattern[w*32+k] == symbol)."""
    B, Lp = patterns.shape
    eq = np.zeros((B, 4, W), np.uint32)
    for s in range(4):
        bits = patterns == s
        pad = np.zeros((B, W * 32), bool)
        pad[:, :Lp] = bits
        pb = pad.reshape(B, W, 32)
        eq[:, s, :] = (pb << np.arange(32, dtype=np.uint64)).sum(
            axis=2, dtype=np.uint64
        ).astype(np.uint32)
    return eq


@jax.jit
def myers_batch(
    eq: jnp.ndarray,       # [B, 4, W] uint32 pattern match masks
    plen: jnp.ndarray,     # [B] int32 pattern lengths
    texts: jnp.ndarray,    # [B, Lt] uint8 2-bit codes (255 = pad)
    tlen: jnp.ndarray,     # [B] int32
):
    """Batched Myers semiglobal matching.

    Returns (best [B] int32 — min edit distance over text end positions,
    best_end [B] int32 — leftmost text end attaining it, 0-based;
    final [B] int32 — distance at the last text char)."""
    B, _, W = eq.shape
    Lt = texts.shape[1]
    widx = jnp.arange(W, dtype=jnp.int32)[None, :]
    ones = jnp.uint32(0xFFFFFFFF)

    # mask of valid pattern bits per word; the top bit of the last word
    last_word = (plen - 1) // 32            # [B]
    top_bit = (plen - 1) % 32

    def step(carry, j):
        Pv, Mv, score, best, best_end = carry
        c = texts[:, j]
        active = (c != 255) & (j < tlen)
        # symbol select without gathers (gathers lower poorly on TPU)
        cc = c.astype(jnp.int32)[:, None]
        Ev = (
            jnp.where(cc == 0, eq[:, 0, :], 0)
            | jnp.where(cc == 1, eq[:, 1, :], 0)
            | jnp.where(cc == 2, eq[:, 2, :], 0)
            | jnp.where(cc == 3, eq[:, 3, :], 0)
        )
        # X = ((Ev & Pv) + Pv) ^ Pv | Ev with multi-word add; the carry
        # ripple converges in <= W-1 propagation steps, so for the small
        # word counts here a static unroll beats a dynamic while_loop
        a = Ev & Pv
        s1 = a + Pv
        c1 = (s1 < a).astype(jnp.uint32)
        cin = jnp.zeros((B, W), jnp.uint32)
        for _ in range(max(W - 1, 1)):
            s2 = s1 + cin
            c2 = (s2 < s1).astype(jnp.uint32)
            cout = c1 | c2
            cin = jnp.maximum(
                jnp.concatenate(
                    [jnp.zeros((B, 1), jnp.uint32), cout[:, :-1]], axis=1
                ),
                cin,
            )
        # Myers's search variant (first text row all zeros): separate
        # horizontal (adder) and vertical X vectors, no Ph shift-in
        Xh = ((a + Pv + cin) ^ Pv) | Ev
        Xv = Ev | Mv
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        # score update from the last pattern word's top bit (masked sum,
        # not a gather)
        is_last = (widx == last_word[:, None]).astype(jnp.uint32)
        ph_top = jnp.sum(
            ((Ph >> top_bit[:, None].astype(jnp.uint32)) & 1) * is_last, axis=1
        )
        mh_top = jnp.sum(
            ((Mh >> top_bit[:, None].astype(jnp.uint32)) & 1) * is_last, axis=1
        )
        new_score = score + ph_top.astype(jnp.int32) - mh_top.astype(jnp.int32)
        # shift Ph/Mh left by 1 across words (carry = neighbor top bit)
        def shl1(x):
            hi = x >> 31
            hi_prev = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.uint32), hi[:, :-1]], axis=1
            )
            return (x << 1) | hi_prev

        Ph1 = shl1(Ph)   # shift-in 0: text-prefix-free first row
        Mh1 = shl1(Mh)
        Pv_new = Mh1 | ~(Xv | Ph1)
        Mv_new = Ph1 & Xv

        Pv = jnp.where(active[:, None], Pv_new, Pv)
        Mv = jnp.where(active[:, None], Mv_new, Mv)
        score = jnp.where(active, new_score, score)
        upd = active & (score < best)
        best = jnp.where(upd, score, best)
        best_end = jnp.where(upd, j, best_end)
        return (Pv, Mv, score, best, best_end), None

    init = (
        jnp.full((B, W), ones),            # Pv = all ones
        jnp.zeros((B, W), jnp.uint32),     # Mv = 0
        jnp.asarray(plen, jnp.int32),      # score = m
        jnp.asarray(plen, jnp.int32),      # best = m (empty match)
        jnp.full((B,), -1, jnp.int32),
    )
    (Pv, Mv, score, best, best_end), _ = jax.lax.scan(
        step, init, jnp.arange(Lt, dtype=jnp.int32)
    )
    return best, best_end, score


def edit_distance_semiglobal(patterns, texts):
    """Convenience: lists of str → (best, end, final) numpy arrays."""
    from genomics_tpu.models.cluster import _BASE_MAP

    B = len(patterns)
    penc = [_BASE_MAP[np.frombuffer(p.encode(), np.uint8)] for p in patterns]
    tenc = [_BASE_MAP[np.frombuffer(t.encode(), np.uint8)] for t in texts]
    Lp = max(len(p) for p in penc)
    Lt = max(len(t) for t in tenc)
    W = (Lp + 31) // 32
    parr = np.full((B, Lp), 255, np.uint8)
    tarr = np.full((B, Lt), 255, np.uint8)
    plen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i, (p, t) in enumerate(zip(penc, tenc)):
        parr[i, : len(p)] = p
        tarr[i, : len(t)] = t
        plen[i], tlen[i] = len(p), len(t)
    eq = build_eq_masks(parr, plen, W)
    best, end, final = myers_batch(
        jnp.asarray(eq), jnp.asarray(plen), jnp.asarray(tarr), jnp.asarray(tlen)
    )
    return np.asarray(best), np.asarray(end), np.asarray(final)


@jax.jit
def hamming_batch(a: jnp.ndarray, b: jnp.ndarray, length: jnp.ndarray):
    """Batched Hamming distance over equal-length prefixes (reference:
    nvbio alignment 'hamming' aligner).  a, b: [B, L] codes; length [B]."""
    L = a.shape[1]
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    diff = (a != b) & (idx < jnp.asarray(length, jnp.int32)[:, None])
    return jnp.sum(diff, axis=1).astype(jnp.int32)
