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


# ---------------------------------------------------------------------------
# Pallas inter-task kernel (TPU fast path)
# ---------------------------------------------------------------------------

try:  # pallas imports are TPU/CPU-safe but keep myers importable anywhere
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _myers_kernel(eq_ref, lastw_ref, topb_ref, texts_ref, tlen_ref,
                  out_best, out_end, out_final, *, W, Lt, S):
    """Inter-task Myers: each (sublane, lane) slot is one pattern/text
    pair; the W pattern words are STATIC python-level registers, so all
    carry propagation (the big-integer add and the Ph/Mh shift-ins) is
    straight-line code with no data-dependent loops — the single-word
    fast path (W=1, reads <= 32bp) has no carry chain at all, W<=4
    covers <=128bp reads with 3 unrolled carry steps.

    Replaces the XLA scan formulation whose [B, W] arrays put the W=3-4
    word axis in the 128-lane dimension (<=3% lane utilization — the
    round-3 9.2 GCUPS regression); here lanes hold 128 different
    alignments and every op is dense.  Semantics identical to
    myers_batch (same search variant: first text row free, score at the
    pattern's top bit).  Reference: nvbio's Myers bit-vector aligner
    (Non-CDP/NvB/nvbio/alignment, myers/ subdir)."""
    ones = jnp.uint32(0xFFFFFFFF)
    lastw = lastw_ref[0]                       # [S, 128] int32
    topb = topb_ref[0].astype(jnp.uint32)
    tlen = tlen_ref[0]
    izero = jnp.minimum(lastw, 0)              # concrete-layout zeros
    uzero = izero.astype(jnp.uint32)
    eq = [[eq_ref[pl.ds(s * W + w, 1), :, :][0] for w in range(W)]
          for s in range(4)]
    plen_score = (lastw * 32 + topb.astype(jnp.int32) + 1)

    def step(j, carry):
        Pv = list(carry[:W])
        Mv = list(carry[W:2 * W])
        score, best, best_end = carry[2 * W:]
        c = texts_ref[pl.ds(j, 1), :, :][0]    # [S, 128] int32
        active = (c != 255) & (j < tlen)
        Ev = []
        for w in range(W):
            e = jnp.where(c == 0, eq[0][w], uzero)
            e = e | jnp.where(c == 1, eq[1][w], uzero)
            e = e | jnp.where(c == 2, eq[2][w], uzero)
            e = e | jnp.where(c == 3, eq[3][w], uzero)
            Ev.append(e)
        # Xh = ((Ev & Pv) + Pv) ^ Pv | Ev with an explicit word-serial
        # carry (W <= 4: the chain is 3 adds deep at most)
        Xh = []
        cin = uzero
        for w in range(W):
            a = Ev[w] & Pv[w]
            s_lo = a + Pv[w]
            c1 = (s_lo < a).astype(jnp.uint32)
            s = s_lo + cin
            c2 = (s < s_lo).astype(jnp.uint32)
            cin = c1 | c2
            Xh.append((s ^ Pv[w]) | Ev[w])
        Xv = [Ev[w] | Mv[w] for w in range(W)]
        Ph = [Mv[w] | ~(Xh[w] | Pv[w]) for w in range(W)]
        Mh = [Pv[w] & Xh[w] for w in range(W)]
        # score delta from each pattern's own top bit
        ph_top = uzero
        mh_top = uzero
        for w in range(W):
            sel = (lastw == w)
            ph_top = ph_top | jnp.where(sel, (Ph[w] >> topb) & 1, uzero)
            mh_top = mh_top | jnp.where(sel, (Mh[w] >> topb) & 1, uzero)
        new_score = (score + ph_top.astype(jnp.int32)
                     - mh_top.astype(jnp.int32))
        # shift Ph/Mh left by one bit across words (shift-in 0: the
        # text-prefix-free first row)
        Ph1, Mh1 = [], []
        cb_p = uzero
        cb_m = uzero
        for w in range(W):
            Ph1.append((Ph[w] << 1) | cb_p)
            cb_p = Ph[w] >> 31
            Mh1.append((Mh[w] << 1) | cb_m)
            cb_m = Mh[w] >> 31
        out = []
        for w in range(W):
            Pv_new = Mh1[w] | ~(Xv[w] | Ph1[w])
            out.append(jnp.where(active, Pv_new, Pv[w]))
        for w in range(W):
            Mv_new = Ph1[w] & Xv[w]
            out.append(jnp.where(active, Mv_new, Mv[w]))
        score = jnp.where(active, new_score, score)
        upd = active & (score < best)
        best = jnp.where(upd, score, best)
        best_end = jnp.where(upd, izero + j, best_end)
        return tuple(out) + (score, best, best_end)

    init = tuple([uzero | ones] * W) + tuple([uzero] * W) + (
        plen_score, plen_score, izero - 1)
    fin = jax.lax.fori_loop(0, Lt, step, init)
    out_best[...] = fin[2 * W + 1]
    out_end[...] = fin[2 * W + 2]
    out_final[...] = fin[2 * W]


@functools.partial(jax.jit, static_argnames=())
def _myers_tpu_call(eq4w, lastw, topb, textsT, tlenT):
    """eq4w [4*W, B] uint32; lastw/topb/tlenT [1, B] int32;
    textsT [Lt, B] int32.  B a multiple of 1024."""
    FW, B = eq4w.shape
    W = FW // 4
    Lt = textsT.shape[0]
    S = 8
    kernel = functools.partial(_myers_kernel, W=W, Lt=Lt, S=S)
    g3 = lambda X: pl.BlockSpec((X, S, LANES), lambda b: (0, b, 0),
                                memory_space=pltpu.VMEM)
    shape3 = lambda a: a.reshape(a.shape[0], B // LANES, LANES)
    o2 = pl.BlockSpec((S, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM)
    best, end, final = pl.pallas_call(
        kernel,
        grid=(B // (S * LANES),),
        in_specs=[g3(4 * W), g3(1), g3(1), g3(Lt), g3(1)],
        out_shape=[jax.ShapeDtypeStruct((B // LANES, LANES), jnp.int32)] * 3,
        out_specs=[o2] * 3,
        interpret=_interpret(),
    )(shape3(eq4w), shape3(lastw), shape3(topb), shape3(textsT),
      shape3(tlenT))
    return best.reshape(B), end.reshape(B), final.reshape(B)


def myers_batch_tpu(eq, plen, texts, tlen):
    """Drop-in for myers_batch on TPU: same inputs ([B,4,W] uint32 eq
    masks, [B] plen, [B,Lt] texts, [B] tlen), same (best, end, final)
    outputs.  Pads the batch to 1024 internally."""
    eq = np.asarray(eq)
    B, _, W = eq.shape
    texts = np.asarray(texts)
    Lt = texts.shape[1]
    plen = np.asarray(plen, np.int64)
    Bp = ((B + 1023) // 1024) * 1024
    eq4w = np.zeros((4 * W, Bp), np.uint32)
    eq4w[:, :B] = eq.transpose(1, 2, 0).reshape(4 * W, B)
    lastw = np.zeros((1, Bp), np.int32)
    lastw[0, :B] = (plen - 1) // 32
    topb = np.zeros((1, Bp), np.int32)
    topb[0, :B] = (plen - 1) % 32
    textsT = np.full((Lt, Bp), 255, np.int32)
    textsT[:, :B] = texts.T
    tlenT = np.zeros((1, Bp), np.int32)
    tlenT[0, :B] = np.asarray(tlen, np.int32)
    best, end, final = _myers_tpu_call(
        jnp.asarray(eq4w), jnp.asarray(lastw), jnp.asarray(topb),
        jnp.asarray(textsT), jnp.asarray(tlenT))
    return (np.asarray(best)[:B], np.asarray(end)[:B],
            np.asarray(final)[:B])


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
