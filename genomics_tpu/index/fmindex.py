"""FM-index with batched backward search (reference:
CDP/NvB/nvbio/fmindex — rank dictionaries + backtracking search;
nvbio/sufsort builds the BWT; nvBWT app).

Build: suffix array via numpy sorting (doubling algorithm), BWT, and a
sampled occurrence table.  Search: batched backward search — all
queries step together, each step two rank lookups per query (vectorized
gathers).  Locate: SA lookup (full SA kept; nvbio samples it — at our
scales full SA is fine and exact).
"""
from __future__ import annotations

import numpy as np

from genomics_tpu.index.qgram import encode2

SENTINEL = 4  # lexicographically smallest


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (O(n log^2 n), numpy)."""
    n = len(codes)
    rank = codes.astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        new = np.zeros(n, np.int64)
        r_o = rank[order]
        k_o = key2[order]
        changed = np.ones(n, bool)
        changed[1:] = (r_o[1:] != r_o[:-1]) | (k_o[1:] != k_o[:-1])
        new[order] = np.cumsum(changed) - 1
        rank = new
        sa = order
        if rank.max() == n - 1:
            break
        k <<= 1
    return sa.astype(np.int64)


class FMIndex:
    def __init__(self, text: str | bytes):
        codes = encode2(text)
        assert (codes != 255).all(), "FM-index text must be ACGT only"
        # append sentinel -1 (lexicographically smallest)
        t = np.concatenate([codes.astype(np.int64), [-1]])
        self.n = len(t)
        sa = suffix_array(t + 1)  # shift to nonneg: sentinel 0, A..T = 1..4
        self.sa = sa
        bwt = t[(sa - 1) % self.n] + 1  # 0 = sentinel, 1..4 = A..T
        self.bwt = bwt.astype(np.int8)
        # C array: counts of symbols < s
        counts = np.bincount(bwt, minlength=5)
        self.C = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        # occ[s, i] = # of s in bwt[:i] — full table (sampled in nvbio)
        self.occ = np.zeros((5, self.n + 1), np.int64)
        for s in range(5):
            self.occ[s, 1:] = np.cumsum(bwt == s)

    def backward_search(self, queries: np.ndarray, qlen: np.ndarray):
        """Batched exact-match backward search.

        queries: [B, L] 2-bit codes (255 pad, aligned RIGHT-justified not
        required — we consume from each query's own end); qlen: [B].
        Returns (lo [B], hi [B]): SA ranges (hi<=lo → no match)."""
        B, L = queries.shape
        lo = np.zeros(B, np.int64)
        hi = np.full(B, self.n, np.int64)
        alive = np.ones(B, bool)
        for step in range(int(qlen.max())):
            k = qlen - 1 - step
            act = alive & (k >= 0)
            sym = np.where(act, queries[np.arange(B), np.clip(k, 0, L - 1)], 0)
            s = sym.astype(np.int64) + 1  # bwt symbol space
            nlo = self.C[s] + self.occ[s, lo]
            nhi = self.C[s] + self.occ[s, hi]
            lo = np.where(act, nlo, lo)
            hi = np.where(act, nhi, hi)
            alive = alive & (hi > lo)
        return lo, hi

    def locate(self, lo: int, hi: int) -> np.ndarray:
        """SA range → sorted text positions."""
        return np.sort(self.sa[lo:hi])

    def count(self, pattern: str) -> int:
        codes = encode2(pattern)[None, :]
        lo, hi = self.backward_search(codes, np.array([codes.shape[1]]))
        return int(max(hi[0] - lo[0], 0))


def find_mems(fm: "FMIndex", query, min_len: int = 19):
    """Greedy maximal exact matches (nvmem-class seeding — reference:
    CDP/NvB/nvMem uses FM-index MEM seeds for chaining).

    Right-to-left backward-search extension: extend until the SA range
    empties, record the maximal match, restart just before the failure
    point.  Returns [(q_start, q_end, sa_lo, sa_hi), ...] with
    q_end exclusive, only matches >= min_len."""
    codes = encode2(query) if isinstance(query, (str, bytes)) else np.asarray(query)
    n = len(codes)
    mems = []
    e = n  # exclusive end of the current extension
    while e > 0:
        lo, hi = 0, fm.n
        i = e
        last = None
        while i > 0 and codes[i - 1] != 255:
            s = int(codes[i - 1]) + 1
            nlo = fm.C[s] + fm.occ[s, lo]
            nhi = fm.C[s] + fm.occ[s, hi]
            if nhi <= nlo:
                break
            lo, hi = int(nlo), int(nhi)
            i -= 1
            last = (i, e, lo, hi)
        if last is not None and (last[1] - last[0]) >= min_len:
            mems.append(last)
        # restart: skip past the character that broke the extension (or
        # the start of this match)
        e = i - 1 if i == e else (e - 1 if last is None else i)
        if last is not None and i == 0:
            break
        if last is None:
            e = min(e, i) if i < e else e - 1
    return mems


def seed_positions(fm: "FMIndex", query, min_len: int = 19, max_hits: int = 32):
    """MEMs expanded to (q_start, ref_pos) seed pairs (capped per MEM)."""
    out = []
    for qs, qe, lo, hi in find_mems(fm, query, min_len):
        for p in fm.sa[lo : min(hi, lo + max_hits)]:
            out.append((qs, int(p)))
    return out
