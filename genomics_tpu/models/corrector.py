"""k-mer spectrum error corrector (reference: CDP/NvB/nvLighter — the
Bloom-filter-based Lighter algorithm: sample k-mers, build a trusted
k-mer Bloom filter, correct reads by restoring untrusted positions to
the alternative that maximizes trusted-k-mer coverage).

Simplified single-pass variant: count k-mers across reads (exact
counts, numpy), k-mers with count >= threshold are trusted (stored in a
Bloom filter — the nvLighter structure); for each read position covered
by too few trusted k-mers, try the 3 alternative bases and keep the one
that maximizes the number of trusted k-mers covering the read.
"""
from __future__ import annotations

import numpy as np

from genomics_tpu.index.bloom import BloomFilter
from genomics_tpu.index.qgram import encode2, qgrams_of


class KmerCorrector:
    def __init__(self, k: int = 15, trust_threshold: int = 3,
                 bloom_bits: int = 1 << 22):
        self.k = k
        self.threshold = trust_threshold
        self.bloom_bits = bloom_bits
        self.bloom: BloomFilter | None = None

    def build(self, reads: list[str]) -> None:
        from collections import Counter

        counts: Counter = Counter()
        for r in reads:
            keys = qgrams_of(encode2(r), self.k)
            keys = keys[keys < (1 << (2 * self.k))]
            counts.update(keys.tolist())
        trusted = np.array(
            [key for key, c in counts.items() if c >= self.threshold], np.uint64
        )
        self.bloom = BloomFilter(self.bloom_bits, k=4)
        if len(trusted):
            self.bloom.insert(trusted)

    def _coverage(self, codes: np.ndarray) -> int:
        keys = qgrams_of(codes, self.k)
        valid = keys < (1 << (2 * self.k))
        if not valid.any():
            return 0
        return int(self.bloom.query(keys[valid].astype(np.uint64)).sum())

    def correct(self, read: str, max_fixes: int = 4) -> str:
        assert self.bloom is not None, "call build() first"
        codes = encode2(read).copy()
        n, k = len(codes), self.k
        if n < k:
            return read
        fixes = 0
        keys = qgrams_of(codes, k)
        valid = keys < (1 << (2 * k))
        trusted = np.zeros(len(keys), bool)
        trusted[valid] = self.bloom.query(keys[valid].astype(np.uint64))
        # positions covered by no trusted k-mer are suspects
        cover = np.zeros(n, np.int32)
        for i in np.nonzero(trusted)[0]:
            cover[i : i + k] += 1
        best_cov = self._coverage(codes)
        for pos in np.nonzero(cover == 0)[0]:
            if fixes >= max_fixes:
                break
            orig = codes[pos]
            best_b, best_c = orig, best_cov
            for b in range(4):
                if b == orig:
                    continue
                codes[pos] = b
                c = self._coverage(codes)
                if c > best_c:
                    best_b, best_c = b, c
            codes[pos] = best_b
            if best_b != orig:
                fixes += 1
                best_cov = best_c
        return "".join("ACGT"[c] if c < 4 else "N" for c in codes)

    def correct_batch(self, reads: list[str]) -> list[str]:
        return [self.correct(r) for r in reads]
