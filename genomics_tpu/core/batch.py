"""Batch containers: padded, static-shape sequence batches.

The TPU-native replacement for GASAL2's linked-list pinned host batches +
offset arrays (reference: CDP/GASAL2/src/host_batch.cpp, gasal.h:98-156).
XLA wants static shapes, so a batch is a dense ``[B, Lpad]`` uint8 code
matrix plus an int32 length vector; Lpad is rounded up to a lane multiple
(the generalization of GASAL2's pad-to-8 'N' padding,
host_batch.cpp:79-160).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from genomics_tpu.core import encoding

LANE = 128          # TPU lane width — pad sequence axis to multiples of this
SUBLANE = 8         # f32/i32 sublane count — pad batch axis to multiples


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class SeqBatch:
    """A batch of sequences as 4-bit codes, padded to static shape.

    codes:  [B, Lpad] uint8 (4-bit base codes; pad value = N code)
    lengths:[B] int32 true lengths
    """

    codes: np.ndarray
    lengths: np.ndarray

    @property
    def size(self) -> int:
        return self.codes.shape[0]

    @property
    def padded_len(self) -> int:
        return self.codes.shape[1]

    @classmethod
    def from_strings(
        cls,
        seqs: Sequence[str | bytes],
        pad_len: int | None = None,
        pad_batch: int | None = None,
    ) -> "SeqBatch":
        n = len(seqs)
        enc = [encoding.encode4(s) for s in seqs]
        maxlen = max((len(e) for e in enc), default=1)
        L = round_up(max(maxlen, 1), LANE) if pad_len is None else pad_len
        B = round_up(max(n, 1), SUBLANE) if pad_batch is None else pad_batch
        codes = np.full((B, L), encoding.N4, dtype=np.uint8)
        lengths = np.zeros(B, dtype=np.int32)
        for i, e in enumerate(enc):
            codes[i, : len(e)] = e
            lengths[i] = len(e)
        return cls(codes=codes, lengths=lengths)

    def __getitem__(self, i: int) -> np.ndarray:
        return self.codes[i, : self.lengths[i]]


@dataclasses.dataclass
class PairBatch:
    """A batch of (query, target) alignment jobs — the unit the batched
    aligner engines consume (GASAL2's per-stream query/target pair,
    reference: gasal.h:98-150)."""

    query: SeqBatch
    target: SeqBatch

    def __post_init__(self):
        assert self.query.size == self.target.size

    @property
    def size(self) -> int:
        return self.query.size

    @classmethod
    def from_strings(
        cls,
        queries: Sequence[str | bytes],
        targets: Sequence[str | bytes],
        q_pad: int | None = None,
        t_pad: int | None = None,
        pad_batch: int | None = None,
    ) -> "PairBatch":
        assert len(queries) == len(targets)
        B = (
            round_up(max(len(queries), 1), SUBLANE)
            if pad_batch is None
            else pad_batch
        )
        return cls(
            query=SeqBatch.from_strings(queries, pad_len=q_pad, pad_batch=B),
            target=SeqBatch.from_strings(targets, pad_len=t_pad, pad_batch=B),
        )
