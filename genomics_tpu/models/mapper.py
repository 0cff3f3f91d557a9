"""Minimal read mapper — the nvBowtie-class pipeline (reference:
CDP/NvB/nvBowtie/bowtie2/cuda: seeding (mapping.cu) → locate → score
(score.cu, ungapped/gapped DP) → reduce/mapq (reduce.cu)).

TPU-native composition of framework pieces:
  1. seed: q-gram index lookups at fixed intervals (index/qgram),
  2. locate: diagonal voting over seed hits (host numpy — tiny),
  3. score: ALL candidate windows across ALL reads extended in one
     batched local-alignment dispatch with traceback
     (runtime.AlignEngine → Pallas on TPU),
  4. reduce: best / second-best per read → position, CIGAR, and a
     bowtie2-flavoured mapq from the score gap.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.index.qgram import QGramIndex, encode2, qgrams_of
from genomics_tpu.runtime.dispatch import AlignEngine


@dataclasses.dataclass
class Mapping:
    pos: int              # 0-based reference position (-1 = unmapped)
    score: int
    mapq: int
    cigar_string: str
    second_score: int = 0


class ReadMapper:
    def __init__(
        self,
        reference: str,
        seed_len: int = 16,
        seed_interval: int = 12,
        max_hits_per_seed: int = 32,
        max_candidates: int = 4,
        band: int = 16,
        params: AlignmentParams | None = None,
    ):
        self.reference = reference
        self.ref_codes = encode2(reference)
        self.index = QGramIndex(reference, q=seed_len)
        self.seed_len = seed_len
        self.seed_interval = seed_interval
        self.max_hits = max_hits_per_seed
        self.max_candidates = max_candidates
        self.band = band
        self.params = params or AlignmentParams(
            match=2, mismatch=6, gap_open=5, gap_extend=3
        )
        self.engine = AlignEngine(self.params, with_tb=True)

    def _candidates(self, read_codes: np.ndarray) -> list[int]:
        """Seed + vote → candidate window start diagonals."""
        L = len(read_codes)
        q = self.seed_len
        offs = list(range(0, max(L - q, 0) + 1, self.seed_interval))
        if not offs:
            return []
        keys = []
        for o in offs:
            kg = qgrams_of(read_codes[o : o + q], q)
            keys.append(kg[0] if len(kg) else (1 << (2 * q)))
        hits, _ = self.index.hits(np.array(keys, np.int64), self.max_hits)
        diags = []
        for o, row in zip(offs, hits):
            for h in row:
                if h >= 0:
                    diags.append(int(h) - o)
        if not diags:
            return []
        diags = np.array(diags)
        # vote: group diagonals within the band
        binned = diags // max(self.band, 1)
        uniq, counts = np.unique(binned, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        out = []
        for b in uniq[order][: self.max_candidates]:
            members = diags[binned == b]
            out.append(int(np.median(members)))
        return out

    def map_batch(self, reads: list[str]) -> list[Mapping]:
        q_list, t_list, owners, starts = [], [], [], []
        for ri, read in enumerate(reads):
            rc = encode2(read)
            for diag in self._candidates(rc):
                s = max(0, diag - self.band)
                e = min(len(self.reference), diag + len(read) + self.band)
                if e <= s:
                    continue
                q_list.append(read)
                t_list.append(self.reference[s:e])
                owners.append(ri)
                starts.append(s)
        results = self.engine.align(q_list, t_list) if q_list else []
        best: list[Mapping] = [Mapping(-1, 0, 0, "")] * len(reads)
        second: list[int] = [0] * len(reads)
        for job, ri, s in zip(results, owners, starts):
            if job.score > best[ri].score:
                second[ri] = best[ri].score
                best[ri] = Mapping(
                    pos=s + job.target_start + 1,
                    score=job.score,
                    mapq=0,
                    cigar_string=job.cigar_string,
                )
            elif job.score > second[ri]:
                second[ri] = job.score
        perfect = self.params.match
        for ri, m in enumerate(best):
            if m.pos < 0:
                continue
            m.second_score = second[ri]
            top = perfect * len(reads[ri])
            gap = (m.score - second[ri]) / max(top, 1)
            m.mapq = int(min(42, 42 * gap + (2 if second[ri] == 0 else 0)))
        return best
