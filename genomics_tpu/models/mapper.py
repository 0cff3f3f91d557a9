"""Read mapper — the nvBowtie-class pipeline (reference:
CDP/NvB/nvBowtie/bowtie2/cuda: seeding (mapping.cu) → locate → score
(score.cu, ungapped/gapped DP) → reduce/mapq (reduce.cu); paired-end
opposite-mate scoring in score.cu / pipeline in nvBowtie driver).

TPU-native composition of framework pieces:
  1. seed: q-gram index lookups at fixed intervals (index/qgram) on
     BOTH strands (forward read + reverse complement),
  2. locate: diagonal voting over seed hits (host numpy — tiny),
  3. score: ALL candidate windows across ALL reads and strands extended
     in ONE batched local-alignment dispatch with traceback
     (runtime.AlignEngine → Pallas on TPU),
  4. reduce: best / second-best per read → position, strand, CIGAR and
     a bowtie2-flavoured mapq from the score gap.

Paired-end (map_pairs): both mates are seeded/scored in the same single
batched dispatch; pairing scans mate1 × mate2 candidate combinations
for the bowtie2 default FR orientation with the fragment length inside
[min_insert, max_insert], maximizing the pair score sum (nvBowtie's
opposite-mate DP window is the same insert-window constraint).
Concordant pairs set the SAM proper-pair flag; otherwise each mate
falls back to its best single-end alignment (discordant/unpaired).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.index.qgram import QGramIndex, encode2, qgrams_of
from genomics_tpu.runtime.dispatch import AlignEngine

_RC = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")


def revcomp(seq: str) -> str:
    return seq.translate(_RC)[::-1]


@dataclasses.dataclass
class Mapping:
    pos: int              # 0-based reference position (-1 = unmapped)
    score: int
    mapq: int
    cigar_string: str
    reverse: bool = False      # mapped to the reverse strand
    second_score: int = 0
    ref_span: int = 0          # reference bases consumed (for TLEN)
    proper_pair: bool = False
    pair_score: int = 0


@dataclasses.dataclass
class _Candidate:
    pos: int               # 0-based leftmost reference position
    score: int
    cigar: str
    reverse: bool
    ref_span: int


def _cigar_ref_span(cigar: str) -> int:
    """Reference bases consumed by a byte-CIGAR string (M/X/D advance)."""
    span, num = 0, 0
    for ch in cigar:
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
        else:
            if ch in "MXD=":
                span += num
            num = 0
    return span


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

    def _diagonals(self, read_codes: np.ndarray) -> list[int]:
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

    def _score_candidates(
        self, reads: list[str], both_strands: bool = True
    ) -> list[list[_Candidate]]:
        """Seed/locate/score all reads (and strands) in one dispatch →
        per-read candidate lists sorted by descending score."""
        q_list, t_list, owners, starts, strands = [], [], [], [], []
        for ri, read in enumerate(reads):
            variants = [(read, False)]
            if both_strands:
                variants.append((revcomp(read), True))
            for seq, rev in variants:
                rc = encode2(seq)
                for diag in self._diagonals(rc):
                    s = max(0, diag - self.band)
                    e = min(len(self.reference), diag + len(seq) + self.band)
                    if e <= s:
                        continue
                    q_list.append(seq)
                    t_list.append(self.reference[s:e])
                    owners.append(ri)
                    starts.append(s)
                    strands.append(rev)
        results = self.engine.align(q_list, t_list) if q_list else []
        cands: list[list[_Candidate]] = [[] for _ in reads]
        for job, ri, s, rev in zip(results, owners, starts, strands):
            if job.score <= 0:
                continue
            cig = job.cigar_string
            cands[ri].append(
                _Candidate(
                    pos=s + job.target_start,
                    score=job.score,
                    cigar=cig,
                    reverse=rev,
                    ref_span=_cigar_ref_span(cig),
                )
            )
        for lst in cands:
            lst.sort(key=lambda c: (-c.score, c.pos))
            # drop duplicate loci (same pos+strand reached via two windows)
            seen, uniq = set(), []
            for c in lst:
                k = (c.pos, c.reverse)
                if k not in seen:
                    seen.add(k)
                    uniq.append(c)
            lst[:] = uniq
        return cands

    def _reduce(self, read: str, cands: list[_Candidate]) -> Mapping:
        """bowtie2-flavoured best/second-best → mapq (reduce.cu analog)."""
        if not cands:
            return Mapping(-1, 0, 0, "")
        best, second = cands[0], cands[1].score if len(cands) > 1 else 0
        m = Mapping(
            pos=best.pos + 1,
            score=best.score,
            mapq=0,
            cigar_string=best.cigar,
            reverse=best.reverse,
            second_score=second,
            ref_span=best.ref_span,
        )
        top = self.params.match * len(read)
        gap = (m.score - second) / max(top, 1)
        m.mapq = int(min(42, 42 * gap + (2 if second == 0 else 0)))
        return m

    def map_batch(
        self, reads: list[str], both_strands: bool = True
    ) -> list[Mapping]:
        cands = self._score_candidates(reads, both_strands)
        return [self._reduce(r, c) for r, c in zip(reads, cands)]

    def map_pairs(
        self,
        reads1: list[str],
        reads2: list[str],
        min_insert: int = 0,
        max_insert: int = 500,
    ) -> list[tuple[Mapping, Mapping]]:
        """Paired-end mapping, bowtie2 default FR orientation: the
        upstream mate maps forward, the downstream mate reverse, with
        fragment length (outer distance) in [min_insert, max_insert]."""
        assert len(reads1) == len(reads2)
        n = len(reads1)
        cands_all = self._score_candidates(list(reads1) + list(reads2))
        out: list[tuple[Mapping, Mapping]] = []
        for i in range(n):
            c1, c2 = cands_all[i], cands_all[n + i]
            best_pair, best_sum, second_sum = None, 0, 0
            for a in c1:
                for b in c2:
                    # FR: forward mate strictly upstream of reverse mate
                    if a.reverse == b.reverse:
                        continue
                    fwd, rev = (a, b) if not a.reverse else (b, a)
                    frag = (rev.pos + rev.ref_span) - fwd.pos
                    if frag < max(min_insert, 1) or frag > max_insert:
                        continue
                    s = a.score + b.score
                    if s > best_sum:
                        second_sum = best_sum
                        best_sum, best_pair = s, (a, b)
                    elif s > second_sum:
                        second_sum = s
            m1 = self._reduce(reads1[i], c1)
            m2 = self._reduce(reads2[i], c2)
            if best_pair is not None:
                a, b = best_pair
                for m, c in ((m1, a), (m2, b)):
                    m.pos = c.pos + 1
                    m.score = c.score
                    m.cigar_string = c.cigar
                    m.reverse = c.reverse
                    m.ref_span = c.ref_span
                    m.proper_pair = True
                    m.pair_score = best_sum
                # pair-level mapq from the pair score gap
                top = self.params.match * (len(reads1[i]) + len(reads2[i]))
                gap = (best_sum - second_sum) / max(top, 1)
                mq = int(min(42, 42 * gap + (2 if second_sum == 0 else 0)))
                m1.mapq = max(m1.mapq, mq)
                m2.mapq = max(m2.mapq, mq)
            out.append((m1, m2))
        return out
