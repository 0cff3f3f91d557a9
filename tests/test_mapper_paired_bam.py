"""Paired-end mapping + BAM output (reference: nvBowtie paired-end
pipeline, nvbio/io SAM/BAM output)."""
import numpy as np
import pytest

from genomics_tpu.models.mapper import Mapping, ReadMapper, revcomp
from genomics_tpu.utils import bamio, samio


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(7)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))


def test_reverse_strand_mapping(genome):
    mapper = ReadMapper(genome)
    fw = genome[1000:1060]
    rc = revcomp(genome[2000:2060])
    maps = mapper.map_batch([fw, rc])
    assert maps[0].pos == 1001 and not maps[0].reverse
    assert maps[1].pos == 2001 and maps[1].reverse
    assert all(m.mapq > 0 for m in maps)


def test_paired_end_concordant(genome):
    mapper = ReadMapper(genome)
    # FR fragment: mate1 forward at 500, mate2 reverse at the far end of
    # a 300bp fragment
    m1_seq = genome[500:560]
    m2_seq = revcomp(genome[740:800])
    pairs = mapper.map_pairs([m1_seq], [m2_seq], max_insert=500)
    a, b = pairs[0]
    assert a.proper_pair and b.proper_pair
    assert a.pos == 501 and not a.reverse
    assert b.pos == 741 and b.reverse
    assert a.pair_score == a.score + b.score


def test_paired_end_insert_window_rejects(genome):
    mapper = ReadMapper(genome)
    # fragment length 1500 > max_insert → no proper pair, but both map
    m1_seq = genome[100:160]
    m2_seq = revcomp(genome[1540:1600])
    (a, b), = mapper.map_pairs([m1_seq], [m2_seq], max_insert=500)
    assert not a.proper_pair and not b.proper_pair
    assert a.pos == 101 and b.pos == 1541


def test_sam_pair_records(tmp_path, genome):
    mapper = ReadMapper(genome)
    m1_seq = genome[500:560]
    m2_seq = revcomp(genome[740:800])
    (a, b), = mapper.map_pairs([m1_seq], [m2_seq])
    p = tmp_path / "p.sam"
    samio.write_sam_pairs(str(p), "ref", len(genome),
                          [("frag", m1_seq, a, m2_seq, b)])
    lines = [l for l in p.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == 2
    f1 = lines[0].split("\t")
    f2 = lines[1].split("\t")
    flag1, flag2 = int(f1[1]), int(f2[1])
    assert flag1 & samio.FLAG_PAIRED and flag1 & samio.FLAG_PROPER
    assert flag1 & samio.FLAG_FIRST and flag2 & samio.FLAG_SECOND
    assert flag1 & samio.FLAG_MATE_REVERSE and flag2 & samio.FLAG_REVERSE
    # RNEXT '=', PNEXT = mate pos, TLEN symmetric
    assert f1[6] == "=" and int(f1[7]) == b.pos
    assert int(f1[8]) == 300 and int(f2[8]) == -300
    # reverse mate SEQ is stored as aligned (genome-forward)
    assert f2[9] == genome[740:800]


def test_bgzf_roundtrip():
    data = bytes(range(256)) * 1000
    assert bamio.bgzf_decompress(bamio.bgzf_compress(data)) == data


def test_bam_roundtrip_single(tmp_path):
    recs = [
        ("r1", "ACGTACGT", Mapping(pos=10, score=16, mapq=42,
                                   cigar_string="8M", ref_span=8)),
        ("r2", "TTTT", Mapping(pos=-1, score=0, mapq=0, cigar_string="")),
        ("r3", "ACGT", Mapping(pos=99, score=8, mapq=30,
                               cigar_string="2M1X1M", reverse=True,
                               ref_span=4)),
    ]
    p = tmp_path / "out.bam"
    bamio.write_bam(str(p), "chr1", 1000, recs)
    text, refs, out = bamio.read_bam(str(p))
    assert refs == [("chr1", 1000)]
    assert "@SQ" in text
    assert [r.name for r in out] == ["r1", "r2", "r3"]
    assert out[0].pos == 9 and out[0].cigar == "8M" and out[0].seq == "ACGTACGT"
    assert out[1].flag & samio.FLAG_UNMAPPED
    assert out[2].flag & samio.FLAG_REVERSE
    # X collapses to M in SAM/BAM; reverse-strand SEQ stored as aligned
    assert out[2].cigar == "4M" and out[2].seq == "ACGT"[::-1].translate(
        str.maketrans("ACGT", "TGCA"))


def test_bam_roundtrip_pairs(tmp_path, genome):
    mapper = ReadMapper(genome)
    m1_seq = genome[500:560]
    m2_seq = revcomp(genome[740:800])
    (a, b), = mapper.map_pairs([m1_seq], [m2_seq])
    p = tmp_path / "p.bam"
    bamio.write_bam_pairs(str(p), "ref", len(genome),
                          [("frag", m1_seq, a, m2_seq, b)])
    _, _, out = bamio.read_bam(str(p))
    assert len(out) == 2
    assert out[0].flag & samio.FLAG_PAIRED and out[0].flag & samio.FLAG_PROPER
    assert out[0].pos == a.pos - 1 and out[1].pos == b.pos - 1
    assert out[0].next_pos == b.pos - 1
    assert out[0].tlen == 300 and out[1].tlen == -300
