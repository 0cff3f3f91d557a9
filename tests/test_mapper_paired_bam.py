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


def test_mapper_multi_contig():
    """Reads map to the right contig with local coordinates; SAM header
    lists every @SQ (multi-reference FASTA, nvBowtie-class)."""
    rng = np.random.default_rng(11)
    c1 = "".join(rng.choice(list("ACGT"), 300))
    c2 = "".join(rng.choice(list("ACGT"), 260))
    mapper = ReadMapper([("chrA", c1), ("chrB", c2)])
    r1 = c1[40:40 + 80]
    r2 = c2[100:100 + 80]
    maps = mapper.map_batch([r1, r2])
    assert maps[0].contig == "chrA" and maps[0].pos == 41
    assert maps[1].contig == "chrB" and maps[1].pos == 101
    # header form
    from genomics_tpu.utils import samio

    hdr = samio.sam_header([("chrA", len(c1)), ("chrB", len(c2))])
    assert "SN:chrA" in hdr and "SN:chrB" in hdr


def test_mapper_fm_seeding():
    """FM-index MEM seeding maps reads like the q-gram seeder."""
    rng = np.random.default_rng(12)
    genome = "".join(rng.choice(list("ACGT"), 400))
    mapper = ReadMapper(genome, seeder="fm")
    read = genome[120:120 + 90]
    m = mapper.map_batch([read])[0]
    assert m.pos == 121 and not m.reverse
    # reverse strand too
    m2 = mapper.map_batch([revcomp(read)])[0]
    assert m2.pos == 121 and m2.reverse


def test_mapper_report_modes():
    """report='all' / best-N returns secondary alignments
    (nvBowtie reduce.cu reporting policy)."""
    rng = np.random.default_rng(13)
    unit = "".join(rng.choice(list("ACGT"), 120))
    genome = unit + "".join(rng.choice(list("ACGT"), 60)) + unit
    mapper = ReadMapper(genome)
    read = unit[10:90]
    all_hits = mapper.map_batch([read], report="all")[0]
    assert len(all_hits) >= 2
    ps = sorted(h.pos for h in all_hits)
    assert ps[0] == 11 and ps[-1] == 11 + 180
    # best-1 cap
    one = mapper.map_batch([read], report=1)[0]
    assert len(one) == 1 and one[0].mapq >= 0
    # repeat read → low primary mapq (two equal best scores)
    assert all_hits[0].mapq <= 3


def test_bowtie_mapq2_model():
    """BowtieMapq2 decision tree spot values (mapq.h:267-327, local)."""
    from genomics_tpu.models.mapq import MapqScheme, bowtie_mapq2

    sc = MapqScheme(match=2, monotone=False)
    L = 100
    perfect = sc.perfect_score(L)
    # unique perfect hit → 44
    assert bowtie_mapq2(perfect, None, L, sc) == 44
    # equal second-best → 0/1
    assert bowtie_mapq2(perfect, perfect, L, sc) <= 1
    # strong gap → high
    assert bowtie_mapq2(perfect, int(sc.min_score(L)) + 1, L, sc) >= 38
    # below min score → 0
    assert bowtie_mapq2(int(sc.min_score(L)) - 1, None, L, sc) == 0


def test_paired_opposite_mate_rescue():
    """nvBowtie opposite-mate rescue (score.cu): mate2 carries too many
    mismatches for any exact 16bp seed, so it is unmappable alone — but
    with mate1 anchored, scoring the insert window recovers it and the
    pair reports concordant."""
    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    g = rng.integers(0, 4, 20000)
    genome = "".join(bases[g])
    p = 5000
    m1 = genome[p:p + 100]
    frag2 = list(genome[p + 250:p + 350])
    # a mismatch every 10bp kills every 16-mer seed
    for j in range(5, 100, 10):
        frag2[j] = "ACGT"[(g[p + 250 + j] + 1) % 4]
    from genomics_tpu.models.mapper import revcomp

    m2 = revcomp("".join(frag2))
    mapper = ReadMapper(genome)
    # sanity: mate2 alone is unmappable by seeding
    solo = mapper.map_batch([m2])[0]
    assert solo.pos <= 0, "test premise broken: mate2 maps on its own"
    with_rescue = mapper.map_pairs([m1], [m2], max_insert=500)[0]
    without = mapper.map_pairs([m1], [m2], max_insert=500, rescue=False)[0]
    assert not without[1].proper_pair
    assert with_rescue[0].proper_pair and with_rescue[1].proper_pair
    assert with_rescue[1].reverse
    assert abs(with_rescue[1].pos - (p + 250 + 1)) <= 8
