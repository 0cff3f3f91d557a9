"""nvbio-class components: Myers edit distance, q-gram index, Bloom
filter, FM-index, and the minimal read mapper."""
import numpy as np
import pytest

from genomics_tpu.index import BloomFilter, FMIndex, QGramIndex
from genomics_tpu.index.qgram import encode2, qgrams_of
from genomics_tpu.ops.myers import edit_distance_semiglobal


def sg_gold(p, t):
    m, n = len(p), len(t)
    prev = np.zeros(n + 1, np.int32)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, np.int32)
        cur[0] = i
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (p[i - 1] != t[j - 1])
            )
        prev = cur
    return prev


def test_myers_vs_dp():
    rng = np.random.default_rng(1)
    ps, ts = [], []
    for _ in range(10):
        ps.append("".join(rng.choice(list("ACGT"), int(rng.integers(4, 90)))))
        ts.append("".join(rng.choice(list("ACGT"), int(rng.integers(4, 120)))))
    best, end, final = edit_distance_semiglobal(ps, ts)
    for i, (p, t) in enumerate(zip(ps, ts)):
        row = sg_gold(p, t)
        assert final[i] == row[-1], i
        assert best[i] == min(int(row[1:].min()), len(p)), i


def test_qgram_index():
    rng = np.random.default_rng(2)
    text = "".join(rng.choice(list("ACGT"), 3000))
    qi = QGramIndex(text, q=12)
    for pos in [0, 77, 1500, 2988]:
        key = qgrams_of(encode2(text[pos : pos + 12]), 12)[0]
        hits, cnt = qi.hits(np.array([key]))
        assert pos in hits[0]


def test_bloom_filter():
    rng = np.random.default_rng(3)
    bf = BloomFilter(1 << 16, k=4)
    ins = rng.integers(0, 1 << 60, 400).astype(np.uint64)
    bf.insert(ins)
    assert bf.query(ins).all()
    neg = rng.integers(0, 1 << 60, 1000).astype(np.uint64)
    assert bf.query(neg).mean() < 0.05


def test_fmindex_count_and_locate():
    import re

    rng = np.random.default_rng(4)
    text = "".join(rng.choice(list("ACGT"), 2000))
    fm = FMIndex(text)
    for pat in [text[10:30], text[500:520], "ACGTACGTACGTACG"]:
        want = len(re.findall(f"(?={pat})", text))
        assert fm.count(pat) == want
    lo, hi = fm.backward_search(encode2(text[10:30])[None], np.array([20]))
    assert 10 in fm.locate(int(lo[0]), int(hi[0]))


def test_read_mapper():
    from genomics_tpu.models.mapper import ReadMapper

    rng = np.random.default_rng(5)
    ref = "".join(rng.choice(list("ACGT"), 8000))
    mapper = ReadMapper(ref)
    reads, truth = [], []
    for _ in range(15):
        p = int(rng.integers(0, len(ref) - 100))
        r = list(ref[p : p + 100])
        for k in range(100):
            if rng.random() < 0.03:
                r[k] = rng.choice(list("ACGT"))
        reads.append("".join(r))
        truth.append(p)
    maps = mapper.map_batch(reads)
    correct = sum(
        abs(m.pos - 1 - t) <= 2 for m, t in zip(maps, truth) if m.pos >= 0
    )
    assert correct >= 13


def test_hamming_batch():
    from genomics_tpu.ops.myers import hamming_batch

    a = np.array([[0, 1, 2, 3, 0, 0], [1, 1, 1, 1, 1, 1]], np.uint8)
    b = np.array([[0, 1, 2, 0, 0, 0], [1, 1, 2, 2, 1, 1]], np.uint8)
    np.testing.assert_array_equal(
        np.asarray(hamming_batch(a, b, np.array([4, 6]))), [1, 2]
    )


def test_fastq_reader(tmp_path):
    from genomics_tpu.utils.fasta import read_fastq, quals_to_phred

    p = tmp_path / "x.fastq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGTT\n+\n!!II\n")
    recs = read_fastq(str(p))
    assert len(recs) == 2 and recs[0].seq == "ACGT"
    np.testing.assert_array_equal(quals_to_phred(recs[1].quals), [0, 0, 40, 40])


def test_mem_seeder():
    from genomics_tpu.index import FMIndex
    from genomics_tpu.index.fmindex import find_mems, seed_positions

    rng = np.random.default_rng(8)
    ref = "".join(rng.choice(list("ACGT"), 6000))
    fm = FMIndex(ref)
    # exact read → one full-length MEM at the right locus
    p = 2500
    mems = find_mems(fm, ref[p : p + 80], min_len=20)
    assert mems and (mems[-1][0], mems[-1][1]) == (0, 80)
    seeds = seed_positions(fm, ref[p : p + 80], min_len=20)
    assert any(pos == p for _, pos in seeds)
    # chimeric read → both loci seeded
    p2 = 4800
    read = ref[p : p + 50] + "T" + ref[p2 : p2 + 50]
    seeds = seed_positions(fm, read, min_len=20)
    assert any(abs(pos - p) <= 1 for _, pos in seeds)
    assert any(abs(pos - p2) <= 1 for _, pos in seeds)


def test_sais_native_parity():
    """native SA-IS (native/sais.cpp) == numpy prefix doubling."""
    from genomics_tpu.index.fmindex import suffix_array
    from genomics_tpu.runtime import native

    rng = np.random.default_rng(5)
    for n in (1, 2, 7, 64, 1000, 20000):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        sa = native.sais_u8(codes)
        if sa is None:
            import pytest

            pytest.skip("native library unavailable")
        t = np.concatenate([codes.astype(np.int64), [-1]])
        ref = suffix_array(t + 1)
        assert (sa.astype(np.int64) == ref).all()


def test_sais_int64_path_parity():
    """The genome-scale int64 SA-IS (gt_sais_u8_64, taken automatically
    above ~2.1 G symbols — the nvBWT human-genome workload the int32
    path cannot index) matches the int32 path bit-for-bit, and the
    int64 BWT marshaller agrees too."""
    from genomics_tpu.runtime import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for n in (1, 5, 257, 4096, 100_000):
        codes = rng.integers(0, 5, n).astype(np.uint8)  # incl. N codes
        sa32 = native.sais_u8(codes)
        sa64 = native.sais_u8(codes, force64=True)
        assert sa64.dtype == np.int64
        assert (sa32.astype(np.int64) == sa64).all()
        assert (native.bwt_from_sa(codes, sa32)
                == native.bwt_from_sa(codes, sa64)).all()


def test_fmindex_sampled_matches_full():
    """Sampled occ/SA (nvbio rank-dict + SSA design) gives identical
    search/locate results to the full tables."""
    from genomics_tpu.index.fmindex import FMIndex
    from genomics_tpu.index.qgram import encode2

    rng = np.random.default_rng(6)
    text = "".join(rng.choice(list("ACGT"), 60000))
    full = FMIndex(text, sa_rate=1)
    samp = FMIndex(text, sa_rate=16, occ_rate=32)
    qs = [text[rng.integers(0, len(text) - 30):][:30] for _ in range(32)]
    Q = np.stack([encode2(q) for q in qs])
    ql = np.full(32, 30)
    lo1, hi1 = full.backward_search(Q, ql)
    lo2, hi2 = samp.backward_search(Q, ql)
    assert (lo1 == lo2).all() and (hi1 == hi2).all()
    for i in range(32):
        p1 = full.locate(int(lo1[i]), int(hi1[i]))
        p2 = samp.locate(int(lo2[i]), int(hi2[i]))
        assert (p1 == p2).all()
        assert text[p1[0] : p1[0] + 30] == qs[i]


def test_bam_reader_roundtrip(tmp_path):
    """write_bam → read_bam round-trip (nvExtractReads input side)."""
    from genomics_tpu.models.mapper import Mapping
    from genomics_tpu.utils import bamio

    p = str(tmp_path / "t.bam")
    maps = [
        Mapping(pos=11, score=50, mapq=42, cigar_string="30M"),
        Mapping(pos=-1, score=0, mapq=0, cigar_string=""),
    ]
    seqs = ["ACGTACGTACGTACGTACGTACGTACGTAC", "TTTTACGTACGTACGTACGTACGTACGTAC"]
    bamio.write_bam(p, "ref", 500,
                    [("r0", seqs[0], maps[0]), ("r1", seqs[1], maps[1])])
    header, refs, recs = bamio.read_bam(p)
    assert refs == [("ref", 500)]
    assert len(recs) == 2
    assert recs[0].seq == seqs[0]
    assert recs[0].pos == 10 and recs[0].mapq == 42
    assert recs[0].cigar == "30M"
    assert recs[1].flag & 0x4             # unmapped


def test_fmindex_save_load(tmp_path):
    """FM-index persistence (nvBWT/nvSSA/nvFM-server analog)."""
    from genomics_tpu.index.fmindex import FMIndex, load_index, save_index
    from genomics_tpu.index.qgram import encode2

    rng = np.random.default_rng(9)
    text = "".join(rng.choice(list("ACGT"), 30000))
    fm = FMIndex(text, sa_rate=16)
    path = str(tmp_path / "idx.npz")
    save_index(fm, path)
    fm2 = load_index(path)
    q = text[5000:5030]
    Q = encode2(q)[None, :]
    lo1, hi1 = fm.backward_search(Q, np.array([30]))
    lo2, hi2 = fm2.backward_search(Q, np.array([30]))
    assert (lo1 == lo2).all() and (hi1 == hi2).all()
    assert (fm.locate(int(lo1[0]), int(hi1[0]))
            == fm2.locate(int(lo2[0]), int(hi2[0]))).all()
