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
