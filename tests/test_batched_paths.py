"""Parity: batched hot paths == their per-read reference walks.

r3 (VERDICT weak #7/#8): Lighter pass 3 and mapper seeding were
per-read Python loops; the batched versions must produce identical
results."""
import numpy as np

from genomics_tpu.index.qgram import encode2
from genomics_tpu.models.corrector import LighterCorrector
from genomics_tpu.models.mapper import ReadMapper

BASES = np.array(list("ACGT"))


def _synth(rng, genome_len, n_reads, read_len=100, err=0.01):
    g = rng.integers(0, 4, genome_len)
    reads = []
    for p in rng.integers(0, genome_len - read_len, n_reads):
        r = g[p:p + read_len].copy()
        e = rng.random(read_len) < err
        r[e] = (r[e] + rng.integers(1, 4, int(e.sum()))) % 4
        reads.append("".join(BASES[r]))
    return "".join(BASES[g]), reads


def test_corrector_batch_matches_per_read():
    rng = np.random.default_rng(3)
    _, reads = _synth(rng, 20000, 4000)      # ~20x coverage → real fixes
    c = LighterCorrector(k=17, genome_size=20000)
    c.build(reads)
    sub = reads[:400]
    batch = c.correct_batch(sub)
    single = [c.correct(r) for r in sub]
    assert batch == single
    # the batch actually corrected something (not a vacuous pass)
    assert any(n > 0 for _, n in batch)


def test_mapper_batched_seeding_matches_per_read():
    rng = np.random.default_rng(4)
    ref, reads = _synth(rng, 50000, 300)
    m = ReadMapper(ref)
    codes = [encode2(r) for r in reads]
    assert m._diagonals_all(codes) == [m._diagonals(c) for c in codes]


def test_bloom_query_one_matches_batch():
    from genomics_tpu.index.bloom import BloomFilter

    rng = np.random.default_rng(5)
    # Non-power-of-two size: h1 + i*h2 must wrap at 2^64 *before* the
    # modulo for query_one to match query()'s uint64 arithmetic.
    for n_bits in [1 << 16, (1 << 16) + 12345]:
        bf = BloomFilter(n_bits, k=4)
        keys = rng.integers(0, 1 << 62, 2000).astype(np.uint64)
        bf.insert(keys[:1000])
        want = bf.query(keys)
        got = np.array([bf.query_one(int(k)) for k in keys])
        np.testing.assert_array_equal(got, want)
        assert want[:1000].all()


def test_mapper_reseeding_and_ed_stage():
    """nvBowtie policy depth (VERDICT r4 task #9): re-seeding rounds
    recover reads whose sparse first-round seeds are all broken, and
    the Myers ed first stage prunes gapped-DP windows without losing
    the true locus.  Mapped rate must strictly improve vs max_reseed=0
    on a heavily-mutated read set (mapping.cu's repeated seeding
    passes; score.cu's EditDistance-then-SmithWaterman backends)."""
    from genomics_tpu.models.mapper import ReadMapper

    rng = np.random.default_rng(42)
    bases = "ACGT"
    ref = "".join(rng.choice(list(bases), 200_000))
    B, RL = 192, 100
    pos = rng.integers(0, len(ref) - RL, B)
    reads = []
    for p in pos:
        r = list(ref[p:p + RL])
        at = rng.choice(RL, rng.integers(8, 14), replace=False)
        for a in at:
            r[a] = bases[(bases.index(r[a]) + rng.integers(1, 4)) % 4]
        reads.append("".join(r))
    m_old = ReadMapper(ref, max_reseed=0)
    m_new = ReadMapper(ref, max_reseed=2)
    maps0 = m_old.map_batch(reads)
    maps1 = m_new.map_batch(reads, two_stage="ed")
    mapped0 = sum(1 for m in maps0 if m.pos >= 0)
    mapped1 = sum(1 for m in maps1 if m.pos >= 0)
    ok1 = sum(1 for m, p in zip(maps1, pos)
              if m.pos >= 0 and abs(m.pos - 1 - p) <= 6)
    assert mapped1 > mapped0
    assert ok1 >= mapped1 * 0.8
