"""FM-index depth (r3): device backward search, bidirectional index +
SMEMs, backtracking inexact search — all against brute force or the
host engine."""
import numpy as np

from genomics_tpu.index.fmindex import BidirFMIndex, FMIndex
from genomics_tpu.index.qgram import encode2

BASES = np.array(list("ACGT"))


def _text(rng, n):
    return "".join(BASES[rng.integers(0, 4, n)])


def test_device_backward_search_matches_host():
    from genomics_tpu.ops import fm_search

    rng = np.random.default_rng(0)
    text = _text(rng, 8000)
    fm = FMIndex(text)
    idx = fm.to_device()
    B, L = 128, 32
    qs = np.zeros((B, L), np.uint8)
    qlen = rng.integers(4, L + 1, B)
    for i in range(B):
        if i % 2 == 0:
            p = rng.integers(0, len(text) - qlen[i])
            qs[i, :qlen[i]] = encode2(text[p:p + qlen[i]])
        else:
            qs[i, :qlen[i]] = rng.integers(0, 4, qlen[i])
    lo_h, hi_h = fm.backward_search(
        np.where(qs == 0, qs, qs), qlen)  # host takes same codes
    lo_d, hi_d = fm_search.backward_search_device(idx, qs, qlen)
    np.testing.assert_array_equal(lo_h, lo_d)
    np.testing.assert_array_equal(hi_h, hi_d)


def test_bidir_extension_matches_backward_search():
    rng = np.random.default_rng(1)
    text = _text(rng, 2000)
    bd = BidirFMIndex(text)
    for _ in range(30):
        L = int(rng.integers(1, 16))
        c = rng.integers(0, 4, L)
        st = bd.start()
        for ch in c[::-1]:
            st = bd.extend_back(st, int(ch))
        lo, hi = bd.fwd.backward_search(
            c[None, :].astype(np.uint8), np.array([L]))
        assert st[2] == max(int(hi[0] - lo[0]), 0)
        if st[2] > 0:
            assert st[0] == lo[0]
        stf = bd.start()
        for ch in c:
            stf = bd.extend_forward(stf, int(ch))
        assert (stf[0], stf[2]) == (st[0], st[2]) if st[2] else stf[2] == 0


def _brute_smems(text, query, min_len):
    m = len(query)
    e = np.zeros(m, np.int64)
    for x in range(m):
        hi = x
        while hi < m and query[x:hi + 1] in text:
            hi += 1
        e[x] = hi
    out, seen = [], set()
    for x in range(m):
        if e[x] > x and e[x] - x >= min_len and e[x] not in seen:
            if all(e[x2] < e[x] for x2 in range(x)):
                out.append((x, int(e[x])))
                seen.add(int(e[x]))
    return sorted(out)


def test_smems_match_brute_force():
    rng = np.random.default_rng(2)
    text = _text(rng, 3000)
    bd = BidirFMIndex(text)
    for _ in range(15):
        parts = []
        for _ in range(3):
            p = rng.integers(0, len(text) - 30)
            parts.append(text[p:p + rng.integers(10, 30)])
            parts.append(_text(rng, rng.integers(2, 8)))
        q = "".join(parts)
        got = [(a, b) for a, b, _, _ in bd.smems(q, min_len=8)]
        assert got == _brute_smems(text, q, 8)
        for a, b, lo, hi in bd.smems(q, min_len=8):
            for pos in bd.fwd.sa_values(np.arange(lo, hi)):
                assert text[pos:pos + (b - a)] == q[a:b]


def test_inexact_search_matches_brute_force():
    rng = np.random.default_rng(3)
    text = _text(rng, 3000)
    fm = FMIndex(text)
    for _ in range(15):
        p = rng.integers(0, len(text) - 25)
        q = list(text[p:p + 20])
        for e_ in rng.choice(20, int(rng.integers(0, 3)), replace=False):
            q[e_] = "ACGT"[rng.integers(0, 4)]
        q = "".join(q)
        got = set()
        for lo, hi, _mm in fm.inexact_search(q, max_mm=2, max_results=1000):
            for pos in fm.sa_values(np.arange(lo, hi)):
                got.add(int(pos))
        want = {
            pos for pos in range(len(text) - 19)
            if sum(a != b for a, b in zip(text[pos:pos + 20], q)) <= 2
        }
        assert got == want


def test_mapper_smem_seeder():
    from genomics_tpu.models.mapper import ReadMapper

    rng = np.random.default_rng(4)
    ref = _text(rng, 20000)
    reads = []
    for p in rng.integers(0, 19900, 30):
        r = list(ref[p:p + 80])
        r[40] = "ACGT"[rng.integers(0, 4)]
        reads.append("".join(r))
    m = ReadMapper(ref, seeder="smem")
    out = m.map_batch(reads)
    assert sum(1 for x in out if x.pos > 0) >= 28


def test_hybrid_search_semantics():
    """approx-hybrid: exact right-half subseed, <=1 mismatch in the
    left part — found positions must obey exactly that split."""
    rng = np.random.default_rng(6)
    text = _text(rng, 3000)
    fm = FMIndex(text)
    q = 16
    for _ in range(20):
        p = rng.integers(0, len(text) - q)
        seed = list(text[p:p + q])
        mmpos = int(rng.integers(0, q))
        orig = seed[mmpos]
        seed[mmpos] = "ACGT"[(("ACGT".index(orig)) + 1) % 4]
        seed = "".join(seed)
        got = set()
        for lo, hi, _mm in fm.hybrid_search(seed, max_mm=1):
            for pos in fm.sa_values(np.arange(lo, hi)):
                got.add(int(pos))
        want = set()
        for pos in range(len(text) - q + 1):
            w = text[pos:pos + q]
            mm_left = sum(a != b for a, b in zip(w[:q // 2], seed[:q // 2]))
            mm_right = sum(a != b for a, b in zip(w[q // 2:], seed[q // 2:]))
            if mm_right == 0 and mm_left <= 1:
                want.add(pos)
        assert got == want


def test_mapper_hybrid_seeder_and_two_stage():
    from genomics_tpu.models.mapper import ReadMapper

    rng = np.random.default_rng(7)
    ref = _text(rng, 20000)
    reads = []
    for p in rng.integers(0, 19900, 25):
        r = list(ref[p:p + 80])
        r[10] = "ACGT"[rng.integers(0, 4)]   # a mismatch inside a seed
        reads.append("".join(r))
    m = ReadMapper(ref, seeder="hybrid")
    out = m.map_batch(reads, two_stage=True)
    assert sum(1 for x in out if x.pos > 0) >= 23
    # two-stage must agree with single-stage on the winners here
    m2 = ReadMapper(ref)
    a = m2.map_batch(reads)
    b = m2.map_batch(reads, two_stage=True)
    assert [(x.pos, x.contig, x.reverse) for x in a] == \
        [(x.pos, x.contig, x.reverse) for x in b]


def test_mapper_map_stream_matches_batch():
    from genomics_tpu.models.mapper import ReadMapper

    rng = np.random.default_rng(8)
    ref = _text(rng, 15000)
    reads = ["".join(ref[p:p + 60]) for p in rng.integers(0, 14900, 40)]
    m = ReadMapper(ref)
    streamed = list(m.map_stream(iter(reads), batch_size=16))
    batched = m.map_batch(reads)
    assert [r for r, _ in streamed] == reads
    assert [(mp.pos, mp.cigar_string) for _, mp in streamed] == \
        [(mp.pos, mp.cigar_string) for mp in batched]


def test_mapper_fmdev_seeder():
    """Device-batched FM seeding (ops/fm_search wired into the mapper):
    one jitted backward-search scan for every fixed-interval seed of
    every read/strand — must map reads like the q-gram seeder."""
    rng = np.random.default_rng(21)
    bases = np.array(list("ACGT"))
    g = rng.integers(0, 4, 20000)
    genome = "".join(bases[g])
    reads = []
    truth = []
    for _ in range(60):
        p = int(rng.integers(0, len(genome) - 100))
        r = g[p:p + 100].copy()
        e = rng.random(100) < 0.01
        r[e] = (r[e] + rng.integers(1, 4, int(e.sum()))) % 4
        reads.append("".join(bases[r]))
        truth.append(p)
    from genomics_tpu.models.mapper import ReadMapper

    m_dev = ReadMapper(genome, seeder="fmdev")
    m_qg = ReadMapper(genome, seeder="qgram")
    out_dev = m_dev.map_batch(reads)
    out_qg = m_qg.map_batch(reads)
    ok_dev = sum(1 for mp, p in zip(out_dev, truth)
                 if mp.pos > 0 and abs(mp.pos - 1 - p) <= 2)
    ok_qg = sum(1 for mp, p in zip(out_qg, truth)
                if mp.pos > 0 and abs(mp.pos - 1 - p) <= 2)
    assert ok_dev >= 55
    assert ok_dev >= ok_qg - 2   # same seeds, same candidates
