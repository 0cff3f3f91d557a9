"""Wavelet tree (nvbio strings/wavelet_tree.h analog) vs brute force."""
import numpy as np

from genomics_tpu.index.wavelet import WaveletTree


def test_wavelet_access_rank_select():
    rng = np.random.default_rng(0)
    for n, sigma in [(1000, 4), (1500, 256), (777, 17), (64, 2)]:
        data = rng.integers(0, sigma, n).astype(np.uint8)
        wt = WaveletTree(data)
        for i in rng.integers(0, n, 30):
            assert wt.access(int(i)) == int(data[i])
        for _ in range(60):
            c = int(rng.integers(0, sigma))
            i = int(rng.integers(0, n + 1))
            assert wt.rank(c, i) == int((data[:i] == c).sum())
        for _ in range(30):
            c = int(rng.integers(0, sigma))
            k = int(rng.integers(1, 6))
            pos = np.nonzero(data == c)[0]
            want = int(pos[k - 1]) if len(pos) >= k else -1
            assert wt.select(c, k) == want


def test_wavelet_from_string():
    wt = WaveletTree("ACGTACGTAAA")
    assert wt.rank(ord("A"), 11) == 5
    assert wt.select(ord("G"), 2) == 6
    assert wt.access(3) == ord("T")
