"""nGIA distributed clustering: single-device vs 8-device mesh parity."""
import numpy as np
import jax
import pytest

from genomics_tpu.models import ngia
from genomics_tpu.parallel import data_mesh


def synth(rng, fam=3, per=4, L=160):
    seqs = []
    for _ in range(fam):
        base = "".join(rng.choice(list("ACGT"), L))
        for _ in range(per):
            s = list(base)
            for pos in rng.integers(0, L, 3):
                s[pos] = rng.choice(list("ACGT"))
            seqs.append("".join(s))
    return seqs


def test_ngia_families():
    seqs = synth(np.random.default_rng(0))
    res = ngia.cluster_distributed(seqs, similarity=0.9)
    assert res.n_clusters == 3
    assert (res.cluster <= np.arange(len(seqs))).all()


def test_ngia_mesh_matches_single():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    seqs = synth(np.random.default_rng(2), fam=2, per=8)
    a = ngia.cluster_distributed(seqs, similarity=0.9)
    b = ngia.cluster_distributed(seqs, similarity=0.9, mesh=data_mesh(8))
    np.testing.assert_array_equal(a.cluster, b.cluster)


def test_ngia_dissimilar_stay_apart():
    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("ACGT"), 150)) for _ in range(8)]
    res = ngia.cluster_distributed(seqs, similarity=0.95)
    assert res.n_clusters == 8


def test_ngia_speculative_matches_serial():
    """speculate=S gives the IDENTICAL clustering to the serial greedy
    loop (CDP kernel_iteration semantics with serial-equivalent
    resolution, func.cu:722-820)."""
    rng = np.random.default_rng(5)
    seqs = synth(rng, fam=4, per=6)
    seqs += ["".join(rng.choice(list("ACGT"), 120)) for _ in range(10)]
    a = ngia.cluster_distributed(seqs, similarity=0.9)
    b = ngia.cluster_distributed(seqs, similarity=0.9, speculate=8)
    np.testing.assert_array_equal(a.cluster, b.cluster)
    assert a.n_clusters == b.n_clusters
