"""Center-star MSA: batched NW matrices vs a literal nw.cc
transcription, and exact output parity with the reference's bundled
results.txt fixture."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from genomics_tpu.models import msa as M
from genomics_tpu.utils.fasta import read_fasta


def nw_gold(s1, s2):
    m, n = len(s1), len(s2)
    MIN = M.MIN_SCORE
    mat = np.full((m + 1, n + 1), MIN, np.int64)
    mat[0, 0] = 0
    x = np.full((m + 1, n + 1), MIN, np.int64)
    y = np.full((m + 1, n + 1), MIN, np.int64)
    for j in range(n + 1):
        x[0][j] = -j
    for i in range(m + 1):
        y[i][0] = -i
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            x[i][j] = max(-1 + mat[i][j - 1], -1 + x[i][j - 1])
            y[i][j] = max(-1 + mat[i - 1][j], -1 + y[i - 1][j])
            s = (0 if s1[i - 1] == s2[j - 1] else -1) + mat[i - 1][j - 1]
            mat[i][j] = max(s, x[i][j], y[i][j])
    return mat


def test_nw_matrices_vs_literal():
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = int(rng.integers(5, 50))
        n = int(rng.integers(5, 50))
        s1 = "".join(rng.choice(list("ACGT"), m))
        s2 = "".join(rng.choice(list("ACGT"), n))
        arr = np.frombuffer(s2.encode(), np.uint8)[None]
        got = np.asarray(
            M.nw_matrices_batch(
                jnp.asarray(np.frombuffer(s1.encode(), np.uint8)), jnp.asarray(arr)
            )
        )[0]
        np.testing.assert_array_equal(got, nw_gold(s1, s2))


def test_msa_reference_fixture_exact():
    path = "/root/reference/CDP/STAR/protein.txt"
    want_path = "/root/reference/CDP/STAR/results.txt"
    if not (os.path.exists(path) and os.path.exists(want_path)):
        pytest.skip("reference fixture not mounted")
    aligned, cidx = M.msa([r.seq for r in read_fasta(path)])
    want = [r.seq for r in read_fasta(want_path)]
    assert len(aligned) == len(want)
    for k, (a, b) in enumerate(zip(aligned, want)):
        assert a == b, f"row {k} differs"


def test_center_selection_dna():
    seqs = ["ACGTACGTACGTACGT", "ACGTACGTACGTACGT", "TTTTGGGGCCCCAAAA"]
    # the two identical sequences share all chunks → one of them wins
    assert M.find_center_sequence(seqs) in (0, 1)


def test_msa_protein_matrix():
    path = "/root/reference/CDP/STAR/protein.txt"
    mat = "/root/reference/CDP/STAR/scoring/BLOSUM62.txt"
    if not (os.path.exists(path) and os.path.exists(mat)):
        pytest.skip("reference fixtures not mounted")
    seqs = [r.seq for r in read_fasta(path)]
    aligned, cidx = M.msa(seqs, matrix_path=mat)
    assert len(set(len(a) for a in aligned)) == 1
    # degapped rows reproduce the inputs
    for s, a in zip(seqs, aligned):
        assert a.replace("-", "") == s


def test_submat_loader():
    mat = "/root/reference/CDP/STAR/scoring/BLOSUM62.txt"
    if not os.path.exists(mat):
        pytest.skip("matrices not mounted")
    from genomics_tpu.core.submat import load_scoring_matrix

    t = load_scoring_matrix(mat)
    assert t[ord("A"), ord("A")] == 4
    assert t[ord("W"), ord("W")] == 11
    assert t[ord("a"), ord("r")] == -1


def test_msa_sharded_matches_single():
    """multi-GPU-msa analog: the per-sequence NW batch sharded over the
    8-device mesh produces identical alignments (cuda-nw.cu:358-431)."""
    import jax

    from genomics_tpu.parallel import data_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(4)
    seqs = ["".join(rng.choice(list("ACGT"), rng.integers(30, 60)))
            for _ in range(13)]
    a1, c1 = M.msa(seqs)
    a2, c2 = M.msa(seqs, mesh=data_mesh(8))
    assert c1 == c2 and a1 == a2


def test_device_backtrack_matches_host():
    """backtrack_batch (device, gap counts only) == the host nw.cc walk
    for every pair, DNA and protein scoring."""
    import jax.numpy as jnp
    import numpy as np

    from genomics_tpu.models import msa as M

    rng = np.random.default_rng(11)
    center = "".join(rng.choice(list("ACGT"), 40))
    others = ["".join(rng.choice(list("ACGT"), rng.integers(10, 60)))
              for _ in range(17)]
    n_pad = max(len(s) for s in others)
    arr = np.zeros((len(others), n_pad), np.uint8)
    for k, s in enumerate(others):
        arr[k, : len(s)] = np.frombuffer(s.encode(), np.uint8)
    cenc = np.frombuffer(center.encode(), np.uint8)
    Ms = M.nw_matrices_batch(jnp.asarray(cenc), jnp.asarray(arr), None)
    slens = np.array([len(s) for s in others], np.int32)
    sp_d, so_d = M.backtrack_batch(
        Ms, jnp.asarray(cenc), jnp.asarray(arr), jnp.asarray(slens))
    Ms_h = np.asarray(Ms)
    for k, s in enumerate(others):
        sp, so = M.backtrack(Ms_h[k, :, : len(s) + 1], center, s)
        np.testing.assert_array_equal(np.asarray(sp_d)[k], sp)
        np.testing.assert_array_equal(np.asarray(so_d)[k, : len(s) + 1], so)


def test_chunk_indices_matches_scalar():
    """The vectorized chunk extractor must equal the scalar
    charsToIndex transcription on mixed content."""
    from genomics_tpu.models.msa import _chars_to_index, _chunk_indices

    import numpy as np

    rng = np.random.default_rng(0)
    alphabet = list("ACGTUNX-")
    for _ in range(20):
        s = "".join(rng.choice(alphabet, rng.integers(8, 64)))
        want = [_chars_to_index(s[i * 8:i * 8 + 8])
                for i in range(len(s) // 8)]
        got = _chunk_indices(s).tolist()
        assert got == want, s
