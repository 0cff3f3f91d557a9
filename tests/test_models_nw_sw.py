"""NW and SW app models vs golds."""
import numpy as np
import jax.numpy as jnp

from genomics_tpu.core import golds
from genomics_tpu.models import nw, sw


def test_nw_matrix_matches_gold():
    rng = np.random.default_rng(0)
    N = 64
    ref = rng.integers(0, 256, N).astype(np.uint8)
    qry = nw.generate_query(ref, rng)
    mat = np.asarray(nw.nw_matrix(jnp.asarray(ref), jnp.asarray(qry)))
    gold = golds.nw_cpu(ref, qry)
    np.testing.assert_array_equal(mat, gold)


def test_nw_run_driver():
    score = nw.run(N=48, seed=3)
    assert isinstance(score, int)


def test_sw_windowed_matches_gold():
    rng = np.random.default_rng(1)
    x = "".join(rng.choice(list("ACGT"), 24))
    y = ("".join(rng.choice(list("ACGT"), 40)) + x
         + "".join(rng.choice(list("ACGT"), 60)))
    res = sw.align(x, y)
    g_score, g_loc, g_idx, g_cig = golds.sw_best_alignment(x, y)
    assert res["score"] == g_score
    assert res["location"] == g_loc
    assert res["cigar"] == g_cig


def test_sw_matrix_vs_gold_window():
    rng = np.random.default_rng(2)
    x = "".join(rng.choice(list("ACGT"), 16))
    y = "".join(rng.choice(list("ACGT"), 50))
    H = np.asarray(
        sw.sw_matrix_batch(
            jnp.asarray(np.frombuffer(x.encode(), np.uint8)),
            jnp.asarray(np.frombuffer(y.encode(), np.uint8))[None],
        )
    )[0]
    score, loc, cig = golds.sw_align_window(x, y, 0, 50)
    assert int(H.max()) == score


def test_compress_cigar():
    assert sw.compress_cigar("MMMIIDM") == "3M2I1D1M"
    assert sw.compress_cigar("") == ""
