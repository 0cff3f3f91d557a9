"""Multi-device tests on the virtual 8-device CPU mesh — the multi-host
capability the reference only has via live MPI rings (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genomics_tpu.core import golds
from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.parallel import data_mesh, shard_batch, sharded_align_scores
from genomics_tpu.parallel.mesh import sharded_pipeline_step

P = AlignmentParams()


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return data_mesh(8)


def test_sharded_scores_match_gold(mesh8):
    rng = np.random.default_rng(0)
    B, Lq, Lt = 32, 24, 24
    q = rng.integers(0, 16, (B, Lq)).astype(np.uint8)
    t = rng.integers(0, 16, (B, Lt)).astype(np.uint8)
    qd, td = shard_batch(mesh8, q, t)
    scores, best = sharded_align_scores(mesh8, qd, td, P)
    scores = np.asarray(scores)
    for i in range(0, B, 5):
        g = golds.local_align(q[i], t[i], P)
        assert scores[i] == g["score"]
    assert int(best) == scores.max()


def test_pipeline_step_collectives(mesh8):
    rng = np.random.default_rng(1)
    B, Lq, Lt, R, C = 16, 16, 16, 8, 12
    q = rng.integers(0, 16, (B, Lq)).astype(np.uint8)
    t = rng.integers(0, 16, (B, Lt)).astype(np.uint8)
    qlen = np.full(B, Lq, np.int32)
    tlen = np.full(B, Lt, np.int32)
    reads = rng.integers(65, 85, (B, R)).astype(np.uint8)
    haps = rng.integers(65, 85, (B, C)).astype(np.uint8)
    rlen = np.full(B, R, np.int32)
    clen = np.full(B, C, np.int32)
    bq = rng.integers(5, 60, (B, R)).astype(np.int32)
    iq = rng.integers(5, 60, (B, R)).astype(np.int32)
    dq = rng.integers(5, 60, (B, R)).astype(np.int32)
    arrays = shard_batch(mesh8, q, t, qlen, tlen, reads, haps, rlen, clen, bq, iq, dq)
    out = sharded_pipeline_step(mesh8, *arrays, params=P)
    sw = np.asarray(out["sw_score"])
    assert int(out["global_best_sw"]) == sw.max()
    # total likelihood = psum over shards of per-pair likelihoods
    lik = np.asarray(out["likelihood"])
    np.testing.assert_allclose(
        float(out["total_likelihood"]), lik.astype(np.float64).sum(), rtol=1e-5
    )
    # per-pair parity vs gold
    g = golds.local_align(q[3], t[3], P)
    assert sw[3] == g["score"]
