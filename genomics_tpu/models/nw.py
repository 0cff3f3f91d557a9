"""NW application (reference: CDP/NW): square NxN global alignment with
MATCH=+1, MISMATCH=INS=DEL=-1 linear gaps, full-matrix output.

The reference ships four GPU kernel versions of the same DP
(cell-per-diagonal, tiled, shared-memory double-buffer, full-tile —
kernel0-3.cu) that all compute the identical matrix and are verified
elementwise against nw_cpu.  On TPU there is ONE formulation that the
compiler tiles: a row scan with the left-gap chain as a max-plus prefix
scan; the four CUDA variants collapse into this (SURVEY.md §2.9 row 1-2).

Also replicates the app's query generator (main.cu:41-62 mutation
model) and verify (main.cu:29-39).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomics_tpu.core import golds

MATCH, MISMATCH, INSERTION, DELETION = 1, -1, -1, -1


def generate_query(reference: np.ndarray, rng: np.random.Generator):
    """The app's mutated-query generator: 80% match / 10% ins / 10% del
    (main.cu:41-62), byte alphabet."""
    N = len(reference)
    out = np.empty(N, np.uint8)
    r = q = 0
    while r < N and q < N:
        p = rng.random()
        if p < 0.80:
            out[q] = reference[r]
            q += 1
            r += 1
        elif p < 0.90:
            out[q] = rng.integers(0, 256)
            q += 1
        else:
            r += 1
    while q < N:
        out[q] = rng.integers(0, 256)
        q += 1
    return out


@functools.partial(jax.jit, static_argnames=())
def nw_matrix(reference: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Full [N, N] score matrix on device (row q, col r) — the output the
    app's verify() checks elementwise."""
    N = reference.shape[0]
    ridx = jnp.arange(N, dtype=jnp.int32)
    sub = jnp.where(
        query[:, None] == reference[None, :], jnp.int32(MATCH), jnp.int32(MISMATCH)
    )

    # boundaries: matrix[-1][r] = (r+1)*DELETION; matrix[q][-1] = (q+1)*INSERTION
    prev = (ridx + 1) * DELETION  # virtual row -1

    def body(prev, inputs):
        q, subrow = inputs
        top = prev + INSERTION
        # topleft: matrix[q-1][r-1], boundary q*INSERTION at r == 0
        # (main.cu:15 — for q-1 == -1 the boundary is r*DELETION, which
        # `prev` already encodes; for r == 0 it is q*INSERTION)
        diag_shift = jnp.concatenate(
            [jnp.array([q * INSERTION], jnp.int32), prev[:-1]]
        )
        dia = diag_shift + subrow
        best = jnp.maximum(top, dia)
        # left-gap prefix: m[r] = max(best[r], m[r-1] + DELETION), with
        # m[-1] = (q+1)*INSERTION.  Via v[r] = m[r] - r*DELETION:
        # v = max(cummax(best - r*D), (q+1)*I + D)
        c = best - ridx * DELETION
        seed = (q + 1) * INSERTION + DELETION
        v = jnp.maximum(jax.lax.cummax(c), seed)
        m = v + ridx * DELETION
        return m, m

    _, mat = jax.lax.scan(
        body, prev, (jnp.arange(N, dtype=jnp.int32), sub)
    )
    return mat


def verify(matrix_cpu: np.ndarray, matrix_gpu: np.ndarray) -> bool:
    """Elementwise check, first mismatch reported (main.cu:29-39)."""
    if np.array_equal(matrix_cpu, matrix_gpu):
        return True
    q, r = np.argwhere(matrix_cpu != matrix_gpu)[0]
    print(
        f"Mismatch at q = {q}, r = {r} "
        f"(CPU result = {matrix_cpu[q, r]}, GPU result = {matrix_gpu[q, r]})"
    )
    return False


def run(N: int = 256, seed: int = 0, verify_against_cpu: bool = True):
    """The app's driver: random reference, mutated query, device DP,
    optional CPU-gold verification.  Returns the final score."""
    rng = np.random.default_rng(seed)
    reference = rng.integers(0, 256, N).astype(np.uint8)
    query = generate_query(reference, rng)
    mat = np.asarray(nw_matrix(jnp.asarray(reference), jnp.asarray(query)))
    if verify_against_cpu:
        gold = golds.nw_cpu(reference, query)
        assert verify(gold, mat), "device matrix does not match nw_cpu"
    return int(mat[-1, -1])
