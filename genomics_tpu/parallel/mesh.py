"""Mesh helpers and the sharded multi-engine pipeline step.

TPU-native scaling model (SURVEY.md §2.9, §5): alignment work is
embarrassingly parallel across *pairs*, so the only mesh axis that
matters is `data`; sequence *length* is handled inside kernels (VMEM
strip-mining / windows), not by sharding.  Multi-host runs extend the
same mesh over DCN via jax.distributed — the code below is identical
for 1 chip, 1 host, or N hosts."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genomics_tpu.core.scoring import AlignmentParams
from genomics_tpu.ops import scan_align, scan_pairhmm


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n devices, axis name 'data'."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays sharded along axis 0 over the mesh's data axis."""
    sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def sharded_align_scores(
    mesh: Mesh,
    q: jnp.ndarray,    # [B, Lq] uint8 (B divisible by mesh size)
    t: jnp.ndarray,    # [B, Lt]
    params: AlignmentParams,
):
    """Data-parallel local alignment: per-shard DP, plus a global
    best-score reduction (the all-reduce the reference does over MPI).

    Returns (scores [B] — sharded, global_best scalar — replicated)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P()),
    )
    def step(q_local, t_local):
        res = scan_align.local_align_batch(q_local, t_local, params)
        best = jax.lax.pmax(jnp.max(res.score), "data")
        return res.score, best

    return jax.jit(step)(q, t)


def sharded_pipeline_step(
    mesh: Mesh,
    q: jnp.ndarray,        # [B, Lq] uint8 codes
    t: jnp.ndarray,        # [B, Lt]
    qlen: jnp.ndarray,     # [B]
    tlen: jnp.ndarray,
    reads: jnp.ndarray,    # [B, R] raw bytes (PairHMM)
    haps: jnp.ndarray,     # [B, C]
    rlen: jnp.ndarray,
    clen: jnp.ndarray,
    bq: jnp.ndarray,       # [B, R] quals
    iq: jnp.ndarray,
    dq: jnp.ndarray,
    params: AlignmentParams,
):
    """The flagship multi-chip step: SW scores + NW scores + PairHMM
    likelihoods on the local shard, global statistics via collectives —
    one fused jit, shardings annotated, XLA inserts the ICI collectives
    (BASELINE.json config 5).

    Returns dict of sharded per-read outputs + replicated globals."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("data"),) * 11,
        out_specs={
            "sw_score": P("data"),
            "nw_score": P("data"),
            "likelihood": P("data"),
            "global_best_sw": P(),
            "global_best_owner": P(),
            "total_likelihood": P(),
        },
    )
    def step(q, t, qlen, tlen, reads, haps, rlen, clen, bq, iq, dq):
        sw = scan_align.local_align_batch(q, t, params)
        nw = scan_align.global_align_batch(q, t, qlen, tlen, params)
        lik = scan_pairhmm.pairhmm_forward_batch(
            reads, haps, rlen, clen, bq, iq, dq
        )
        # global best + owning shard: the nGIA "representative selection"
        # pattern (min/max reduce + implicit replication, no Bcast)
        local_best = jnp.max(sw.score)
        global_best = jax.lax.pmax(local_best, "data")
        me = jax.lax.axis_index("data")
        owner = jax.lax.pmin(
            jnp.where(local_best == global_best, me, jnp.int32(1 << 30)), "data"
        )
        total = jax.lax.psum(jnp.sum(lik, dtype=jnp.float32), "data")
        return {
            "sw_score": sw.score,
            "nw_score": nw.score,
            "likelihood": lik,
            "global_best_sw": global_best,
            "global_best_owner": owner,
            "total_likelihood": total,
        }

    return jax.jit(step)(q, t, qlen, tlen, reads, haps, rlen, clen, bq, iq, dq)
