"""Multi-process (multi-host) smoke + parity + scaling run.

This exercises the one configuration a single process can never test:
the PROCESS boundary of jax.distributed — the TPU-native analog of the
reference's MPI layer (CDP/CLUSTER/cluster/src/func.cu:10-26 MPI_Init /
rank binding, 306-318 per-iteration Gather+Bcast, 520 result Gather).

Topology: the same 8-device global mesh, built two ways —

    job "1proc":  1 process × 8 CPU devices   (the single-host config)
    job "2proc":  2 processes × 4 CPU devices (jax.distributed over a
                  local coordinator — the N-host config, DCN analog)

and the parity contract is that every output is IDENTICAL: same mesh,
same shardings, same kernels; only the process boundary moved.  Three
workloads cross it:

  1. sharded_pipeline_step — SW + NW + PairHMM Pallas kernels under
     shard_map with pmax/pmin/psum collectives (parallel/mesh.py),
  2. sharded_align_scores — timed, for the 1→2 process scaling number,
  3. ngia.cluster_distributed — the greedy clustering with in-graph
     representative selection (models/ngia.py).

Orchestrator mode (no --worker) spawns the jobs, compares, and writes
MULTIHOST_SMOKE.json.  Run:  python benchmarks/multihost_run.py
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# worker mode: joins the distributed job and runs the workloads
# ---------------------------------------------------------------------------


def _worker(args) -> None:
    # CPU backend with ndev virtual devices.  The axon TPU plugin may
    # have pinned jax_platforms at interpreter startup (sitecustomize),
    # so override via jax.config too — same recipe as tests/conftest.py.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.ndev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.worker,
        )
    import numpy as np

    from genomics_tpu.core.scoring import AlignmentParams
    from genomics_tpu.models import ngia
    from genomics_tpu.parallel import mesh as pmesh
    from genomics_tpu.parallel.multihost import fetch

    assert len(jax.devices()) == args.ndev * args.nprocs
    mesh = pmesh.data_mesh()
    params = AlignmentParams()
    out: dict = {
        "nprocs": args.nprocs,
        "ndev_per_proc": args.ndev,
        "n_global_devices": len(jax.devices()),
        "backend": jax.default_backend(),
    }

    # -- 1. pipeline step (Pallas kernels under shard_map + collectives) --
    rng = np.random.default_rng(0)
    B, Lq, Lt, R, C = args.b_pipeline, 32, 32, 16, 24
    q = rng.integers(0, 4, (B, Lq)).astype(np.uint8)
    t = rng.integers(0, 4, (B, Lt)).astype(np.uint8)
    qlen = np.full(B, Lq, np.int32)
    tlen = np.full(B, Lt, np.int32)
    reads = rng.integers(65, 85, (B, R)).astype(np.uint8)
    haps = rng.integers(65, 85, (B, C)).astype(np.uint8)
    rlen = np.full(B, R, np.int32)
    clen = np.full(B, C, np.int32)
    bq = rng.integers(5, 60, (B, R)).astype(np.int32)
    iq = rng.integers(5, 60, (B, R)).astype(np.int32)
    dq = rng.integers(5, 60, (B, R)).astype(np.int32)
    arrays = pmesh.shard_batch(
        mesh, q, t, qlen, tlen, reads, haps, rlen, clen, bq, iq, dq
    )
    res = pmesh.sharded_pipeline_step(
        mesh, *arrays, params=params, use_pallas=not args.no_pallas
    )
    jax.block_until_ready(res)
    out["pipeline"] = {
        "sw_score": fetch(res["sw_score"]).tolist(),
        "nw_score": fetch(res["nw_score"]).tolist(),
        "likelihood": fetch(res["likelihood"]).astype(np.float64).tolist(),
        "global_best_sw": int(fetch(res["global_best_sw"])),
        "global_best_owner": int(fetch(res["global_best_owner"])),
        "total_likelihood": float(fetch(res["total_likelihood"])),
    }

    # -- 2. sharded scores, timed (scan engines: compiled XLA on CPU) --
    B2, L2 = args.b_scale, 64
    q2 = rng.integers(0, 4, (B2, L2)).astype(np.uint8)
    t2 = rng.integers(0, 4, (B2, L2)).astype(np.uint8)
    q2d, t2d = pmesh.shard_batch(mesh, q2, t2)
    scores, best = pmesh.sharded_align_scores(
        mesh, q2d, t2d, params, use_pallas=False
    )
    jax.block_until_ready((scores, best))
    reps, t0 = 3, time.perf_counter()
    for _ in range(reps):
        scores, best = pmesh.sharded_align_scores(
            mesh, q2d, t2d, params, use_pallas=False
        )
        jax.block_until_ready((scores, best))
    dt = (time.perf_counter() - t0) / reps
    out["scores"] = {
        "checksum": int(fetch(scores).astype(np.int64).sum()),
        "global_best": int(fetch(best)),
        "reads": B2,
        "seconds": dt,
        "reads_per_s": B2 / dt,
    }

    # -- 3. nGIA distributed clustering --
    rng3 = np.random.default_rng(7)
    base = "".join("ACGT"[c] for c in rng3.integers(0, 4, 240))
    seqs = []
    for i in range(args.n_reads):
        s = list(base)
        for _ in range(rng3.integers(0, 30)):
            s[rng3.integers(0, len(s))] = "ACGT"[rng3.integers(0, 4)]
        if i % 4 == 0:   # a second family, far from the first
            s = ["ACGT"[c] for c in rng3.integers(0, 4, 200)]
        seqs.append("".join(s))
    ng = ngia.cluster_distributed(seqs, similarity=0.92, mesh=mesh)
    out["ngia"] = {
        "cluster": ng.cluster.tolist(),
        "n_clusters": ng.n_clusters,
    }

    if jax.process_index() == 0:
        with open(args.out, "w") as fh:
            json.dump(out, fh)
    # let proc 0 finish its write before the coordinator (proc 0) exits
    if args.nprocs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("multihost_run_done")


# ---------------------------------------------------------------------------
# orchestrator mode
# ---------------------------------------------------------------------------


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_job(nprocs: int, ndev: int, out: str, args) -> None:
    port = _free_port()
    procs = []
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for i in range(nprocs):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--worker", str(i), "--nprocs", str(nprocs),
            "--ndev", str(ndev), "--port", str(port), "--out", out,
            "--b-pipeline", str(args.b_pipeline),
            "--b-scale", str(args.b_scale),
            "--n-reads", str(args.n_reads),
        ] + (["--no-pallas"] if args.no_pallas else [])
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        raise RuntimeError(f"job nprocs={nprocs} failed: rcs={rcs}")


def _orchestrate(args) -> int:
    import tempfile

    tmp = tempfile.mkdtemp(prefix="multihost_")
    f1 = os.path.join(tmp, "out_1proc.json")
    f2 = os.path.join(tmp, "out_2proc.json")
    t0 = time.perf_counter()
    _spawn_job(1, 8, f1, args)
    _spawn_job(args.nprocs, 8 // args.nprocs, f2, args)
    wall = time.perf_counter() - t0
    with open(f1) as fh:
        r1 = json.load(fh)
    with open(f2) as fh:
        r2 = json.load(fh)

    checks = {}
    p1, p2 = r1["pipeline"], r2["pipeline"]
    checks["pipeline_sw_score"] = p1["sw_score"] == p2["sw_score"]
    checks["pipeline_nw_score"] = p1["nw_score"] == p2["nw_score"]
    lik_err = max(
        (abs(a - b) / max(abs(a), 1e-300))
        for a, b in zip(p1["likelihood"], p2["likelihood"])
    )
    checks["pipeline_likelihood_bitexact"] = p1["likelihood"] == p2["likelihood"]
    checks["pipeline_globals"] = (
        p1["global_best_sw"] == p2["global_best_sw"]
        and p1["global_best_owner"] == p2["global_best_owner"]
    )
    checks["scores_checksum"] = (
        r1["scores"]["checksum"] == r2["scores"]["checksum"]
        and r1["scores"]["global_best"] == r2["scores"]["global_best"]
    )
    checks["ngia_cluster"] = r1["ngia"]["cluster"] == r2["ngia"]["cluster"]
    checks["ngia_n_clusters"] = r1["ngia"]["n_clusters"] == r2["ngia"]["n_clusters"]
    ok = all(checks.values())

    artifact = {
        "ok": ok,
        "checks": checks,
        "pipeline_likelihood_max_rel_err": lik_err,
        "topology": {
            "1proc": {"processes": 1, "devices_per_process": 8},
            f"{args.nprocs}proc": {
                "processes": args.nprocs,
                "devices_per_process": 8 // args.nprocs,
            },
        },
        "backend": r1["backend"],
        "n_global_devices": r1["n_global_devices"],
        "ngia_n_clusters": r1["ngia"]["n_clusters"],
        "host_scaling": {
            "note": (
                "same 8-device CPU mesh split 1 vs N processes; CPU "
                "devices share host cores so this measures process-"
                "boundary overhead, not chip throughput"
            ),
            "reads": r1["scores"]["reads"],
            "reads_per_s_1proc": r1["scores"]["reads_per_s"],
            f"reads_per_s_{args.nprocs}proc": r2["scores"]["reads_per_s"],
            "efficiency": r2["scores"]["reads_per_s"]
            / r1["scores"]["reads_per_s"],
        },
        "wall_seconds": wall,
    }
    with open(args.artifact, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact, indent=1))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--ndev", type=int, default=4)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--artifact",
                    default=os.path.join(REPO, "MULTIHOST_SMOKE.json"))
    ap.add_argument("--b-pipeline", type=int, default=256)
    ap.add_argument("--b-scale", type=int, default=4096)
    ap.add_argument("--n-reads", type=int, default=64)
    ap.add_argument("--no-pallas", action="store_true",
                    help="scan engines in the pipeline step (faster on CPU)")
    args = ap.parse_args()
    if args.worker is not None:
        _worker(args)
        return 0
    return _orchestrate(args)


if __name__ == "__main__":
    sys.exit(main())
