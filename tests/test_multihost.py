"""Multi-PROCESS jax.distributed tests — the config a single process
cannot cover (SURVEY.md §4: multi-process CPU jax.distributed with
num_processes>1; reference analog: nGIA's MPI layer,
CDP/CLUSTER/cluster/src/func.cu:10-26, 306-318, 520).

The orchestrator (benchmarks/multihost_run.py) runs the same workloads
on the same 8-device CPU mesh built as 1 process × 8 devices and as
2 processes × 4 devices (local coordinator over gRPC/Gloo), and asserts
every output identical: sharded_pipeline_step (Pallas kernels under
shard_map + collectives), sharded_align_scores, and
ngia.cluster_distributed.  Only the process boundary moves."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multiprocess_parity(tmp_path):
    artifact = tmp_path / "MULTIHOST_SMOKE.json"
    env = dict(os.environ)
    # the orchestrator's workers pin their own backend; drop the
    # conftest's in-process overrides so they don't double-apply
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "benchmarks", "multihost_run.py"),
            "--artifact", str(artifact),
            "--b-pipeline", "128", "--b-scale", "1024", "--n-reads", "32",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    res = json.loads(artifact.read_text())
    assert res["ok"], res
    assert all(res["checks"].values()), res["checks"]
    assert res["n_global_devices"] == 8
    assert res["checks"]["pipeline_likelihood_bitexact"]
