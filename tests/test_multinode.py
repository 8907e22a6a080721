"""Multi-node smoke: the flagship job on a REAL 2-node Ray cluster.

The north rule runs via ``ray job submit`` on a fixed-size multi-node
cluster. This container ships ray[data] without the jobs HTTP server
(``ray job`` needs ray[default]), so the test exercises the same execution
model one layer down: a head node + a separate worker node (two raylets,
two object stores), a driver process connecting with
``ray.init(address=...)`` — exactly what a submitted job's entrypoint does
on the head node — and the checkpointed flagship run spreading tasks
across BOTH nodes, then resuming from the manifest.

Everything runs in subprocesses so the pytest session's local Ray stays
untouched. scripts/submit_job.sh is the thin ``ray job submit`` wrapper
around the same entrypoint for clusters that have the jobs API.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 6391

DRIVER = r"""
import json, sys
import ray

ray.init(address=sys.argv[1], logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

alive = [n for n in ray.nodes() if n["Alive"]]
assert len(alive) == 2, f"expected 2 nodes, got {len(alive)}"

# prove tasks actually spread across both raylets
def node_of(batch):
    import pyarrow as pa
    nid = ray.get_runtime_context().get_node_id()
    return pa.table({"node": [nid] * len(batch["id"])})

nodes = set(
    r["node"]
    for r in ray.data.range(4096, override_num_blocks=64)
    .map_batches(node_of, batch_format="pyarrow")
    .take_all()
)

from rotel_ray.pipelines.flagship import run_flagship
res1 = run_flagship(sys.argv[2], sys.argv[3], waves=4, enrich_concurrency=2,
                    batch_size=8192)
res2 = run_flagship(sys.argv[2], sys.argv[3], waves=4, enrich_concurrency=2,
                    batch_size=8192)  # resume: all waves committed
print(json.dumps({
    "nodes_seen": len(nodes),
    "sink_counts": res1["sink_counts"],
    "resumed_skipped": res2.get("skipped_waves", res2.get("skipped", None)),
    "second_run": res2["sink_counts"],
}))
ray.shutdown()
"""


def _ray(args, **kw):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)
    return subprocess.run(["ray", *args], capture_output=True, text=True,
                          cwd=REPO, env=env, timeout=180, **kw)


@pytest.mark.skipif(os.environ.get("RAY_MULTINODE") != "1",
                    reason="starts/stops machine-wide Ray daemons (`ray stop`"
                           " would kill the suite's session Ray); run"
                           " standalone: RAY_MULTINODE=1 python -m pytest"
                           " tests/test_multinode.py")
def test_flagship_on_two_node_cluster(tmp_path):
    from rotel_ray.generator import generate_shard

    t = generate_shard(0, 20_000)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    per = 20_000 // 8
    for s in range(8):
        pq.write_table(t.slice(s * per, per), in_dir / f"part-{s}.parquet")

    assert _ray(["stop", "--force"]).returncode == 0
    head = _ray(["start", "--head", f"--port={PORT}", "--num-cpus=3",
                 "--include-dashboard=false", "--disable-usage-stats"])
    if head.returncode != 0:
        pytest.skip(f"cannot start head node: {head.stderr[-400:]}")
    try:
        worker = _ray(["start", f"--address=127.0.0.1:{PORT}", "--num-cpus=3",
                       "--disable-usage-stats"])
        assert worker.returncode == 0, worker.stderr[-400:]

        env = dict(os.environ, PYTHONPATH=REPO)
        env.pop("RAY_ADDRESS", None)
        out = subprocess.run(
            [sys.executable, "-c", DRIVER, f"127.0.0.1:{PORT}",
             str(in_dir), str(tmp_path / "out")],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=420)
        assert out.returncode == 0, out.stderr[-2000:]
        res = json.loads(out.stdout.strip().splitlines()[-1])
        assert res["nodes_seen"] == 2, res  # tasks ran on BOTH nodes
        assert (res["sink_counts"]["traces"] + res["sink_counts"]["logs"]
                == 20_000)
        # the resumed run re-reports committed counters without recompute
        assert res["second_run"] == res["sink_counts"]
    finally:
        _ray(["stop", "--force"])
