"""Multi-node flagship bench: head + worker raylets on this machine.

The round-3 2-node test (tests/test_multinode.py) proves CORRECTNESS off
the driver; this script adds the measured datapoint: the flagship job over
the sf2 corpus (12 M turns) on a real head+worker cluster (two raylets,
two object stores, tasks spread across both), reported as turns/s for
BASELINE.md next to the single-node scaling numbers.

Topology default: 2 nodes x 12 CPUs = 24 workers total, matching the
single-node 24-CPU scaling datapoints so the cross-node overhead (object
transfer between object stores, remote scheduling) is directly readable
from the delta.

MUST run standalone (it calls `ray stop --force`, which kills any other
local Ray session — same caveat as tests/test_multinode.py):

    python scripts/multinode_bench.py [sf] [cpus_per_node]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PORT = 6395

DRIVER = r"""
import json, sys, time
import ray

ray.init(address=sys.argv[1], logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

alive = [n for n in ray.nodes() if n["Alive"]]
assert len(alive) == 2, f"expected 2 nodes, got {len(alive)}"

def node_of(batch):
    import pyarrow as pa
    return pa.table({"node": [ray.get_runtime_context().get_node_id()]
                     * len(batch["id"])})

nodes = set(r["node"] for r in ray.data.range(4096, override_num_blocks=64)
            .map_batches(node_of, batch_format="pyarrow").take_all())

from rotel_ray.pipelines.flagship import run_flagship
t0 = time.time()
res = run_flagship(sys.argv[2], sys.argv[3], waves=8, batch_size=65536)
wall = time.time() - t0
print(json.dumps({"nodes_seen": len(nodes), "wall_sec": round(wall, 2),
                  "rows_in": res["rows_in"],
                  "turns_per_sec": round(res["rows_in"] / wall, 1),
                  "sink_counts": res["sink_counts"]}))
ray.shutdown()
"""


def _ray(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)
    return subprocess.run(["ray", *args], capture_output=True, text=True,
                          cwd=REPO, env=env, timeout=300)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from rotel_ray.generator import ensure_transcripts

    tdir = ensure_transcripts(sf)
    out_dir = f"/tmp/rotel_mn_bench_sf{sf:g}"
    subprocess.run(["rm", "-rf", out_dir], check=True)

    assert _ray(["stop", "--force"]).returncode == 0
    head = _ray(["start", "--head", f"--port={PORT}", f"--num-cpus={cpus}",
                 "--include-dashboard=false", "--disable-usage-stats"])
    if head.returncode != 0:
        sys.exit(f"cannot start head node: {head.stderr[-400:]}")
    try:
        worker = _ray(["start", f"--address=127.0.0.1:{PORT}",
                       f"--num-cpus={cpus}", "--disable-usage-stats"])
        assert worker.returncode == 0, worker.stderr[-400:]
        env = dict(os.environ, PYTHONPATH=REPO)
        env.pop("RAY_ADDRESS", None)
        t0 = time.time()
        res = subprocess.run(
            [sys.executable, "-c", DRIVER, f"127.0.0.1:{PORT}", tdir, out_dir],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=1800)
        assert res.returncode == 0, res.stderr[-2000:]
        rec = json.loads(res.stdout.strip().splitlines()[-1])
        print(json.dumps({"sf": sf, "cpus_per_node": cpus, "n_nodes": 2,
                          **rec, "total_wall_sec": round(time.time() - t0, 1)}))
    finally:
        _ray(["stop", "--force"])


if __name__ == "__main__":
    main()
