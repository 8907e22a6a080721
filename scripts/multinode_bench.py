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
    python scripts/multinode_bench.py --scaling [sf] [cpus_per_node] [repeats]

--scaling (round 5) measures the N->2N NODE-count datapoint the north
rule's cross-cluster criterion wants: 1 node x cpus vs 2 nodes x cpus,
fresh clusters per run, repeats alternated across topologies, best-of-R
per level, efficiency = (2-node throughput / 1-node throughput) / 2.
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
assert len(alive) == int(sys.argv[4]), f"expected {sys.argv[4]} nodes, got {len(alive)}"

def node_of(batch):
    import pyarrow as pa
    return pa.table({"node": [ray.get_runtime_context().get_node_id()]
                     * len(batch["id"])})

nodes = set(r["node"] for r in ray.data.range(4096, override_num_blocks=64)
            .map_batches(node_of, batch_format="pyarrow").take_all())

from rotel_ray.pipelines.flagship import run_flagship
t0 = time.time()
res = run_flagship(sys.argv[2], sys.argv[3], waves=int(sys.argv[5]),
                   batch_size=65536)
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


def run_once(n_nodes: int, cpus: int, tdir: str, out_dir: str,
             waves: int = 8) -> dict:
    """Fresh cluster (head + n_nodes-1 workers), one flagship run, teardown.

    ``waves``: 8 for the cross-node-overhead A/B (exercises checkpointed
    multi-wave resume across object stores); 1 for the N->2N scaling
    measurement (single-wave streaming job, the same profile as the
    single-node bench.py scaling datapoints — at 24 workers the 8 per-wave
    manifest barriers otherwise dominate wall time and measure launch
    latency, not node scaling)."""
    subprocess.run(["rm", "-rf", out_dir], check=True)
    assert _ray(["stop", "--force"]).returncode == 0
    head = _ray(["start", "--head", f"--port={PORT}", f"--num-cpus={cpus}",
                 "--include-dashboard=false", "--disable-usage-stats"])
    if head.returncode != 0:
        sys.exit(f"cannot start head node: {head.stderr[-400:]}")
    try:
        for _ in range(n_nodes - 1):
            worker = _ray(["start", f"--address=127.0.0.1:{PORT}",
                           f"--num-cpus={cpus}", "--disable-usage-stats"])
            assert worker.returncode == 0, worker.stderr[-400:]
        env = dict(os.environ, PYTHONPATH=REPO)
        env.pop("RAY_ADDRESS", None)
        res = subprocess.run(
            [sys.executable, "-c", DRIVER, f"127.0.0.1:{PORT}", tdir, out_dir,
             str(n_nodes), str(waves)],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=1800)
        assert res.returncode == 0, res.stderr[-2000:]
        return json.loads(res.stdout.strip().splitlines()[-1])
    finally:
        _ray(["stop", "--force"])


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--scaling"]
    scaling = "--scaling" in sys.argv[1:]
    sf = float(args[0]) if len(args) > 0 else 2.0
    cpus = int(args[1]) if len(args) > 1 else 12
    repeats = int(args[2]) if len(args) > 2 else 2

    from rotel_ray.generator import ensure_transcripts

    tdir = ensure_transcripts(sf)
    out_dir = f"/tmp/rotel_mn_bench_sf{sf:g}"

    if not scaling:
        t0 = time.time()
        rec = run_once(2, cpus, tdir, out_dir)
        print(json.dumps({"sf": sf, "cpus_per_node": cpus, "n_nodes": 2,
                          **rec, "total_wall_sec": round(time.time() - t0, 1)}))
        return

    # N -> 2N node scaling: 1 node x cpus vs 2 nodes x cpus, fresh clusters,
    # repeats ALTERNATED across topologies so host weather hits both levels
    # evenly; best-of-R per level (the round-2 variance rule). Efficiency =
    # (throughput_2n / throughput_1n) / 2.
    runs = {1: [], 2: []}
    for _ in range(repeats):
        for n in (1, 2):
            rec = run_once(n, cpus, tdir, out_dir, waves=1)
            runs[n].append(rec["turns_per_sec"])
    t1, t2 = max(runs[1]), max(runs[2])
    print(json.dumps({
        "sf": sf, "cpus_per_node": cpus, "repeats": repeats,
        "one_node_turns_per_sec": t1, "two_node_turns_per_sec": t2,
        "one_node_all": runs[1], "two_node_all": runs[2],
        "node_scaling_efficiency": round(t2 / t1 / 2, 4),
    }))


if __name__ == "__main__":
    main()
