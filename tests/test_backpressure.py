"""Streaming-execution evidence: the flagship completes with a deliberately
tiny object store (forced spill/backpressure) — the property that lets the
same pipeline stream 100 TB through a fixed-size cluster.

Runs in a subprocess with its own constrained Ray session so the suite's
session fixture is untouched.
"""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, sys
import ray

# ~200 MB object store: far below the working set of a 600k-turn wave, so
# the streaming executor must backpressure + spill rather than materialize
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", object_store_memory=200 * 1024 * 1024)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from rotel_ray.generator import ensure_transcripts
from rotel_ray.pipelines.flagship import run_flagship

tdir = ensure_transcripts("/root/testdata/sf0.1")  # 600k turns
res = run_flagship(tdir, sys.argv[1], waves=2, enrich_concurrency=2)
print(json.dumps({"traces": res["sink_counts"]["traces"],
                  "logs": res["sink_counts"]["logs"]}))
ray.shutdown()
"""


def test_flagship_under_tiny_object_store(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, "-c", DRIVER, str(tmp_path / "out")],
                         capture_output=True, text=True, cwd=REPO, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["traces"] + res["logs"] == 600_000


DRIVER_OPS = r"""
import json, sys
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", object_store_memory=200 * 1024 * 1024)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from rotel_ray.queries import QUERIES

sf = "/root/testdata/sf0.1"
packed = QUERIES["conv_examples"](sf).to_pandas()      # 600k-row shuffle op
curated = QUERIES["corpus_pack"](sf).to_pandas()       # composed gate->dedup->pack
print(json.dumps({"conv_examples": len(packed),
                  "corpus_pack": len(curated)}))
ray.shutdown()
"""


def test_round4_ops_under_tiny_object_store(tmp_path):
    """The round-4 shuffle-bearing ops stream under the same 200 MB object
    store the flagship test uses — backpressure, not materialization."""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, "-c", DRIVER_OPS],
                         capture_output=True, text=True, cwd=REPO, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["conv_examples"] == 600_000
    assert res["corpus_pack"] > 0
