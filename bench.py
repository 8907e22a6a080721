"""Benchmark harness.

Plain run: execute the headline flagship pipeline (parse -> enrich -> route
-> sinks -> aggregates) over $GRAFT_SF_DIR (default /root/testdata/sf0.1,
mapped to the deterministic synthetic transcript corpus at that scale) with
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32), plus a set of secondary
query timings. Prints ONE JSON line.

--scaling: run the headline pipeline in two fresh processes at num_cpus=8
and num_cpus=32 on the same input and report both throughputs + scaling
efficiency (the in-sandbox evidence for the N->4N >=0.8 criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

SECONDARY = [
    "conv_agg",
    "metrics_emf",
    "logs_sink",
    "lineitem_pricing",
    "nation_orders",
    "order_revenue_join",
    "events_minute",
    "sessionize",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk",
    "embedding_neardup",
    "lang_id",
    "file_source",
    "mm_features",
]


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from rotel_ray.generator import ensure_transcripts, sf_from_dir
    from rotel_ray.pipelines.flagship import run_flagship
    from rotel_ray.queries import QUERIES

    tdir = ensure_transcripts(SF_DIR)
    # warm OS page cache so we measure compute+shuffle, not first disk read
    for f in os.listdir(tdir):
        with open(os.path.join(tdir, f), "rb") as fh:
            fh.read()
    # warm the Ray worker pool (python workers import ray.data/pyarrow once;
    # ~8s one-time at 32 cpus) so the timed run measures steady-state
    import ray.data as rd

    rd.read_parquet(tdir).map_batches(lambda t: t, batch_format="pyarrow").count()

    out_dir = f"/tmp/rotel_bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    totals = run_flagship(
        tdir, out_dir, waves=1, enrich_concurrency=max(2, NUM_CPUS // 4), resume=False
    )
    headline = time.time() - t0
    turns = totals["rows_in"]

    queries = {"flagship": round(headline, 3)}
    for name in SECONDARY:
        t0 = time.time()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "flagship parse→enrich→route→aggregate wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_from_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        "turns": turns,
        "turns_per_sec": round(turns / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling():
    def run_at(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run_at(lo), run_at(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (num_cpus 8 -> 32, same input)",
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "turns_per_sec_8": r_lo["turns_per_sec"],
                "turns_per_sec_32": r_hi["turns_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "sf": r_hi["sf"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
