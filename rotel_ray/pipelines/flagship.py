"""The flagship pipeline: read -> parse -> enrich -> route -> sinks +
aggregates, with checkpointed, resumable execution.

This is the batch restatement of rotel's agent hot path
(src/topology/generic_pipeline.rs:202-327: receive -> resource-attr upsert ->
processors -> batch -> fanout -> exporters), per SURVEY.md §3.4. Every stage
is a lazy Dataset transform; the streaming executor pipelines them with
backpressure; the only materialization points are the sink writes and the
(small) aggregate results.
"""

from __future__ import annotations

import glob
import os
import time

import ray.data as rd

from ..sinks import write_sink_atomic
from ..stages.aggregate import conv_aggregate, metrics_aggregate
from ..stages.enrich import enrich_stage
from ..stages.parse import parse_stage
from ..stages.route import LOGS, TRACES, route_stage, split_sinks
from ..state.manifest import Manifest


def build_routed(input_paths, *, enrich_concurrency=4, batch_size: int = 16384,
                 resource_attrs: dict | None = None):
    """read -> parse -> enrich -> route (lazy)."""
    ds = rd.read_parquet(input_paths)
    ds = parse_stage(ds, batch_size=batch_size)
    ds = enrich_stage(ds, concurrency=enrich_concurrency, batch_size=batch_size,
                      resource_attrs=resource_attrs)
    return route_stage(ds, batch_size=batch_size)


def run_flagship(
    input_dir: str,
    out_dir: str,
    *,
    waves: int = 4,
    enrich_concurrency=4,
    batch_size: int = 16384,
    resume: bool = True,
) -> dict:
    """Run the full job, checkpointed by input-file wave.

    Commit granularity is a *wave* of input fragments: each wave is one
    streaming pipeline over its files, its sinks land atomically under
    ``out/{sink}/wave={w}``, and only then is the wave's manifest record
    (lineage + data-plane counters) appended. Resume skips committed waves —
    the translation of the reference's min-pending-offset watermark
    (src/receivers/kafka/offset_tracker.rs:8-20).
    """
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    manifest = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    if not resume and os.path.exists(manifest.path):
        os.remove(manifest.path)
        manifest = Manifest(manifest.path)

    waves = min(waves, len(files))
    chunks = [files[w::waves] for w in range(waves)]

    for w, frag in enumerate(chunks):
        if manifest.is_done(w):
            continue
        t0 = time.time()
        routed = build_routed(frag, enrich_concurrency=enrich_concurrency, batch_size=batch_size)
        # materialize the routed blocks once; every consumer below re-reads
        # these object-store blocks instead of re-running parse/enrich
        routed = routed.materialize()
        sinks = split_sinks(routed)
        sink_counts: dict[str, int] = {}
        sink_files = []

        # the four consumers are independent Dataset executions — run them
        # concurrently from driver threads so they fill each other's idle
        # CPU slots (Ray schedules their tasks into one pool)
        from concurrent.futures import ThreadPoolExecutor

        jobs = {
            TRACES: (sinks[TRACES], os.path.join(out_dir, TRACES, f"wave={w}")),
            LOGS: (sinks[LOGS], os.path.join(out_dir, LOGS, f"wave={w}")),
            "metrics": (metrics_aggregate(routed), os.path.join(out_dir, "metrics", f"wave={w}")),
            "conv_agg": (conv_aggregate(routed).sort("conv_id"), os.path.join(out_dir, "conv_agg", f"wave={w}")),
        }
        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            futs = {name: ex.submit(write_sink_atomic, ds, d) for name, (ds, d) in jobs.items()}
            for name, fut in futs.items():
                sink_counts[name] = fut.result()
                sink_files.append(jobs[name][1])

        # data-plane counters (exporter-counter parity): routed totals come
        # from the rows actually written; parse failures are the 'chat'
        # fall-through count already aggregated into the metrics sink
        rows_in = sink_counts[TRACES] + sink_counts[LOGS]
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        mtbl = pq.read_table(jobs["metrics"][1], columns=["name", "value_count"])
        rows_failed = (
            pc.sum(mtbl.filter(pc.equal(mtbl.column("name"), "chat")).column("value_count")).as_py() or 0
        )
        manifest.commit(
            w,
            frag,
            rows_in=rows_in,
            rows_parsed=rows_in - rows_failed,
            rows_failed=rows_failed,
            sink_counts=sink_counts,
            sink_files=sink_files,
            wall_ms=int((time.time() - t0) * 1000),
        )
    return manifest.totals()
