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


def _count_batch(t):
    """Per-batch row/parse-failure counters (data-plane metrics rows —
    the debug-inspector analogue, src/topology/debug/traces.rs:9-60)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ok = pc.sum(pc.cast(t.column("parse_ok"), pa.int64())).as_py() or 0
    return pa.table(
        {"rows": pa.array([t.num_rows], pa.int64()), "failed": pa.array([t.num_rows - ok], pa.int64())}
    )


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
        # materialize the routed blocks once; both sink projections and the
        # aggregates re-read these blocks from the object store instead of
        # re-running parse/enrich per consumer
        routed = routed.materialize()
        sinks = split_sinks(routed)
        sink_counts = {}
        sink_files = []
        for name in (TRACES, LOGS):
            d = os.path.join(out_dir, name, f"wave={w}")
            sink_counts[name] = write_sink_atomic(sinks[name], d)
            sink_files.append(d)
        mdir = os.path.join(out_dir, "metrics", f"wave={w}")
        sink_counts["metrics"] = write_sink_atomic(metrics_aggregate(routed), mdir)
        sink_files.append(mdir)
        adir = os.path.join(out_dir, "conv_agg", f"wave={w}")
        sink_counts["conv_agg"] = write_sink_atomic(
            conv_aggregate(routed).sort("conv_id"), adir
        )
        sink_files.append(adir)

        cdf = (
            routed.map_batches(_count_batch, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
            .sum()
        )
        rows_in, rows_failed = int(cdf["rows"]), int(cdf["failed"])
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
