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

import ray.data as rd  # noqa: F401 — fault-injection patch point for tests

from ..io import read_parquet
from ..stages.aggregate import fused_metrics_conv_aggregate
from ..stages.enrich import enrich_stage
from ..stages.parse import parse_stage
from ..stages.route import LOGS, TRACES, route_stage
from ..state.manifest import Manifest


def build_routed(input_paths, *, enrich_concurrency=4, batch_size: int = 16384,
                 resource_attrs: dict | None = None, enrich_compute: str = "tasks"):
    """read -> parse -> enrich -> route (lazy)."""
    ds = read_parquet(input_paths)
    ds = parse_stage(ds, batch_size=batch_size)
    ds = enrich_stage(ds, concurrency=enrich_concurrency, batch_size=batch_size,
                      resource_attrs=resource_attrs, compute=enrich_compute)
    return route_stage(ds, batch_size=batch_size,
                       extra_cols=sorted(resource_attrs) if resource_attrs else None)


def run_flagship(
    input_dir: str,
    out_dir: str,
    *,
    waves: int = 4,
    enrich_concurrency=4,
    batch_size: int = 16384,
    resume: bool = True,
    resource_attrs: dict | None = None,
    enrich_compute: str = "tasks",
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

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for w, frag in enumerate(chunks):
        if manifest.is_done(w, frag):  # fingerprint-checked resume
            continue
        t0 = time.time()
        sink_counts: dict[str, int] = {}
        sink_files = []

        # ONE fully-streaming execution: read -> parse -> enrich -> route ->
        # partitioned write (sink=traces|logs). No materialize barrier — the
        # write overlaps parse under backpressure, and the object store never
        # holds more than the in-flight blocks (the shape that streams 100 TB).
        # Per-sink column projection happens at READ time via parquet column
        # pruning instead of at write time (columnar format makes the unused
        # columns ~free to carry).
        routed = build_routed(frag, enrich_concurrency=enrich_concurrency,
                              batch_size=batch_size, resource_attrs=resource_attrs,
                              enrich_compute=enrich_compute)
        tmp = os.path.join(out_dir, f".routed_wave{w}.writing")
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)
        routed.write_parquet(tmp, partition_cols=["sink"],
                             arrow_parquet_args_fn=lambda: {"compression": "snappy"})
        for sink in (TRACES, LOGS):
            src = os.path.join(tmp, f"sink={sink}")
            dst = os.path.join(out_dir, sink, f"wave={w}")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            _sh.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                os.replace(src, dst)
            else:
                os.makedirs(dst, exist_ok=True)  # wave routed zero rows there
            sink_counts[sink] = sum(
                pq.read_metadata(os.path.join(dst, f)).num_rows
                for f in os.listdir(dst) if f.endswith(".parquet")
            )
            sink_files.append(dst)
        _sh.rmtree(tmp, ignore_errors=True)

        # aggregates consume the just-written sink files with column pruning
        # (second pass reads ~5 narrow columns, not the text payload)
        wave_files = [
            f for s in (TRACES, LOGS)
            for f in sorted(glob.glob(os.path.join(out_dir, s, f"wave={w}", "*.parquet")))
        ]
        agg_cols = ["conv_id", "turn_idx", "ts", "role", "event_type",
                    "severity_number", "error_code", "duration_ms", "body_bytes_sent"]
        agg_src = read_parquet(wave_files, columns=agg_cols)

        # BOTH aggregates run in ONE fused execution (one streaming-executor
        # launch + one sort instead of two — halves the aggregate-side fixed
        # latency F that caps small-corpus scaling efficiency; BASELINE.md).
        # The partitioned write lands __agg=metrics / __agg=conv_agg dirs;
        # each sink carries the other aggregate's columns as nulls, which is
        # ~free in parquet (null bitmaps) and pruned at read time — the same
        # projection-at-read philosophy as the routed sinks.
        fused = fused_metrics_conv_aggregate(agg_src)
        agg_tmp = os.path.join(out_dir, f".agg_wave{w}.writing")
        _sh.rmtree(agg_tmp, ignore_errors=True)
        fused.write_parquet(agg_tmp, partition_cols=["__agg"],
                            arrow_parquet_args_fn=lambda: {"compression": "snappy"})
        agg_dirs = {}
        for name in ("metrics", "conv_agg"):
            src = os.path.join(agg_tmp, f"__agg={name}")
            d = os.path.join(out_dir, name, f"wave={w}")
            os.makedirs(os.path.dirname(d), exist_ok=True)
            _sh.rmtree(d, ignore_errors=True)
            if os.path.isdir(src):
                os.replace(src, d)
            else:
                os.makedirs(d, exist_ok=True)
            sink_counts[name] = sum(
                pq.read_metadata(os.path.join(d, f)).num_rows
                for f in os.listdir(d) if f.endswith(".parquet")
            )
            sink_files.append(d)
            agg_dirs[name] = d
        _sh.rmtree(agg_tmp, ignore_errors=True)

        # data-plane counters (exporter-counter parity): routed totals come
        # from the rows actually written; parse failures are the 'chat'
        # fall-through count already aggregated into the metrics sink
        rows_in = sink_counts[TRACES] + sink_counts[LOGS]
        mtbl = pq.read_table(agg_dirs["metrics"], columns=["name", "value_count"])
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
