"""Debug inspector stage — per-batch summary/detail logging.

The reference's debug exporter prints per-batch count summaries
("Received traces resource_spans=N spans=M", src/topology/debug/traces.rs:
9-60) in `basic` mode or a full per-record dump via a debug buffer in
`detailed` mode (debug_buffer.rs). Batch restatement: a pass-through
``map_batches`` stage that logs one summary line per batch (and the first
row in detailed mode) to the worker's logger, leaving the stream unchanged.
Authoritative counters stay in the data plane (manifest row counts) — this
stage is observability only, like the reference's.
"""

from __future__ import annotations

import logging

import pyarrow as pa

logger = logging.getLogger("rotel_ray.debug")


def summarize_batch(t: pa.Table, signal: str = "logs") -> str:
    """One summary line per batch, mirroring the reference's format."""
    parts = [f"Received {signal}", f"records={t.num_rows}"]
    if "sink" in t.column_names:
        counts = t.group_by("sink").aggregate([("sink", "count")])
        per = dict(zip(counts.column("sink").to_pylist(), counts.column("sink_count").to_pylist()))
        parts += [f"{k}={v}" for k, v in sorted(per.items())]
    if "event_type" in t.column_names:
        et = t.group_by("event_type").aggregate([("event_type", "count")])
        per = dict(zip(et.column("event_type").to_pylist(), et.column("event_type_count").to_pylist()))
        parts.append("event_types=" + ",".join(f"{k}:{v}" for k, v in sorted(per.items())))
    return " ".join(parts)


def debug_batch(t: pa.Table, *, signal: str = "logs", verbosity: str = "basic",
                level: int = logging.INFO) -> pa.Table:
    """Pass-through inspect: logs the batch summary (and first row when
    detailed). Returns the batch unchanged (zero-copy)."""
    logger.log(level, summarize_batch(t, signal))
    if verbosity == "detailed" and t.num_rows:
        logger.log(level, "first_record=%s", t.slice(0, 1).to_pylist()[0])
    return t


def debug_stage(ds, *, signal: str = "logs", verbosity: str = "basic",
                level: int = logging.INFO):
    """Attach the inspector anywhere in a pipeline (pass-through)."""
    return ds.map_batches(
        lambda t: debug_batch(t, signal=signal, verbosity=verbosity, level=level),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
