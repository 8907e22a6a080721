"""Route stage: tag each enriched row with its destination sink and fan out.

The Ray-Data-native analogue of rotel's telemetry-type routing + fanout
(reference: src/topology/fanout.rs:17-95 — one batch cloned to N exporter
queues; src/init/agent.rs:396-538 — signal -> named exporter set). In batch
world the router is a vectorized predicate cascade producing a `sink`
column; each sink then gets a projected, filtered view of the same lazy
Dataset (blocks are shared zero-copy — the clone-for-fanout cost the
reference pays per batch, fanout.rs:108-160, is free here).

Routing rules (FIXTURES.md §2e):
- parsed tool invocation  -> traces sink
- everything else         -> logs sink  (all rows carry severity; the raw
  line is preserved verbatim in `body` — per-turn text equality gate)
- metrics sink receives *grouped data points* derived from all rows (EMF
  grouping, see stages/aggregate.py), not raw rows.

Exporter-counter parity (rotel_exporter_sent_{spans,log_records} — reference
src/exporters/otlp/exporter.rs:87-205): per-sink counts are computed from the
data plane (the routed datasets themselves), never from side-state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import LOGS_SINK_COLUMNS, TRACES_SINK_COLUMNS

TRACES, LOGS, METRICS = "traces", "logs", "metrics"

# union of the columns any downstream consumer (sink projections, metrics /
# conv aggregates, counters) needs; everything else is dropped before the
# routed dataset is materialized so the object store holds the minimal
# working set (the heavy unparsed string fields — user agents, raw log
# messages — die here; `text` itself is preserved for the sinks).
ROUTED_COLUMNS = [
    "conv_id", "turn_idx", "ts", "role", "text",
    "tool_name", "tool_cmd", "tool_exit", "duration_ms",
    "event_type", "severity_number", "severity_text", "error_code",
    "body_bytes_sent", "attrs", "role_side", "tool_kind", "sink",
]


def tag_sink(t: pa.Table, extra_cols: list[str] | None = None) -> pa.Table:
    """Append the `sink` routing column (predicate cascade) and project to
    the routed working set (+ any upserted resource-attr columns, which the
    reference propagates to every exporter)."""
    sink = pc.if_else(pc.equal(t.column("event_type"), "tool_call"), TRACES, LOGS)
    t = t.append_column("sink", pc.cast(sink, pa.string()))
    keep = [c for c in ROUTED_COLUMNS if c in t.column_names]
    keep += [c for c in (extra_cols or []) if c in t.column_names and c not in keep]
    return t.select(keep)


def route_stage(ds, batch_size: int = 16384, extra_cols: list[str] | None = None):
    return ds.map_batches(
        lambda t: tag_sink(t, extra_cols), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True,
    )


def _project_traces(t: pa.Table) -> pa.Table:
    t = t.filter(pc.equal(t.column("sink"), TRACES))
    keep = [c for c in TRACES_SINK_COLUMNS if c in t.column_names]
    extra = [c for c in ("role_side", "tool_kind") if c in t.column_names]
    return t.select(keep + extra)


def _project_logs(t: pa.Table) -> pa.Table:
    t = t.filter(pc.equal(t.column("sink"), LOGS))
    t = t.append_column("body", t.column("text"))  # raw line verbatim (log.rs body column)
    keep = [c for c in LOGS_SINK_COLUMNS if c in t.column_names]
    extra = [c for c in ("role_side",) if c in t.column_names]
    return t.select(keep + extra)


def split_sinks(routed_ds) -> dict:
    """Fan one routed Dataset out to per-sink projected Datasets.

    Both sinks re-read the same upstream blocks; Ray Data shares the lineage
    so the parse/enrich stages run once when the routed dataset is
    materialized (callers that consume both sinks should pass a materialized
    routed dataset; callers consuming one sink can stay fully streaming).
    """
    return {
        TRACES: routed_ds.map_batches(_project_traces, batch_format="pyarrow", zero_copy_batch=True),
        LOGS: routed_ds.map_batches(_project_logs, batch_format="pyarrow", zero_copy_batch=True),
    }


def sink_counts_batch(t: pa.Table) -> pa.Table:
    """Partial per-sink counts within one batch (data-plane counters)."""
    g = t.group_by("sink").aggregate([("sink", "count")])
    return g.rename_columns(["sink", "n"])
