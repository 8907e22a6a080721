"""ClickHouse metrics exporter row shapes — the five per-metric-type
tables of the reference's ClickHouse exporter, re-expressed over the parsed
transcripts.

Reference semantics (all citations into /root/reference):

- ``src/exporters/clickhouse/transform_metrics.rs:53-231``: each OTLP data
  point is routed by metric type to its own request/table with a dedicated
  row struct; meta columns (service name, metric name/unit, attributes) are
  denormalized onto every row.
- ``src/exporters/clickhouse/schema.rs:204-383``: the row structs —
  MetricsSumRow (value/flags/aggregation_temporality/is_monotonic),
  MetricsGaugeRow (value/flags), MetricsHistogramRow (count/sum/
  bucket_counts/explicit_bounds/min/max/temporality),
  MetricsExpHistogramRow (count/sum/scale/zero_count/positive & negative
  offset+bucket_counts/min/max/temporality), MetricsSummaryRow
  (count/sum/value_at_quantiles arrays).
- Array-valued columns follow the ``MapOrJson`` convention of the file
  exporter (``src/exporters/file/parquet/common.rs:16-20``): canonical JSON
  strings (ints only, so the text form is byte-stable across engines).
- ``src/exporters/clickhouse/schema.rs:177-200``: every metric row carries
  the five ``Exemplars.*`` columns (FilteredAttributes / TimeUnix / Value /
  SpanId / TraceId). The reference emits EMPTY arrays for exemplar-less
  input (the normal case; our transcript fixture has no tracing-linked
  exemplars), so each row gets the empty-array form — serialized as the
  canonical-JSON ``'[]'`` per the array convention above.

Shapes over the transcript analogue:

- gauge  = one point per nginx access line (``body_bytes_sent``),
- sum    = one cumulative point per tool call (``duration_ms``),
- histogram / exp_histogram / summary = per-conversation distributions of
  tool durations / response bytes / status codes.

Scale shape: gauge/sum are stateless fused ``map_batches`` projections; the
three grouped shapes run through ``grouped_apply`` (hash-bucketed shuffle,
one vectorized reduce per bucket — numpy segment ops across all convs in
the bucket; the only Python loop is over GROUPS when assembling the
variable-length JSON arrays)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import grouped_apply

HIST_BOUNDS = [10, 100, 1000]  # ms, upper-inclusive like OTLP explicit bounds
SUMMARY_QS = [0.5, 0.95]
AGG_TEMPORALITY_CUMULATIVE = 2


def _ns(ts: pa.Array) -> pa.Array:
    return pc.multiply(pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64()),
                       np.int64(1000))


EXEMPLAR_COLS = ("exemplars_filtered_attributes", "exemplars_time_unix",
                 "exemplars_value", "exemplars_span_id", "exemplars_trace_id")


def _exemplar_cols(n: int) -> dict[str, pa.Array]:
    """Empty Exemplars.* arrays (schema.rs:177-200) in the canonical-JSON
    array form — what the reference serializes for exemplar-less metrics."""
    return {c: pa.nulls(n, pa.string()).fill_null("[]") for c in EXEMPLAR_COLS}


def _attrs_json(key: str, vals: pa.Array) -> pa.Array:
    head = pa.nulls(len(vals), pa.string()).fill_null('{"%s":"' % key)
    return pc.binary_join_element_wise(head, pc.cast(vals, pa.string()),
                                       '"}', "", null_handling="emit_null")


def gauge_rows(parsed_ds):
    """MetricsGaugeRow (schema.rs:236-249): body_bytes_sent per access line."""

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "nginx_access"))
        ns = _ns(t.column("ts"))
        return pa.table({
            "service_name": t.column("role"),
            "metric_name": pa.nulls(t.num_rows, pa.string()).fill_null("body_bytes"),
            "metric_unit": pa.nulls(t.num_rows, pa.string()).fill_null("By"),
            "attributes": _attrs_json("remote_addr", t.column("remote_addr")),
            "start_time_unix": ns,
            "time_unix": ns,
            "value": pc.cast(t.column("body_bytes_sent"), pa.float64()),
            "flags": pa.nulls(t.num_rows, pa.int32()).fill_null(0),
            **_exemplar_cols(t.num_rows),
        })

    return parsed_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sum_rows(parsed_ds):
    """MetricsSumRow (schema.rs:204-220): duration_ms per tool call,
    cumulative monotonic."""

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        ns = _ns(t.column("ts"))
        return pa.table({
            "service_name": t.column("role"),
            "metric_name": pa.nulls(t.num_rows, pa.string()).fill_null("tool_duration"),
            "metric_unit": pa.nulls(t.num_rows, pa.string()).fill_null("ms"),
            "attributes": _attrs_json("tool", t.column("tool_name")),
            "start_time_unix": ns,
            "time_unix": ns,
            "value": pc.cast(t.column("duration_ms"), pa.float64()),
            "flags": pa.nulls(t.num_rows, pa.int32()).fill_null(0),
            "aggregation_temporality": pa.nulls(t.num_rows, pa.int32()).fill_null(
                AGG_TEMPORALITY_CUMULATIVE),
            "is_monotonic": pa.nulls(t.num_rows, pa.bool_()).fill_null(True),
            **_exemplar_cols(t.num_rows),
        })

    return parsed_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _segments(t: pa.Table, value_col: str):
    """Sort by conv_id, return (conv_ids_per_seg, seg_starts, values_sorted,
    ts_ns_sorted)."""
    t = t.sort_by("conv_id")
    conv = t.column("conv_id").to_numpy(zero_copy_only=False)
    vals = t.column(value_col).to_numpy(zero_copy_only=False)
    ns = t.column("__ns").to_numpy(zero_copy_only=False)
    uniq, starts = np.unique(conv, return_index=True)
    return uniq, starts, vals, ns


def _meta_table(uniq, starts, ns, name: str, unit: str, n: int):
    ends = np.r_[starts[1:], n]
    return {
        "service_name": pa.nulls(len(uniq), pa.string()).fill_null("transcripts"),
        "metric_name": pa.nulls(len(uniq), pa.string()).fill_null(name),
        "metric_unit": pa.nulls(len(uniq), pa.string()).fill_null(unit),
        "attributes": _attrs_json("conv_id", pa.array(uniq.astype(str))),
        "start_time_unix": pa.array(np.minimum.reduceat(ns, starts), pa.int64()),
        "time_unix": pa.array(np.maximum.reduceat(ns, starts), pa.int64()),
    }, ends


def histogram_rows(parsed_ds):
    """MetricsHistogramRow (schema.rs:265-284): per-conv tool-duration
    histogram with explicit bounds HIST_BOUNDS (upper-inclusive buckets +
    overflow, the OTLP explicit-bounds convention)."""

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        return pa.table({"conv_id": t.column("conv_id"),
                         "duration_ms": pc.cast(t.column("duration_ms"), pa.int64()),
                         "__ns": _ns(t.column("ts"))})

    def reduce(t: pa.Table) -> pa.Table:
        uniq, starts, vals, ns = _segments(t, "duration_ms")
        n = len(vals)
        meta, ends = _meta_table(uniq, starts, ns, "tool_duration_hist", "ms", n)
        counts = (ends - starts).astype(np.int64)
        # indicator reduceat per bound: counts of v <= b per segment
        le = [np.add.reduceat((vals <= b).astype(np.int64), starts) for b in HIST_BOUNDS]
        per_bucket = []
        prev = np.zeros(len(uniq), np.int64)
        for cum in le:
            per_bucket.append(cum - prev)
            prev = cum
        per_bucket.append(counts - prev)  # overflow bucket
        bc = np.stack(per_bucket, axis=1)
        bounds_json = "[" + ",".join(str(b) for b in HIST_BOUNDS) + "]"
        return pa.table({
            **meta,
            "count": pa.array(counts),
            "sum": pa.array(np.add.reduceat(vals.astype(np.float64), starts)),
            "bucket_counts": pa.array(["[" + ",".join(map(str, row)) + "]" for row in bc]),
            "explicit_bounds": pa.array([bounds_json] * len(uniq)),
            "flags": pa.nulls(len(uniq), pa.int32()).fill_null(0),
            "min": pa.array(np.minimum.reduceat(vals, starts).astype(np.float64)),
            "max": pa.array(np.maximum.reduceat(vals, starts).astype(np.float64)),
            "aggregation_temporality": pa.nulls(len(uniq), pa.int32()).fill_null(
                AGG_TEMPORALITY_CUMULATIVE),
            **_exemplar_cols(len(uniq)),
        })

    pre = parsed_ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(pre, ["conv_id"], reduce, batch_format="pyarrow")


def exp_histogram_rows(parsed_ds):
    """MetricsExpHistogramRow (schema.rs:310-334): per-conv base-2
    exponential histogram of response bytes at scale 0. Bucket index =
    floor(log2(v)) computed EXACTLY via the float exponent (frexp), so the
    SQL mirror (length(bin(v))-1) is bit-identical; zero values land in
    zero_count; our fixture has no negatives (negative_* emitted empty)."""

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("body_bytes_sent")))
        return pa.table({"conv_id": t.column("conv_id"),
                         "bytes": pc.cast(t.column("body_bytes_sent"), pa.int64()),
                         "__ns": _ns(t.column("ts"))})

    def reduce(t: pa.Table) -> pa.Table:
        uniq, starts, vals, ns = _segments(t, "bytes")
        n = len(vals)
        meta, ends = _meta_table(uniq, starts, ns, "body_bytes_exp", "By", n)
        counts = (ends - starts).astype(np.int64)
        zero = np.add.reduceat((vals == 0).astype(np.int64), starts)
        # exact floor(log2) for v > 0: frexp exponent - 1 (ints < 2^53)
        idx = np.frexp(np.maximum(vals, 1).astype(np.float64))[1] - 1
        offs, pos_json = [], []
        for g, (lo, hi) in enumerate(zip(starts, ends)):
            seg_idx = idx[lo:hi][vals[lo:hi] > 0]
            if seg_idx.size == 0:
                offs.append(0)
                pos_json.append("[]")
                continue
            o = int(seg_idx.min())
            binc = np.bincount(seg_idx - o)
            offs.append(o)
            pos_json.append("[" + ",".join(map(str, binc)) + "]")
        return pa.table({
            **meta,
            "count": pa.array(counts),
            "sum": pa.array(np.add.reduceat(vals.astype(np.float64), starts)),
            "scale": pa.nulls(len(uniq), pa.int32()).fill_null(0),
            "zero_count": pa.array(zero),
            "positive_offset": pa.array(np.array(offs, np.int32)),
            "positive_bucket_counts": pa.array(pos_json),
            "negative_offset": pa.nulls(len(uniq), pa.int32()).fill_null(0),
            "negative_bucket_counts": pa.nulls(len(uniq), pa.string()).fill_null("[]"),
            "flags": pa.nulls(len(uniq), pa.int32()).fill_null(0),
            "min": pa.array(np.minimum.reduceat(vals, starts).astype(np.float64)),
            "max": pa.array(np.maximum.reduceat(vals, starts).astype(np.float64)),
            "aggregation_temporality": pa.nulls(len(uniq), pa.int32()).fill_null(
                AGG_TEMPORALITY_CUMULATIVE),
            **_exemplar_cols(len(uniq)),
        })

    pre = parsed_ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(pre, ["conv_id"], reduce, batch_format="pyarrow")


def summary_rows(parsed_ds):
    """MetricsSummaryRow (schema.rs:364-380): per-conv status-code summary
    with discrete quantiles SUMMARY_QS (inverted-CDF: sorted[ceil(q*n)-1],
    matching DuckDB quantile_disc)."""

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("status")))
        return pa.table({"conv_id": t.column("conv_id"),
                         "status": pc.cast(t.column("status"), pa.int64()),
                         "__ns": _ns(t.column("ts"))})

    def reduce(t: pa.Table) -> pa.Table:
        t = t.sort_by([("conv_id", "ascending"), ("status", "ascending")])
        conv = t.column("conv_id").to_numpy(zero_copy_only=False)
        vals = t.column("status").to_numpy(zero_copy_only=False)
        ns = t.column("__ns").to_numpy(zero_copy_only=False)
        uniq, starts = np.unique(conv, return_index=True)
        n = len(vals)
        meta, ends = _meta_table(uniq, starts, ns, "status_summary", "1", n)
        counts = (ends - starts).astype(np.int64)
        q_json = "[" + ",".join(str(q) for q in SUMMARY_QS) + "]"
        vq = []
        for q in SUMMARY_QS:
            pos = starts + np.ceil(q * counts).astype(np.int64) - 1
            vq.append(vals[np.maximum(pos, starts)])
        vq = np.stack(vq, axis=1)
        return pa.table({
            **meta,
            "count": pa.array(counts),
            "sum": pa.array(np.add.reduceat(vals.astype(np.float64), starts)),
            "value_at_quantiles_quantile": pa.array([q_json] * len(uniq)),
            "value_at_quantiles_value": pa.array(
                ["[" + ",".join(map(str, row)) + "]" for row in vq]),
            # NO Exemplars.* here: MetricsSummaryRow is the one metric row
            # without them (schema.rs:364-380; the summary DDL table has no
            # Exemplars Nested either, ddl_metrics.rs METRICS_SUMMARY_*)
            "flags": pa.nulls(len(uniq), pa.int32()).fill_null(0),
        })

    pre = parsed_ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(pre, ["conv_id"], reduce, batch_format="pyarrow")
