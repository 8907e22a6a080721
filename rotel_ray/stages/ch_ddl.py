"""ClickHouse DDL generation — the `clickhouse-ddl create` parity surface.

The reference ships a CLI that emits the CREATE TABLE statements its
ClickHouse exporter targets (src/bin/clickhouse-ddl/ddl_traces.rs,
ddl_logs.rs, ddl_metrics.rs, ddl.rs, main.rs). This module generates the
same tables from COLUMN-SPEC DATA so the statements stay mechanically in
sync with the row shapes this repo writes (stages/ch_rows.py,
stages/ch_metrics.py): ``tests/test_ch_ddl.py`` asserts the 1:1 mapping
between each DDL column and the corresponding snake_case row-shape column.

Semantics mirrored from the reference (file:line cited per clause):

- table name      ``{database}.{prefix}_{name}``            (ddl.rs:7-12)
- ON CLUSTER      optional                                  (ddl.rs:14-19)
- TTL             largest exact unit of day/hour/minute/sec (ddl.rs:21-38)
- map-vs-JSON     ``Map(LowCardinality(String), String)`` or ``JSON``
                                                            (ddl.rs:52-57)
- Null engine     drops PARTITION BY / ORDER BY / PRIMARY KEY / indexes /
                  SETTINGS                                  (ddl.rs:59-81)
- SETTINGS        index_granularity=8192, ttl_only_drop_parts=1
                  (+ allow_experimental_json_type=1 when JSON)
                                                            (ddl.rs:83-107)
- logs            TimestampTime storage column + its keys only on the
                  map path; EventName column only on the JSON path
                                                            (ddl_logs.rs:31-55)
- traces          span table + trace_id→(Start,End) lookup table + the
                  materialized view filling it (non-Null engines)
                                                            (ddl_traces.rs:95-101,160-176)
- metrics         five per-type tables (sum/gauge/histogram/exp-histogram/
                  summary); Attributes participates in ORDER BY only on
                  the map path                              (ddl_metrics.rs:19-23,34-42)

Formatting is this module's own (one column per line, deterministic
SETTINGS order); the parity target is the column/type/codec/index/clause
set, which the golden tests pin.
"""

from __future__ import annotations

MAP_TYPE = "Map(LowCardinality(String), String)"

MERGE_TREE = "MergeTree"
REPLICATED = "ReplicatedMergeTree"
NULL = "Null"
ENGINES = (MERGE_TREE, REPLICATED, NULL)


def build_table_name(database: str, table_prefix: str, name: str) -> str:
    return f"{database}.{table_prefix}_{name}"


def build_cluster_string(cluster: str | None) -> str:
    return f"ON CLUSTER {cluster}" if cluster else ""


def build_ttl_string(ttl_secs: int, time_field: str) -> str:
    """Largest unit that divides the TTL exactly (ddl.rs:21-38)."""
    if ttl_secs == 0:
        return ""
    for unit, secs in (("Day", 86_400), ("Hour", 3_600), ("Minute", 60)):
        if ttl_secs % secs == 0:
            return f"TTL {time_field} + toInterval{unit}({ttl_secs // secs})"
    return f"TTL {time_field} + toIntervalSecond({ttl_secs})"


def _settings(use_json: bool, engine: str) -> str:
    if engine == NULL:
        return ""
    kv = [("index_granularity", 8192), ("ttl_only_drop_parts", 1)]
    if use_json:
        kv.append(("allow_experimental_json_type", 1))
    return "SETTINGS " + ", ".join(f"{k} = {v}" for k, v in kv)


def _map_or_json(use_json: bool) -> str:
    return "JSON" if use_json else MAP_TYPE


def _bloom_indices(attr_cols: list[str]) -> list[str]:
    out = []
    for col in attr_cols:
        short = {"ResourceAttributes": "res_attr", "ScopeAttributes": "scope_attr",
                 "SpanAttributes": "span_attr", "LogAttributes": "log_attr",
                 "Attributes": "attr"}[col]
        out.append(f"INDEX idx_{short}_key mapKeys({col}) "
                   f"TYPE bloom_filter(0.01) GRANULARITY 1")
        out.append(f"INDEX idx_{short}_value mapValues({col}) "
                   f"TYPE bloom_filter(0.01) GRANULARITY 1")
    return out


def _nested(name: str, fields: list[tuple[str, str]]) -> str:
    inner = ", ".join(f"{f} {t}" for f, t in fields)
    return f"{name} Nested ({inner}) CODEC(ZSTD(1))"


def _render(table: str, cluster: str | None, cols: list[str],
            indices: list[str], engine: str, clauses: list[str],
            create: str = "TABLE") -> str:
    head = f"CREATE {create} IF NOT EXISTS {table}"
    cl = build_cluster_string(cluster)
    if cl:
        head += f" {cl}"
    body = ",\n    ".join(cols + (indices if engine != NULL else []))
    tail = "\n".join(c for c in clauses if c)
    return f"{head} (\n    {body}\n) ENGINE = {engine}" + \
           (f"\n{tail}" if tail else "") + "\n;"


# ---------------------------------------------------------------------------
# logs (ddl_logs.rs; row shape: ch_rows.log_record_rows)
# ---------------------------------------------------------------------------


def logs_columns(use_json: bool) -> list[str]:
    mj = _map_or_json(use_json)
    cols = [
        "Timestamp DateTime64(9) CODEC(Delta(8), ZSTD(1))",
    ]
    if not use_json:
        # storage-only derived column (the map path's partition/order key)
        cols.append("TimestampTime DateTime DEFAULT toDateTime(Timestamp)")
    cols += [
        "TraceId String CODEC(ZSTD(1))",
        "SpanId String CODEC(ZSTD(1))",
        "TraceFlags UInt8",
        "SeverityText LowCardinality(String) CODEC(ZSTD(1))",
        "SeverityNumber UInt8",
        "ServiceName LowCardinality(String) CODEC(ZSTD(1))",
        "Body String CODEC(ZSTD(1))",
        "ResourceSchemaUrl LowCardinality(String) CODEC(ZSTD(1))",
        f"ResourceAttributes {mj} CODEC(ZSTD(1))",
        "ScopeSchemaUrl LowCardinality(String) CODEC(ZSTD(1))",
        "ScopeName String CODEC(ZSTD(1))",
        "ScopeVersion LowCardinality(String) CODEC(ZSTD(1))",
        f"ScopeAttributes {mj} CODEC(ZSTD(1))",
        f"LogAttributes {mj} CODEC(ZSTD(1))",
    ]
    if use_json:
        cols.append("EventName String CODEC(ZSTD(1))")
    return cols


def get_logs_ddl(*, cluster: str | None = None, database: str = "otel",
                 table_prefix: str = "otel", engine: str = MERGE_TREE,
                 ttl_secs: int = 0, use_json: bool = False) -> list[str]:
    indices = [] if engine == NULL else (
        ([] if use_json else _bloom_indices(
            ["ResourceAttributes", "ScopeAttributes", "LogAttributes"]))
        + ["INDEX idx_trace_id TraceId TYPE bloom_filter(0.001) GRANULARITY 1",
           "INDEX idx_body Body TYPE tokenbf_v1(32768, 3, 0) GRANULARITY 8"])
    if use_json:
        part, pk, order, ttl_col = (
            "toDate(Timestamp)", "(ServiceName, toDateTime(Timestamp))",
            "(ServiceName, toDateTime(Timestamp), Timestamp)", "Timestamp")
    else:
        part, pk, order, ttl_col = (
            "toDate(TimestampTime)", "(ServiceName, TimestampTime)",
            "(ServiceName, TimestampTime, Timestamp)", "TimestampTime")
    clauses = [] if engine == NULL else [
        f"PARTITION BY {part}", f"PRIMARY KEY {pk}", f"ORDER BY {order}",
        build_ttl_string(ttl_secs, ttl_col), _settings(use_json, engine)]
    return [_render(build_table_name(database, table_prefix, "logs"),
                    cluster, logs_columns(use_json), indices, engine, clauses)]


# ---------------------------------------------------------------------------
# traces (ddl_traces.rs; row shape: ch_rows.span_rows)
# ---------------------------------------------------------------------------


def traces_columns(use_json: bool) -> list[str]:
    mj = _map_or_json(use_json)
    return [
        "Timestamp DateTime64(9) CODEC(Delta, ZSTD(1))",
        "TraceId String CODEC(ZSTD(1))",
        "SpanId String CODEC(ZSTD(1))",
        "ParentSpanId String CODEC(ZSTD(1))",
        "TraceState String CODEC(ZSTD(1))",
        "SpanName LowCardinality(String) CODEC(ZSTD(1))",
        "SpanKind LowCardinality(String) CODEC(ZSTD(1))",
        "ServiceName LowCardinality(String) CODEC(ZSTD(1))",
        f"ResourceAttributes {mj} CODEC(ZSTD(1))",
        "ScopeName String CODEC(ZSTD(1))",
        "ScopeVersion String CODEC(ZSTD(1))",
        f"SpanAttributes {mj} CODEC(ZSTD(1))",
        "Duration UInt64 CODEC(ZSTD(1))",
        "StatusCode LowCardinality(String) CODEC(ZSTD(1))",
        "StatusMessage String CODEC(ZSTD(1))",
        _nested("Events", [("Timestamp", "DateTime64(9)"),
                           ("Name", "LowCardinality(String)"),
                           ("Attributes", mj)]),
        _nested("Links", [("TraceId", "String"), ("SpanId", "String"),
                          ("TraceState", "String"), ("Attributes", mj)]),
    ]


def get_traces_ddl(*, cluster: str | None = None, database: str = "otel",
                   table_prefix: str = "otel", engine: str = MERGE_TREE,
                   ttl_secs: int = 0, use_json: bool = False) -> list[str]:
    indices = [] if engine == NULL else (
        ([] if use_json else _bloom_indices(
            ["ResourceAttributes", "SpanAttributes"]))
        + ["INDEX idx_duration Duration TYPE minmax GRANULARITY 1",
           "INDEX idx_trace_id TraceId TYPE bloom_filter(0.001) GRANULARITY 1"])
    clauses = [] if engine == NULL else [
        "PARTITION BY toDate(Timestamp)",
        "ORDER BY (ServiceName, SpanName, toDateTime(Timestamp))",
        build_ttl_string(ttl_secs, "toDateTime(Timestamp)"),
        _settings(use_json, engine)]
    table = build_table_name(database, table_prefix, "traces")
    main = _render(table, cluster, traces_columns(use_json), indices,
                   engine, clauses)
    if engine == NULL:
        return [main]
    id_ts_table = build_table_name(database, table_prefix, "traces_trace_id_ts")
    id_ts = _render(
        id_ts_table, cluster,
        ["TraceId String CODEC(ZSTD(1))",
         "Start DateTime CODEC(Delta, ZSTD(1))",
         "End DateTime CODEC(Delta, ZSTD(1))"],
        ["INDEX idx_trace_id TraceId TYPE bloom_filter(0.01) GRANULARITY 1"],
        engine,
        ["PARTITION BY toDate(Start)", "ORDER BY (TraceId, Start)",
         build_ttl_string(ttl_secs, "toDateTime(Start)"),
         _settings(use_json, engine)])
    mv_table = build_table_name(database, table_prefix, "traces_trace_id_ts_mv")
    mv_head = f"CREATE MATERIALIZED VIEW IF NOT EXISTS {mv_table}"
    cl = build_cluster_string(cluster)
    if cl:
        mv_head += f" {cl}"
    mv = (f"{mv_head}\nTO {id_ts_table}\nAS SELECT\n"
          "    TraceId,\n    min(Timestamp) as Start,\n"
          "    max(Timestamp) as End\nFROM\n"
          f"{table}\nWHERE TraceId != ''\nGROUP BY TraceId\n;")
    return [main, id_ts, mv]


# ---------------------------------------------------------------------------
# metrics (ddl_metrics.rs; row shapes: ch_metrics.{sum,gauge,histogram,
# exp_histogram,summary}_rows)
# ---------------------------------------------------------------------------


def _metrics_common(use_json: bool) -> list[str]:
    mj = _map_or_json(use_json)
    return [
        f"ResourceAttributes {mj} CODEC(ZSTD(1))",
        "ResourceSchemaUrl String CODEC(ZSTD(1))",
        "ScopeName String CODEC(ZSTD(1))",
        "ScopeVersion String CODEC(ZSTD(1))",
        f"ScopeAttributes {mj} CODEC(ZSTD(1))",
        "ScopeDroppedAttrCount UInt32 CODEC(ZSTD(1))",
        "ScopeSchemaUrl String CODEC(ZSTD(1))",
        "ServiceName LowCardinality(String) CODEC(ZSTD(1))",
        "MetricName String CODEC(ZSTD(1))",
        "MetricDescription String CODEC(ZSTD(1))",
        "MetricUnit String CODEC(ZSTD(1))",
        f"Attributes {mj} CODEC(ZSTD(1))",
        "StartTimeUnix DateTime64(9) CODEC(Delta, ZSTD(1))",
        "TimeUnix DateTime64(9) CODEC(Delta, ZSTD(1))",
    ]


def _exemplars(use_json: bool) -> str:
    return _nested("Exemplars",
                   [("FilteredAttributes", _map_or_json(use_json)),
                    ("TimeUnix", "DateTime64(9)"), ("Value", "Float64"),
                    ("SpanId", "String"), ("TraceId", "String")])


def metrics_columns(kind: str, use_json: bool) -> list[str]:
    """Per-type tail after the shared meta block (ddl_metrics.rs templates)."""
    cols = _metrics_common(use_json)
    if kind == "sum":
        cols += ["Value Float64 CODEC(ZSTD(1))", "Flags UInt32 CODEC(ZSTD(1))",
                 _exemplars(use_json),
                 "AggregationTemporality Int32 CODEC(ZSTD(1))",
                 "IsMonotonic Boolean CODEC(Delta, ZSTD(1))"]
    elif kind == "gauge":
        cols += ["Value Float64 CODEC(ZSTD(1))", "Flags UInt32 CODEC(ZSTD(1))",
                 _exemplars(use_json)]
    elif kind == "histogram":
        cols += ["Count UInt64 CODEC(Delta, ZSTD(1))",
                 "Sum Float64 CODEC(ZSTD(1))",
                 "BucketCounts Array(UInt64) CODEC(ZSTD(1))",
                 "ExplicitBounds Array(Float64) CODEC(ZSTD(1))",
                 _exemplars(use_json), "Flags UInt32 CODEC(ZSTD(1))",
                 "Min Float64 CODEC(ZSTD(1))", "Max Float64 CODEC(ZSTD(1))",
                 "AggregationTemporality Int32 CODEC(ZSTD(1))"]
    elif kind == "exponential_histogram":
        cols += ["Count UInt64 CODEC(Delta, ZSTD(1))",
                 "Sum Float64 CODEC(ZSTD(1))",
                 "Scale Int32 CODEC(ZSTD(1))",
                 "ZeroCount UInt64 CODEC(ZSTD(1))",
                 "PositiveOffset Int32 CODEC(ZSTD(1))",
                 "PositiveBucketCounts Array(UInt64) CODEC(ZSTD(1))",
                 "NegativeOffset Int32 CODEC(ZSTD(1))",
                 "NegativeBucketCounts Array(UInt64) CODEC(ZSTD(1))",
                 _exemplars(use_json), "Flags UInt32 CODEC(ZSTD(1))",
                 "Min Float64 CODEC(ZSTD(1))", "Max Float64 CODEC(ZSTD(1))",
                 "AggregationTemporality Int32 CODEC(ZSTD(1))"]
    elif kind == "summary":
        cols += ["Count UInt64 CODEC(Delta, ZSTD(1))",
                 "Sum Float64 CODEC(ZSTD(1))",
                 _nested("ValueAtQuantiles",
                         [("Quantile", "Float64"), ("Value", "Float64")]),
                 "Flags UInt32 CODEC(ZSTD(1))"]
    else:
        raise ValueError(f"unknown metrics table kind {kind!r}")
    return cols


METRIC_KINDS = ("sum", "gauge", "histogram", "exponential_histogram", "summary")


def get_metrics_ddl(*, cluster: str | None = None, database: str = "otel",
                    table_prefix: str = "otel", engine: str = MERGE_TREE,
                    ttl_secs: int = 0, use_json: bool = False) -> list[str]:
    order = ("(ServiceName, MetricName, toUnixTimestamp64Nano(TimeUnix))"
             if use_json else
             "(ServiceName, MetricName, Attributes, toUnixTimestamp64Nano(TimeUnix))")
    indices = [] if (use_json or engine == NULL) else _bloom_indices(
        ["ResourceAttributes", "ScopeAttributes", "Attributes"])
    # metrics templates emit TTL before PARTITION BY (ddl_metrics.rs)
    clauses = [] if engine == NULL else [
        build_ttl_string(ttl_secs, "toDateTime(TimeUnix)"),
        "PARTITION BY toDate(TimeUnix)", f"ORDER BY {order}",
        _settings(use_json, engine)]
    return [
        _render(build_table_name(database, table_prefix, f"metrics_{k}"),
                cluster, metrics_columns(k, use_json), indices, engine, clauses)
        for k in METRIC_KINDS
    ]


def get_ddl(signal: str, **kw) -> list[str]:
    """Dispatch mirroring the reference CLI's --traces/--logs/--metrics."""
    fn = {"traces": get_traces_ddl, "logs": get_logs_ddl,
          "metrics": get_metrics_ddl}.get(signal)
    if fn is None:
        raise ValueError(f"unknown DDL signal {signal!r} "
                         "(expected traces|logs|metrics)")
    return fn(**kw)
