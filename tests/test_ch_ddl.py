"""ClickHouse DDL parity: the generated CREATE TABLE statements must map
1:1 onto the row shapes this repo writes (stages/ch_rows.py,
stages/ch_metrics.py), and the clause semantics must mirror the
reference's clickhouse-ddl binary (src/bin/clickhouse-ddl/ddl.rs tests)."""

import re

import ray.data as rd

from rotel_ray.stages.ch_ddl import (
    METRIC_KINDS,
    build_ttl_string,
    get_ddl,
    get_logs_ddl,
    get_metrics_ddl,
    get_traces_ddl,
    logs_columns,
    metrics_columns,
    traces_columns,
)


def _snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def _spec_names(cols: list[str]) -> list[str]:
    """Column spec strings -> snake_case row-shape names (Nested blocks
    expand to prefixed per-field columns, the parquet explosion the row
    builders use)."""
    out = []
    for c in cols:
        name = c.split()[0]
        m = re.match(r"(\w+) Nested \((.*)\) CODEC", c)
        if m:
            for field in re.findall(r"(\w+) [\w()&, ]+?(?:,|$)", m.group(2)):
                out.append(_snake(m.group(1)) + "_" + _snake(field))
        else:
            out.append(_snake(name))
    return out


def _rows_schema(query, sf="/root/testdata/sf0.001"):
    from rotel_ray.queries import QUERIES

    res = QUERIES[query](sf)
    return list(res.schema().names if hasattr(res, "schema") else res.columns)


def test_logs_ddl_columns_match_row_shape():
    # the JSON variant is the exact row-shape column set (the map variant
    # additionally carries the TimestampTime storage column and drops
    # EventName, per ddl_logs.rs:31-55)
    assert _spec_names(logs_columns(use_json=True)) == _rows_schema("ch_logs_row")
    map_cols = _spec_names(logs_columns(use_json=False))
    assert "timestamp_time" in map_cols and "event_name" not in map_cols
    assert [c for c in map_cols if c != "timestamp_time"] == \
        _rows_schema("ch_logs_row")[:-1]  # minus event_name


def test_traces_ddl_columns_match_row_shape():
    assert _spec_names(traces_columns(use_json=False)) == \
        _rows_schema("ch_traces_row")
    assert _spec_names(traces_columns(use_json=True)) == \
        _rows_schema("ch_traces_row")


# columns the exporter tables define but the repo's metric rows leave to
# ClickHouse defaults (resource/scope meta + description) — fixed set
_METRICS_DDL_ONLY = {
    "resource_attributes", "resource_schema_url", "scope_name",
    "scope_version", "scope_attributes", "scope_dropped_attr_count",
    "scope_schema_url", "metric_description",
}


def test_metrics_ddl_columns_cover_row_shapes():
    for kind, query in [("sum", "ch_metrics_sum"), ("gauge", "ch_metrics_gauge"),
                        ("histogram", "ch_metrics_histogram"),
                        ("exponential_histogram", "ch_metrics_exp_histogram"),
                        ("summary", "ch_metrics_summary")]:
        ddl = _spec_names(metrics_columns(kind, use_json=False))
        rows = _rows_schema(query)
        assert set(rows) <= set(ddl), (kind, set(rows) - set(ddl))
        assert set(ddl) - set(rows) == _METRICS_DDL_ONLY, kind
        # relative order of the shared columns matches the insert path
        shared = [c for c in ddl if c in set(rows)]
        assert shared == sorted(rows, key=shared.index)


def test_ttl_string_reference_vectors():
    """The ddl.rs unit-test vectors (ddl.rs:110-188)."""
    assert build_ttl_string(0, "timestamp") == ""
    assert build_ttl_string(86400, "timestamp") == \
        "TTL timestamp + toIntervalDay(1)"
    assert build_ttl_string(86400 * 7, "timestamp") == \
        "TTL timestamp + toIntervalDay(7)"
    assert build_ttl_string(3600, "timestamp") == \
        "TTL timestamp + toIntervalHour(1)"
    assert build_ttl_string(3600 * 23, "timestamp") == \
        "TTL timestamp + toIntervalHour(23)"
    assert build_ttl_string(60, "timestamp") == \
        "TTL timestamp + toIntervalMinute(1)"
    assert build_ttl_string(60 * 59, "timestamp") == \
        "TTL timestamp + toIntervalMinute(59)"
    assert build_ttl_string(45, "timestamp") == \
        "TTL timestamp + toIntervalSecond(45)"
    assert build_ttl_string(3601, "timestamp") == \
        "TTL timestamp + toIntervalSecond(3601)"
    assert build_ttl_string(86400, "created_at") == \
        "TTL created_at + toIntervalDay(1)"
    assert build_ttl_string(86400 * 365 * 10, "timestamp") == \
        "TTL timestamp + toIntervalDay(3650)"
    assert build_ttl_string(1, "timestamp") == \
        "TTL timestamp + toIntervalSecond(1)"


def test_statement_structure():
    logs = get_logs_ddl(ttl_secs=86400 * 3)
    assert len(logs) == 1
    s = logs[0]
    assert s.startswith("CREATE TABLE IF NOT EXISTS otel.otel_logs")
    assert "ENGINE = MergeTree" in s
    assert "PARTITION BY toDate(TimestampTime)" in s
    assert "PRIMARY KEY (ServiceName, TimestampTime)" in s
    assert "ORDER BY (ServiceName, TimestampTime, Timestamp)" in s
    assert "TTL TimestampTime + toIntervalDay(3)" in s
    assert "SETTINGS index_granularity = 8192, ttl_only_drop_parts = 1" in s
    assert "tokenbf_v1(32768, 3, 0)" in s
    assert "bloom_filter(0.001)" in s
    assert "mapKeys(LogAttributes)" in s
    assert "Map(LowCardinality(String), String)" in s

    # traces: span table + id->ts lookup + materialized view
    tr = get_traces_ddl(cluster="c1")
    assert len(tr) == 3
    assert all("ON CLUSTER c1" in s for s in tr)
    assert "otel.otel_traces_trace_id_ts " in tr[1] or \
        "otel.otel_traces_trace_id_ts\n" in tr[1] or \
        "otel.otel_traces_trace_id_ts (" in tr[1]
    assert tr[2].startswith("CREATE MATERIALIZED VIEW IF NOT EXISTS "
                            "otel.otel_traces_trace_id_ts_mv")
    assert "TO otel.otel_traces_trace_id_ts" in tr[2]
    assert "WHERE TraceId != ''" in tr[2]
    assert "ORDER BY (ServiceName, SpanName, toDateTime(Timestamp))" in tr[0]
    assert "INDEX idx_duration Duration TYPE minmax GRANULARITY 1" in tr[0]

    # metrics: five tables, Attributes in ORDER BY on the map path only
    mt = get_metrics_ddl()
    assert len(mt) == 5
    for s, kind in zip(mt, METRIC_KINDS):
        assert f"otel.otel_metrics_{kind}" in s
        assert "ORDER BY (ServiceName, MetricName, Attributes, " \
               "toUnixTimestamp64Nano(TimeUnix))" in s
        assert "PARTITION BY toDate(TimeUnix)" in s
    mt_json = get_metrics_ddl(use_json=True)
    for s in mt_json:
        assert "ORDER BY (ServiceName, MetricName, " \
               "toUnixTimestamp64Nano(TimeUnix))" in s
        assert "allow_experimental_json_type = 1" in s
        assert "JSON CODEC" in s and "Map(LowCardinality" not in s
        assert "mapKeys" not in s  # no map indices on the JSON path


def test_null_engine_drops_layout_clauses():
    for sigs in (get_logs_ddl(engine="Null", ttl_secs=3600),
                 get_traces_ddl(engine="Null"),
                 get_metrics_ddl(engine="Null")):
        for s in sigs:
            assert "ENGINE = Null" in s
            for banned in ("PARTITION BY", "ORDER BY", "PRIMARY KEY",
                           "SETTINGS", "INDEX ", "TTL "):
                assert banned not in s, (banned, s)
    # Null traces: single statement (no lookup table / MV)
    assert len(get_traces_ddl(engine="Null")) == 1


def test_get_ddl_dispatch_and_cli():
    import subprocess
    import sys

    assert get_ddl("logs") == get_logs_ddl()
    out = subprocess.run(
        [sys.executable, "-m", "rotel_ray.cli", "--ddl", "traces",
         "--ddl-ttl-secs", "7200", "--ddl-cluster", "main"],
        capture_output=True, text=True, check=True)
    assert out.stdout.count("CREATE") == 3
    assert "ON CLUSTER main" in out.stdout
    assert "toIntervalHour(2)" in out.stdout
