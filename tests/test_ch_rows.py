"""ClickHouse logs/traces row-shape unit tests (transform_logs.rs /
transform_traces.rs semantics beyond what the SQL oracle covers)."""

import pyarrow as pa

from rotel_ray.stages.ch_rows import any_value_to_string


def test_any_value_stringify_cascade():
    # transform_logs.rs:45-57: string / bool / int / double / bytes / none
    kind = pa.array(["str", "bool", "bool", "int", "double", "bytes", "none"])
    sval = pa.array(["hello", None, None, None, None, None, None])
    ival = pa.array([None, None, None, -42, None, None, None], pa.int64())
    dval = pa.array([None, None, None, None, 1.5, None, None], pa.float64())
    bval = pa.array([None, True, False, None, None, None, None], pa.bool_())
    bytesval = pa.array([None, None, None, None, None, b"\xde\xad\xbe\xef", None],
                        pa.binary())
    out = any_value_to_string(kind, sval, ival, dval, bval, bytesval).to_pylist()
    assert out == ["hello", "true", "false", "-42", "1.5", "deadbeef", ""]


def test_any_value_double_shortest_roundtrip():
    # Rust f64::to_string is shortest-roundtrip — repr() matches on float64
    kind = pa.array(["double", "double", "double"])
    none = pa.nulls(3, pa.string())
    dval = pa.array([0.1, 3.0, 1e300], pa.float64())
    out = any_value_to_string(kind, none, pa.nulls(3, pa.int64()), dval,
                              pa.nulls(3, pa.bool_()), pa.nulls(3, pa.binary()))
    assert out.to_pylist() == ["0.1", "3.0", "1e+300"]


def test_span_rows_events_and_parent(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray

    from rotel_ray.stages.ch_rows import span_rows
    from rotel_ray.stages.parse import parse_stage

    rows = {
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": ["tool", "tool", "tool"],
        "text": [
            'TOOL_CALL tool=search cmd="grep a" exit=0 duration_ms=5',
            'TOOL_CALL tool=edit cmd="patch b" exit=2 duration_ms=7',
            'TOOL_CALL tool=run cmd="make" exit=0 duration_ms=0',
        ],
        "tool": ["search", "edit", "run"],
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000], pa.timestamp("us")),
    }
    pq.write_table(pa.table(rows), tmp_path / "t.parquet")
    ds = parse_stage(ray.data.read_parquet(str(tmp_path / "t.parquet")))
    out = span_rows(ds).to_pandas().sort_values(
        ["trace_id", "timestamp"]).reset_index(drop=True)
    by = {(r.span_name): r for r in out.itertuples()}
    ok, failed, root2 = by["search"], by["edit"], by["run"]
    # parent chain: turn 0 is root, turn 1 parents on turn 0's span id
    assert ok.parent_span_id == "" and root2.parent_span_id == ""
    assert failed.parent_span_id == ok.span_id
    assert failed.trace_id == ok.trace_id != root2.trace_id
    # status + exception event arrays only on the failed call
    assert ok.status_code == "Ok" and ok.events_name == "[]"
    assert failed.status_code == "Error"
    assert failed.status_message == "exit=2"
    assert failed.events_name == '["exception"]'
    assert failed.events_attributes == '[{"exception.message":"exit=2"}]'
    assert failed.events_timestamp == f"[{2_000_000 * 1000}]"
    # duration ms -> ns, clamped >= 0
    assert ok.duration == 5_000_000 and root2.duration == 0
