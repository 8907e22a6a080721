"""ClickHouse logs/traces exporter row shapes — the two remaining
ClickHouse tables (``otel_logs``, ``otel_traces``) of the reference,
re-expressed over the parsed transcripts.

Reference semantics (citations into /root/reference):

- ``src/exporters/clickhouse/transform_logs.rs:12-105``: LogRecordRow per
  log record — AnyValue body stringify cascade (string / bool / int /
  double / array / kvlist→JSON / bytes→hex, lines 45-57), hex-encoded
  trace/span ids via ``encode_id`` (59-62), ``trace_flags = flags & 0xFF``
  and ``severity_number & 0xFF`` (68-70), service_name pulled from the
  ``service.name`` resource attribute (29), denormalized resource/scope
  meta on every row, extended ``event_name`` column (82).
- ``src/exporters/clickhouse/transform_traces.rs:13-173``: SpanRow per
  span — ``span_kind_to_string`` (148-162), status mapping Unset/Ok/Error
  (164-173), overflow-safe duration ``end>start ? end-start : 0`` (95-99),
  events/links exploded into parallel array columns (52-89).
- ``src/exporters/clickhouse/schema.rs:22-131``: the SpanRow /
  LogRecordRow column lists mirrored below.
- Attr maps follow the ``MapOrJson`` canonical-JSON convention of the file
  exporter (``src/exporters/file/parquet/common.rs:16-20``): JSON objects
  with sorted keys; array columns are canonical JSON arrays (matches the
  ch_metrics tables).

Transcript analogue: every parsed line is a log record (body = the raw
line verbatim — the StringValue branch of the body cascade; the non-string
branches are exercised by ``any_value_to_string`` unit tests); tool-call
lines are client spans with one synthetic "exception" event when the tool
exited non-zero.

Scale shape: both are stateless fused ``map_batches`` projections — pure
Arrow kernels, no shuffle, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scalar import hex_encode, span_id_from, trace_id_from

SCOPE_NAME = "rotel_ray"
SCOPE_VERSION = "0.2"


def _const(n: int, val, typ=pa.string()) -> pa.Array:
    return pa.nulls(n, typ).fill_null(val)


def _ns(ts: pa.Array) -> pa.Array:
    return pc.multiply(pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64()),
                       np.int64(1000))


def _join(*parts, null_handling="emit_null") -> pa.Array:
    return pc.binary_join_element_wise(*parts, "", null_handling=null_handling)


def any_value_to_string(kind: pa.Array, sval: pa.Array, ival: pa.Array,
                        dval: pa.Array, bval: pa.Array,
                        bytesval: pa.Array) -> pa.Array:
    """The AnyValue body stringify cascade of transform_logs.rs:45-57 as a
    vectorized kernel over a decomposed (kind, typed columns) union:
    kind ∈ {str, bool, int, double, bytes, none}. bool→"true"/"false",
    int/double→decimal text, bytes→lowercase hex, none→""."""
    n = len(kind)
    out_b = pc.if_else(bval, _const(n, "true"), _const(n, "false"))
    out_i = pc.cast(ival, pa.string())
    # Rust f64::to_string(): shortest roundtrip; Python repr matches for
    # the float64 domain
    out_d = pa.array(
        [None if v is None else repr(v) for v in dval.to_pylist()], pa.string())
    # bytes bodies are rare (non-hot branch): per-value hex like the double
    # branch; the fixed-width id paths use the vectorized hex_encode LUT
    out_hex = pa.array(
        [None if v is None else v.hex() for v in bytesval.to_pylist()], pa.string())
    return pc.case_when(
        pc.make_struct(pc.equal(kind, "str"), pc.equal(kind, "bool"),
                       pc.equal(kind, "int"), pc.equal(kind, "double"),
                       pc.equal(kind, "bytes")),
        sval, out_b, out_i, out_d, out_hex, _const(n, ""))


def _resource_attrs(role: pa.Array) -> pa.Array:
    n = len(role)
    return _join(_const(n, '{"service.name":"'), role, _const(n, '"}'))


def _log_attrs(t: pa.Table, n: int) -> pa.Array:
    """Per-event-type dynamic log attributes as canonical sorted-key JSON
    (the transform_attrs_kv analogue, transform_logs.rs:30,40,79)."""
    et = t.column("event_type")
    s = lambda c: pc.cast(t.column(c), pa.string())
    tool = _join(_const(n, '{"tool.exit":"'), s("tool_exit"),
                 _const(n, '","tool.name":"'), s("tool_name"), _const(n, '"}'))
    err = _join(_const(n, '{"error.code":"'), s("error_code"),
                _const(n, '","retryable":"'),
                pc.if_else(t.column("retryable"), _const(n, "true"), _const(n, "false")),
                _const(n, '"}'))
    acc = _join(_const(n, '{"http.status":"'), s("status"),
                _const(n, '","remote.addr":"'), s("remote_addr"), _const(n, '"}'))
    km = _join(_const(n, '{"kmsg.facility":"'), s("km_facility"),
               _const(n, '","kmsg.priority":"'), s("km_priority"), _const(n, '"}'))
    return pc.case_when(
        pc.make_struct(pc.equal(et, "tool_call"), pc.equal(et, "error"),
                       pc.equal(et, "nginx_access"), pc.equal(et, "kmsg")),
        tool, err, acc, km, _const(n, "{}"))


def log_record_rows(parsed_ds):
    """LogRecordRow table (schema.rs:91-131) over every parsed line."""

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        conv = t.column("conv_id").combine_chunks()
        is_tool = pc.equal(t.column("event_type"), "tool_call")
        key = pc.binary_join_element_wise(
            conv, pc.cast(t.column("turn_idx").combine_chunks(), pa.string()), ":")
        # encode_id of an absent id is the empty string (transform_logs.rs:59-62)
        trace_id = pc.if_else(is_tool, hex_encode(trace_id_from(conv)), _const(n, ""))
        span_id = pc.if_else(is_tool, hex_encode(span_id_from(key)), _const(n, ""))
        return pa.table({
            "timestamp": _ns(t.column("ts")),
            "trace_id": trace_id,
            "span_id": span_id,
            "trace_flags": _const(n, 0, pa.int32()),
            "severity_text": t.column("severity_text"),
            "severity_number": pc.bit_wise_and(t.column("severity_number"),
                                               pa.scalar(0xFF, pa.int32())),
            "service_name": t.column("role"),
            "body": t.column("text"),
            "resource_schema_url": _const(n, ""),
            "resource_attributes": _resource_attrs(t.column("role")),
            "scope_schema_url": _const(n, ""),
            "scope_name": _const(n, SCOPE_NAME),
            "scope_version": _const(n, SCOPE_VERSION),
            "scope_attributes": _const(n, "{}"),
            "log_attributes": _log_attrs(t, n),
            "event_name": t.column("event_type"),
        })

    return parsed_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def span_rows(parsed_ds):
    """SpanRow table (schema.rs:22-66) over tool-call lines: client spans,
    parent = previous turn's span id (root at turn 0), status Ok/Error from
    the tool exit code, one "exception" event per failed call."""

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        n = t.num_rows
        conv = t.column("conv_id").combine_chunks()
        turn = t.column("turn_idx").combine_chunks()
        turn_s = pc.cast(turn, pa.string())
        key = pc.binary_join_element_wise(conv, turn_s, ":")
        pkey = pc.binary_join_element_wise(
            conv, pc.cast(pc.subtract(turn, 1), pa.string()), ":")
        is_root = pc.equal(turn, 0)
        failed = pc.not_equal(t.column("tool_exit"), 0)
        ns = _ns(t.column("ts"))
        exit_s = pc.cast(t.column("tool_exit"), pa.string())
        status_msg = pc.if_else(
            failed, _join(_const(n, "exit="), exit_s), _const(n, ""))
        ev_ts = pc.if_else(failed,
                           _join(_const(n, "["), pc.cast(ns, pa.string()), _const(n, "]")),
                           _const(n, "[]"))
        ev_name = pc.if_else(failed, _const(n, '["exception"]'), _const(n, "[]"))
        ev_attrs = pc.if_else(
            failed,
            _join(_const(n, '[{"exception.message":"exit='), exit_s,
                  _const(n, '"}]')),
            _const(n, "[]"))
        span_attrs = _join(
            _const(n, '{"tool.cmd":"'), t.column("tool_cmd"),
            _const(n, '","tool.name":"'), t.column("tool_name"), _const(n, '"}'))
        # duration: ms → ns, clamped ≥0 (transform_traces.rs:95-99)
        duration = pc.max_element_wise(
            pc.multiply(pc.cast(t.column("duration_ms"), pa.int64()),
                        np.int64(1_000_000)),
            pa.scalar(0, pa.int64()))
        return pa.table({
            "timestamp": ns,
            "trace_id": hex_encode(trace_id_from(conv)),
            "span_id": hex_encode(span_id_from(key)),
            "parent_span_id": pc.if_else(
                is_root, _const(n, ""), hex_encode(span_id_from(pkey))),
            "trace_state": _const(n, ""),
            "span_name": t.column("tool_name"),
            "span_kind": _const(n, "Client"),
            "service_name": t.column("role"),
            "resource_attributes": _resource_attrs(t.column("role")),
            "scope_name": _const(n, SCOPE_NAME),
            "scope_version": _const(n, SCOPE_VERSION),
            "span_attributes": span_attrs,
            "duration": duration,
            "status_code": pc.if_else(failed, _const(n, "Error"), _const(n, "Ok")),
            "status_message": status_msg,
            "events_timestamp": ev_ts,
            "events_name": ev_name,
            "events_attributes": ev_attrs,
            "links_trace_id": _const(n, "[]"),
            "links_span_id": _const(n, "[]"),
            "links_trace_state": _const(n, "[]"),
            "links_attributes": _const(n, "[]"),
        })

    return parsed_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
