"""Arrow schemas for the transcript pipeline.

Input table (authoritative, per BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[us]

Sink schemas are modeled on the reference's Parquet file exporter column sets
(reference: src/exporters/file/parquet/span.rs:17-71, log.rs:13-31,
metric.rs:14-32) — flattened, one row per record, attribute overflow as a JSON
string column (MapOrJson, src/exporters/file/parquet/common.rs:16-20).
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Columns appended by the parse stage (vectorized regex/JSON extract over
# `text`; the RegexParser analogue — reference:
# src/receivers/file/parser/regex.rs:107-150 named capture groups -> one
# attribute per group; non-match -> parse error).
PARSED_COLUMNS = {
    "event_type": pa.string(),  # tool_call|error|json|kmsg|nginx_error|nginx_access|chat
    # tool-invocation grammar
    "tool_name": pa.string(),
    "tool_cmd": pa.string(),
    "tool_exit": pa.int32(),
    "duration_ms": pa.int64(),
    # error grammar
    "error_code": pa.string(),
    "error_msg": pa.string(),
    "retryable": pa.bool_(),
    # nginx combined access grammar (field names per
    # src/receivers/file/parser/nginx.rs:53)
    "remote_addr": pa.string(),
    "remote_user": pa.string(),
    "time_local": pa.string(),
    "request": pa.string(),
    "status": pa.int32(),
    "body_bytes_sent": pa.int64(),
    "http_referer": pa.string(),
    "http_user_agent": pa.string(),
    # nginx error grammar (nginx.rs:64)
    "ng_level": pa.string(),
    "ng_pid": pa.int32(),
    "ng_tid": pa.int32(),
    "ng_cid": pa.int64(),
    "ng_message": pa.string(),
    # kmsg grammar (src/receivers/kmsg/parser.rs:226-272)
    "km_priority": pa.int32(),
    "km_facility": pa.int32(),
    "km_seq": pa.int64(),
    "km_ts_us": pa.int64(),
    "km_flags": pa.string(),
    "km_message": pa.string(),
    # derived
    "severity_number": pa.int32(),
    "severity_text": pa.string(),
    "log_ts": pa.timestamp("us"),
    "attrs": pa.string(),  # JSON overflow (MapOrJson analogue)
    "parse_ok": pa.bool_(),
}

# traces-sink schema (cf. src/exporters/file/parquet/span.rs:17-71)
TRACES_SINK_COLUMNS = [
    "conv_id",
    "turn_idx",
    "ts",
    "role",
    "tool_name",
    "tool_cmd",
    "tool_exit",
    "duration_ms",
    "text",
]

# logs-sink schema (cf. src/exporters/file/parquet/log.rs:13-31; `body` is the
# raw line verbatim — per-turn text equality is asserted on this column)
LOGS_SINK_COLUMNS = [
    "conv_id",
    "turn_idx",
    "ts",
    "role",
    "event_type",
    "severity_number",
    "severity_text",
    "error_code",
    "body",
    "attrs",
]

# metrics-sink schema (cf. src/exporters/file/parquet/metric.rs:14-32 and the
# EMF GroupedMetric shape, src/exporters/awsemf/transformer.rs:116-137)
METRICS_SINK_COLUMNS = [
    "namespace",
    "name",
    "group_key",
    "ts_minute",
    "value_count",
    "value_sum",
    "value_min",
    "value_max",
]

# OTLP severity numbers and their text names (severity mapping per
# src/receivers/kmsg/parser.rs:94-166).
SEVERITY_TEXT = {5: "DEBUG", 9: "INFO", 10: "INFO2", 13: "WARN", 17: "ERROR", 21: "FATAL"}
