"""Vectorized parse stage: structured-field extraction from `text`.

The Ray-Data-native analogue of the reference's per-line parsers
(Parser trait: src/receivers/file/parser/traits.rs:17-26 — one parse call per
line producing {timestamp, attributes, severity}). Here the whole batch is
parsed at once with RE2 regex over the Arrow string column
(``pyarrow.compute.extract_regex`` — named capture groups -> one column per
group, non-match -> null, exactly the RegexParser contract of
src/receivers/file/parser/regex.rs:107-150) and ``pyarrow.json`` for JSON
lines (src/receivers/file/parser/json.rs:38-105; lenient mode -> nulls).

Grammars (FIXTURES.md §2):
- TOOL_CALL / ERROR transcript lines (router drivers)
- nginx combined access / nginx error (presets per
  src/receivers/file/parser/nginx.rs:53,64; constant attr source=nginx at
  nginx.rs:118 becomes the event_type column)
- JSON log lines
- kmsg ``prio,seq,ts_us[,flags];msg`` (src/receivers/kmsg/parser.rs:226-272;
  priority = low 3 bits, facility = bits 3-7)
- anything else -> event_type="chat" (unparsed fall-through, parse_ok=false)

Severity mapping mirrors src/receivers/kmsg/parser.rs:155-166:
priority {0,1,2}->21, 3->17, 4->13, 5->10, 6->9, 7->5.
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as paj

from ..schema import PARSED_COLUMNS

# RE2 patterns (anchored; each grammar has a distinct prefix so at most one
# non-access pattern matches a given line).
RE_TOOL = (
    r'^TOOL_CALL tool=(?P<tool_name>\w+) cmd="(?P<tool_cmd>[^"]*)" '
    r"exit=(?P<tool_exit>\d+) duration_ms=(?P<duration_ms>\d+)$"
)
RE_ERROR = r'^ERROR code=(?P<error_code>\w+) msg="(?P<error_msg>[^"]*)" retryable=(?P<retryable>true|false)$'
# nginx combined access, field names per reference nginx.rs:53
RE_ACCESS = (
    r"^(?P<remote_addr>\S+) - (?P<remote_user>\S+) \[(?P<time_local>[^\]]+)\] "
    r'"(?P<request>[^"]*)" (?P<status>\d+) (?P<body_bytes_sent>\d+) '
    r'"(?P<http_referer>[^"]*)" "(?P<http_user_agent>[^"]*)"$'
)
# nginx error, field names per reference nginx.rs:64
RE_NGERR = (
    r"^(?P<ng_time>\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}) \[(?P<ng_level>\w+)\] "
    r"(?P<ng_pid>\d+)#(?P<ng_tid>\d+):(?: \*(?P<ng_cid>\d+))? (?P<ng_message>.*)$"
)
RE_KMSG = r"^(?P<km_prio>\d+),(?P<km_seq>\d+),(?P<km_ts_us>\d+)(?:,(?P<km_flags>[^;]*))?;(?P<km_message>.*)$"

JSON_SCHEMA = pa.schema(
    [
        ("time_local", pa.string()),
        ("remote_addr", pa.string()),
        ("request", pa.string()),
        ("status", pa.int64()),
        ("body_bytes_sent", pa.int64()),
    ]
)

# kmsg priority -> OTLP severity number (parser.rs:155-166)
_PRIO_TO_SEV = pa.array([21, 21, 21, 17, 13, 10, 9, 5], type=pa.int32())
_LEVELS = pa.array(["debug", "info", "notice", "warn", "error", "crit", "alert", "emerg"])
_LEVEL_SEV = pa.array([5, 9, 10, 13, 17, 21, 21, 21], type=pa.int32())
_SEV_NUMS = pa.array([5, 9, 10, 13, 17, 21], type=pa.int32())
_SEV_TEXTS = pa.array(["DEBUG", "INFO", "INFO2", "WARN", "ERROR", "FATAL"])


def _field(struct_arr: pa.ChunkedArray | pa.Array, name: str) -> pa.Array:
    return pc.struct_field(struct_arr, name)


def _cast(arr, typ):
    return pc.cast(arr, typ)


def _blank_to_null(arr):
    # RE2 optional groups extract as '' rather than null
    return pc.if_else(pc.equal(arr, ""), pa.scalar(None, pa.string()), arr)


def _parse_json_rows(text: pa.Array, mask: pa.Array, n: int) -> dict[str, pa.Array]:
    """Parse the JSON-line subset with pyarrow.json (vectorized C++ parser).

    Returns full-length arrays (nulls outside the subset). Lenient semantics:
    an unparseable subset falls back to all-null (json.rs:27-35 lenient mode).
    """
    out_cols = {f.name: pa.nulls(n, f.type) for f in JSON_SCHEMA}
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    if idx.size == 0:
        return out_cols
    lines = pc.take(text, pa.array(idx)).to_pylist()
    try:
        tbl = paj.read_json(
            io.BytesIO(("\n".join(lines)).encode()),
            parse_options=paj.ParseOptions(
                explicit_schema=JSON_SCHEMA, unexpected_field_behavior="ignore"
            ),
        )
    except pa.ArrowInvalid:
        return out_cols
    if tbl.num_rows != idx.size:
        return out_cols
    for f in JSON_SCHEMA:
        vals = tbl.column(f.name).combine_chunks() if f.name in tbl.column_names else pa.nulls(idx.size, f.type)
        np_col = np.zeros(n, dtype=object)
        np_valid = np.zeros(n, dtype=bool)
        np_col[idx] = vals.to_numpy(zero_copy_only=False)
        np_valid[idx] = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        np_col[~np_valid] = None
        out_cols[f.name] = pa.array(np_col, type=f.type, from_pandas=True)
    return out_cols


def _strptime_or_null(arr, fmt: str) -> pa.Array:
    return pc.strptime(arr, format=fmt, unit="us", error_is_null=True)


def parse_batch(batch: pa.Table) -> pa.Table:
    """Append PARSED_COLUMNS to the batch. Pure Arrow kernels; zero Python
    per-row work except the JSON subset join (C++ JSON parse)."""
    text = batch.column("text").combine_chunks()
    n = len(text)

    tool = pc.extract_regex(text, RE_TOOL)
    err = pc.extract_regex(text, RE_ERROR)
    kmsg = pc.extract_regex(text, RE_KMSG)
    ngerr = pc.extract_regex(text, RE_NGERR)
    access = pc.extract_regex(text, RE_ACCESS)
    is_json = pc.starts_with(text, "{")

    m_tool = pc.is_valid(tool)
    m_err = pc.is_valid(err)
    m_kmsg = pc.is_valid(kmsg)
    m_ngerr = pc.is_valid(ngerr)
    # access must not claim kmsg/ngerr lines (distinct prefixes make overlap
    # impossible in practice, but keep the cascade explicit)
    m_access = pc.and_(
        pc.is_valid(access),
        pc.and_kleene(pc.invert(m_kmsg), pc.invert(m_ngerr)),
    )

    event_type = pc.case_when(
        pc.make_struct(m_tool, m_err, is_json, m_kmsg, m_ngerr, m_access),
        "tool_call",
        "error",
        "json",
        "kmsg",
        "nginx_error",
        "nginx_access",
        "chat",
    )

    jcols = _parse_json_rows(text, is_json, n)

    cols: dict[str, pa.Array] = {}
    cols["event_type"] = event_type
    cols["tool_name"] = _field(tool, "tool_name")
    cols["tool_cmd"] = _field(tool, "tool_cmd")
    cols["tool_exit"] = _cast(_field(tool, "tool_exit"), pa.int32())
    cols["duration_ms"] = _cast(_field(tool, "duration_ms"), pa.int64())
    cols["error_code"] = _field(err, "error_code")
    cols["error_msg"] = _field(err, "error_msg")
    cols["retryable"] = pc.equal(_field(err, "retryable"), "true")

    cols["remote_addr"] = pc.coalesce(_field(access, "remote_addr"), jcols["remote_addr"])
    cols["remote_user"] = _field(access, "remote_user")
    cols["time_local"] = pc.coalesce(_field(access, "time_local"), jcols["time_local"])
    cols["request"] = pc.coalesce(_field(access, "request"), jcols["request"])
    cols["status"] = pc.coalesce(
        _cast(_field(access, "status"), pa.int32()), _cast(jcols["status"], pa.int32())
    )
    cols["body_bytes_sent"] = pc.coalesce(
        _cast(_field(access, "body_bytes_sent"), pa.int64()), jcols["body_bytes_sent"]
    )
    cols["http_referer"] = _field(access, "http_referer")
    cols["http_user_agent"] = _field(access, "http_user_agent")

    cols["ng_level"] = _field(ngerr, "ng_level")
    cols["ng_pid"] = _cast(_field(ngerr, "ng_pid"), pa.int32())
    cols["ng_tid"] = _cast(_field(ngerr, "ng_tid"), pa.int32())
    cols["ng_cid"] = _cast(_blank_to_null(_field(ngerr, "ng_cid")), pa.int64())
    cols["ng_message"] = _field(ngerr, "ng_message")

    km_prio_raw = _cast(_field(kmsg, "km_prio"), pa.int32())
    # priority = low 3 bits, facility = bits 3..7 (parser.rs:226-272)
    cols["km_priority"] = pc.bit_wise_and(km_prio_raw, 7)
    cols["km_facility"] = pc.shift_right(km_prio_raw, 3)
    cols["km_seq"] = _cast(_field(kmsg, "km_seq"), pa.int64())
    cols["km_ts_us"] = _cast(_field(kmsg, "km_ts_us"), pa.int64())
    cols["km_flags"] = _blank_to_null(_field(kmsg, "km_flags"))
    cols["km_message"] = _field(kmsg, "km_message")

    # severity cascade
    sev_km = pc.take(_PRIO_TO_SEV, cols["km_priority"])
    sev_ng = pc.take(_LEVEL_SEV, pc.index_in(cols["ng_level"], _LEVELS))
    status = cols["status"]
    sev_http = pc.case_when(
        pc.make_struct(pc.greater_equal(status, 500), pc.greater_equal(status, 400)),
        pa.scalar(17, pa.int32()),
        pa.scalar(13, pa.int32()),
        pa.scalar(9, pa.int32()),
    )
    sev_http = pc.if_else(pc.is_valid(status), sev_http, pa.nulls(n, pa.int32()))
    sev_err = pc.if_else(m_err, pa.scalar(17, pa.int32()), pa.nulls(n, pa.int32()))
    cols["severity_number"] = pc.coalesce(sev_km, sev_ng, sev_err, sev_http, pa.scalar(9, pa.int32()))
    cols["severity_text"] = pc.take(_SEV_TEXTS, pc.index_in(cols["severity_number"], _SEV_NUMS))

    # timestamp parse: '%d/%b/%Y:%H:%M:%S +0000' (fixed-width naive part,
    # UTC) and nginx-error '%Y/%m/%d %H:%M:%S' — naive-UTC fallback semantics
    # per regex.rs:84-105 / nginx.rs:40,144-152
    tl_naive = pc.utf8_slice_codeunits(cols["time_local"], 0, 20)
    ts_access = _strptime_or_null(tl_naive, "%d/%b/%Y:%H:%M:%S")
    ts_ngerr = _strptime_or_null(_field(ngerr, "ng_time"), "%Y/%m/%d %H:%M:%S")
    cols["log_ts"] = pc.coalesce(ts_access, ts_ngerr)

    cols["attrs"] = pc.if_else(is_json, text, pa.nulls(n, pa.string()))
    cols["parse_ok"] = pc.invert(pc.equal(event_type, "chat"))

    out = batch
    for name, arr in cols.items():
        out = out.append_column(pa.field(name, PARSED_COLUMNS[name]), _cast(arr, PARSED_COLUMNS[name]))
    return out


def parse_stage(ds, batch_size: int = 16384):
    """read -> parse. Stateless tasks (no per-actor state needed: RE2
    patterns are module-level compiled on first use inside each worker)."""
    return ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Drain-lite log template mining
# ---------------------------------------------------------------------------

# Masks applied IN ORDER (quoted payloads first so their digits never split,
# hex ids before plain numbers). RE2 on both engines: Arrow
# `replace_substring_regex` and DuckDB `regexp_replace(..., 'g')` are the
# same non-overlapping leftmost global replace, so the template strings are
# byte-identical and the op is exactly SQL-oracleable.
TEMPLATE_MASKS: list[tuple[str, str]] = [
    (r'"[^"]*"', "<STR>"),
    (r"0x[0-9a-fA-F]+", "<HEX>"),
    (r"\d+(\.\d+)*", "<NUM>"),  # also collapses IPs / versions to one token
]


def mine_log_templates(ds, *, text_col: str = "text",
                       group_col: str = "conv_id", k: int = 50,
                       num_buckets: int = 16):
    """Log-template mining (Drain-family, deterministic variant): mask the
    variable parts of every line (quoted strings, hex ids, numbers), then
    roll up per template: line count, distinct-conversation count and the
    lexicographically smallest raw example line. Top-``k`` by line count.

    The simplification vs Drain proper (He et al., ICWS 2017): templates come
    from fixed masking rules instead of an online parse tree, which keeps the
    operator stateless/vectorized and exactly verifiable — the realistic
    trade for a batch pipeline where the masks are tuned offline.

    Scale shape: the shuffle moves one (template, group, count, example) row
    per distinct (template, group) pair per batch — never the raw lines.
    Distinct-group counting is exact: phase 2 re-collapses (template, group)
    inside each template-hash bucket before counting, so a group seen in many
    batches counts once. Skew note: a planetary template funnels its
    per-group rows into one bucket — that is inherent to exact distinct
    counting (same shape as tool_stats' per-conv rollup); the count column
    stays bounded by the true distinct-group cardinality.
    """
    from .aggregate import grouped_apply

    def mask(t: pa.Table) -> pa.Table:
        tpl = t.column(text_col)
        for pat, repl in TEMPLATE_MASKS:
            tpl = pc.replace_substring_regex(tpl, pattern=pat, replacement=repl)
        return pa.table({"template": tpl, "g": t.column(group_col),
                         "raw": t.column(text_col)})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["template", "g"]).aggregate(
            [("raw", "min"), ("raw", "count")])
        return g.rename_columns(["template", "g", "ex", "c"])

    parts = (ds.map_batches(mask, batch_format="pyarrow", zero_copy_batch=True)
               .map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True))

    def reduce_bucket(t: pa.Table) -> pa.Table:
        g1 = t.group_by(["template", "g"]).aggregate(
            [("ex", "min"), ("c", "sum")])
        g2 = g1.group_by("template").aggregate(
            [("c_sum", "sum"), ("g", "count"), ("ex_min", "min")])
        return pa.table({
            "template": g2.column("template"),
            "n_lines": pc.cast(g2.column("c_sum_sum"), pa.int64()),
            "n_convs": pc.cast(g2.column("g_count"), pa.int64()),
            "example": g2.column("ex_min_min"),
        })

    rolled = grouped_apply(parts, ["template"], reduce_bucket,
                           num_buckets=num_buckets, batch_format="pyarrow")
    return rolled.sort(["n_lines", "template"],
                       descending=[True, False]).limit(k)


def template_drift(ds, mid_us: int, *, text_col: str = "text",
                   ts_col: str = "ts", num_buckets: int = 8):
    """Log-shape regression detector: PSI between the first- and
    second-half TEMPLATE distributions (same masks as
    mine_log_templates) — a deploy that changes what the service logs
    moves this number even when volume stays flat. Same sign-safe exact
    integer PSI as value_psi, bins = templates. Output one row
    (n_templates_common, n_only_first, n_only_second, psi_e6).

    Scale shape: one masked two-phase (template, half) count collapses
    the stream to the template grid; the big-int scoring runs
    driver-side over that bounded grid."""
    import math

    from .aggregate import two_phase_aggregate

    def mask(t: pa.Table) -> pa.Table:
        tpl = t.column(text_col)
        for pat, repl in TEMPLATE_MASKS:
            tpl = pc.replace_substring_regex(tpl, pattern=pat,
                                             replacement=repl)
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        h1 = (us < mid_us).astype(np.int64)
        return pa.table({"template": tpl, "c1": pa.array(h1),
                         "c2": pa.array(1 - h1)})

    grid = two_phase_aggregate(
        ds.map_batches(mask, batch_format="pyarrow", zero_copy_batch=True),
        ["template"], [("c1", "sum", "c1"), ("c2", "sum", "c2")],
        num_buckets=num_buckets).take_all()

    n1 = sum(int(r["c1"]) for r in grid)
    n2 = sum(int(r["c2"]) for r in grid)
    common = only1 = only2 = 0
    num = 0
    for r in grid:
        c1, c2 = int(r["c1"]), int(r["c2"])
        if c1 > 0 and c2 > 0:
            common += 1
            x, y = c1 * n2, c2 * n1
            # float(x)/float(y) mirrors DuckDB's two HUGEINT→DOUBLE casts
            num += (x - y) * math.floor(math.log(float(x) / float(y)) * 1e6)
        elif c1 > 0:
            only1 += 1
        else:
            only2 += 1
    psi = num // (n1 * n2) if n1 and n2 else 0
    return pa.table({
        "n_templates_common": pa.array([common], pa.int64()),
        "n_only_first": pa.array([only1], pa.int64()),
        "n_only_second": pa.array([only2], pa.int64()),
        "psi_e6": pa.array([psi], pa.int64())})
