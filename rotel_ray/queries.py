"""Named queries + DuckDB oracle SQL — the correctness surface.

Every operator claimed in SURVEY.md §2 has an entry here: a Ray-Data
pipeline callable ``f(sf_dir) -> Dataset|Table`` and (where SQL-expressible)
a matching ANSI-SQL oracle that DuckDB runs on the same parquet inputs.
Column names and types match between the two by construction.

Floating-point policy: monetary/double sums are converted per-row to integer
"cents" via ``floor(x*100 + 0.5)`` on BOTH sides, so aggregation order can
never produce hash mismatches; integer-valued doubles (durations, byte
counts) sum exactly in float64 and are left as doubles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .generator import ensure_transcripts
from .stages.aggregate import (
    conv_aggregate,
    delta_within_group,
    metrics_aggregate,
    two_phase_aggregate,
)
from .stages.parse import parse_stage
from .stages.route import route_stage

# ---------------------------------------------------------------------------
# shared SQL fragments (classification predicates mirror stages/parse.py)
# ---------------------------------------------------------------------------

SQL_IS_TOOL = r"""regexp_matches(text, '^TOOL_CALL tool=\w+ cmd="[^"]*" exit=\d+ duration_ms=\d+$')"""
SQL_IS_ERROR = r"""regexp_matches(text, '^ERROR code=\w+ msg="[^"]*" retryable=(true|false)$')"""
SQL_IS_JSON = r"""starts_with(text, '{')"""
SQL_IS_KMSG = r"""regexp_matches(text, '^\d+,\d+,\d+(,[^;]*)?;')"""
SQL_IS_NGERR = r"""regexp_matches(text, '^\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2} \[\w+\] \d+#\d+:( \*\d+)? ')"""
SQL_IS_ACCESS = r"""regexp_matches(text, '^\S+ - \S+ \[[^\]]+\] "[^"]*" \d+ \d+ "[^"]*" "[^"]*"$')"""

SQL_EVENT_TYPE = f"""CASE
  WHEN {SQL_IS_TOOL} THEN 'tool_call'
  WHEN {SQL_IS_ERROR} THEN 'error'
  WHEN {SQL_IS_JSON} THEN 'json'
  WHEN {SQL_IS_KMSG} THEN 'kmsg'
  WHEN {SQL_IS_NGERR} THEN 'nginx_error'
  WHEN {SQL_IS_ACCESS} THEN 'nginx_access'
  ELSE 'chat' END"""

SQL_STATUS = f"""CASE
  WHEN {SQL_IS_ACCESS} THEN CAST(regexp_extract(text, '" (\\d+) (\\d+) "', 1) AS INTEGER)
  WHEN {SQL_IS_JSON} THEN CAST(json_extract_string(text, '$.status') AS INTEGER)
  END"""

SQL_SEVERITY = f"""CASE
  WHEN {SQL_IS_KMSG} THEN
    CASE (CAST(regexp_extract(text, '^(\\d+),', 1) AS INTEGER) % 8)
      WHEN 0 THEN 21 WHEN 1 THEN 21 WHEN 2 THEN 21 WHEN 3 THEN 17
      WHEN 4 THEN 13 WHEN 5 THEN 10 WHEN 6 THEN 9 ELSE 5 END
  WHEN {SQL_IS_NGERR} THEN
    CASE regexp_extract(text, '\\[(\\w+)\\]', 1)
      WHEN 'debug' THEN 5 WHEN 'info' THEN 9 WHEN 'notice' THEN 10
      WHEN 'warn' THEN 13 WHEN 'error' THEN 17 ELSE 21 END
  WHEN {SQL_IS_ERROR} THEN 17
  WHEN ({SQL_STATUS}) IS NOT NULL THEN
    CASE WHEN ({SQL_STATUS}) >= 500 THEN 17 WHEN ({SQL_STATUS}) >= 400 THEN 13 ELSE 9 END
  ELSE 9 END"""

SQL_SEV_TEXT = f"""CASE ({SQL_SEVERITY}) WHEN 5 THEN 'DEBUG' WHEN 9 THEN 'INFO' WHEN 10 THEN 'INFO2'
  WHEN 13 THEN 'WARN' WHEN 17 THEN 'ERROR' ELSE 'FATAL' END"""

SQL_DURATION = f"""CASE WHEN {SQL_IS_TOOL} THEN CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1) AS BIGINT) END"""
SQL_BYTES = f"""CASE
  WHEN {SQL_IS_ACCESS} THEN CAST(regexp_extract(text, '" (\\d+) (\\d+) "', 2) AS BIGINT)
  WHEN {SQL_IS_JSON} THEN CAST(json_extract_string(text, '$.body_bytes_sent') AS BIGINT) END"""

ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _trans_sql_rel(sf_dir: str = ORACLE_SF_DIR) -> str:
    path = ensure_transcripts(sf_dir)
    return f"read_parquet('{path}/*.parquet')"


# ---------------------------------------------------------------------------
# helpers (Ray side)
# ---------------------------------------------------------------------------


def _transcripts_ds(sf_dir: str):
    return rd.read_parquet(ensure_transcripts(sf_dir))


def _parsed(sf_dir: str):
    return parse_stage(_transcripts_ds(sf_dir))


def _cents_arr(arr) -> pa.Array:
    """floor(x*100 + 0.5) as int64 — deterministic money-sum convention."""
    return pc.cast(pc.floor(pc.add(pc.multiply(pc.cast(arr, pa.float64()), 100.0), 0.5)), pa.int64())


SQL_CENTS = "CAST(floor({expr} * 100 + 0.5) AS BIGINT)"


def _cast_final(ds, casts: dict):
    """Normalize aggregate output types (Ray groupby widens int32 keys to
    int64 and narrows timestamps); keeps Ray and DuckDB schemas identical."""

    def f(t: pa.Table) -> pa.Table:
        for c, typ in casts.items():
            if c in t.column_names:
                t = t.set_column(t.column_names.index(c), c, pc.cast(t.column(c), typ))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# transcript-pipeline queries
# ---------------------------------------------------------------------------


def q_parse_tool_calls(sf_dir: str):
    ds = _parsed(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "tool_call")).select(
            ["conv_id", "turn_idx", "tool_name", "tool_cmd", "tool_exit", "duration_ms"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_parse_errors(sf_dir: str):
    ds = _parsed(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "error")).select(
            ["conv_id", "turn_idx", "error_code", "error_msg", "retryable"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_parse_nginx_access(sf_dir: str):
    ds = _parsed(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "nginx_access")).select(
            ["conv_id", "turn_idx", "remote_addr", "remote_user", "request", "status",
             "body_bytes_sent", "log_ts"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_parse_kmsg(sf_dir: str):
    ds = _parsed(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "kmsg")).select(
            ["conv_id", "turn_idx", "km_priority", "km_facility", "km_seq", "km_message",
             "severity_number"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_route_counts(sf_dir: str):
    ds = route_stage(_parsed(sf_dir))
    return two_phase_aggregate(ds, ["sink"], [("sink", "count", "n")])


def q_traces_sink(sf_dir: str):
    ds = route_stage(_parsed(sf_dir))
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("sink"), "traces")).select(
            ["conv_id", "turn_idx", "ts", "role", "tool_name", "tool_cmd", "tool_exit",
             "duration_ms", "text"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_logs_sink(sf_dir: str):
    """The per-turn text-equality gate: `body` is the raw line verbatim."""
    ds = route_stage(_parsed(sf_dir))

    def proj(t):
        t = t.filter(pc.equal(t.column("sink"), "logs"))
        t = t.append_column("body", t.column("text"))
        return t.select(["conv_id", "turn_idx", "event_type", "severity_number",
                         "severity_text", "error_code", "body"])

    return ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def q_conv_agg(sf_dir: str):
    return _cast_final(
        conv_aggregate(_parsed(sf_dir)),
        {"max_severity": pa.int32(), "first_ts": pa.timestamp("us"), "last_ts": pa.timestamp("us")},
    )


def q_metrics_emf(sf_dir: str):
    return _cast_final(metrics_aggregate(_parsed(sf_dir)), {"ts_minute": pa.timestamp("us")})


def q_severity_hist(sf_dir: str):
    ds = _parsed(sf_dir)
    agg = two_phase_aggregate(ds, ["severity_number"], [("severity_number", "count", "n")])
    return _cast_final(agg, {"severity_number": pa.int32()})


def q_enrich_roles(sf_dir: str):
    from .stages.enrich import ROLE_META, _lookup

    ds = _parsed(sf_dir)

    def add_side(t):
        return t.append_column("role_side", _lookup(t.column("role").combine_chunks(), ROLE_META))

    ds = ds.map_batches(add_side, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(ds, ["role_side"], [("role_side", "count", "n")])


def q_delta_kmseq(sf_dir: str):
    """Cumulative->delta per conversation over kmsg sequence numbers
    (delta-calculator semantics, awsemf/transformer.rs:797-844)."""
    return delta_within_group(_parsed(sf_dir), key="conv_id", order="turn_idx", value="km_seq")


# ---------------------------------------------------------------------------
# driver-table queries (TPC-H-ish + events + documents + embeddings)
# ---------------------------------------------------------------------------


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate, two-phase with cents sums."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(t):
        disc_price = pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount")))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_cents": _cents_arr(t.column("l_quantity")),
                "base_cents": _cents_arr(t.column("l_extendedprice")),
                "disc_cents": _cents_arr(disc_price),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("qty_cents", "sum", "sum_qty_cents"),
            ("base_cents", "sum", "sum_base_cents"),
            ("disc_cents", "sum", "sum_disc_cents"),
            ("qty_cents", "count", "n_rows"),
        ],
    )


def q_nation_orders(sf_dir: str):
    """Broadcast join: orders -> customer -> nation (small sides ray.put once;
    the reference's static-map enrichment pattern, otel_util.rs:44-58)."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    c_keys = cust.column("c_custkey").combine_chunks()
    c_nname = pa.array([nk[v] for v in cust.column("c_nationkey").to_pylist()])
    ref = ray.put((c_keys, c_nname))

    class JoinNation:
        def __init__(self):
            self.c_keys, self.c_nname = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("o_custkey").combine_chunks(), self.c_keys)
            return pa.table(
                {
                    "n_name": pc.take(self.c_nname, idx),
                    "total_cents": _cents_arr(t.column("o_totalprice")),
                }
            )

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    ds = ds.map_batches(JoinNation, batch_format="pyarrow", concurrency=2, zero_copy_batch=True)
    return two_phase_aggregate(
        ds, ["n_name"], [("total_cents", "sum", "sum_total_cents"), ("total_cents", "count", "n_orders")]
    )


def q_events_minute(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def prep(t):
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "ts_minute": pc.floor_temporal(t.column("ts"), unit="minute"),
                "value_cents": _cents_arr(t.column("value")),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = two_phase_aggregate(
        ds,
        ["event_type", "ts_minute"],
        [("value_cents", "sum", "sum_value_cents"), ("value_cents", "count", "n")],
    )
    return _cast_final(agg, {"ts_minute": pa.timestamp("us")})


def q_top_users(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    ds = ds.map_batches(
        lambda t: pa.table({"user_id": t.column("user_id"), "value_cents": _cents_arr(t.column("value"))}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = two_phase_aggregate(ds, ["user_id"], [("value_cents", "sum", "sum_value_cents")])
    return agg.sort("sum_value_cents", descending=True).limit(10)


def q_dedup_exact(sf_dir: str):
    """Exact dedup: content-hash (md5) added vectorized per batch, then
    two-phase groupby keeps min doc_id + dup count (no raw text shuffled)."""
    from .stages.enrich import _hash_values

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda t: pa.table({"text_hash": _hash_values(t.column("text"), "md5"), "doc_id": t.column("doc_id")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return two_phase_aggregate(
        ds, ["text_hash"], [("doc_id", "min", "doc_id"), ("doc_id", "count", "n_dups")]
    )


def q_doc_tokens(sf_dir: str):
    """Token counting (whitespace tokens) + char length per doc."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tok(t):
        text = t.column("text").combine_chunks()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    return ds.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_quality(sf_dir: str):
    """Quality scoring: alpha ratio + mean token length (text-analysis op)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(t):
        text = t.column("text").combine_chunks()
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.float64())
        toks = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "alpha_ratio": pc.divide(alpha, n_chars),
                "mean_tok_len": pc.divide(alpha, pc.max_element_wise(toks, 1.0)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def q_sim_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k vs a broadcast query vector (ANN baseline):
    numpy matmul per batch against the ray.put query, global top-k via
    sort+limit. Returns vec_ids only (float-tie-safe)."""
    emb0 = pq.read_table(f"{sf_dir}/embeddings.parquet").filter(
        pc.equal(pc.field("vec_id"), 0)
    )
    q = np.asarray(emb0.column("embedding").to_pylist()[0], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    qref = ray.put(qn)

    class Cosine:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sim = m @ self.q
            return pa.table({"vec_id": t.column("vec_id"), "sim": pa.array(sim)})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = ds.map_batches(Cosine, batch_format="pyarrow", concurrency=2)
    top = ds.sort("sim", descending=True).limit(k)
    return top.select_columns(["vec_id"])


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "parse_tool_calls": q_parse_tool_calls,
    "parse_errors": q_parse_errors,
    "parse_nginx_access": q_parse_nginx_access,
    "parse_kmsg": q_parse_kmsg,
    "route_counts": q_route_counts,
    "traces_sink": q_traces_sink,
    "logs_sink": q_logs_sink,
    "conv_agg": q_conv_agg,
    "metrics_emf": q_metrics_emf,
    "severity_hist": q_severity_hist,
    "enrich_roles": q_enrich_roles,
    "delta_kmseq": q_delta_kmseq,
    "lineitem_pricing": q_lineitem_pricing,
    "nation_orders": q_nation_orders,
    "events_minute": q_events_minute,
    "top_users": q_top_users,
    "dedup_exact": q_dedup_exact,
    "doc_tokens": q_doc_tokens,
    "doc_quality": q_doc_quality,
    "sim_topk": q_sim_topk,
}


def oracle_sql(sf_dir: str = ORACLE_SF_DIR) -> dict[str, str]:
    T = _trans_sql_rel(sf_dir)
    sql = {}
    sql["parse_tool_calls"] = f"""
        SELECT conv_id, turn_idx,
               regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1) AS tool_name,
               regexp_extract(text, 'cmd="([^"]*)"', 1) AS tool_cmd,
               CAST(regexp_extract(text, 'exit=(\\d+)', 1) AS INTEGER) AS tool_exit,
               CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1) AS BIGINT) AS duration_ms
        FROM {T} WHERE {SQL_IS_TOOL}"""
    sql["parse_errors"] = f"""
        SELECT conv_id, turn_idx,
               regexp_extract(text, 'code=(\\w+)', 1) AS error_code,
               regexp_extract(text, 'msg="([^"]*)"', 1) AS error_msg,
               regexp_extract(text, 'retryable=(true|false)$', 1) = 'true' AS retryable
        FROM {T} WHERE {SQL_IS_ERROR}"""
    sql["parse_nginx_access"] = f"""
        SELECT conv_id, turn_idx,
               regexp_extract(text, '^(\\S+) ', 1) AS remote_addr,
               regexp_extract(text, '^\\S+ - (\\S+) ', 1) AS remote_user,
               regexp_extract(text, '"([^"]*)" \\d+ \\d+ ', 1) AS request,
               CAST(regexp_extract(text, '" (\\d+) (\\d+) "', 1) AS INTEGER) AS status,
               CAST(regexp_extract(text, '" (\\d+) (\\d+) "', 2) AS BIGINT) AS body_bytes_sent,
               strptime(substring(regexp_extract(text, '\\[([^\\]]+)\\]', 1), 1, 20),
                        '%d/%b/%Y:%H:%M:%S') AS log_ts
        FROM {T} WHERE ({SQL_EVENT_TYPE}) = 'nginx_access'"""
    sql["parse_kmsg"] = f"""
        SELECT conv_id, turn_idx,
               CAST(regexp_extract(text, '^(\\d+),', 1) AS INTEGER) % 8 AS km_priority,
               CAST(regexp_extract(text, '^(\\d+),', 1) AS INTEGER) // 8 AS km_facility,
               CAST(regexp_extract(text, '^\\d+,(\\d+),', 1) AS BIGINT) AS km_seq,
               regexp_extract(text, ';(.*)$', 1) AS km_message,
               {SQL_SEVERITY} AS severity_number
        FROM {T} WHERE {SQL_IS_KMSG}"""
    sql["route_counts"] = f"""
        SELECT CASE WHEN {SQL_IS_TOOL} THEN 'traces' ELSE 'logs' END AS sink,
               count(*) AS n
        FROM {T} GROUP BY 1"""
    sql["traces_sink"] = f"""
        SELECT conv_id, turn_idx, ts, role,
               regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1) AS tool_name,
               regexp_extract(text, 'cmd="([^"]*)"', 1) AS tool_cmd,
               CAST(regexp_extract(text, 'exit=(\\d+)', 1) AS INTEGER) AS tool_exit,
               CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1) AS BIGINT) AS duration_ms,
               text
        FROM {T} WHERE {SQL_IS_TOOL}"""
    sql["logs_sink"] = f"""
        SELECT conv_id, turn_idx, {SQL_EVENT_TYPE} AS event_type,
               {SQL_SEVERITY} AS severity_number, {SQL_SEV_TEXT} AS severity_text,
               CASE WHEN {SQL_IS_ERROR} THEN regexp_extract(text, 'code=(\\w+)', 1) END AS error_code,
               text AS body
        FROM {T} WHERE NOT {SQL_IS_TOOL}"""
    sql["conv_agg"] = f"""
        SELECT conv_id,
               count(*) AS n_turns,
               CAST(sum(CASE WHEN {SQL_IS_TOOL} THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls,
               CAST(sum(CASE WHEN {SQL_IS_ERROR} THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
               CAST(sum(coalesce({SQL_DURATION}, 0)) AS BIGINT) AS total_duration_ms,
               max({SQL_SEVERITY}) AS max_severity,
               min(ts) AS first_ts, max(ts) AS last_ts
        FROM {T} GROUP BY conv_id"""
    sql["metrics_emf"] = f"""
        SELECT 'rotel_ray' AS namespace, {SQL_EVENT_TYPE} AS name,
               'role=' || role AS group_key,
               date_trunc('minute', ts) AS ts_minute,
               count(*) AS value_count,
               CAST(sum(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE) AS value_sum,
               CAST(min(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE) AS value_min,
               CAST(max(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE) AS value_max
        FROM {T} GROUP BY 1, 2, 3, 4"""
    sql["severity_hist"] = f"""
        SELECT {SQL_SEVERITY} AS severity_number, count(*) AS n FROM {T} GROUP BY 1"""
    sql["enrich_roles"] = f"""
        SELECT CASE role WHEN 'user' THEN 'client' WHEN 'assistant' THEN 'server'
                         WHEN 'system' THEN 'internal' WHEN 'tool' THEN 'tool' END AS role_side,
               count(*) AS n
        FROM {T} GROUP BY 1"""
    sql["delta_kmseq"] = f"""
        SELECT conv_id, turn_idx, km_seq,
               CAST(greatest(km_seq - lag(km_seq) OVER w, 0) AS DOUBLE) AS delta
        FROM (SELECT conv_id, turn_idx,
                     CAST(regexp_extract(text, '^\\d+,(\\d+),', 1) AS BIGINT) AS km_seq
              FROM {T} WHERE {SQL_IS_KMSG})
        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        QUALIFY lag(km_seq) OVER w IS NOT NULL"""
    cents = SQL_CENTS
    sql["lineitem_pricing"] = f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum({cents.format(expr='l_quantity')}) AS BIGINT) AS sum_qty_cents,
               CAST(sum({cents.format(expr='l_extendedprice')}) AS BIGINT) AS sum_base_cents,
               CAST(sum({cents.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS sum_disc_cents,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1, 2"""
    sql["nation_orders"] = f"""
        SELECT n_name,
               CAST(sum({cents.format(expr='o_totalprice')}) AS BIGINT) AS sum_total_cents,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1"""
    sql["events_minute"] = f"""
        SELECT event_type, date_trunc('minute', ts) AS ts_minute,
               CAST(sum({cents.format(expr='value')}) AS BIGINT) AS sum_value_cents, count(*) AS n
        FROM events GROUP BY 1, 2"""
    sql["top_users"] = f"""
        SELECT user_id, CAST(sum({cents.format(expr='value')}) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY 1 ORDER BY 2 DESC LIMIT 10"""
    sql["dedup_exact"] = """
        SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_dups
        FROM documents GROUP BY 1"""
    sql["doc_tokens"] = r"""
        SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents"""
    sql["doc_quality"] = r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / length(text) AS alpha_ratio,
               CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '\S+')), 1) AS mean_tok_len
        FROM documents"""
    sql["sim_topk"] = """
        SELECT vec_id FROM embeddings
        ORDER BY list_cosine_similarity(embedding,
            (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC
        LIMIT 10"""
    return sql
