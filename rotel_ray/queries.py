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

from .generator import ensure_transcripts
from .io import read_parquet
from .stages.aggregate import (
    conv_aggregate,
    delta_within_group,
    metrics_aggregate,
    two_phase_aggregate,
)
from .stages.parse import parse_stage
from .stages.route import route_stage

def _table_hint(sf_dir: str, table: str = "documents", fanout: int = 1):
    """Parquet-metadata row-count hint scoped over plan construction
    (aggregate.input_rows_hint) — see _docs_hint. ``fanout`` scales the
    hint for queries whose exchanges see MORE rows than the driving table
    (per-token k-gram explodes, window fan-outs): the hint contract is an
    upper bound on rows feeding every exchange, so an exploding query must
    declare its per-row expansion factor or the coalesce could funnel a
    fanned-out exchange through one merge task at mid scale."""
    import pyarrow.parquet as pq

    from .stages.aggregate import input_rows_hint

    return input_rows_hint(
        fanout * pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows)


def _hinted(table: str, fanout: int = 1):
    """Decorator: run the query's plan construction under the row-count
    hint of its driving table, so tiny exchanges coalesce at small scale
    (no-op at corpus scale). Metadata only — never an execution.
    ``fanout`` must be set by queries that explode rows (see _table_hint)."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(sf_dir, *a, **k):
            with _table_hint(sf_dir, table, fanout):
                return fn(sf_dir, *a, **k)
        return wrapped
    return deco


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
    # pure cache path — no build side effect; every query callable
    # ensure_transcripts() itself before the oracle SQL ever runs
    from .generator import sf_from_dir, transcripts_path

    path = transcripts_path(sf_from_dir(sf_dir) if isinstance(sf_dir, str)
                            else sf_dir)
    return f"read_parquet('{path}/*.parquet')"


# ---------------------------------------------------------------------------
# helpers (Ray side)
# ---------------------------------------------------------------------------


def _transcripts_ds(sf_dir: str):
    return read_parquet(ensure_transcripts(sf_dir))


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


def q_conv_outcomes(sf_dir: str):
    """Conversation funnel: how many conversations used a tool, hit an
    error, both, or neither — per-conv boolean rollup (max of per-batch
    flags, two-phase) then a 4-row groupby over the flag pairs."""
    from .stages.aggregate import two_phase_aggregate

    ds = _parsed(sf_dir)

    def flags(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": t.column("conv_id"),
            "has_tool": pc.cast(pc.equal(t.column("event_type"),
                                         "tool_call"), pa.int64()),
            "has_error": pc.cast(pc.equal(t.column("event_type"), "error"),
                                 pa.int64()),
        })

    per_conv = two_phase_aggregate(
        ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"],
        [("has_tool", "max", "has_tool"), ("has_error", "max", "has_error")],
        num_buckets=16)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "has_tool": pc.cast(t.column("has_tool"), pa.bool_()),
            "has_error": pc.cast(t.column("has_error"), pa.bool_()),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
        })

    return two_phase_aggregate(
        per_conv.map_batches(one, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["has_tool", "has_error"], [("one", "sum", "n_convs")],
        num_buckets=4)


def q_error_recovery(sf_dir: str):
    """Agent resilience funnel: of the conversations that hit an error, how
    many RECOVERED (a successful tool call at a turn strictly after the
    last error)? Narrow (conv, turn, 2 flags) rows shuffle; each bucket
    resolves its conversations with two vectorized group reductions."""
    import pandas as pd

    from .stages.aggregate import grouped_apply, two_phase_aggregate

    ds = _parsed(sf_dir)

    def narrow(t: pa.Table) -> pa.Table:
        is_err = pc.equal(t.column("event_type"), "error")
        ok_tool = pc.and_(pc.equal(t.column("event_type"), "tool_call"),
                          pc.equal(pc.fill_null(t.column("tool_exit"), -1), 0))
        return pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "is_err": pc.cast(is_err, pa.int64()),
            "ok_tool": pc.cast(ok_tool, pa.int64()),
        })

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        errs = g[g.is_err == 1]
        if not len(errs):
            return pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                                 "recovered": pd.Series([], dtype=np.int64)})
        last = errs.groupby("conv_id").turn_idx.max().rename("last_err")
        ok = g.loc[g.ok_tool == 1, ["conv_id", "turn_idx"]].merge(
            last, on="conv_id")
        rec = set(ok.loc[ok.turn_idx > ok.last_err, "conv_id"])
        return pd.DataFrame({
            "conv_id": last.index.to_numpy(),
            "recovered": np.array([int(c in rec) for c in last.index],
                                  np.int64),
        })

    per_conv = grouped_apply(rows, ["conv_id"], per_bucket, num_buckets=16)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "recovered": pc.cast(t.column("recovered"), pa.bool_()),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
        })

    return two_phase_aggregate(
        per_conv.map_batches(one, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["recovered"], [("one", "sum", "n_convs")], num_buckets=4)


def q_tool_stats(sf_dir: str):
    """Agent-ops rollup: per tool, call count, failure count (exit != 0),
    distinct conversations, and exact duration sums/max — the SRE view of
    the parsed tool-call stream. Two bucketed two-phase aggregates: first
    collapse to (tool, conv) partials, then one row per tool."""
    from .stages.aggregate import two_phase_aggregate

    ds = _parsed(sf_dir)

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        return pa.table({
            "tool_name": t.column("tool_name"),
            "conv_id": t.column("conv_id"),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "failed": pc.cast(pc.not_equal(t.column("tool_exit"), 0),
                              pa.int64()),
            "duration_ms": t.column("duration_ms"),
        })

    per_conv = two_phase_aggregate(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        ["tool_name", "conv_id"],
        [("one", "sum", "c"), ("failed", "sum", "f"),
         ("duration_ms", "sum", "s"), ("duration_ms", "max", "mx")],
        num_buckets=16)

    def to_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "tool_name": t.column("tool_name"),
            "c": t.column("c"), "f": t.column("f"), "s": t.column("s"),
            "mx": t.column("mx"),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
        })

    rolled = two_phase_aggregate(
        per_conv.map_batches(to_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["tool_name"],
        [("c", "sum", "n_calls"), ("f", "sum", "n_failed"),
         ("one", "sum", "n_convs"), ("s", "sum", "sum_duration_ms"),
         ("mx", "max", "max_duration_ms")],
        num_buckets=16)
    return rolled


def q_log_templates(sf_dir: str):
    """Log-template mining (Drain-lite) over the raw transcript stream:
    mask quoted strings / hex ids / numbers, then per template report line
    count, distinct conversations and the smallest raw example — the
    log-clustering view an SRE uses to read an unfamiliar firehose. The
    exchange moves one (template, conv) partial row per batch, never raw
    lines; hinted by the transcripts row count (same upper-bound argument
    as conv_examples)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.parse import mine_log_templates

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["conv_id", "text"])
    with input_rows_hint(n_turns):
        return mine_log_templates(ds, k=LOG_TEMPLATE_K)


LOG_TEMPLATE_K = 50


def q_retry_storms(sf_dir: str):
    """Retry-storm episodes: maximal runs of >=2 consecutive failed calls to
    the same tool within a conversation (consecutive in the tool-call
    subsequence). Rows narrow to 4 columns pre-shuffle; islands are mined
    per conv-hash bucket with a boundary mask + reduceat."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import retry_storms

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = _parsed(sf_dir)

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        return t.select(["conv_id", "turn_idx", "tool_name", "tool_exit"])

    ds = ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    with input_rows_hint(n_turns):
        return retry_storms(ds)


def q_tool_latency_quantiles(sf_dir: str):
    """Exact per-tool latency percentiles (p50/p95/p99 ms): rows collapse
    to (tool, duration) -> count partials per batch, so the exchange is
    bounded by distinct ms values per tool, never call volume."""
    from .stages.window import group_quantiles

    ds = _parsed(sf_dir)

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        return t.select(["tool_name", "duration_ms"])

    ds = ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    return group_quantiles(ds)


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
    ds = read_parquet(
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
    the reference's static-map enrichment pattern, otel_util.rs:44-58). Uses
    the fused-task broadcast_join — a fixed actor pool here would break
    read->join->partial fusion and force an object-store hop (and triggers a
    Ray constructor-arg restart warning)."""
    from .stages.join import broadcast_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    side = pa.table(
        {
            "c_custkey": cust.column("c_custkey").combine_chunks(),
            "n_name": pa.array([nk[v] for v in cust.column("c_nationkey").to_pylist()]),
        }
    )
    ds = read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    ds = broadcast_join(ds, side, left_on="o_custkey", right_on="c_custkey",
                        take_cols=["n_name"])
    ds = ds.map_batches(
        lambda t: pa.table({"n_name": t.column("n_name"),
                            "total_cents": _cents_arr(t.column("o_totalprice"))}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return two_phase_aggregate(
        ds, ["n_name"], [("total_cents", "sum", "sum_total_cents"), ("total_cents", "count", "n_orders")]
    )


@_hinted("events")
def q_events_minute(sf_dir: str):
    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

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


@_hinted("events")
def q_top_users(sf_dir: str):
    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
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

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
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
    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

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
    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

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


def _query_vec(sf_dir: str) -> np.ndarray:
    emb0 = pq.read_table(f"{sf_dir}/embeddings.parquet").filter(pc.equal(pc.field("vec_id"), 0))
    return np.asarray(emb0.column("embedding").to_pylist()[0], dtype=np.float64)


def q_sim_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k vs a broadcast query vector (exact ANN
    baseline): zero-copy (n,d) matrix per batch, GEMM, per-batch partial
    top-k, tiny final sort. Returns vec_ids only (float-tie-safe)."""
    from .stages.similarity import brute_force_topk

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk(ds, _query_vec(sf_dir), k).select_columns(["vec_id"])


@_hinted("embeddings")
def q_embedding_outliers(sf_dir: str):
    """Per-class embedding outliers: top-20 vectors by division-free
    exact-int squared distance to their own label's centroid (dist2 =
    sum((n*xi - sum_i)^2) with xi = floor(x*1e3)). Two-phase label stats,
    one broadcast, partial top-k per batch."""
    from .stages.similarity import embedding_outliers

    ds = read_parquet(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    return embedding_outliers(ds, k=20)


@_hinted("embeddings")
def q_hard_negatives(sf_dir: str, k: int = 10):
    """Hard-negative mining: top-k most-cosine-similar vectors whose LABEL
    differs from the query vector's — the contrastive-training sampler.
    Same streaming GEMM + partial top-k as sim_topk with a fused label
    filter; vec_ids only (float-tie-safe)."""
    from .stages.similarity import brute_force_topk

    emb0 = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         filters=[("vec_id", "=", 0)])
    qv = np.asarray(emb0.column("embedding").to_pylist()[0], dtype=np.float64)
    qlabel = emb0.column("label").to_pylist()[0]

    ds = read_parquet(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    neg = ds.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("label"), qlabel)).drop_columns(["label"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return brute_force_topk(neg, qv, k).select_columns(["vec_id"])


@_hinted("embeddings")
def q_embedding_quantize(sf_dir: str):
    """Global per-dim scalar quantization of the embedding table to uint8
    codes (exploded rows)."""
    from .stages.similarity import quantize_embeddings

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return quantize_embeddings(ds)


@_hinted("embeddings")
def q_pq_codes(sf_dir: str):
    """Product-quantization codes (8 sub-spaces x 8 deterministic codebook
    entries) over the integer scalar-quantized vectors — all-int64 squared-L2
    argmin, exactly SQL-verifiable."""
    from .stages.similarity import pq_codes

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return pq_codes(ds, m=8, k=8)


@_hinted("embeddings")
def q_pq_search(sf_dir: str):
    """PQ asymmetric-distance top-10 for the vec_id=0 query — the complete
    quantized-ANN search path (codes + integer ADC tables), bit-exact."""
    from .stages.similarity import pq_search

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return pq_search(ds, _query_vec(sf_dir), k_top=10, m=8, k=8)


def q_sim_topk_lsh(sf_dir: str, k: int = 10):
    """Approximate top-k: random-hyperplane LSH bucket probing + exact cosine
    on candidates (the scale path). Runs over the PLANTED fixture — the
    corpus plus verified-retrievable near-neighbors of the query vector —
    so the approximate result provably equals the exact brute-force top-k
    and carries a full DuckDB oracle (see stages/planted.py; recall on the
    raw organic corpus stays covered by tests/test_similarity.py)."""
    from .stages.planted import ensure_planted_topk
    from .stages.similarity import lsh_topk

    path = ensure_planted_topk(sf_dir)
    ds = read_parquet(path, columns=["vec_id", "embedding"])
    return lsh_topk(ds, _query_vec(sf_dir), k).select_columns(["vec_id"])


# ---------------------------------------------------------------------------
# dedup / text-analysis / multimodal / window / join queries
# ---------------------------------------------------------------------------


def _doc_buckets(sf_dir: str) -> int:
    """Shuffle fan-out sized to the documents table (parquet metadata row
    count — no scan). Grows with the corpus; collapses fixed per-partition
    shuffle overhead at small scale."""
    import pyarrow.parquet as pq

    from .stages.aggregate import auto_buckets

    return auto_buckets(pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows)



def _docs_hint(sf_dir: str):
    """Parquet-metadata row-count hint scoped over plan construction
    (aggregate.input_rows_hint): at small scale the exchanges built inside
    collapse to single-task coalesces (sort launch latency dominates
    there); at corpus scale the hint exceeds the threshold and plans are
    unchanged. Metadata only — never a count() execution."""
    import pyarrow.parquet as pq

    from .stages.aggregate import input_rows_hint

    return input_rows_hint(
        pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows)


KMEANS_K = 8


@_hinted("embeddings")
def q_embedding_kmeans_assign(sf_dir: str):
    """Embedding cluster ASSIGNMENT (the per-vector step of SemDeDup-style
    k-means curation): centroids = the KMEANS_K lowest-id vectors
    (deterministic), every vector maps to its max-cosine centroid in one
    broadcast GEMM pass. The iterative fit (kmeans_fit) is pytest-verified;
    the assignment kernel is the SQL-checkable projection."""
    from .stages.similarity import kmeans_assign

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = ds.sort("vec_id").limit(KMEANS_K).to_pandas()
    centroids = np.stack(first["embedding"].to_numpy()).astype(np.float64)
    return kmeans_assign(ds, centroids)


@_hinted("embeddings")
def q_semdedup(sf_dir: str):
    """SemDeDup end-to-end: deterministic centroids (lowest-id vectors) ->
    cluster assignment -> within-cluster cosine >= 0.95 drops the higher id
    -> kept vec_ids. The cheap restatement of embedding dedup: pairwise
    work is bounded per cluster, never O(n^2) over the corpus."""
    from .stages.similarity import semdedup

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = ds.sort("vec_id").limit(KMEANS_K).to_pandas()
    centroids = np.stack(first["embedding"].to_numpy()).astype(np.float64)
    return semdedup(ds, centroids, tau=0.95)


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs with distributed exact-Jaccard verify."""
    from .stages.dedup import minhash_lsh_neardup

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    with _docs_hint(sf_dir):
        return minhash_lsh_neardup(ds, threshold=0.5, num_buckets=_doc_buckets(sf_dir))


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs (Hamming <= 3; full recall by 4-band pigeonhole)."""
    from .stages.dedup import simhash_neardup

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    with _docs_hint(sf_dir):
        return simhash_neardup(ds, max_hamming=3, num_buckets=_doc_buckets(sf_dir))


@_hinted("documents")
def q_token_jaccard(sf_dir: str):
    """Exact token-set Jaccard on the deterministic (2i, 2i+1) pairing."""
    from .stages.dedup import token_jaccard_pairs

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_jaccard_pairs(ds)


NEARDUP_TAU = 0.45


@_hinted("embeddings")
def q_embedding_neardup(sf_dir: str):
    """All embedding pairs with cosine >= tau (exact broadcast baseline);
    pairs only — the float similarity stays out of the hash compare."""
    from .stages.dedup import embedding_neardup_exact

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = embedding_neardup_exact(ds, tau=NEARDUP_TAU)
    return pairs.select_columns(["vec_a", "vec_b"])


@_hinted("embeddings")
def q_embedding_neardup_lsh(sf_dir: str):
    """LSH-bucketed near-dup pairs (scale path). Runs over the PLANTED
    fixture — the corpus plus exact-2x-scaled clones whose band signatures
    are bit-identical to their sources, at a tau verified above every
    organic pairwise cosine — so banded-LSH recall on the planted pairs is
    exactly 1 and the brute-force DuckDB threshold join is a full oracle
    (organic near-threshold recall stays covered by tests)."""
    from .stages.dedup import embedding_neardup_lsh
    from .stages.planted import PLANTED_NEARDUP_TAU, ensure_planted_neardup

    path = ensure_planted_neardup(sf_dir)
    ds = read_parquet(path, columns=["vec_id", "embedding"])
    return embedding_neardup_lsh(
        ds, tau=PLANTED_NEARDUP_TAU).select_columns(["vec_a", "vec_b"])


def q_lang_id(sf_dir: str):
    from .stages.textstats import lang_id

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lang_id(ds)


def q_token_count_bpe(sf_dir: str):
    from .stages.textstats import token_count_bpe

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_count_bpe(ds)


def q_doc_fingerprint(sf_dir: str):
    """Winnowing document fingerprints (rolling-hash k-grams, window mins)."""
    from .stages.textstats import doc_fingerprint

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return doc_fingerprint(ds)


def q_quality_full(sf_dir: str):
    from .stages.textstats import quality_score

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return quality_score(ds)


def q_mm_features(sf_dir: str):
    """Multimodal decode -> byte-histogram features (actor-pool stages over
    binary payload columns; REAL stdlib PNG/WAV codecs for image/audio,
    synthetic FVID for video). The full feature pipeline runs; the
    oracle-checked projection compares the recomputed mean_byte against the
    generator's metadata column — which now requires a correct zlib inflate
    + un-filter for every PNG row (the 16-bin histogram list layout is
    pytest-verified in tests/test_multimodal.py — float-list columns don't
    survive the driver's value-hash canonicalization)."""
    from .generator import sf_from_dir
    from .stages.multimodal import ensure_media, media_pipeline

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = media_pipeline(media_dir)
    return ds.map_batches(
        lambda t: t.select(["media_id", "kind", "mean_byte"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_doc_sample(sf_dir: str):
    """Deterministic hash-based sampling — the reproducible sampling method
    that scales (no RNG state, no coordination: membership is a pure
    function of content). Keeps docs whose md5(text) starts with '0'|'1'
    (expected 1/8 of the corpus), preserving doc_id + lang for downstream
    stratification checks."""
    from .stages.enrich import _hash_values

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def f(t: pa.Table) -> pa.Table:
        h = _hash_values(t.column("text"), "md5")
        keep = pc.is_in(pc.utf8_slice_codeunits(h, 0, 1), value_set=pa.array(["0", "1"]))
        return t.filter(keep).select(["doc_id", "lang"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_mm_meta(sf_dir: str):
    """Multimodal decode correctness gate: the actor-pool decoder's header
    parse (kind/width/height/n_bytes from the binary payload) must equal the
    generator's metadata columns — SQL-verifiable because both live in the
    same media parquet."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, ensure_media

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir)
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)
    return ds.map_batches(
        lambda t: t.select(["media_id", "kind", "width", "height", "nframes",
                            "channels", "n_bytes"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_mm_decode(sf_dir: str):
    """Codec correctness gate over the MIXED corpus: decode every payload
    (PNG via stdlib zlib inflate + un-filter, WAV via RIFF chunk walk, FVID
    header parse) and emit exact-integer byte stats of the decoded body.
    The oracle replays the generator's pre-encode body_hex — any decode
    divergence (filter math, chunk offsets, RIFF padding) breaks equality."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, ensure_media

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)

    def stats(t: pa.Table) -> pa.Table:
        bodies = t.column("body").to_pylist()
        sums, firsts, lasts = [], [], []
        for b in bodies:
            arr = np.frombuffer(b, np.uint8)
            sums.append(int(arr.sum(dtype=np.int64)))
            firsts.append(int(arr[0]))
            lasts.append(int(arr[-1]))
        return pa.table({
            "media_id": t.column("media_id"),
            "kind": t.column("kind"),
            "n_bytes": t.column("n_bytes"),
            "byte_sum": pa.array(sums, pa.int64()),
            "first_byte": pa.array(firsts, pa.int64()),
            "last_byte": pa.array(lasts, pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def q_mm_jpeg_decode(sf_dir: str):
    """REAL baseline JPEG decode (ITU T.81: marker walk, Huffman entropy
    decode, DC prediction, zigzag, dequant, shared IDCT kernel) over a
    deterministic JPEG corpus cycling gray / 4:4:4 / 4:2:0 / 4:2:2 /
    restart-interval variants — exact-integer byte stats of the decoded
    pixels. The oracle replays the generator's ground-truth body_hex, so
    any divergence in the lossless entropy layer or the documented IDCT
    arithmetic breaks equality (same protocol as the PNG/WAV oracles)."""
    from .generator import sf_from_dir
    from .stages.jpeg import ensure_jpeg_media, jpeg_decode_stage

    jdir = ensure_jpeg_media(sf_from_dir(sf_dir))
    ds = read_parquet(jdir, columns=["media_id", "payload"])
    ds = jpeg_decode_stage(ds)
    return ds.map_batches(lambda t: t.drop_columns(["body"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def q_mm_frames(sf_dir: str):
    """Video frame sampling fan-out (every 4th frame)."""
    from .generator import sf_from_dir
    from .stages.multimodal import ensure_media, frame_sample_pipeline

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = frame_sample_pipeline(media_dir, every=4)
    return ds.select_columns(["media_id", "frame_idx"])


def q_mm_loudness(sf_dir: str):
    """Per-frame audio energy (VAD/silence primitive) over REAL decoded
    payloads: 64-sample frames, exact-int sum((s-128)^2) — byte-level
    hex-replay oracle on the decode."""
    from .generator import sf_from_dir
    from .stages.multimodal import (MediaDecoder, audio_frame_energy,
                                    ensure_media)

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    return ds.map_batches(audio_frame_energy, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


def q_mm_resample(sf_dir: str):
    """Nearest-neighbor 512-sample audio resample over decoded payloads —
    the 1-D analogue of mm_resize, same byte-exact hex-replay oracle."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, ensure_media, resample_audio

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)
    ds = ds.map_batches(resample_audio, batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)
    return ds.map_batches(
        lambda t: t.drop_columns(["resampled"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_mm_motion(sf_dir: str):
    """Frame-differencing motion energy per video (scene-cut primitive):
    total and peak absolute-difference between consecutive frames, plus the
    peak pair index — byte-exact hex-replay oracle."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, ensure_media, motion_energy

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)
    return ds.map_batches(motion_energy, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


@_hinted("events")
def q_slo_burn(sf_dir: str):
    """Multi-window SLO burn-rate alerting (the SRE error-budget rule):
    per-tool 5-minute vs 1-hour error ratios, burn flag when the short
    window exceeds 2x the long — rate comparison done by integer
    cross-multiplication so the flag is exact on both engines. Pre-
    aggregation means the hour pass reads 5-minute partials, never rows."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import bucket_hash_join

    ds = _parsed(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        return pa.table({
            "tool_name": t.column("tool_name"),
            "w5": pc.floor_temporal(t.column("ts"), multiple=5, unit="minute"),
            "err": pc.cast(pc.not_equal(pc.fill_null(t.column("tool_exit"), 0), 0),
                           pa.int64()),
            "tot": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
        })

    per5 = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["tool_name", "w5"], [("err", "sum", "err5"), ("tot", "sum", "tot5")],
        num_buckets=16).materialize()

    def key60(t: pa.Table) -> pa.Table:
        w60 = pc.floor_temporal(t.column("w5"), unit="hour")
        k = pc.binary_join_element_wise(
            t.column("tool_name"), pc.cast(w60, pa.string()), "#")
        return t.append_column("k", k)

    with_k = per5.map_batches(key60, batch_format="pyarrow", zero_copy_batch=True)
    per60 = two_phase_aggregate(
        with_k.map_batches(lambda t: t.select(["k", "err5", "tot5"]),
                           batch_format="pyarrow", zero_copy_batch=True),
        ["k"], [("err5", "sum", "err60"), ("tot5", "sum", "tot60")],
        num_buckets=8)
    joined = bucket_hash_join(with_k, per60, on="k", num_buckets=16)

    def flag(t: pa.Table) -> pa.Table:
        burn = pc.greater(pc.multiply(t.column("err5"), t.column("tot60")),
                          pc.multiply(pc.multiply(t.column("err60"), pa.scalar(2)),
                                      t.column("tot5")))
        return pa.table({"tool_name": t.column("tool_name"),
                         "w5": t.column("w5"),
                         "err5": t.column("err5"), "tot5": t.column("tot5"),
                         "err60": t.column("err60"), "tot60": t.column("tot60"),
                         "burn": burn})

    return joined.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def q_mm_resize(sf_dir: str):
    """Nearest-neighbor 32x32 image resize over the decoded payloads: the
    resize ARITHMETIC is oracle-checked — DuckDB replays the floor index
    map byte-for-byte from the original blob (hex-string indexing)."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, ensure_media, resize_images

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)
    ds = ds.map_batches(resize_images, batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)
    return ds.map_batches(
        lambda t: t.drop_columns(["resized"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_mm_dhash(sf_dir: str):
    """Perceptual dHash fingerprints over the decoded image payloads — the
    image near-dup signature op. Map-only (decode fuses with the hash); the
    hash ARITHMETIC (integer luma, 8x9 floor-grid shrink, 64 comparison
    bits) is replayed byte-for-byte by the DuckDB oracle from the original
    decoded blob."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, dhash_images, ensure_media

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True)
    return ds.map_batches(dhash_images, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


@_hinted("events")
def q_sessionize(sf_dir: str):
    from .stages.window import sessionize

    ds = read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value", "event_id"])
    return sessionize(ds, gap_minutes=30.0)


RATE_SPIKE_WINDOW = 16
RATE_SPIKE_NUM = 3
RATE_SPIKE_DEN = 2


@_hinted("events")
def q_rate_spikes(sf_dir: str):
    """Alerting: flag (event_type, minute) cells whose count exceeds 1.5x
    the trailing-16-observed-minute average — division-free integer rule, the
    monitoring-pipeline spike detector. Raw rows collapse to per-batch
    minute partials before the one bucketed exchange."""
    from .stages.window import rate_spikes

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    return rate_spikes(ds, window=RATE_SPIKE_WINDOW,
                       factor_num=RATE_SPIKE_NUM, factor_den=RATE_SPIKE_DEN)


@_hinted("events")
def q_top_events_per_user(sf_dir: str):
    from .stages.window import topk_per_group

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value", "event_id"])
    return topk_per_group(ds, key="user_id", order_col="value", id_col="event_id", k=3)


@_hinted("events")
def q_asof_purchase_click(sf_dir: str):
    """For each purchase, the user's most recent click at or before it."""
    from .stages.window import asof_join_backward

    ds = read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type", "event_id", "value"])
    left = ds.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    right = ds.filter(expr="event_type == 'click'").drop_columns(["event_type"])
    out = asof_join_backward(left, right, key="user_id", ts_col="ts",
                             left_cols=["event_id", "value"], right_cols=["event_id", "value"])

    def fix_types(t: pa.Table) -> pa.Table:
        for c in ("event_id_right",):
            if c in t.column_names:
                t = t.set_column(t.column_names.index(c), c, pc.cast(t.column(c), pa.int64()))
        return t

    return out.map_batches(fix_types, batch_format="pyarrow")


@_hinted("events", fanout=5)
def q_events_hopping(sf_dir: str):
    """Hopping-window aggregate: 5-min windows sliding by 1 min over events
    (each event fans out to the 5 windows containing it — fanout=5 keeps the
    exchange-rows hint honest)."""
    from .stages.window import hopping_window_aggregate

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    return hopping_window_aggregate(ds, window_minutes=5, hop_minutes=1)


@_hinted("events")
def q_range_join(sf_dir: str):
    """Time-range join: every error within ±1 hour of a purchase by the same
    user (bucketed time-grid co-partitioning, no all-pairs)."""
    from .stages.window import range_join_time

    ds = read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type", "event_id"])
    purchases = ds.filter(expr="event_type == 'purchase'")
    errors = ds.filter(expr="event_type == 'error'")
    return range_join_time(purchases, errors, key="user_id",
                           before_minutes=60.0, after_minutes=60.0)


def q_customers_no_urgent(sf_dir: str):
    """Relational anti-join: customers with NO urgent-priority order —
    bucketed NOT IN (the right side collapses to distinct keys per batch
    before the shuffle; no broadcast, no full collect)."""
    from .stages.join import bucket_anti_join

    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_name"])
    urgent = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_orderpriority"])
    urgent = urgent.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                    "1-URGENT")).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return bucket_anti_join(cust, urgent, on="c_custkey",
                            right_on="o_custkey", num_buckets=16)


def q_order_revenue_join(sf_dir: str):
    """Big-big hash-shuffle join: lineitem ⋈ orders on orderkey, revenue per
    order priority (bucket co-partitioned join — 2x faster than
    Dataset.join for skinny fact⋈fact, see BASELINE.md)."""
    from .stages.join import bucket_hash_join

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "rev_cents": _cents_arr(rev)})

    li = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    orders = read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    joined = bucket_hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_buckets=64)
    return two_phase_aggregate(
        joined, ["o_orderpriority"],
        [("rev_cents", "sum", "revenue_cents"), ("rev_cents", "count", "n_items")],
    )


def q_region_revenue(sf_dir: str):
    """TPC-H Q5-shaped composed join chain: lineitem ⋈ orders (bucket
    co-partitioned big-big) with customer→nation→region broadcast on the
    orders side; revenue per nation within one region. Demonstrates the
    design rule: broadcast every side that fits, shuffle only fact⋈fact."""
    from .stages.join import broadcast_join, bucket_hash_join

    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    rk = dict(zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()))
    nat = nation.append_column("r_name", pa.array(
        [rk[v] for v in nation.column("n_regionkey").to_pylist()]
    ))
    nat = nat.filter(pc.equal(nat.column("r_name"), "ASIA"))
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    orders = read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust, left_on="o_custkey", right_on="c_custkey",
                            take_cols=["c_nationkey"])
    orders = broadcast_join(orders, nat, left_on="c_nationkey", right_on="n_nationkey",
                            take_cols=["n_name"])  # inner: drops non-ASIA orders

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "rev_cents": _cents_arr(rev)})

    li = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    joined = bucket_hash_join(li, orders.select_columns(["o_orderkey", "n_name"]),
                              on="l_orderkey", right_on="o_orderkey", num_buckets=64)
    return two_phase_aggregate(
        joined, ["n_name"],
        [("rev_cents", "sum", "revenue_cents"), ("rev_cents", "count", "n_items")],
    )


def q_sim_topk_ivf(sf_dir: str, k: int = 10):
    """IVF ANN variant: seeded sampled centroids, nearest-centroid
    assignment, probe the closest n_probe lists only. Runs over the PLANTED
    fixture (planted rows verified to land in probed cells at build time),
    so the approximate result provably equals the exact top-k and carries a
    full DuckDB oracle; organic-corpus recall stays covered by tests."""
    from .stages.planted import ensure_planted_topk
    from .stages.similarity import ivf_topk

    path = ensure_planted_topk(sf_dir)
    ds = read_parquet(path, columns=["vec_id", "embedding"])
    return ivf_topk(ds, _query_vec(sf_dir), k=k, n_centroids=16,
                    n_probe=4).select_columns(["vec_id"])


def q_attrs_actions(sf_dir: str):
    """Attributes-processor action chain (upsert + hash + extract) applied to
    the transcript table (attributes_processor.py:312-378 semantics)."""
    from .stages.enrich import AttrAction, AttributesProcessor

    proc = AttributesProcessor(
        [
            AttrAction("upsert", key="env", value="prod"),
            AttrAction("hash", key="role", hash_function="sha256"),
            AttrAction("extract", from_attribute="text", pattern=r"^TOOL_CALL tool=(?P<xtool>\w+)"),
        ]
    )
    ds = _transcripts_ds(sf_dir)
    ds = ds.map_batches(proc, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "env", "role", "xtool"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_redaction(sf_dir: str):
    """Redaction processor: mask private-IP values in remote_addr + per-row
    masked count (redaction_processor.py:159-269 semantics)."""
    from .stages.enrich import RedactionConfig, RedactionProcessor

    proc = RedactionProcessor(
        RedactionConfig(blocked_value_patterns=[r"^10\."], apply_to=["remote_addr"])
    )
    ds = _parsed(sf_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "nginx_access")).select(
            ["conv_id", "turn_idx", "remote_addr"]
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.map_batches(proc, batch_format="pyarrow", zero_copy_batch=True)


def q_parse_json(sf_dir: str):
    ds = _parsed(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "json")).select(
            ["conv_id", "turn_idx", "remote_addr", "request", "status", "body_bytes_sent",
             "time_local"]
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_parse_nginx_error(sf_dir: str):
    ds = _parsed(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "nginx_error")).select(
            ["conv_id", "turn_idx", "ng_level", "ng_pid", "ng_tid", "ng_cid", "ng_message",
             "severity_number"]
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_span_ids(sf_dir: str):
    """Deterministic trace/span id derivation for the traces sink (hex ids
    at every sink — clickhouse/transformer.rs:218-235): trace_id =
    md5(conv_id), span_id = md5(conv_id:turn_idx) prefix, hex-encoded with
    the vectorized nibble-LUT kernel."""
    from .functions.scalar import hex_encode, span_id_from, trace_id_from

    ds = _parsed(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        conv = t.column("conv_id").combine_chunks()
        key = pc.binary_join_element_wise(
            conv, pc.cast(t.column("turn_idx").combine_chunks(), pa.string()), ":"
        )
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": t.column("turn_idx"),
                "trace_id": hex_encode(trace_id_from(conv)),
                "span_id": hex_encode(span_id_from(key)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_file_source(sf_dir: str):
    """File-receiver path: raw .log files -> read_text -> vectorized parse ->
    severity histogram. Must equal the parquet path filtered to the same
    grammars (the per-turn text-equality invariant via a second source)."""
    from .sources.text_logs import ensure_log_files, parse_log_files

    ldir = ensure_log_files(ensure_transcripts(sf_dir))
    ds = parse_log_files(ldir)
    ds = ds.map_batches(
        lambda t: t.select(["event_type", "severity_number"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    agg = two_phase_aggregate(
        ds, ["event_type", "severity_number"], [("event_type", "count", "n")]
    )
    return _cast_final(agg, {"severity_number": pa.int32()})


def q_metrics_dim_filter(sf_dir: str):
    """Wildcard dimension filter over metric names (case-insensitive, `*`
    = 0+ chars, exclude wins — awsemf/dim_filter.rs:4-60 semantics).
    Vectorized via the shared wildcard_match kernel (one regex test per
    DISTINCT name, not per row)."""
    from .functions.scalar import wildcard_match

    def f(t: pa.Table) -> pa.Table:
        return t.filter(wildcard_match(t.column("name"), exclude=["km*", "json"]))

    ds = _cast_final(metrics_aggregate(_parsed(sf_dir)), {"ts_minute": pa.timestamp("us")})
    return ds.map_batches(f, batch_format="pyarrow")


HH_PHI = 1 / 200  # heavy-hitter threshold as a fraction of the token stream
HH_K = 512        # MG summary size; exactness needs phi >= 2/(k+1)


def q_heavy_hitters(sf_dir: str):
    """Misra-Gries heavy hitters over the transcript token stream: tokens
    with exact frequency >= ceil(N/200). Exact despite being sketch-based:
    phi = 1/200 >= 2/(k+1) guarantees every qualifying token survives the
    batch + bucket compressions, and the final pass recounts candidates
    exactly (stages/sketch.py)."""
    import math

    from .stages.sketch import _batch_token_counts, heavy_hitters

    ds = _transcripts_ds(sf_dir).map_batches(
        lambda t: t.select(["text"]), batch_format="pyarrow", zero_copy_batch=True
    )

    def count_tokens(t: pa.Table) -> pa.Table:
        _, counts = _batch_token_counts(t.column("text"))
        return pa.table({"n": pa.array([int(counts.sum())], pa.int64())})

    n_total = ds.map_batches(count_tokens, batch_format="pyarrow").sum("n")
    threshold = math.ceil(n_total * HH_PHI)
    return heavy_hitters(ds, text_col="text", k=HH_K, threshold=threshold)


def q_dedup_keep(sf_dir: str):
    """Near-dup removal output: the corpus minus every verified pair's higher
    doc_id (match-drops-newer policy over exact-Jaccard >= 0.5 pairs), via a
    distributed anti-join — no driver-side id set."""
    from .stages.dedup import minhash_dedup_keep

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    with _docs_hint(sf_dir):
        return minhash_dedup_keep(ds, threshold=0.5, keep_cols=["doc_id", "lang"],
                                  num_buckets=_doc_buckets(sf_dir))


def q_doc_repetition(sf_dir: str):
    """Gopher-style per-doc repetition signals (distinct-3gram deficit, top
    2-gram mass) — the n-gram repetition quality gates of a training-data
    curation pipeline."""
    from .stages.textstats import repetition_stats

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_stats(ds)


SAMPLE_STRATA = {"en": "8000", "de": "4000", "fr": "2000"}
SAMPLE_DEFAULT_THR = "1000"


@_hinted("documents")
def q_doc_sample_stratified(sf_dir: str):
    """Stratified deterministic sampling: per-language keep rates expressed
    as 4-hex md5-prefix thresholds (en 1/2, de 1/4, fr 1/8, others 1/16).
    Membership is a pure function of content + a broadcast rate table — no
    RNG state, reproducible across cluster sizes; hex-prefix < threshold is
    the numeric compare (same-length hex strings order lexicographically)."""
    from .stages.enrich import _hash_values, _lookup

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def f(t: pa.Table) -> pa.Table:
        h4 = pc.utf8_slice_codeunits(_hash_values(t.column("text"), "md5"), 0, 4)
        thr = pc.fill_null(_lookup(t.column("lang").combine_chunks(), SAMPLE_STRATA),
                           SAMPLE_DEFAULT_THR)
        return t.filter(pc.less(h4, thr)).select(["doc_id", "lang"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_clusters(sf_dir: str):
    """Transitive near-dup CLUSTERS from verified pairs: distributed
    connected components (min-label propagation over the pair graph), so a
    chain a~b~c collapses to one cluster even when (a,c) itself never
    verified — the semantics corpus dedup needs to keep exactly one
    representative per duplicate family. cluster_id = min doc_id reachable."""
    from .stages.dedup import connected_components, minhash_lsh_neardup

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    nb = _doc_buckets(sf_dir)
    with _docs_hint(sf_dir):
        return connected_components(
            minhash_lsh_neardup(ds, threshold=0.5, num_buckets=nb),
            num_buckets=nb)


def q_dedup_keep_clustered(sf_dir: str):
    """Cluster-aware near-dup removal: one representative (min doc_id) per
    transitive dup cluster survives — pairs -> connected components ->
    distributed anti-join of all non-representatives."""
    from .stages.dedup import minhash_dedup_keep_clustered

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    with _docs_hint(sf_dir):
        return minhash_dedup_keep_clustered(ds, threshold=0.5,
                                            keep_cols=["doc_id", "lang"],
                                            num_buckets=_doc_buckets(sf_dir))


def q_span_dedup(sf_dir: str):
    """C4/RefinedWeb-style exact span dedup: 10-token windows, each distinct
    span survives only at its first global (doc_id, span_idx) occurrence,
    docs reassembled from surviving spans (docs with none vanish). Two
    bucketed shuffles — by span text, then by doc id."""
    from .stages.dedup import span_dedup

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    with _docs_hint(sf_dir):
        return span_dedup(ds, width=10, num_buckets=_doc_buckets(sf_dir))


def q_span_boilerplate(sf_dir: str):
    """Cross-doc boilerplate removal (CCNet/RefinedWeb frequency rule over
    10-token spans): spans present in >= 2 distinct docs drop EVERYWHERE
    (span_dedup keeps the first; this keeps none). Same two bucketed
    shuffles; the per-bucket kernel is a lexsort + distinct-doc bincount."""
    from .stages.dedup import span_boilerplate

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    with _docs_hint(sf_dir):
        return span_boilerplate(ds, width=10, min_docs=2,
                                num_buckets=_doc_buckets(sf_dir))


def q_span_dedup_indoc(sf_dir: str):
    """Dolma-style IN-DOCUMENT repetition removal over 2-token spans: a
    span repeating within one document keeps only its first occurrence
    (other documents' copies untouched). Map-only — the uniqueness unit is
    a single doc, so there is NO shuffle at any corpus size."""
    from .stages.dedup import span_dedup_indoc

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return span_dedup_indoc(ds, width=2)


@_hinted("documents")
def q_mix_balance(sf_dir: str):
    """Source re-mixing to an equal token share (Gopher/DoReMi-style static
    mix): per-source token totals via two-phase aggregate, integer-exact
    md5-prefix down-sampling thresholds broadcast into a fused filter."""
    from .stages.mix import mix_balance

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "source", "text"])
    return mix_balance(ds, num_buckets=_doc_buckets(sf_dir))


def q_mix_temperature(sf_dir: str):
    """Temperature-based source re-weighting (q ∝ p^tau, tau=0.7 — the
    XLM-style flattening exponent): one two-phase token aggregate ->
    per-source weight table (natural share, p^tau weight, target share,
    boost). Integer-exact downstream of ONE floor-quantized exp/ln."""
    from .stages.mix import mix_temperature

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])
    return mix_temperature(ds, tau=0.7, num_buckets=_doc_buckets(sf_dir))


@_hinted("documents")
def q_shard_assign(sf_dir: str):
    """Deterministic global shuffle + shard for training export: shard =
    md5-prefix mod 16, pos = rank in shard by (md5, doc_id). Reproducible
    across runs and cluster sizes — a pure content function."""
    from .stages.mix import shard_assign

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return shard_assign(ds, n_shards=16, num_buckets=_doc_buckets(sf_dir))


def q_distinct_kmv(sf_dir: str):
    """KMV distinct-count sketch (k smallest hashes) over 3-token shingles:
    deterministic under the fixed FNV/rolling-poly hash, so the estimate is
    bit-exact against SQL. Mergeable; reduce input bounded at batches*k."""
    from .stages.sketch import distinct_count_kmv

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return distinct_count_kmv(ds, k=256)


def q_pii_scrub(sf_dir: str):
    """PII substring scrub over turn text: per-pattern match counts plus the
    masked body (emails/IPv4s/phone-shaped runs -> typed placeholder tokens).
    One fused task stage, RE2 on both sides so the oracle is bit-exact."""
    from .stages.pii import pii_scrub_stage

    ds = read_parquet(ensure_transcripts(sf_dir), columns=["conv_id", "turn_idx", "text"])
    return pii_scrub_stage(ds, keep_cols=["conv_id", "turn_idx", "text"])


@_hinted("documents")
def q_norm_dedup(sf_dir: str):
    """Normalization-aware exact dedup over turn text (lowercase +
    whitespace collapse + trim, then content-hash groups): one row per
    normalized-content group with the lexicographic-min (conv_id, turn_idx)
    keep key and the duplicate count."""
    from .stages.textstats import normalized_dedup

    ds = read_parquet(ensure_transcripts(sf_dir),
                      columns=["conv_id", "turn_idx", "text"])
    return normalized_dedup(ds, key_cols=["conv_id", "turn_idx"])


def q_bigram_logprob(sf_dir: str):
    """Bigram-LM doc scoring (add-one-smoothed conditionals, integer
    micro-nats) — one rung above unigram_logprob on the LM quality ladder."""
    from .stages.textstats import bigram_logprob

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bigram_logprob(ds)


def q_kn_bigram_logprob(sf_dir: str):
    """Interpolated Kneser-Ney bigram doc scoring (absolute discount 0.75,
    continuation-probability backoff) in integer micro-nats — the top rung
    of the LM-quality ladder above unigram/bigram scoring."""
    from .stages.textstats import kn_bigram_logprob

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return kn_bigram_logprob(ds)


@_hinted("documents")
def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (hashed unigram+bigram LM ratio, target =
    lang='en' docs) in integer micro-nats — the importance-resampling data
    selector. Bounded 1024-bucket feature space; see
    stages/textstats.py::dsir_weights."""
    from .stages.textstats import dsir_weights

    base = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "text"])
    full = base.map_batches(lambda t: t.drop_columns(["lang"]),
                            batch_format="pyarrow", zero_copy_batch=True)
    target = base.map_batches(
        lambda t: t.filter(pc.equal(t.column("lang"), "en")).select(["text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return dsir_weights(full, target)


@_hinted("documents")
def q_dsir_select(sf_dir: str):
    """Importance RESAMPLING completed: exact global top-1/4 of documents by
    DSIR weight (ties by doc_id), each with its exact global rank — the
    distributed-rank primitive (range-binned partition + driver prefix-sum
    over <= 4096 bin counts, no single-task global sort)."""
    from .stages.window import global_topfrac

    w = q_dsir_weights(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "w_unat"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return global_topfrac(w, value_col="w_unat", id_col="doc_id", num=1, den=4)


def q_corpus_pack(sf_dir: str):
    """THE composed LLM-corpus pipeline end-to-end: quality gate + language
    allowlist + exact dedup (corpus_curation) -> distributed semi-join of the
    kept ids back onto the text -> packed-sequence export. Three shuffles
    total (dedup hash, id co-partition, seq partials), nothing driver-side."""
    from .stages.dedup import semi_join_ids
    from .stages.pack import pack_sequences

    with _docs_hint(sf_dir):
        kept_ids = q_corpus_curation(sf_dir).map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow", zero_copy_batch=True)
        docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        curated = semi_join_ids(docs, kept_ids)
        return pack_sequences(curated, seq_len=1024)


def q_global_quantiles(sf_dir: str):
    """Exact GLOBAL p50/p95/p99 of tool-call durations by iterative range
    bisection — no global sort, driver holds only bin counts (the scale
    counterpart of duration_quantiles' per-group sorts)."""
    from .stages.window import global_quantiles

    ds = _parsed(sf_dir)
    tools = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "tool_call"))
                   .select(["duration_ms"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return global_quantiles(tools, value_col="duration_ms", qs=(0.5, 0.95, 0.99))


def q_table_profile(sf_dir: str):
    """Exact table profile of the events table (rows / nulls / distincts /
    int ranges per column) — the 'what is in this corpus' operator."""
    from .stages.profile import table_profile

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "event_type", "props"])
    return table_profile(ds, ["event_id", "user_id", "event_type", "props"])


def q_token_budget(sf_dir: str):
    """Exact token-budget subsample (deterministic md5-order prefix until
    8192 tokens) — reproducible 'give me N tokens uniformly' selection."""
    from .stages.mix import token_budget_sample

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_budget_sample(ds, budget=8192)


@_hinted("documents")
def q_pack_export(sf_dir: str):
    """Packed-stream materialization: one row per 2048-token training
    sequence with exact token/doc counts and an int64 token-id checksum
    (FNV-hash vocab) — the final pretraining-data export step on top of
    seq_pack's distributed prefix-sum."""
    from .stages.pack import pack_sequences

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_sequences(ds, seq_len=2048)


def q_bpe_pairs(sf_dir: str):
    """Corpus-wide byte-pair statistics (the BPE trainer's inner loop): one
    fused combiner over the bounded 2^16 pair keyspace, tiny shuffle,
    deterministic (n desc, b1, b2) top-k."""
    from .stages.bpe import bpe_pair_counts

    ds = read_parquet(ensure_transcripts(sf_dir), columns=["text"])
    return bpe_pair_counts(ds, top_k=50)


def q_bpe_train(sf_dir: str):
    """Iterative byte-level BPE training (8 merge rounds) over the documents
    corpus; result is the learned merge table. Oracled bit-exactly by a
    generated 8-round chained-CTE DuckDB program applying the same greedy
    run-parity merge rule."""
    from .stages.bpe import bpe_train

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    with _docs_hint(sf_dir):
        return bpe_train(ds, num_merges=8)


def q_bpe_encode(sf_dir: str):
    """Tokenizer SERVING pass: train the 8-merge BPE table, then encode the
    corpus with it — per-doc token count plus order-sensitive exact-integer
    sequence checksums. The oracle replays the train rounds in SQL and joins
    the final word->symbols table back to each doc's word positions."""
    from .stages.bpe import bpe_encode, bpe_train

    with _docs_hint(sf_dir):
        train = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        merges = [(r["b1"], r["b2"], r["new_id"])
                  for r in bpe_train(train, num_merges=8).take_all()]
        docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return bpe_encode(docs, merges)


def q_turn_transitions(sf_dir: str):
    """Conversation state-machine statistics: global (from_role, to_role)
    transition counts over turn order within each conversation — who speaks
    after whom, the Markov structure of the transcript corpus."""
    from .stages.window import transition_counts

    ds = read_parquet(ensure_transcripts(sf_dir),
                      columns=["conv_id", "turn_idx", "role"])
    return transition_counts(ds, key="conv_id", order_col="turn_idx",
                             state_col="role")


DOC_CHUNK_SIZE = 64
DOC_CHUNK_STRIDE = 48


def q_doc_chunks(sf_dir: str):
    """RAG chunk export: sliding 64-token windows every 48 tokens per doc
    (overlap 16) with hashed-token checksums — the embedding-index input
    layout. Doc-local, shuffle-free."""
    from .stages.pack import doc_chunks

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return doc_chunks(ds, chunk_size=DOC_CHUNK_SIZE, stride=DOC_CHUNK_STRIDE)


@_hinted("orders")
def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER bucket join: every customer with its order count,
    zero-order customers included — the outer-join path of the big-big
    bucketed join (aggregate the fact side first so the join moves one row
    per key, then left-join the dimension side, coalescing misses to 0)."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import bucket_hash_join

    orders = read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    ones = orders.map_batches(
        lambda t: t.append_column("n_orders",
                                  pa.nulls(t.num_rows, pa.int64()).fill_null(1)),
        batch_format="pyarrow", zero_copy_batch=True)
    cnt = two_phase_aggregate(ones, ["o_custkey"], [("n_orders", "sum", "n_orders")],
                              num_buckets=16)
    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    return bucket_hash_join(cust, cnt, on="c_custkey", right_on="o_custkey",
                            how="left", fill={"n_orders": 0}, num_buckets=16)


@_hinted("events")
def q_rolling_value(sf_dir: str):
    """Per-user rolling 5-event value sum (cents) in (ts, event_id) order —
    the sliding-row-window aggregate of streaming analytics, vectorized
    across every key in a bucket."""
    from .stages.window import rolling_sum

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "value"])
    return rolling_sum(ds, key="user_id", order_cols=["ts", "event_id"],
                       value_col="value", window=5)


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware cluster dedup: per transitive near-dup cluster the
    member with the most tokens survives (tie -> lowest id) — keeps the
    fullest copy where min-id keep would favor truncated variants."""
    from .stages.dedup import minhash_dedup_keep_best

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang", "text"])
    with _docs_hint(sf_dir):
        return minhash_dedup_keep_best(ds, threshold=0.5,
                                       keep_cols=["doc_id", "lang"],
                                       num_buckets=_doc_buckets(sf_dir))


KMV_GROUP_K = 64


@_hinted("events")
def q_users_per_type_kmv(sf_dir: str):
    """Per-group KMV distinct sketch: estimated distinct users per event
    type from k=64 smallest id-permutation hashes — grouped mergeable
    sketches, bit-exact estimate under the fixed hash."""
    from .stages.sketch import grouped_kmv

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "user_id"])
    return grouped_kmv(ds, key="event_type", id_col="user_id", k=KMV_GROUP_K)


@_hinted("embeddings")
def q_embedding_covariance(sf_dir: str):
    """Distributed PCA input: exact-integer second-moment accumulation over
    the embedding corpus — per (i<=j) dim pair the Gram sum, per-dim sums
    and count, reduced two-phase over the dimension-bounded keyspace."""
    from .stages.similarity import embedding_covariance

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return embedding_covariance(ds)


@_hinted("events")
def q_users_per_type_hll(sf_dir: str):
    """Per-group HyperLogLog distinct users per event type — the grouped
    mergeable form of distinct_hll (constant registers/key), bit-exact
    oracle incl. per-group harmonic sums and estimates."""
    from .stages.sketch import grouped_hll

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "user_id"])
    return grouped_hll(ds, key="event_type", id_col="user_id")


@_hinted("documents")
def q_weighted_sample(sf_dir: str, k: int = 50):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis exponential keys, weight = n_chars): the 50 winners by
    hash-exponential key — the one-pass distributed weighted sampler."""
    from .stages.mix import weighted_sample

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "n_chars"])
    return weighted_sample(ds, k, weight_col="n_chars")


@_hinted("documents")
def q_attr_mi(sf_dir: str):
    """Exact mutual information between the documents' lang and source
    attributes (plug-in MI, nano-nat floor per joint cell -> order-free
    integer sum) — attribute-dependency profiling (PAPERS.md: MI across
    attributes, ICDE'24)."""
    from .stages.profile import attr_mi

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    return attr_mi(ds, x_col="lang", y_col="source")


@_hinted("documents")
def q_source_lm_score(sf_dir: str):
    """Per-source language-model quality — the domain-weighting signal
    (DoReMi-style per-domain loss, computed here with the exactly-verifiable
    unigram LM): per source, doc/token mass, total micro-nat log-prob and
    the mean log-prob per token as an exact FLOOR division (int math — the
    negative-floor-div convention both engines mirror)."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import bucket_hash_join
    from .stages.textstats import unigram_logprob

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "text"])
    scored = unigram_logprob(docs.map_batches(
        lambda t: t.select(["doc_id", "text"]),
        batch_format="pyarrow", zero_copy_batch=True))
    src = docs.map_batches(lambda t: t.select(["doc_id", "source"]),
                           batch_format="pyarrow", zero_copy_batch=True)
    joined = bucket_hash_join(scored, src, on="doc_id", num_buckets=16)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"source": t.column("source"),
                         "n_docs": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
                         "n_tokens": pc.cast(t.column("n_tokens"), pa.int64()),
                         "lp_sum_unat": t.column("lp_sum_unat")})

    agg = two_phase_aggregate(
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], [("n_docs", "sum", "n_docs"),
                     ("n_tokens", "sum", "n_tokens"),
                     ("lp_sum_unat", "sum", "lp_sum_unat")], num_buckets=8)

    def mean_lp(t: pa.Table) -> pa.Table:
        lp = t.column("lp_sum_unat").to_numpy(zero_copy_only=False)
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return t.append_column(
            "mean_lp_unat", pa.array(lp // np.maximum(nt, 1))) \
            .replace_schema_metadata(None)

    return agg.map_batches(mean_lp, batch_format="pyarrow", zero_copy_batch=True)


@_hinted("documents")
def q_inverted_index(sf_dir: str):
    """Inverted-index build (the retrieval-index construction op): one row
    per token with exact df and the ascending posting list, one token-keyed
    shuffle with vectorized per-bucket assembly."""
    from .stages.textstats import inverted_index

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return inverted_index(ds)


@_hinted("documents")
def q_corpus_report(sf_dir: str):
    """Per-source dataset card — the 'what went into this training run'
    summary a corpus release ships: docs, token/char mass, language mix and
    exact-duplicate groups per source, in one two-phase pass over per-batch
    partials (the dup-group count is a second vocab-bounded aggregate on
    (source, content-hash))."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.enrich import _hash_values
    from .stages.tokenize import split_tokens

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "source", "lang", "text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        _, _, n_tok = split_tokens(t.column("text"))
        return pa.table({
            "source": t.column("source"),
            "n_docs": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "n_tokens": pa.array(n_tok),
            "n_chars": pc.cast(t.column("n_chars"), pa.int64()),
            "n_en": pc.cast(pc.equal(t.column("lang"), "en"), pa.int64()),
        })

    base = two_phase_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("n_docs", "sum", "n_docs"), ("n_tokens", "sum", "n_tokens"),
         ("n_chars", "sum", "n_chars"), ("n_en", "sum", "n_en")])

    def hash_rows(t: pa.Table) -> pa.Table:
        return pa.table({"source": t.column("source"),
                         "h": _hash_values(t.column("text"), "md5")})

    hashes = ds.map_batches(hash_rows, batch_format="pyarrow",
                            zero_copy_batch=True)
    groups = two_phase_aggregate(hashes, ["source", "h"],
                                 [("h", "count", "n")])

    def per_src(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "dup": pc.cast(pc.greater(t.column("n"), 1), pa.int64()),
        })

    distincts = two_phase_aggregate(
        groups.map_batches(per_src, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], [("one", "sum", "n_distinct_texts"),
                     ("dup", "sum", "n_dup_groups")])
    from .stages.join import bucket_hash_join

    return bucket_hash_join(base, distincts, on="source", num_buckets=8)


@_hinted("documents")
def q_doc_quality_rank(sf_dir: str):
    """Exact global quality ranking of every document (classifier score
    desc, doc_id asc) via the range-binned distributed rank — the
    curriculum-ordering / quality-percentile primitive (num=den=1 keeps
    ALL rows; only bin counts ever reach the driver)."""
    from .stages.textstats import hashed_classifier
    from .stages.window import global_topfrac

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    scored = hashed_classifier(ds).map_batches(
        lambda t: t.select(["doc_id", "score"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return global_topfrac(scored, value_col="score", id_col="doc_id",
                          num=1, den=1)


@_hinted("documents")
def q_corpus_diff(sf_dir: str):
    """Snapshot diff between corpus versions (incremental-ingest primitive):
    every doc id classified added / removed / changed / unchanged against a
    deterministic v2 snapshot (drops, recrawl drift, new docs — see
    stages/mix.py::ensure_docs_v2). One tagged (id, md5, side) shuffle."""
    from .stages.mix import corpus_diff, ensure_docs_v2

    v1 = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    v2 = read_parquet(ensure_docs_v2(sf_dir), columns=["doc_id", "text"])
    return corpus_diff(v1, v2)


def q_dedup_rate_by_source(sf_dir: str):
    """Per-source duplication rollup over the union of the two corpus
    snapshots (unchanged docs appear twice — the real recrawl shape):
    (source, n_docs, n_unique, n_dup_docs). Only (source, md5) rows
    shuffle; the second exchange is one row per source."""
    from .stages.dedup import dedup_rate_by_source
    from .stages.mix import ensure_docs_v2

    v1 = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])
    v2 = read_parquet(ensure_docs_v2(sf_dir), columns=["source", "text"])
    return dedup_rate_by_source(v1.union(v2))


@_hinted("documents")
def q_vocab_kl(sf_dir: str):
    """Distribution drift: exact-integer KL divergence between the English
    and non-English documents' unigram distributions (add-one smoothed over
    the union vocab, nano-nat floor per term -> order-free integer sum)."""
    from .stages.textstats import vocab_kl

    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    p = docs.map_batches(lambda t: t.filter(pc.equal(t.column("lang"), "en"))
                         .select(["text"]),
                         batch_format="pyarrow", zero_copy_batch=True)
    q = docs.map_batches(lambda t: t.filter(pc.not_equal(t.column("lang"), "en"))
                         .select(["text"]),
                         batch_format="pyarrow", zero_copy_batch=True)
    return vocab_kl(p, q)


def q_distinct_hll(sf_dir: str):
    """HyperLogLog distinct users (4096 registers, splitmix64-mixed) — the
    industry-standard cardinality sketch with an exact-integer register
    core, fully DuckDB-oracled including the harmonic sum and the
    linear-counting small-range branch (stages/sketch.py::hll_distinct)."""
    from .stages.sketch import hll_distinct

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_distinct(ds)


def q_dup_cluster_sizes(sf_dir: str):
    """Duplicate-family size histogram over the minhash transitive clusters
    — dedup-run forensics: (cluster_size, n_clusters)."""
    from .stages.dedup import (connected_components, dup_cluster_sizes,
                               minhash_lsh_neardup)

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    nb = _doc_buckets(sf_dir)
    with _docs_hint(sf_dir):
        cc = connected_components(minhash_lsh_neardup(ds, threshold=0.5,
                                                      num_buckets=nb),
                                  num_buckets=nb)
        return dup_cluster_sizes(cc)


def q_source_overlap(sf_dir: str):
    """Cross-source contamination matrix: distinct normalized texts shared
    by each source pair (a < b) — inter-snapshot leakage forensics."""
    from .stages.dedup import source_overlap

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])
    return source_overlap(ds)


@_hinted("events")
def q_latest_with_tombstones(sf_dir: str):
    """CDC compaction with deletes: latest-wins per user, keys whose newest
    event is an 'error' tombstone are dropped (log-compaction semantics)."""
    from .stages.window import latest_with_tombstones

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])
    return latest_with_tombstones(ds, key="user_id",
                                  order_cols=["ts", "event_id"])


@_hinted("events")
def q_latest_event_per_user(sf_dir: str):
    """Changelog compaction (CDC latest-wins upsert): one row per user —
    the newest event by (ts, event_id). Per-batch pre-compaction means the
    shuffle moves at most one row per (batch, key)."""
    from .stages.window import latest_per_key

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])
    return latest_per_key(ds, key="user_id", order_cols=["ts", "event_id"])


BM25_QUERY_TERMS = ["the", "of", "data"]


def q_bm25_topk(sf_dir: str):
    """Lexical retrieval: BM25 top-10 documents for a fixed 3-term query
    (integer micro-nat scores, Lucene +1 idf) — the keyword-search
    counterpart of the embedding sim_topk path."""
    from .stages.textstats import bm25_topk

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_topk(ds, BM25_QUERY_TERMS, k=10)


@_hinted("documents")
def q_oov_rate(sf_dir: str):
    """Tokenizer-coverage audit: per-source token and OOV counts against
    the corpus top-16 vocabulary (broadcast once); per-(batch, source)
    combiners keep the final exchange at a few rows per source."""
    from .stages.textstats import oov_rate

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])
    return oov_rate(ds, vocab_size=16)


@_hinted("documents")
def q_zipf_slope(sf_dir: str):
    """Corpus profiling: least-squares Zipf slope of ln(freq) vs ln(rank)
    over the top-256 unigrams — milli-nat int quantization makes the
    regression sums exact int64, one final float64 division."""
    from .stages.textstats import zipf_slope

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return zipf_slope(ds, top_n=256)


def q_rrf_fusion(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25 top-50
    lexical ranking with the integer-exact dense dot-product top-50 over
    the doc-aligned embedding table; top-20 fused docs in nano-unit RRF
    scores. Both sources are streaming partial-top-k operators; the fusion
    itself touches 2x50 rows."""
    from .stages.similarity import hybrid_rrf

    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    return hybrid_rrf(docs, emb, _query_vec(sf_dir), BM25_QUERY_TERMS,
                      k_each=50, k_out=20, rrf_k=60)


def q_collocations(sf_dir: str):
    """Phrase mining: top-50 adjacent-token collocations by PMI (integer
    micro-nats, min pair count 5) over the documents corpus — broadcast
    unigram table, distributed bigram scoring, global top-k sort."""
    from .stages.textstats import collocations

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return collocations(ds, k=50, min_count=5)


KMEANS_FIT_ROUNDS = 3


@_hinted("embeddings")
def q_kmeans_fit_int(sf_dir: str):
    """Iterative integer Lloyd k-means FIT (init = k lowest-id vectors, 2
    update rounds + final assignment) — the exactly-verifiable variant of
    the float spherical fit: floor-scaled int64 vectors, floor-division
    centroid updates, argmin ties to the lowest centroid id. Oracled by a
    generated chained-CTE DuckDB program replaying the same rounds."""
    from .stages.similarity import kmeans_fit_int

    ds = read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return kmeans_fit_int(ds, k=KMEANS_K, rounds=KMEANS_FIT_ROUNDS)


def q_quality_classifier(sf_dir: str):
    """fastText-style hashed linear quality classifier serving pass (the
    learned-filter shape of CCNet/DCLM/FineWeb-Edu curation): unigram
    hashing trick -> deterministic integer weight table -> per-doc score +
    keep gate, exact int64 on both engines."""
    from .stages.textstats import hashed_classifier

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return hashed_classifier(ds)


def q_corpus_curation(sf_dir: str):
    """End-to-end corpus-curation chain — the composed LLM-training-data
    pipeline: token/alpha quality gate -> language allowlist -> exact dedup
    keeping the min doc_id per content hash. Filters use integer-exact
    predicates (alpha*2 >= chars) so the oracle can't drift on float
    boundaries; all stages stream (filter inside map_batches, one bucketed
    dedup shuffle)."""
    from .stages.enrich import _hash_values

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    keep_langs = pa.array(["en", "de", "fr"])

    def gate(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks()
        n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(n_tok, 5),
                    pc.greater_equal(pc.multiply(n_alpha, 2), n_chars)),
            pc.is_in(t.column("lang"), value_set=keep_langs),
        )
        out = pa.table(
            {
                "text_hash": _hash_values(text, "md5"),
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "n_tokens": n_tok,
            }
        )
        return out.filter(keep)

    gated = ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    agg = two_phase_aggregate(
        gated, ["text_hash"],
        [("doc_id", "min", "doc_id"), ("lang", "min", "lang"),
         ("n_tokens", "min", "n_tokens"), ("doc_id", "count", "n_dups")],
    )
    return agg.map_batches(
        lambda t: t.select(["doc_id", "lang", "n_tokens", "n_dups"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_duration_quantiles(sf_dir: str):
    """Per-tool exact duration quantiles (p50/p95/p99, discrete/inverted-CDF
    semantics matching DuckDB quantile_disc) — the Summary-quantile analogue
    (awsemf summaries carry quantile values; transformer.rs:610-617).
    Bucketed grouped_apply; quantile via sorted segment indexing."""
    import pandas as pd

    from .stages.aggregate import grouped_apply

    ds = _parsed(sf_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "tool_call")).select(
            ["tool_name", "duration_ms"]
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import math

        rows = []
        for tool, s in g.groupby("tool_name")["duration_ms"]:
            v = np.sort(s.to_numpy())
            n = len(v)
            q = {p: int(v[max(math.ceil(p * n) - 1, 0)]) for p in (0.5, 0.95, 0.99)}
            rows.append((tool, n, q[0.5], q[0.95], q[0.99]))
        return pd.DataFrame(rows, columns=["tool_name", "n", "p50", "p95", "p99"])

    return grouped_apply(ds, ["tool_name"], per_bucket)


# ---------------------------------------------------------------------------
# exporter-transform queries (transform.py operators)
# ---------------------------------------------------------------------------


def q_attrs_flatten(sf_dir: str):
    """ClickHouse nested-attr flattening over the JSON event lines: dotted
    keys + stringified leaves, exploded to (conv_id, turn_idx, key, value)
    rows (clickhouse/transformer.rs:56-84 semantics)."""
    from .stages.transform import flatten_attrs

    ds = _parsed(sf_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "json")).select(
            ["conv_id", "turn_idx", "text"]
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return flatten_attrs(ds, json_col="text", id_cols=("conv_id", "turn_idx"))


# deterministic span-attribute derivation from the transcript grammars —
# mirrored 1:1 in the SQL oracle (the cascade itself is generic; this is the
# corpus-specific attribute sourcing)
_DB_BY_TOOL = {"python": "sqlite", "search": "elasticsearch"}
_RPC_BY_TOOL = {"bash": "grpc", "browser": "aws-api"}
_RPC_SERVICE_BY_TOOL = {"browser": "s3"}


# JSON keys promoted to fixed columns by the parse stage (parse.JSON_SCHEMA);
# everything else overflows into the attrs map (SURVEY §7.6.5)
FIXED_JSON_KEYS = frozenset(
    ["time_local", "remote_addr", "request", "status", "body_bytes_sent"]
)


def q_attrs_overflow(sf_dir: str):
    """Dynamic-attr-key handling: fixed columns + overflow map (the parquet
    exporter's MapOrJson attrs column, parquet/common.rs:16-20). The real
    operator appends a map<string,string> column (pytest-verified incl.
    parquet round-trip); the oracle-checked projection explodes the same
    overflow entries to rows (map columns don't survive the driver's
    value-hash canonicalization)."""
    from .stages.transform import flatten_attrs_batch

    ds = _parsed(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "json")).select(
            ["conv_id", "turn_idx", "text"]
        )
        out = flatten_attrs_batch(t, json_col="text", id_cols=["conv_id", "turn_idx"])
        keep = pc.invert(pc.is_in(out.column("attr_key"),
                                  value_set=pa.array(sorted(FIXED_JSON_KEYS))))
        return out.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_span_operation(sf_dir: str):
    """Datadog operation-name + span-type derivation cascade
    (otel_util.rs:64-175, 34-61 + db_types.rs) over span-like rows derived
    from the parsed transcripts: tool calls are client spans (db/rpc attrs
    from the tool name), access/json lines are server spans (http method),
    everything else is internal."""
    from .stages.enrich import _lookup
    from .stages.transform import operation_name_cascade, span_type_cascade

    ds = _parsed(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        is_tool = pc.equal(et, "tool_call")
        is_server = pc.is_in(et, value_set=pa.array(["nginx_access", "json"]))
        kind = pc.if_else(is_tool, pa.scalar("client"),
                          pc.if_else(is_server, pa.scalar("server"),
                                     pc.if_else(pc.equal(et, "chat"),
                                                pa.scalar("unspecified"),
                                                pa.scalar("internal"))))
        req = t.column("request").combine_chunks()
        method = pc.struct_field(pc.extract_regex(pc.fill_null(req, ""), r"^(?P<m>\S+) "), "m")
        tn = t.column("tool_name").combine_chunks()
        span = pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "span_kind": kind,
                "http_method": method,
                "db_system": _lookup(tn, _DB_BY_TOOL),
                "rpc_system": _lookup(tn, _RPC_BY_TOOL),
                "rpc_service": _lookup(tn, _RPC_SERVICE_BY_TOOL),
            }
        )
        attrs = {"http.request.method": "http_method", "db.system": "db_system",
                 "rpc.system": "rpc_system", "rpc.service": "rpc_service"}
        return pa.table(
            {
                "conv_id": span.column("conv_id"),
                "turn_idx": span.column("turn_idx"),
                "operation_name": operation_name_cascade(span, attrs=attrs),
                "span_type": span_type_cascade(span, attrs=attrs),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_span_resource(sf_dir: str):
    """Datadog resource-name / service / env / status-code extraction
    (otel_util.rs:176-345 + attributes.rs:9-23,79-110) over span-like rows
    from the parsed transcripts: nginx access lines are server spans
    (method + route from the request, status code), tool calls are client
    spans (rpc tools -> rpc.method/rpc.service; db tools -> db.system +
    db.query.text = the command), everything else falls through the cascade
    to the span name (= event_type)."""
    from .stages.enrich import _lookup
    from .stages.transform import (env_cascade, resource_name_cascade,
                                   service_cascade, status_code_cascade)

    ds = _parsed(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        is_tool = pc.equal(et, "tool_call")
        is_server = pc.is_in(et, value_set=pa.array(["nginx_access", "json"]))
        kind = pc.if_else(is_tool, pa.scalar("client"),
                          pc.if_else(is_server, pa.scalar("server"), pa.scalar("internal")))
        req = pc.fill_null(t.column("request").combine_chunks(), "")
        m = pc.extract_regex(req, r"^(?P<m>\S+) (?P<p>\S+) ")
        tn = t.column("tool_name").combine_chunks()
        db_system = _lookup(tn, _DB_BY_TOOL)
        rpc_tool = pc.is_in(tn, value_set=pa.array(list(_RPC_BY_TOOL)))
        span = pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "span_kind": kind,
            "span_name": et,
            "http_method": pc.struct_field(m, "m"),
            "http_route": pc.struct_field(m, "p"),
            "rpc_method": pc.if_else(pc.fill_null(rpc_tool, False), tn,
                                     pa.nulls(t.num_rows, pa.string())),
            "rpc_service": _lookup(tn, _RPC_SERVICE_BY_TOOL),
            "db_system": db_system,
            "db_query": pc.if_else(pc.is_valid(db_system), t.column("tool_cmd").combine_chunks(),
                                   pa.nulls(t.num_rows, pa.string())),
            "svc_name": pc.if_else(pc.fill_null(is_tool, False),
                                   pc.binary_join_element_wise(
                                       pa.nulls(t.num_rows, pa.string()).fill_null("tool-"),
                                       pc.cast(tn, pa.string()), ""),
                                   pa.nulls(t.num_rows, pa.string())),
            "dep_env": pc.if_else(pc.equal(et, "nginx_access"), pa.scalar("production"),
                                  pa.nulls(t.num_rows, pa.string())),
            "dep_env_name": pc.if_else(pc.equal(et, "json"), pa.scalar("staging"),
                                       pa.nulls(t.num_rows, pa.string())),
            "status": t.column("status"),
        })
        attrs = {"http.request.method": "http_method", "http.route": "http_route",
                 "rpc.method": "rpc_method", "rpc.service": "rpc_service",
                 "db.system": "db_system", "db.query.text": "db_query",
                 "service.name": "svc_name", "deployment.environment": "dep_env",
                 "deployment.environment.name": "dep_env_name",
                 "http.response.status_code": "status"}
        return pa.table({
            "conv_id": span.column("conv_id"),
            "turn_idx": span.column("turn_idx"),
            "resource_name": resource_name_cascade(span, attrs=attrs),
            "service": service_cascade(span, attrs=attrs),
            "env": env_cascade(span, attrs=attrs),
            "status_code": status_code_cascade(span, attrs=attrs),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_container_tags(sf_dir: str):
    """Datadog container tags from a DYNAMIC resource-attr map
    (otel_mapping/attributes.rs:76-107): per row a 6-entry
    map<string,string> carrying semconv keys, custom-prefix keys (one
    colliding with a mapped tag -> mapped wins), an unmapped key and an
    empty value; the operator iterates the map (flattened stream), renames,
    strips, and drops -> exploded (id, tag_key, tag_value) rows."""
    from .stages.transform import container_tags

    ds = _transcripts_ds(sf_dir)

    def build(t: pa.Table) -> pa.Table:
        n = t.num_rows
        conv = pc.cast(t.column("conv_id").combine_chunks(), pa.string())
        role = pc.cast(t.column("role").combine_chunks(), pa.string())
        turn3 = t.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64) % 3
        keys6 = ["container.id", "cloud.region", "datadog.container.tag.team",
                 "datadog.container.tag.region", "x.unmapped", "k8s.pod.name"]
        kf = np.tile(np.array(keys6, dtype=object), n)
        cv = conv.to_numpy(zero_copy_only=False)
        rl = role.to_numpy(zero_copy_only=False)
        rg = np.char.add("eu-", turn3.astype("U1")).astype(object)
        vf = np.stack([cv, rg, rl,
                       np.full(n, "shadowed", object),
                       np.full(n, "v", object),
                       np.full(n, "", object)], axis=1).ravel()
        offsets = pa.array(np.arange(0, 6 * n + 1, 6, dtype=np.int32), pa.int32())
        ma = pa.MapArray.from_arrays(offsets, pa.array(kf, pa.string()),
                                     pa.array(vf, pa.string()))
        return pa.table({"conv_id": t.column("conv_id"),
                         "turn_idx": t.column("turn_idx"),
                         "attrs_map": ma})

    built = ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)
    return built.map_batches(container_tags, batch_format="pyarrow", zero_copy_batch=True)


def q_error_tags(sf_dir: str):
    """Datadog error-span tagging (transformer.rs:328-377): error spans =
    ERROR lines + 5xx access lines; retryable errors carry an exception
    event (error.msg/error.type from it), non-retryable fall back to the
    span status message, access rows fall back to the http status code
    (+" {status_text}" for 500)."""
    from .stages.transform import error_tagging

    ds = _parsed(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        status = pc.cast(t.column("status").combine_chunks(), pa.int32())
        is_err = pc.fill_null(pc.equal(et, "error"), False)
        is_5xx = pc.fill_null(pc.greater_equal(status, 500), False)
        t = t.filter(pc.or_(is_err, is_5xx))
        n = t.num_rows
        nulls = pa.nulls(n, pa.string())
        et = t.column("event_type").combine_chunks()
        is_err = pc.fill_null(pc.equal(et, "error"), False)
        retry = pc.fill_null(t.column("retryable").combine_chunks(), False)
        ecode = t.column("error_code").combine_chunks()
        span = pa.table({
            "conv_id": t.column("conv_id"), "turn_idx": t.column("turn_idx"),
            "exc_msg": pc.if_else(pc.and_(is_err, retry),
                                  t.column("error_msg").combine_chunks(), nulls),
            "exc_type": pc.if_else(pc.and_(is_err, retry), ecode, nulls),
            "status_msg": pc.if_else(is_err, pc.binary_join_element_wise(
                nulls.fill_null("code="), pc.cast(ecode, pa.string()), "",
                null_handling="emit_null"), nulls.fill_null("")),
            "http_code": pc.if_else(is_err, nulls,
                                    pc.cast(t.column("status"), pa.string())),
            "status_text": pc.if_else(
                pc.fill_null(pc.equal(pc.cast(t.column("status"), pa.int32()), 500), False),
                pa.scalar("Internal Server Error"), nulls),
        })
        attrs = {"exception.message": "exc_msg", "exception.type": "exc_type",
                 "exception.stacktrace": "exc_stack", "status.message": "status_msg",
                 "http.response.status_code": "http_code",
                 "http.status_text": "status_text"}
        msg, typ, stack = error_tagging(span, attrs=attrs)
        return pa.table({
            "conv_id": span.column("conv_id"), "turn_idx": span.column("turn_idx"),
            "error": pa.nulls(n, pa.int32()).fill_null(1),
            "error_msg": msg, "error_type": typ, "error_stack": stack,
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_span_meta(sf_dir: str):
    """Datadog span-meta mapping over a dynamic span-attr map
    (transformer.rs:392-441 + HTTP_MAPPINGS): per row six attrs exercising
    every branch — semconv rename, empty-value fall-through, header-prefix
    rewrite, analytics.event bool -> metrics (non-bool dropped), APM
    convention key skipped, custom passthrough."""
    from .stages.transform import span_meta_tags

    ds = _parsed(sf_dir)

    def build(t: pa.Table) -> pa.Table:
        n = t.num_rows
        et = t.column("event_type").combine_chunks()
        conv = pc.cast(t.column("conv_id").combine_chunks(), pa.string())
        role = pc.cast(t.column("role").combine_chunks(), pa.string())
        status = pc.fill_null(pc.cast(t.column("status").combine_chunks(), pa.string()), "")
        ua = pc.fill_null(t.column("http_user_agent").combine_chunks(), "")
        analytics = pc.if_else(pc.equal(et, "tool_call"), pa.scalar("true"),
                    pc.if_else(pc.equal(et, "error"), pa.scalar("NOTBOOL"),
                               pa.scalar("false")))
        keys6 = ["http.response.status_code", "http.request.header.x-trace",
                 "analytics.event", "http.method", "custom.key",
                 "user_agent.original"]
        kf = np.tile(np.array(keys6, dtype=object), n)
        vf = np.stack([
            status.to_numpy(zero_copy_only=False),
            conv.to_numpy(zero_copy_only=False),
            analytics.to_numpy(zero_copy_only=False),
            np.full(n, "GET", object),
            role.to_numpy(zero_copy_only=False),
            ua.to_numpy(zero_copy_only=False),
        ], axis=1).ravel()
        offsets = pa.array(np.arange(0, 6 * n + 1, 6, dtype=np.int32), pa.int32())
        ma = pa.MapArray.from_arrays(offsets, pa.array(kf, pa.string()),
                                     pa.array(vf, pa.string()))
        return pa.table({"conv_id": t.column("conv_id"),
                         "turn_idx": t.column("turn_idx"), "attrs_map": ma})

    built = ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)
    return built.map_batches(span_meta_tags, batch_format="pyarrow", zero_copy_batch=True)


def q_xray_segments(sf_dir: str):
    """X-Ray segment JSON documents (xray/transformer.rs:352-519) for the
    access-log spans: base keys + http/annotations/metadata/aws blocks +
    fault/throttle/error flags + parent/subsegment linkage (turn n-1 is the
    parent), serialized with sorted keys; the oracle-checked projection
    parses each emitted document back to its structural fields (a malformed
    or mis-flagged document cannot round-trip)."""
    import json as _json

    from .functions.scalar import xray_trace_id
    from .stages.enrich import _hash_values
    from .stages.transform import xray_segment_json

    ds = _parsed(sf_dir)

    def build(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "nginx_access"))
        n = t.num_rows
        conv = pc.cast(t.column("conv_id").combine_chunks(), pa.string())
        turn_i = pc.cast(t.column("turn_idx").combine_chunks(), pa.int64())
        turn = pc.cast(turn_i, pa.string())
        key = pc.binary_join_element_wise(conv, turn, ":")
        prev_key = pc.binary_join_element_wise(
            conv, pc.cast(pc.subtract(turn_i, 1), pa.string()), ":")
        span_id = pc.utf8_slice_codeunits(_hash_values(key, "md5"), 0, 16)
        parent = pc.if_else(
            pc.greater(turn_i, 0),
            pc.utf8_slice_codeunits(_hash_values(prev_key, "md5"), 0, 16),
            pa.nulls(n, pa.string()))
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        epoch_s = pc.divide(us, 1_000_000)
        trace = xray_trace_id(_hash_values(conv, "md5"), epoch_s)
        # us < 2^53, so the int64 -> double cast is exact (ns would not be)
        start_s = pc.divide(pc.cast(us, pa.float64()), 1e6)
        req = pc.fill_null(t.column("request").combine_chunks(), "")
        m = pc.extract_regex(req, r"^(?P<m>\S+) (?P<p>\S+) ")
        span = pa.table({
            "trace_id": trace, "span_id": span_id, "parent_id": parent,
            "name": pa.nulls(n, pa.string()).fill_null("nginx"),
            "start_s": start_s, "end_s": start_s,
            "method": pc.struct_field(m, "m"), "url": pc.struct_field(m, "p"),
            "status": pc.cast(t.column("status").combine_chunks(), pa.string()),
            "conv_id": conv, "request_id": key,
        })
        return pa.table({"conv_id": conv, "turn_idx": t.column("turn_idx"),
                         "event": xray_segment_json(span)})

    events = ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)

    def parse_back(t: pa.Table) -> pa.Table:
        rows = [_json.loads(e) for e in t.column("event").to_pylist()]
        return pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "trace_id": pa.array([r["trace_id"] for r in rows], pa.string()),
            "seg_id": pa.array([r["id"] for r in rows], pa.string()),
            "parent_id": pa.array([r.get("parent_id") for r in rows], pa.string()),
            "seg_type": pa.array([r["type"] for r in rows], pa.string()),
            "name": pa.array([r["name"] for r in rows], pa.string()),
            "start_time": pa.array([r["start_time"] for r in rows], pa.float64()),
            "method": pa.array([r["http"]["request"]["method"] for r in rows], pa.string()),
            "url": pa.array([r["http"]["request"]["url"] for r in rows], pa.string()),
            "status": pa.array([r["http"]["response"]["status"] for r in rows], pa.string()),
            "error": pa.array([r.get("error", False) for r in rows], pa.bool_()),
            "fault": pa.array([r.get("fault", False) for r in rows], pa.bool_()),
            "throttle": pa.array([r.get("throttle", False) for r in rows], pa.bool_()),
            "request_id": pa.array([r["aws"]["request_id"] for r in rows], pa.string()),
            "environment": pa.array([r["metadata"]["environment"] for r in rows], pa.string()),
        })

    return events.map_batches(parse_back, batch_format="pyarrow")


def q_dd_source(sf_dir: str):
    """Datadog source detection (source.rs:40-107, cloud.rs, k8s.rs) over
    resource attrs derived per event type: kmsg rows alternate ECS-Fargate
    task ARNs and datadog.host.name, access rows carry a ``host`` attr, json
    rows are k8s nodes (+cluster), tool rows are aws instances (host.id),
    error rows are azure VMs (host.name fallback), nginx_error rows have
    bare host.name, chat rows have nothing -> no source."""
    from .stages.transform import source_cascade

    ds = _parsed(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        nulls = pa.nulls(n, pa.string())
        et = t.column("event_type").combine_chunks()
        s = lambda c: pc.cast(t.column(c).combine_chunks(), pa.string())  # noqa: E731
        is_ = lambda v: pc.fill_null(pc.equal(et, v), False)  # noqa: E731
        seq_even = pc.fill_null(
            pc.equal(pc.bit_wise_and(pc.cast(t.column("km_seq"), pa.int64()), 1), 0), False)
        glue = lambda prefix, arr: pc.binary_join_element_wise(  # noqa: E731
            pa.nulls(n, pa.string()).fill_null(prefix), arr, "", null_handling="emit_null")
        span = pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "launchtype": pc.if_else(pc.and_(is_("kmsg"), seq_even),
                                     pa.scalar("fargate"), nulls),
            "task_arn": pc.if_else(pc.and_(is_("kmsg"), seq_even),
                                   glue("arn:ecs:", s("conv_id")), nulls),
            "dd_host": pc.if_else(pc.and_(is_("kmsg"), pc.invert(seq_even)),
                                  glue("ddh-", s("km_facility")), nulls),
            "host": pc.if_else(is_("nginx_access"), s("remote_addr"), nulls),
            "k8s_node": pc.if_else(is_("json"), glue("node-", s("status")), nulls),
            "k8s_cluster": pc.if_else(
                is_("json"),
                glue("c", pc.cast(pc.bit_wise_and(pc.cast(t.column("turn_idx"), pa.int64()), 1),
                                  pa.string())), nulls),
            "provider": pc.if_else(is_("tool_call"), pa.scalar("aws"),
                                   pc.if_else(is_("error"), pa.scalar("azure"), nulls)),
            "host_id": pc.if_else(is_("tool_call"), glue("i-", s("tool_name")), nulls),
            "host_name": pc.if_else(is_("error"), glue("vm-", s("error_code")),
                                    pc.if_else(is_("nginx_error"), glue("ng-", s("ng_level")),
                                               nulls)),
        })
        attrs = {"aws.ecs.launchtype": "launchtype", "aws.ecs.task.arn": "task_arn",
                 "datadog.host.name": "dd_host", "host": "host",
                 "k8s.node.name": "k8s_node", "k8s.cluster.name": "k8s_cluster",
                 "cloud.provider": "provider", "host.id": "host_id",
                 "host.name": "host_name"}
        kind, ident = source_cascade(span, attrs=attrs)
        return pa.table({"conv_id": span.column("conv_id"),
                         "turn_idx": span.column("turn_idx"),
                         "source_kind": kind, "source_id": ident})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_ch_metrics_gauge(sf_dir: str):
    """ClickHouse MetricsGaugeRow table (schema.rs:236-249): one gauge point
    per nginx access line."""
    from .stages.ch_metrics import gauge_rows
    return gauge_rows(_parsed(sf_dir))


def q_ch_metrics_sum(sf_dir: str):
    """ClickHouse MetricsSumRow table (schema.rs:204-220): one cumulative
    monotonic point per tool call."""
    from .stages.ch_metrics import sum_rows
    return sum_rows(_parsed(sf_dir))


def q_ch_metrics_histogram(sf_dir: str):
    """ClickHouse MetricsHistogramRow table (schema.rs:265-284): per-conv
    tool-duration histogram (explicit bounds, JSON array columns)."""
    from .stages.ch_metrics import histogram_rows
    return histogram_rows(_parsed(sf_dir))


def q_ch_metrics_exp_histogram(sf_dir: str):
    """ClickHouse MetricsExpHistogramRow table (schema.rs:310-334): per-conv
    base-2 exponential histogram of response bytes at scale 0."""
    from .stages.ch_metrics import exp_histogram_rows
    return exp_histogram_rows(_parsed(sf_dir))


def q_ch_metrics_summary(sf_dir: str):
    """ClickHouse MetricsSummaryRow table (schema.rs:364-380): per-conv
    status-code summary with discrete quantiles."""
    from .stages.ch_metrics import summary_rows
    return summary_rows(_parsed(sf_dir))


@_hinted("documents", fanout=64)
def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: training docs sharing any token 8-gram
    with the eval split (doc_id % 19 == 0 plays the held-out benchmark).
    Eval grams broadcast once; train side is one stateless probe pass.
    fanout=64 ≈ grams per doc: exchanges here carry per-gram rows, not
    per-doc rows, so the coalesce hint must scale with the explode."""
    from .stages.dedup import decontaminate

    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def is_eval(t):
        d = t.column("doc_id")
        return pc.equal(pc.subtract(d, pc.multiply(pc.divide(d, 19), 19)), 0)
    ev = docs.map_batches(
        lambda t: t.filter(is_eval(t)), batch_format="pyarrow", zero_copy_batch=True)
    tr = docs.map_batches(
        lambda t: t.filter(pc.invert(is_eval(t))), batch_format="pyarrow",
        zero_copy_batch=True)
    return decontaminate(tr, ev, k=8)


def q_decontaminate_bloom(sf_dir: str):
    """Bloom-filter decontamination — the constant-size-broadcast scale
    path of q_decontaminate (same eval split): eval grams fold into a
    2^20-bit filter (128 KiB whatever the benchmark-suite size), train
    side is one stateless vectorized probe. md5 double hashing of the
    literal gram text makes the filter (and its false positives)
    bit-for-bit reproducible in SQL."""
    from .stages.dedup import decontaminate_bloom

    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def is_eval(t):
        d = t.column("doc_id")
        return pc.equal(pc.subtract(d, pc.multiply(pc.divide(d, 19), 19)), 0)
    ev = docs.map_batches(
        lambda t: t.filter(is_eval(t)), batch_format="pyarrow", zero_copy_batch=True)
    tr = docs.map_batches(
        lambda t: t.filter(pc.invert(is_eval(t))), batch_format="pyarrow",
        zero_copy_batch=True)
    return decontaminate_bloom(tr, ev, k=8)


@_hinted("documents")
def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary-growth curve: distinct-token count of every
    power-of-two doc_id prefix — (token, min doc_id) two-phase partials
    bucketed by bit_length into a <= 64-row histogram; nothing vocab-sized
    reaches the driver."""
    from .stages.textstats import vocab_growth

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return vocab_growth(ds)


@_hinted("documents")
def q_ppl_buckets(sf_dir: str):
    """CCNet head/middle/tail perplexity tertiles per source (rank-based,
    tie-stable): broadcast unigram LM scoring + ONE int-only bucketed
    shuffle for the per-source ranks."""
    from .stages.textstats import ppl_buckets

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "source"])
    return ppl_buckets(ds)


@_hinted("documents", fanout=64)
def q_contamination_overlap(sf_dir: str):
    """Per-eval-doc exact 8-gram contamination fraction vs the train split
    (GPT-3 appendix-C dirtiness reporting; eval = doc_id % 19 == 0, the
    decontaminate split). Eval grams broadcast once; the train side emits
    only hit gram values (bounded by the eval gram count); one bucketed
    (gram, doc) exchange + a two-phase integer aggregate finish it."""
    from .stages.dedup import contamination_overlap

    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def is_eval(t):
        d = t.column("doc_id")
        return pc.equal(pc.subtract(d, pc.multiply(pc.divide(d, 19), 19)), 0)
    ev = docs.map_batches(
        lambda t: t.filter(is_eval(t)), batch_format="pyarrow", zero_copy_batch=True)
    tr = docs.map_batches(
        lambda t: t.filter(pc.invert(is_eval(t))), batch_format="pyarrow",
        zero_copy_batch=True)
    return contamination_overlap(tr, ev, k=8)


def q_text_normalize(sf_dir: str):
    """Unicode ingest normalization (NFC + control/zero-width strip +
    whitespace collapse + trim) over the dirtied unicode fixture — every
    hazard class oracle-checked against DuckDB's nfc_normalize +
    regexp_replace with the SAME RE2 patterns."""
    from .stages.clean import ensure_unicode_docs, text_normalize

    ds = read_parquet(ensure_unicode_docs(sf_dir), columns=["doc_id", "text"])
    return text_normalize(ds)


def q_gopher_rules(sf_dir: str):
    """Gopher §A1.1 quality rule set (word-count / mean-word-length bounds,
    bullet- and ellipsis-line fraction caps, alphabetic-word floor,
    stop-word presence) + conjunctive keep flag, over the reflowed
    multi-line fixture. One stateless vectorized pass — no shuffle at any
    scale; every count is an RE2 kernel the oracle mirrors bit-for-bit."""
    from .stages.filterrules import ensure_lines_docs, gopher_rules

    ds = read_parquet(ensure_lines_docs(sf_dir), columns=["doc_id", "text"])
    return gopher_rules(ds)


def q_c4_line_filter(sf_dir: str):
    """C4 §2.2 line-level cleaning (terminal-punctuation lines only, >= 3
    words, no curly brace / "javascript"), documents reassembled from
    surviving lines. Lines explode and reassemble INSIDE each batch via
    ListArray offsets — a doc's lines never leave its row, no shuffle."""
    from .stages.filterrules import c4_line_filter, ensure_lines_docs

    ds = read_parquet(ensure_lines_docs(sf_dir), columns=["doc_id", "text"])
    return c4_line_filter(ds)


@_hinted("documents", fanout=64)
def q_ngram_diversity(sf_dir: str):
    """Corpus distinct-n diversity for n in {1,2,3} (memorization screen):
    gram-hash partials -> two-phase -> 3-row count+sum reduce. fanout=64:
    the gram exchange carries one row per (n, gram) partial."""
    from .stages.textstats import ngram_diversity

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_diversity(ds)


def q_conv_quality(sf_dir: str):
    """Conversation-level SFT curation rollup: turns, exact char sum, and
    role-alternation violations per conversation — char counts computed
    before the shuffle so text never moves. Hinted by the transcripts row
    count (one exchange row per turn)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import conv_quality

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["conv_id", "turn_idx", "role", "text"])
    with input_rows_hint(n_turns):
        return conv_quality(ds)


@_hinted("events")
def q_session_conversion(sf_dir: str):
    """Click->purchase conversion inside 30-min gap sessions: one exact-int
    row (n_sessions, n_with_click, n_converted). Same session-break rule
    as sessionize; buckets emit 3-int partials."""
    from .stages.window import session_conversion

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type", "event_id"])
    return session_conversion(ds, num_buckets=16)


@_hinted("documents")
def q_source_lang_rollup(sf_dir: str):
    """Warehouse ROLLUP over (source, lang): finest cells plus per-source
    margins plus the grand total ('*' sentinel rows — no NULL ambiguity,
    sources/langs are never null in the corpus). The margins derive from
    the finest cells (exact — sums of sums), so the corpus aggregates
    ONCE; the rollup itself touches |sources| x |langs| rows."""
    import pandas as pd

    from .stages.aggregate import two_phase_aggregate

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "lang", "n_chars"])

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"), "lang": t.column("lang"),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "n_chars": pc.cast(t.column("n_chars"), pa.int64()),
        })

    cells = two_phase_aggregate(
        ds.map_batches(one, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "lang"],
        [("one", "sum", "n_docs"), ("n_chars", "sum", "sum_chars")],
        num_buckets=8).to_pandas()  # |sources| x |langs| rows — driver-safe
    per_src = (cells.groupby("source", as_index=False)
               [["n_docs", "sum_chars"]].sum())
    per_src["lang"] = "*"
    total = pd.DataFrame({"source": ["*"], "lang": ["*"],
                          "n_docs": [cells.n_docs.sum()],
                          "sum_chars": [cells.sum_chars.sum()]})
    out = pd.concat([cells, per_src, total], ignore_index=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out[["source", "lang", "n_docs", "sum_chars"]]


@_hinted("events")
def q_quantile_sketch(sf_dir: str):
    """Mergeable histogram quantile sketch over event values (cents):
    p50/p90/p99 bucket + lower-bound estimate in 2 passes of pure int
    arithmetic — the bounded-error scale path next to the exact bisection
    of global_quantiles."""
    from .stages.sketch import quantile_sketch

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return quantile_sketch(ds)


def q_late_events(sf_dir: str):
    """Watermark late-data accounting (Flink bounded-out-of-orderness
    model) over the deterministic out-of-order arrival fixture: events
    whose ts falls below (running max of earlier-arrived ts) − 1 h are
    LATE; exact counts per (event_type, late). Chunked prefix-max — no
    global data sort, only int metadata on the driver."""
    from .stages.window import ensure_ooo_events, late_events

    path = ensure_ooo_events(sf_dir)
    ds = read_parquet(path, columns=["arrival_seq", "ts", "event_type"])
    return late_events(ds)


def q_pagerank(sf_dir: str):
    """Fixed-iteration exact-integer PageRank over the deterministic
    document link graph (crawl-centrality prior): 3 power iterations, each
    one bucketed edges-join-ranks + two-phase sum + left join back to the
    node table, materialized per iteration (the distributed checkpoint
    barrier). Bit-exact vs a chained-CTE DuckDB replay."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import ensure_link_graph, pagerank_int

    gdir = ensure_link_graph(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    with input_rows_hint(n_edges + n):  # join unions edges + node rows
        return pagerank_int(edges, n)


@_hinted("events")
def q_state_dwell(sf_dir: str):
    """Time-in-state rollup: inter-event gaps attributed to the previous
    event's type (how long users sit in each state), exact int64 us,
    bucketed with per-bucket partials."""
    from .stages.window import state_dwell

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type", "event_id"])
    return state_dwell(ds)


@_hinted("events")
def q_event_cooccurrence(sf_dir: str):
    """Alert-correlation mining: unordered pairs of event types observed
    within the same calendar minute, counted over minutes — which signals
    fire together. Reuses the vectorized pair-explosion kernel over
    (minute, event_type) distincts."""
    from .stages.aggregate import pair_cooccurrence

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["ts", "event_type"])

    def to_minute(t: pa.Table) -> pa.Table:
        us = t.column("ts").combine_chunks().cast(pa.int64())
        return pa.table({
            "minute_id": pc.divide(us, 60_000_000),
            "event_type": t.column("event_type"),
        })

    rows = ds.map_batches(to_minute, batch_format="pyarrow",
                          zero_copy_batch=True)
    pairs = pair_cooccurrence(rows, group_col="minute_id",
                              item_col="event_type")
    return pairs.map_batches(
        lambda t: pa.table({"type_a": t.column("tool_a"),
                            "type_b": t.column("tool_b"),
                            "n_minutes": t.column("n_groups")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("events")
def q_skew_report(sf_dir: str):
    """Shuffle-planning skew diagnostics on events.user_id: n_keys,
    n_rows, hottest-key count and the exact-integer Gini of the per-key
    count distribution (rank-run algebra over a bounded count-value
    histogram — no global sort)."""
    from .stages.profile import skew_report

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return skew_report(ds, key="user_id")


@_hinted("events")
def q_session_paths(sf_dir: str):
    """Entry-funnel path mining: the ordered event-type sequence of each
    gap-session's first 3 events, counted over sessions. One bucketed pass
    sessionizes + ranks + assembles paths vectorized; the shuffle after it
    moves (path, n) partials bounded by |event_types|^3."""
    from .stages.window import session_paths

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type", "event_id"])
    return session_paths(ds, gap_minutes=30.0, depth=3)


def q_label_propagation(sf_dir: str):
    """Semi-supervised label propagation over the link graph: every 5th
    doc seeds its lang label; 2 fixed rounds of majority-vote adoption by
    unlabeled neighbors (ties -> label asc). Per round: one bucketed
    halfedge-join, a (node,label) two-phase count, a vectorized per-node
    argmax and a bucketed anti-join — labels move as 2-column rows."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import LP_SEED_MOD, ensure_link_graph, label_propagation

    gdir = ensure_link_graph(sf_dir)
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang"])

    def seed(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = pa.array(d % LP_SEED_MOD == 0)
        return pa.table({"v": t.column("doc_id").filter(m),
                         "lab": t.column("lang").filter(m)})

    seeds = docs.map_batches(seed, batch_format="pyarrow",
                             zero_copy_batch=True)
    with input_rows_hint(n_edges * 4):  # halfedge-join fan-out bound
        return label_propagation(edges, seeds)


def q_triangle_count(sf_dir: str):
    """Triangle census of the undirected link graph (clustering-structure
    health check): distinct-edge canonicalization, per-center vectorized
    wedge explosion, bucketed wedge-vs-edge join; n_triangles =
    closed_wedges // 3 (exact identity, asserted in the stage)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import ensure_link_graph, triangle_count

    gdir = ensure_link_graph(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    # wedge fan-out: avg degree is < 2*GRAPH_MAX_OUT; 32x bounds k(k-1)/2
    with input_rows_hint(n_edges * 32):
        return triangle_count(edges, n)


def q_rank_curation(sf_dir: str):
    """Composed graph-aware curation (the crawl-frontier shape: keep pages
    that are both well-linked and well-written): integer PageRank over the
    link graph -> exact global median rank via distributed bisection (no
    sort, driver sees bin counts) -> bucketed semi-join with the Gopher
    keep set. Output: (doc_id, pagerank_int) of docs passing both gates."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.filterrules import ensure_lines_docs, gopher_rules
    from .stages.graph import ensure_link_graph, pagerank_int
    from .stages.join import bucket_hash_join
    from .stages.window import global_quantiles

    gdir = ensure_link_graph(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    with input_rows_hint(n_edges + n):
        ranks = pagerank_int(read_parquet(gdir), n).materialize()
        med = global_quantiles(ranks, value_col="pagerank_int",
                               qs=(0.5,)).take_all()[0]["value"]
        high = ranks.map_batches(
            lambda t, m=med: t.filter(
                pc.greater_equal(t.column("pagerank_int"), m)),
            batch_format="pyarrow", zero_copy_batch=True)
        g = gopher_rules(read_parquet(ensure_lines_docs(sf_dir),
                                      columns=["doc_id", "text"]))
        keeps = g.map_batches(
            lambda t: t.filter(pc.equal(t.column("keep"), 1))
                       .select(["doc_id"]),
            batch_format="pyarrow", zero_copy_batch=True)
        out = bucket_hash_join(high, keeps, on="node_id",
                               right_on="doc_id", num_buckets=16)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t.column("node_id"),
                            "pagerank_int": t.column("pagerank_int")}),
        batch_format="pyarrow", zero_copy_batch=True)


def q_graph_degrees(sf_dir: str):
    """Link-graph degree distribution: (direction, degree, n_nodes) for
    in- and out-degree, zero-degree nodes included (left join to the node
    table) — the first sanity report any crawl-graph pipeline prints.
    Degree cardinality is bounded, so every exchange after the first count
    is tiny."""
    import glob as _glob

    import ray.data as rd

    from .stages.aggregate import input_rows_hint, two_phase_aggregate
    from .stages.graph import ensure_link_graph
    from .stages.join import bucket_hash_join

    gdir = ensure_link_graph(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))

    with input_rows_hint(n_edges + n):
        edges = read_parquet(gdir)
        nodes = rd.range(n).map_batches(
            lambda t: pa.table({"v": t.column("id").combine_chunks()
                                .cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        outs = []
        for direction, key in (("out", "src"), ("in", "dst")):
            cnt = two_phase_aggregate(edges, [key], [(key, "count", "deg")],
                                      num_buckets=16)
            full = bucket_hash_join(nodes, cnt, on="v", right_on=key,
                                    how="left", fill={"deg": 0},
                                    num_buckets=16)
            hist = two_phase_aggregate(full, ["deg"],
                                       [("v", "count", "n_nodes")],
                                       num_buckets=4)
            outs.append(hist.map_batches(
                lambda t, d=direction: pa.table(
                    {"direction": pa.array([d] * t.num_rows),
                     "degree": t.column("deg"),
                     "n_nodes": t.column("n_nodes")}),
                batch_format="pyarrow", zero_copy_batch=True))
        return outs[0].union(outs[1])


@_hinted("documents", fanout=256)
def q_cms_counts(sf_dir: str):
    """Count-min sketch point estimates vs truth for the top-64 corpus
    tokens: constant-size (depth x width int) sketch built from per-batch
    distinct-token partials, md5 double hashing (SQL-replayable); output
    pins the CMS overestimate guarantee (est >= true, error = hash
    collisions)."""
    from .stages.sketch import cms_token_estimates

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return cms_token_estimates(ds)


def q_tool_pairs(sf_dir: str):
    """Tool-affinity market-basket view: for every unordered pair of
    distinct tools used in the same conversation, the number of
    conversations where they co-occur. Distinct-first (two-phase), then a
    fully vectorized per-group pair explosion with bounded fan-out (k =
    tools per conversation, capped by the tool vocabulary)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint, pair_cooccurrence

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["conv_id", "tool"])
    with input_rows_hint(n_turns * 4):  # pair fan-out bound: k<=8 tools/conv
        return pair_cooccurrence(ds, group_col="conv_id", item_col="tool")


def q_subnet_rollup(sf_dir: str):
    """Per-/24-subnet traffic rollup over the nginx access grammar: request
    count, distinct client users and total bytes — the top-talkers view.
    Distinct users via a chained two-phase ((subnet,user) grain first, then
    subnet), so no distinct-set ever materializes."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint, two_phase_aggregate

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    parsed = _parsed(sf_dir)

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "nginx_access"))
        sub = pc.struct_field(
            pc.extract_regex(t.column("remote_addr"),
                             r"^(?P<s>\d+\.\d+\.\d+)\."), "s")
        return pa.table({"subnet": sub,
                         "remote_user": t.column("remote_user"),
                         "bytes": t.column("body_bytes_sent")})

    rows = parsed.map_batches(narrow, batch_format="pyarrow",
                              zero_copy_batch=True)
    with input_rows_hint(n_turns):
        per_user = two_phase_aggregate(rows, ["subnet", "remote_user"],
                                       [("bytes", "count", "n"),
                                        ("bytes", "sum", "b")],
                                       num_buckets=16)
        out = two_phase_aggregate(per_user, ["subnet"],
                                  [("n", "sum", "n_requests"),
                                   ("n", "count", "n_users"),
                                   ("b", "sum", "sum_bytes")], num_buckets=8)
    return out


@_hinted("events", fanout=2)
def q_peak_concurrency(sf_dir: str):
    """Peak concurrent sessions per hour (capacity planning): sweep-line
    over gap-sessionized intervals, +1/-1 boundary deltas, starts before
    ends at ties. Chunk == hour in the chunked-prefix pattern: per-hour
    carry-ins from a two-phase int aggregate, one vectorized
    cumsum+reduceat per bucket; 3-int rows are all that shuffles."""
    from .stages.window import peak_concurrency

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "value", "event_id"])
    return peak_concurrency(ds, gap_minutes=30.0)


def q_typo_pairs(sf_dir: str):
    """Typo mining over the transcript alphabetic vocabulary: token pairs
    within Levenshtein distance 2 via FastSS deletion-neighborhood
    candidates (complete filter) + exact DP verification on the few
    survivors — the spell-canonicalization primitive of corpus cleaning."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.textstats import typo_pairs

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["text"])
    with input_rows_hint(n_turns * 64):  # deletion-variant fan-out bound
        return typo_pairs(ds, max_dist=2, min_len=3)


def q_multiline_stitch(sf_dir: str):
    """Multiline record assembly (the file-receiver continuation rule;
    reference concept: kmsg's ``c`` continuation flag,
    src/receivers/kmsg/parser.rs:184,256-270): indented lines join the
    previous record. One row per stitched record with its start line_no,
    line count and \\n-joined text. Chunked prefix-sum for the global
    record ordinal — no global sort; text moves through two bounded
    exchanges."""
    from .sources.text_logs import ensure_multiline_logs, stitch_multiline
    from .stages.aggregate import input_rows_hint

    path = ensure_multiline_logs(sf_dir)
    n = pq.ParquetFile(f"{path}/part-0000.parquet").metadata.num_rows
    ds = read_parquet(path)
    with input_rows_hint(n):
        return stitch_multiline(ds)


def q_turn_latency(sf_dir: str):
    """Inter-turn latency by (role_from -> role_to) speaker transition:
    exact integer microsecond sums/means; timestamps collapse to int64 on
    the map side, buckets pre-aggregate to per-pair partials."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import turn_latency

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["conv_id", "turn_idx", "role", "ts"])
    with input_rows_hint(n_turns):
        return turn_latency(ds)


def q_conv_dedup(sf_dir: str):
    """Exact duplicate-conversation detection over transcripts with planted
    duplicates (~19% of convs copied under a '-dup' id): per-turn md5
    before any exchange (text never shuffles), per-conv hash folded per
    bucket, exact groups keep the lexicographic-min conv_id."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.dedup import conv_dedup, ensure_dup_convs

    path = ensure_dup_convs(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{path}/*.parquet"))
    ds = read_parquet(path, columns=["conv_id", "turn_idx", "role", "text"])
    with input_rows_hint(n_turns):
        return conv_dedup(ds)


PER_SOURCE_CAP = 10


@_hinted("documents")
def q_per_source_cap(sf_dir: str):
    """Crawl-curation per-domain cap: keep at most N docs per source in
    the deterministic (md5(text), doc_id) order; text never shuffles."""
    from .stages.mix import per_source_cap

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "source", "text"])
    return per_source_cap(ds, cap=PER_SOURCE_CAP)


def q_conv_split(sf_dir: str):
    """Leakage-safe train/val/test split by conversation: every turn of a
    conv lands in the same split (membership = pure function of the group
    key's md5, 90/5/5 bands)."""
    from .stages.mix import conv_split

    ds = read_parquet(ensure_transcripts(sf_dir),
                      columns=["conv_id", "turn_idx"])
    return conv_split(ds)


@_hinted("documents")
def q_char_entropy(sf_dir: str):
    """Byte-entropy quality score per document (gibberish/binary filter),
    exact integer micro-nats over the zero-copy Arrow byte stream."""
    from .stages.textstats import char_entropy

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return char_entropy(ds)


COMPACT_TARGET_BYTES = 400_000


def q_compaction_plan(sf_dir: str):
    """Small-file compaction planning over the transcript shard directory:
    deterministic cumulative-compressed-bytes cut (group_id =
    bytes_before_file // target). Footer reads fan out as a Ray map; only
    one row per FILE reaches the driver."""
    from .stages.compact import compaction_plan

    return compaction_plan(ensure_transcripts(sf_dir),
                           target_bytes=COMPACT_TARGET_BYTES)


def q_scan_prune_plan(sf_dir: str):
    """Zone-map scan pruning over the re-chunked (time-ordered, ~16 row
    groups) events layout: which row groups the predicate
    ``event_id >= n/2`` never reads, from footer min/max stats only.
    Footer reads fan out as a Ray map; one output row per row group."""
    from .stages.compact import ensure_zonemap_events, scan_prune_plan

    path = ensure_zonemap_events(sf_dir)
    half = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows // 2
    return scan_prune_plan(path, column="event_id", threshold=half)


CONV_EXAMPLE_BUDGET = 128


def q_conv_examples(sf_dir: str):
    """Turn-aligned SFT example packing over conversations: example_id =
    tokens-before-this-turn // budget within each conv — boundaries never
    split a turn; token counts computed before the shuffle so the exchange
    never moves text. Hinted by the TRANSCRIPTS row count (the exchange
    moves one row per turn — the events-table proxy would understate it
    6x and break the upper-bound contract)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.pack import conv_examples

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["conv_id", "turn_idx", "text"])
    with input_rows_hint(n_turns):
        return conv_examples(ds, budget=CONV_EXAMPLE_BUDGET)


@_hinted("documents")
def q_length_buckets(sf_dir: str):
    """Pad-to-max batching planner: power-of-two token-length bins with
    per-bin doc count / token sum / max length / padding waste."""
    from .stages.textstats import length_buckets

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return length_buckets(ds)


def q_unigram_logprob(sf_dir: str):
    """Unigram-LM quality scoring over the documents corpus (CCNet-style
    perplexity proxy): global token counts (two-phase, vocab-bounded) ->
    broadcast micro-nat table -> stateless per-doc scoring pass."""
    from .stages.textstats import unigram_logprob

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return unigram_logprob(ds)


@_hinted("documents")
def q_seq_pack(sf_dir: str):
    """Sequence packing (concat-and-chunk): map every document to its span
    in the seq_len-token packed training stream via a distributed exclusive
    prefix-sum (per-range totals -> broadcast bases -> bucketed offsets)."""
    from .stages.pack import seq_pack

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return seq_pack(ds, seq_len=512, range_size=64)


def q_tfidf_topk(sf_dir: str):
    """Top-5 TF-IDF terms per document, exact-integer micro-nat idf scores
    (vocab-bounded df partials -> broadcast idf table -> stateless top-k)."""
    from .stages.textstats import tfidf_topk

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=5)


@_hinted("documents", fanout=64)
def q_dup_ngrams(sf_dir: str):
    """Intra-corpus duplicate k-gram statistics (Lee et al. exact-substring
    dedup signal): one bucketed shuffle of (doc, gram, multiplicity) rows —
    corpus gram totals are per-bucket segment sums, nothing broadcast.
    fanout=64 ≈ grams per doc (the shuffle moves one row per (doc, 8-gram),
    so the coalesce hint scales with the explode, not the doc count)."""
    from .stages.dedup import dup_ngram_stats

    ds = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dup_ngram_stats(ds, k=8)


def q_dd_span(sf_dir: str):
    """Datadog minimal DDSpan conversion
    (datadog/transform/transformer.rs:263-323): 64-bit id truncation
    (convert_trace_id = BE u64 of the LAST 8 bytes, convert_span_id = BE u64
    of the 8-byte id, absent parent -> 0), span.kind meta name, _top_level
    (root or server/consumer kind), _dd.measured (client/producer kind —
    enable_otlp_compute_top_level_by_span_kind path), error flag from the
    status, http status-code metric (otel_util.rs:288-307), start/duration
    ns — plus the general ``set_metric_otlp`` metrics map
    (transformer.rs:196-197,433-441): every Int/Double-valued span attr
    lands in the f64 metrics map, with ``sampling.priority`` renamed to
    ``_sampling_priority_v1``. The per-turn numeric attr set (synthesized
    sampling.priority + custom.load, parsed duration_ms + tool.exit)
    exercises the rename, Int and Double branches; the map serializes as
    sorted-key canonical JSON. Fused stateless map_batches."""
    from .functions.scalar import be_u64, span_id_from, trace_id_from

    ds = _parsed(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        et = t.column("event_type").combine_chunks()
        is_tool = pc.equal(et, "tool_call")
        is_server = pc.is_in(et, value_set=pa.array(["nginx_access", "json"]))
        kind = pc.if_else(is_tool, pa.scalar("client"),
                          pc.if_else(is_server, pa.scalar("server"),
                                     pc.if_else(pc.equal(et, "chat"),
                                                pa.scalar("unspecified"),
                                                pa.scalar("internal"))))
        conv = t.column("conv_id").combine_chunks()
        turn = t.column("turn_idx").combine_chunks()
        key = pc.binary_join_element_wise(conv, pc.cast(turn, pa.string()), ":")
        pkey = pc.binary_join_element_wise(
            conv, pc.cast(pc.subtract(turn, 1), pa.string()), ":")
        is_root = pc.equal(turn, 0)
        parent = pc.if_else(is_root, pa.scalar(0, pa.uint64()),
                            be_u64(span_id_from(pkey)))
        top_level = pc.or_(is_root, pc.equal(kind, "server"))
        measured = pc.equal(kind, "client")
        err = pc.or_kleene(
            pc.equal(et, "error"),
            pc.fill_null(pc.not_equal(t.column("tool_exit"), 0), False))
        ns = pc.multiply(pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                                 pa.int64()), np.int64(1000))
        dur = pc.fill_null(
            pc.multiply(pc.cast(t.column("duration_ms"), pa.int64()),
                        np.int64(1_000_000)), 0)
        # set_metric_otlp metrics map: f64 values of integral attrs render
        # as "<int>.0" (and halves as ".5") on both engines — byte-stable
        turn64 = pc.cast(turn, pa.int64())

        def jnum(key: str, ints: pa.Array) -> pa.Array:
            return pc.binary_join_element_wise(
                pa.nulls(n, pa.string()).fill_null(f'"{key}":'),
                pc.cast(ints, pa.string()), ".0", "",
                null_handling="emit_null")

        sp = jnum("_sampling_priority_v1", pc.bit_wise_and(turn64, 1))
        half = pc.cast(pc.divide(turn64, 2), pa.string())
        frac = pc.if_else(pc.equal(pc.bit_wise_and(turn64, 1), 0),
                          pa.scalar(".0"), pa.scalar(".5"))
        cl = pc.binary_join_element_wise(
            pa.nulls(n, pa.string()).fill_null('"custom.load":'), half, frac,
            "", null_handling="emit_null")
        dm = jnum("duration_ms", pc.cast(t.column("duration_ms"), pa.int64()))
        te = jnum("tool.exit", pc.cast(t.column("tool_exit"), pa.int64()))
        body = pc.binary_join_element_wise(sp, cl, dm, te, ",",
                                           null_handling="skip")
        metrics_json = pc.binary_join_element_wise(
            pa.nulls(n, pa.string()).fill_null("{"), body, "}", "",
            null_handling="emit_null")
        return pa.table({
            "conv_id": conv,
            "turn_idx": turn,
            "trace_id_u64": be_u64(trace_id_from(conv), offset=8),
            "span_id_u64": be_u64(span_id_from(key)),
            "parent_id_u64": parent,
            "span_kind": kind,
            "top_level": top_level,
            "measured": measured,
            "error": pc.cast(err, pa.int32()),
            "status_code": pc.cast(t.column("status"), pa.float64()),
            "start": ns,
            "duration": dur,
            "metrics_json": metrics_json,
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_ch_logs_row(sf_dir: str):
    """ClickHouse LogRecordRow table (transform_logs.rs:12-105,
    schema.rs:91-131): one row per parsed line — body stringify (string
    branch; other AnyValue branches unit-tested in any_value_to_string),
    hex trace/span ids for span-bearing lines, masked severity, sorted-key
    JSON attr maps, extended event_name column."""
    from .stages.ch_rows import log_record_rows
    return log_record_rows(_parsed(sf_dir))


def q_ch_traces_row(sf_dir: str):
    """ClickHouse SpanRow table (transform_traces.rs:13-173,
    schema.rs:22-66): client spans from tool calls — span_kind_to_string,
    Ok/Error status from the exit code, clamped ns duration, exception
    event arrays for failed calls, empty link arrays."""
    from .stages.ch_rows import span_rows
    return span_rows(_parsed(sf_dir))


def q_otlp_spans_json(sf_dir: str):
    """OTLP/JSON span export — the reference's primary exporter wire shape
    restated per the proto3 JSON mapping (one ExportTraceServiceRequest
    document per tool-call span; see stages/transform.py::otlp_span_json).
    The oracle-checked projection PARSES each emitted document back down
    the resourceSpans -> scopeSpans -> spans hierarchy — a structurally
    malformed document cannot round-trip."""
    import json as _json

    from .stages.transform import otlp_span_json

    events = _parsed(sf_dir).map_batches(otlp_span_json, batch_format="pyarrow",
                                         zero_copy_batch=True)

    def parse_back(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("service", "trace_id", "span_id",
                                "parent_span_id", "name", "kind", "start_ns",
                                "end_ns", "tool_exit", "status_code")}
        for ev in t.column("event").to_pylist():
            doc = _json.loads(ev)
            rs = doc["resourceSpans"][0]
            attrs = {a["key"]: a["value"] for a in rs["resource"]["attributes"]}
            sc = rs["scopeSpans"][0]
            assert sc["scope"]["name"] == "rotel_ray"
            sp = sc["spans"][0]
            sattrs = {a["key"]: a["value"] for a in sp["attributes"]}
            rows["service"].append(attrs["service.name"]["stringValue"])
            rows["trace_id"].append(sp["traceId"])
            rows["span_id"].append(sp["spanId"])
            rows["parent_span_id"].append(sp.get("parentSpanId", ""))
            rows["name"].append(sp["name"])
            rows["kind"].append(sp["kind"])
            rows["start_ns"].append(int(sp["startTimeUnixNano"]))
            rows["end_ns"].append(int(sp["endTimeUnixNano"]))
            rows["tool_exit"].append(int(sattrs["tool.exit"]["intValue"]))
            rows["status_code"].append(sp["status"]["code"])
        return pa.table({
            "conv_id": t.column("conv_id"), "turn_idx": t.column("turn_idx"),
            **{k: pa.array(v, pa.int64() if k in ("kind", "start_ns", "end_ns",
                                                  "tool_exit", "status_code")
                           else pa.string()) for k, v in rows.items()},
        })

    return events.map_batches(parse_back, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_otlp_logs_json(sf_dir: str):
    """OTLP/JSON log export (ExportLogsServiceRequest per parsed line, see
    stages/transform.py::otlp_log_json) with a parse-back oracle — body
    escaping must round-trip the raw line exactly."""
    import json as _json

    from .stages.transform import otlp_log_json

    events = _parsed(sf_dir).map_batches(otlp_log_json, batch_format="pyarrow",
                                         zero_copy_batch=True)

    def parse_back(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("service", "time_ns", "severity_number",
                                "severity_text", "body", "event_type",
                                "trace_id", "span_id")}
        for ev in t.column("event").to_pylist():
            doc = _json.loads(ev)
            rl = doc["resourceLogs"][0]
            attrs = {a["key"]: a["value"] for a in rl["resource"]["attributes"]}
            sc = rl["scopeLogs"][0]
            assert sc["scope"]["name"] == "rotel_ray"
            lr = sc["logRecords"][0]
            lattrs = {a["key"]: a["value"] for a in lr["attributes"]}
            rows["service"].append(attrs["service.name"]["stringValue"])
            rows["time_ns"].append(int(lr["timeUnixNano"]))
            rows["severity_number"].append(lr["severityNumber"])
            rows["severity_text"].append(lr["severityText"])
            rows["body"].append(lr["body"]["stringValue"])
            rows["event_type"].append(lattrs["event.type"]["stringValue"])
            rows["trace_id"].append(lr.get("traceId", ""))
            rows["span_id"].append(lr.get("spanId", ""))
        ints = {"time_ns", "severity_number"}
        return pa.table({
            "conv_id": t.column("conv_id"), "turn_idx": t.column("turn_idx"),
            **{k: pa.array(v, pa.int64() if k in ints else pa.string())
               for k, v in rows.items()},
        })

    return events.map_batches(parse_back, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_otlp_metrics_json(sf_dir: str):
    """OTLP/JSON metric export (ExportMetricsServiceRequest per grouped
    stat-set row, histogram data point with string u64 count — see
    stages/transform.py::otlp_metric_json) with a parse-back oracle."""
    import json as _json

    from .stages.aggregate import metrics_aggregate as _magg
    from .stages.transform import otlp_metric_json

    agg = _magg(_parsed(sf_dir))
    events = agg.map_batches(otlp_metric_json, batch_format="pyarrow",
                             zero_copy_batch=True)

    def parse_back(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("namespace", "name", "role", "time_ns",
                                "value_count", "value_sum", "value_min",
                                "value_max")}
        for ev in t.column("event").to_pylist():
            doc = _json.loads(ev)
            rm = doc["resourceMetrics"][0]
            rattrs = {a["key"]: a["value"] for a in rm["resource"]["attributes"]}
            sm = rm["scopeMetrics"][0]
            m = sm["metrics"][0]
            dp = m["histogram"]["dataPoints"][0]
            assert m["histogram"]["aggregationTemporality"] == 2
            dattrs = {a["key"]: a["value"] for a in dp["attributes"]}
            rows["namespace"].append(rattrs["service.namespace"]["stringValue"])
            rows["name"].append(m["name"])
            rows["role"].append(dattrs["role"]["stringValue"])
            rows["time_ns"].append(int(dp["timeUnixNano"]))
            rows["value_count"].append(int(dp["count"]))
            rows["value_sum"].append(float(dp["sum"]))
            rows["value_min"].append(float(dp["min"]))
            rows["value_max"].append(float(dp["max"]))
        ints = {"time_ns", "value_count"}
        flts = {"value_sum", "value_min", "value_max"}
        return pa.table({
            k: pa.array(v, pa.int64() if k in ints else
                        pa.float64() if k in flts else pa.string())
            for k, v in rows.items()})

    return events.map_batches(parse_back, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_metrics_emf_json(sf_dir: str):
    """EMF JSON event serialization + namespace fallback chain
    (awsemf/transformer.rs:533-619, 746-766): grouped metrics with
    service.namespace/service.name resource attrs -> one `_aws` EMF event
    per group; the oracle-checked projection parses the emitted event back
    to its structural fields (a malformed event cannot round-trip)."""
    import json as _json

    from .stages.aggregate import metrics_aggregate as _magg
    from .stages.transform import emf_event_json

    parsed = _parsed(sf_dir)

    def add_svc(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.append_column("service_namespace", pa.nulls(n, pa.string()).fill_null("svc"))
        return t.append_column("service_name", pa.nulls(n, pa.string()).fill_null("rotel"))

    agg = _magg(parsed.map_batches(add_svc, batch_format="pyarrow", zero_copy_batch=True),
                namespace=None)

    def label_split(t: pa.Table) -> pa.Table:
        role = pc.utf8_replace_slice(t.column("group_key").combine_chunks(), 0, 5, "")
        return t.append_column("role", role)

    events = agg.map_batches(label_split, batch_format="pyarrow").map_batches(
        lambda t: emf_event_json(t, label_cols=["role"]), batch_format="pyarrow"
    )

    def parse_back(t: pa.Table) -> pa.Table:
        rows = [_json.loads(e) for e in t.column("event").to_pylist()]
        cw = [r["_aws"]["CloudWatchMetrics"][0] for r in rows]
        names = [c["Metrics"][0]["Name"] for c in cw]
        stat = [r[n] for r, n in zip(rows, names)]
        return pa.table(
            {
                "timestamp_ms": t.column("timestamp_ms"),
                "namespace": pa.array([c["Namespace"] for c in cw], pa.string()),
                "name": pa.array(names, pa.string()),
                "dims": pa.array([",".join(c["Dimensions"][0]) for c in cw], pa.string()),
                "role": pa.array([r["role"] for r in rows], pa.string()),
                "value_count": pa.array([s["Count"] for s in stat], pa.int64()),
                "value_sum": pa.array([s["Sum"] for s in stat], pa.float64()),
                "value_min": pa.array([s["Min"] for s in stat], pa.float64()),
                "value_max": pa.array([s["Max"] for s in stat], pa.float64()),
            }
        )

    return events.map_batches(parse_back, batch_format="pyarrow")


def q_xray_groups(sf_dir: str):
    """X-Ray prefix-strip attribute grouping (xray/transformer.rs:360-429):
    http.request.* / http.response.* / annotation.* / aws.* columns map to
    grouped blocks with prefixes stripped, plus the seeded
    metadata.environment entry — exploded to (block, key, value) rows."""
    from .stages.transform import xray_prefix_groups

    ds = _parsed(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "nginx_access"))
        req = t.column("request").combine_chunks()
        method = pc.struct_field(pc.extract_regex(pc.fill_null(req, ""), r"^(?P<m>\S+) "), "m")
        span = pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "http.request.method": method,
                "http.request.client_ip": t.column("remote_addr"),
                "http.response.status": pc.cast(t.column("status"), pa.string()),
                "annotation.conv": t.column("conv_id"),
                "aws.request_id": pc.binary_join_element_wise(
                    t.column("conv_id").combine_chunks(),
                    pc.cast(t.column("turn_idx").combine_chunks(), pa.string()), ":"
                ),
            }
        )
        return xray_prefix_groups(span, id_cols=("conv_id", "turn_idx"),
                                  environment="production")

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_redaction_body(sf_dir: str):
    """Recursive log-body redaction (redaction_processor.py:318-397): IPs in
    any nested string value of the JSON body are substituted; the
    oracle-checked projection parses the redacted body back plus the
    masked-key meta columns."""
    import json as _json

    from .stages.enrich import BodyRedactor, RedactionConfig

    red = BodyRedactor(
        RedactionConfig(blocked_value_patterns=[r"\d+\.\d+\.\d+\.\d+"]), body_col="body"
    )
    ds = _parsed(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "json"))
        return pa.table({"conv_id": t.column("conv_id"), "turn_idx": t.column("turn_idx"),
                         "body": t.column("text")})

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(red, batch_format="pyarrow")

    def parse_back(t: pa.Table) -> pa.Table:
        rows = [_json.loads(b) for b in t.column("body").to_pylist()]
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "remote_addr": pa.array([r.get("remote_addr") for r in rows], pa.string()),
                "status": pa.array([r.get("status") for r in rows], pa.int64()),
                "body_masked_count": t.column("body_masked_count"),
                "body_masked_keys": t.column("body_masked_keys"),
            }
        )

    return ds.map_batches(parse_back, batch_format="pyarrow")


def q_fluent_forward(sf_dir: str):
    """Fluent forward-protocol receiver path: real msgpack wire decode
    (Message/Forward variants, receivers/fluent/message.rs:8-18) over a
    deterministic fixture derived from the transcripts, aggregated per tag —
    must match the parquet-side per-conversation counts/timestamps."""
    from .sources.fluent import ensure_fluent_fixture, read_forward_msgpack

    fdir = ensure_fluent_fixture(ensure_transcripts(sf_dir))
    ds = read_forward_msgpack(fdir)
    ds = ds.map_batches(
        lambda t: t.select(["tag", "ts"]), batch_format="pyarrow", zero_copy_batch=True
    )
    agg = two_phase_aggregate(
        ds, ["tag"],
        [("ts", "count", "n_entries"), ("ts", "min", "first_ts"), ("ts", "max", "last_ts")],
    )
    return _cast_final(agg, {"first_ts": pa.timestamp("us"), "last_ts": pa.timestamp("us")})


def q_file_source_gz(sf_dir: str):
    """Compressed-input receiver path: gzip log files decompressed in the
    read tasks (otlp_http.rs:500-530, 671-677) -> same parse -> severity
    histogram; must equal the uncompressed file_source oracle."""
    from .sources.text_logs import ensure_log_files_gz, parse_log_files

    gdir = ensure_log_files_gz(ensure_transcripts(sf_dir))
    ds = parse_log_files(gdir)
    ds = ds.map_batches(
        lambda t: t.select(["event_type", "severity_number"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    agg = two_phase_aggregate(
        ds, ["event_type", "severity_number"], [("event_type", "count", "n")]
    )
    return _cast_final(agg, {"severity_number": pa.int32()})


def q_kcore_peel(sf_dir: str):
    """Fixed-round 2-core peeling over the link graph (chained-CTE
    oracle, the pagerank convention): survivors of 3 degree-filter
    rounds with their last-check degree."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import ensure_link_graph, kcore_peel

    gdir = ensure_link_graph(sf_dir)
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    with input_rows_hint(2 * n_edges):
        return kcore_peel(edges)


def q_token_canonical(sf_dir: str):
    """Lexicon canonicalization: min-label connected components over the
    FastSS typo-pair graph; canonical = lexicographically smallest
    cluster member."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.textstats import token_canonical

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["text"])
    with input_rows_hint(n_turns):
        return token_canonical(ds)


@_hinted("events")
def q_retention_audit(sf_dir: str):
    """7-day TTL deletion dry run per event type, anchored at the corpus
    max timestamp from footer stats."""
    from .stages.compact import footer_min_max
    from .stages.window import retention_audit

    now_us = footer_min_max(f"{sf_dir}/events.parquet", ["ts"])["ts_max"]
    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["ts", "event_type"])
    return retention_audit(ds, now_us)


def q_clustering_coef(sf_dir: str):
    """Per-node local clustering coefficient over the link graph (exact
    int fields: degree, triangles through the node, cc_e6) — the
    per-page link-farm signal."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import clustering_coefficient, ensure_link_graph

    gdir = ensure_link_graph(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    # wedge fan-out bound, the triangle_count convention
    with input_rows_hint(n_edges * 32):
        return clustering_coefficient(edges, n)


@_hinted("events")
def q_user_event_entropy(sf_dir: str):
    """Per-user behavioral entropy over event types, exact int64
    micro-nats (bot/monoculture detector)."""
    from .stages.window import user_event_entropy

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type"])
    return user_event_entropy(ds)


def q_script_mix(sf_dir: str):
    """Per-source UTF-8 width-class composition (ASCII / 2-byte / 3-byte
    BMP / 4-byte astral codepoints) over the dirtied unicode fixture —
    lead-byte counting on the raw Arrow buffers, no decode."""
    from .stages.aggregate import input_rows_hint
    from .stages.clean import ensure_unicode_docs, script_mix

    udir = ensure_unicode_docs(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    texts = read_parquet(udir, columns=["doc_id", "text"])
    sources = read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    with input_rows_hint(2 * n):
        return script_mix(texts, sources)


def q_hits_scores(sf_dir: str):
    """Fixed-iteration exact-integer HITS hubs/authorities over the
    directed link graph (2 rounds, unnormalized int recurrence) —
    bit-exact vs a chained-CTE DuckDB replay."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import ensure_link_graph, hits_int

    gdir = ensure_link_graph(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    with input_rows_hint(n_edges + n):
        return hits_int(edges, n)


@_hinted("events")
def q_volume_trend(sf_dir: str):
    """Per-type hourly log-volume least-squares slope (micro-events/hour
    per hour), hour index anchored by footer stats."""
    from .stages.compact import footer_min_max
    from .stages.window import volume_trend

    hour0 = (footer_min_max(f"{sf_dir}/events.parquet", ["ts"])["ts_min"]
             // 3_600_000_000)
    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["ts", "event_type"])
    return volume_trend(ds, hour0)


@_hinted("documents")
def q_fertility_by_lang(sf_dir: str):
    """Tokenizer-fertility proxy per language: exact chars-per-token
    ratio over whitespace tokens."""
    from .stages.textstats import fertility_by_lang

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["lang", "text"])
    return fertility_by_lang(ds)


@_hinted("documents")
def q_readability(sf_dir: str):
    """Per-doc readability raw fields (Flesch inputs) as exact ints:
    words, sentence runs, vowel-group syllable proxy + e3 ratios."""
    from .stages.textstats import readability

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return readability(ds)


def q_edge_overlap(sf_dir: str):
    """Per-edge common-neighbor count + neighborhood Jaccard over the
    link graph (tie-strength / link-spam signal)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import edge_overlap, ensure_link_graph

    gdir = ensure_link_graph(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    with input_rows_hint(n_edges * 32):
        return edge_overlap(edges, n)


@_hinted("events")
def q_anomaly_hours(sf_dir: str):
    """Hourly volume anomalies per event type (|z| > 2 via the
    division-free exact-integer z² identity)."""
    from .stages.compact import footer_min_max
    from .stages.window import anomaly_hours

    hour0 = (footer_min_max(f"{sf_dir}/events.parquet", ["ts"])["ts_min"]
             // 3_600_000_000)
    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["ts", "event_type"])
    return anomaly_hours(ds, hour0)


@_hinted("documents")
def q_length_ks(sf_dir: str):
    """Exact KS drift statistic of each source's doc-length CDF vs the
    whole corpus (64-char buckets, arbitrary-precision ints)."""
    from .stages.textstats import length_ks

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "n_chars"])
    return length_ks(ds)


@_hinted("events")
def q_props_stats(sf_dir: str):
    """JSON side-payload promotion: extract props.k with one shared RE2
    pattern and reduce per event type."""
    from .stages.window import props_stats

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "props"])
    return props_stats(ds)


@_hinted("events")
def q_audience_overlap(sf_dir: str):
    """Pairwise distinct-user overlap + exact Jaccard between event
    types (the pair_cooccurrence kernel grouped by user)."""
    from .stages.window import audience_overlap

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type"])
    return audience_overlap(ds)


@_hinted("lineitem")
def q_promo_share(sf_dir: str):
    """TPC-H Q14-shaped promo revenue share per ship year: part type
    broadcast onto the lineitem stream (never shuffled), exact cents
    sums, share_e6 = floor(1e6·promo/total)."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_partkey", "l_shipdate",
                               "l_extendedprice", "l_discount"])
    li = broadcast_join(li, part, left_on="l_partkey",
                        right_on="p_partkey", take_cols=["p_type"])

    def prep(t: pa.Table) -> pa.Table:
        rev = _cents_arr(pc.multiply(t.column("l_extendedprice"),
                                     pc.subtract(1.0, t.column("l_discount"))))
        promo = pc.cast(pc.equal(t.column("p_type"), "PROMO"), pa.int64())
        return pa.table({
            "ship_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
            "promo_cents": pc.multiply(rev, promo),
            "total_cents": rev})

    agg = two_phase_aggregate(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["ship_year"],
        [("promo_cents", "sum", "promo_cents"),
         ("total_cents", "sum", "total_cents")], num_buckets=8)

    def share(t: pa.Table) -> pa.Table:
        p = t.column("promo_cents").to_numpy(zero_copy_only=False)
        tot = t.column("total_cents").to_numpy(zero_copy_only=False)
        s = np.where(tot > 0, p * 1_000_000 // np.maximum(tot, 1), 0)
        return t.append_column("share_e6", pa.array(s.astype(np.int64)))

    return agg.map_batches(share, batch_format="pyarrow",
                           zero_copy_batch=True)


@_hinted("supplier")
def q_supplier_rank(sf_dir: str):
    """Top-3 suppliers per nation by account balance (deterministic
    suppkey tiebreak): the topk_per_group bounded-shuffle kernel over a
    relational dimension table + nation-name broadcast."""
    from .stages.join import broadcast_join
    from .stages.window import topk_per_group

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    ds = read_parquet(f"{sf_dir}/supplier.parquet",
                      columns=["s_suppkey", "s_name", "s_nationkey",
                               "s_acctbal"])
    top = topk_per_group(ds, key="s_nationkey", order_col="s_acctbal",
                         id_col="s_suppkey", k=3,
                         cols=["s_nationkey", "s_acctbal", "s_suppkey",
                               "s_name"])
    top = broadcast_join(top, nation, left_on="s_nationkey",
                         right_on="n_nationkey", take_cols=["n_name"])
    return top.map_batches(
        lambda t: t.select(["n_name", "s_suppkey", "s_name", "s_acctbal"]),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("lineitem")
def q_ship_delay(sf_dir: str):
    """Exact ship-delay percentiles per order priority (days from order
    to line shipment, negative-safe offset floor): lineitem ⋈ orders
    bucket join into the group_quantiles bounded-value histogram."""
    from .stages.join import bucket_hash_join
    from .stages.window import group_quantiles

    DAY = 86_400_000_000
    OFF = 10_000
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate",
                                   "o_orderpriority"])
    j = bucket_hash_join(li, orders, on="l_orderkey",
                         right_on="o_orderkey", num_buckets=32)

    def delay(t: pa.Table) -> pa.Table:
        s = (t.column("l_shipdate").combine_chunks()
             .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy())
        o = (t.column("o_orderdate").combine_chunks()
             .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy())
        # + OFF days keeps the dividend positive so // floors identically
        # in numpy and DuckDB (which truncates toward zero on negatives)
        d = (s - o + OFF * DAY) // DAY - OFF
        return pa.table({"o_orderpriority": t.column("o_orderpriority"),
                         "delay_days": pa.array(d)})

    return group_quantiles(
        j.map_batches(delay, batch_format="pyarrow", zero_copy_batch=True),
        key="o_orderpriority", value_col="delay_days", percents=(50, 95))


@_hinted("lineitem")
def q_top_unshipped_orders(sf_dir: str):
    """TPC-H Q3-shaped shipping backlog: BUILDING-segment orders placed
    before the cutoff whose lines are still shipping after it, ranked by
    outstanding revenue (exact cents). The segment filter rides a
    broadcast semi-join, the fact⋈fact side is the bucketed orderkey
    join, and the global top-10 uses the bounded topk kernel
    (revenue desc, orderkey asc — deterministic)."""
    import datetime

    from .stages.aggregate import two_phase_aggregate
    from .stages.join import broadcast_join, bucket_hash_join
    from .stages.window import topk_per_group

    CUT = datetime.datetime(1998, 1, 1)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING"))
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"), pa.scalar(CUT)))
        us = pc.cast(pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey"),
                         "o_orderdate_us": us})

    orders = broadcast_join(
        orders.map_batches(o_prep, batch_format="pyarrow",
                           zero_copy_batch=True),
        cust.select(["c_custkey"]), left_on="o_custkey",
        right_on="c_custkey", take_cols=[])
    orders = orders.map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate_us"]),
        batch_format="pyarrow", zero_copy_batch=True)

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_shipdate",
                               "l_extendedprice", "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), pa.scalar(CUT)))
        rev = _cents_arr(pc.multiply(t.column("l_extendedprice"),
                                     pc.subtract(1.0, t.column("l_discount"))))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev_cents": rev})

    j = bucket_hash_join(
        li.map_batches(l_prep, batch_format="pyarrow", zero_copy_batch=True),
        orders, on="l_orderkey", right_on="o_orderkey", num_buckets=32)
    per_order = two_phase_aggregate(
        j, ["l_orderkey"],
        [("rev_cents", "sum", "revenue_cents"),
         ("o_orderdate_us", "min", "o_orderdate_us")], num_buckets=32)
    top = topk_per_group(
        per_order.map_batches(
            lambda t: t.append_column(
                "g", pa.nulls(t.num_rows, pa.int64()).fill_null(0)),
            batch_format="pyarrow", zero_copy_batch=True),
        key="g", order_col="revenue_cents", id_col="l_orderkey", k=10,
        cols=["g", "revenue_cents", "l_orderkey", "o_orderdate_us"])
    return top.map_batches(
        lambda t: t.select(["l_orderkey", "revenue_cents", "o_orderdate_us"]),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("lineitem")
def q_order_priority_check(sf_dir: str):
    """TPC-H Q4-shaped order-priority SLA check: per priority, how many
    orders have at least one line shipped more than 90 days after the
    order date (the EXISTS semi-join, restated as a per-order max flag
    over the bucketed orderkey join, then a tiny priority rollup with an
    e6 late share)."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import bucket_hash_join

    DAY = 86_400_000_000
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate",
                                   "o_orderpriority"])
    j = bucket_hash_join(li, orders, on="l_orderkey",
                         right_on="o_orderkey", num_buckets=32)

    def flag(t: pa.Table) -> pa.Table:
        s = (t.column("l_shipdate").combine_chunks()
             .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy())
        o = (t.column("o_orderdate").combine_chunks()
             .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy())
        late = (s - o > 90 * DAY).astype(np.int64)
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "o_orderpriority": t.column("o_orderpriority"),
                         "late": pa.array(late)})

    per_order = two_phase_aggregate(
        j.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey", "o_orderpriority"], [("late", "max", "late")],
        num_buckets=32)

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": t.column("o_orderpriority"),
                         "late": t.column("late"),
                         "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    agg = two_phase_aggregate(
        per_order.map_batches(ones, batch_format="pyarrow",
                              zero_copy_batch=True),
        ["o_orderpriority"],
        [("one", "sum", "n_orders"), ("late", "sum", "n_late")],
        num_buckets=4)

    def share(t: pa.Table) -> pa.Table:
        n = t.column("n_orders").to_numpy(zero_copy_only=False)
        l = t.column("n_late").to_numpy(zero_copy_only=False)
        return t.append_column(
            "late_e6", pa.array((l * 1_000_000 // n).astype(np.int64)))

    return agg.map_batches(share, batch_format="pyarrow",
                           zero_copy_batch=True)


@_hinted("lineitem")
def q_totalprice_audit(sf_dir: str):
    """Billing integrity audit: per order, the signed cents gap between
    o_totalprice and Σ line extendedprice·(1+tax)·(1−discount), rolled
    into a bit_length-of-|gap| histogram — the reconciliation report a
    finance pipeline runs nightly (the synthetic corpus mismatches by
    design, so every magnitude bucket binds)."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import bucket_hash_join

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_extendedprice",
                               "l_discount", "l_tax"])

    def l_prep(t: pa.Table) -> pa.Table:
        amt = _cents_arr(pc.multiply(
            pc.multiply(t.column("l_extendedprice"),
                        pc.add(1.0, t.column("l_tax"))),
            pc.subtract(1.0, t.column("l_discount"))))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "line_cents": amt})

    per_order = two_phase_aggregate(
        li.map_batches(l_prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_orderkey"], [("line_cents", "sum", "line_cents")],
        num_buckets=32)
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: pa.table({"o_orderkey": t.column("o_orderkey"),
                            "total_cents": _cents_arr(
                                t.column("o_totalprice"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = bucket_hash_join(per_order, orders, on="l_orderkey",
                         right_on="o_orderkey", num_buckets=32)

    _powers = np.left_shift(np.int64(1), np.arange(63))

    def bucketize(t: pa.Table) -> pa.Table:
        gap = (t.column("total_cents").to_numpy(zero_copy_only=False)
               - t.column("line_cents").to_numpy(zero_copy_only=False))
        a = np.abs(gap)
        # exact integer bit_length (0 for exact match) — the
        # length_buckets searchsorted idiom, no float log anywhere
        b = np.searchsorted(_powers, a, side="right").astype(np.int64)
        return pa.table({
            "gap_bucket": pa.array(b),
            "one": pa.nulls(len(a), pa.int64()).fill_null(1),
            "abs_gap": pa.array(a)})

    return two_phase_aggregate(
        j.map_batches(bucketize, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["gap_bucket"],
        [("one", "sum", "n_orders"), ("abs_gap", "sum", "sum_abs_gap")],
        num_buckets=4)


@_hinted("orders")
def q_orphan_orders(sf_dir: str):
    """Referential-integrity audit that actually binds: orders with NO
    lineitems (the bucketed anti-join), counted per order year — the
    orphan-row report an ingest reconciliation emits."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import bucket_anti_join

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "order_year": pc.cast(pc.year(t.column("o_orderdate")),
                                  pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey"])
    orphans = bucket_anti_join(orders, li, on="o_orderkey",
                               right_on="l_orderkey", num_buckets=32)
    return two_phase_aggregate(
        orphans.map_batches(
            lambda t: pa.table({
                "order_year": t.column("order_year"),
                "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["order_year"], [("one", "sum", "n_orphans")], num_buckets=4)


@_hinted("orders")
def q_order_status_trend(sf_dir: str):
    """Order-status mix per year with within-year e6 shares (the
    fulfillment trend view)."""
    from .stages.aggregate import grouped_apply, two_phase_aggregate

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderstatus", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "order_year": pc.cast(pc.year(t.column("o_orderdate")),
                                  pa.int64()),
            "o_orderstatus": t.column("o_orderstatus"),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    agg = two_phase_aggregate(
        orders.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["order_year", "o_orderstatus"], [("one", "sum", "n_orders")],
        num_buckets=8)

    import pandas as pd

    def share(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"order_year": pd.Series([], np.int64),
                                 "o_orderstatus": pd.Series([], str),
                                 "n_orders": pd.Series([], np.int64),
                                 "share_e6": pd.Series([], np.int64)})
        g = g.copy()
        tot = g.groupby("order_year")["n_orders"].transform("sum")
        g["share_e6"] = (g["n_orders"] * 1_000_000 // tot).astype(np.int64)
        return g[["order_year", "o_orderstatus", "n_orders", "share_e6"]]

    return grouped_apply(agg, ["order_year"], share, num_buckets=4)


@_hinted("events")
def q_column_sizes(sf_dir: str):
    """Column-level storage audit of the events table from parquet
    footers only (per-column compressed/uncompressed bytes and ratio —
    the encoding/sort-order planning view)."""
    import os as _os

    from .stages.compact import column_sizes

    return column_sizes(_os.path.dirname(f"{sf_dir}/events.parquet")
                        or sf_dir, pattern="events.parquet")


@_hinted("events")
def q_churn_flags(sf_dir: str):
    """Inactivity census anchored at the corpus max timestamp (footer
    stats): users idle > 30 days are churned. One row
    (n_users, n_churned, churn_e6)."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.compact import footer_min_max

    mm = footer_min_max(f"{sf_dir}/events.parquet", ["ts"])
    cutoff = mm["ts_max"] - 30 * 86_400_000_000
    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({"user_id": t.column("user_id"), "us": us})

    last = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("us", "max", "last_us")], num_buckets=16)

    def flag(t: pa.Table) -> pa.Table:
        lu = t.column("last_us").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.nulls(len(lu), pa.int64()).fill_null(0),
            "one": pa.nulls(len(lu), pa.int64()).fill_null(1),
            "churned": pa.array((lu < cutoff).astype(np.int64))})

    agg = two_phase_aggregate(
        last.map_batches(flag, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["g"], [("one", "sum", "n_users"), ("churned", "sum", "n_churned")],
        num_buckets=1)

    def rate(t: pa.Table) -> pa.Table:
        n = t.column("n_users").to_numpy(zero_copy_only=False)
        c = t.column("n_churned").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_users": t.column("n_users"),
            "n_churned": t.column("n_churned"),
            "churn_e6": pa.array(c * 1_000_000 // np.maximum(n, 1))})

    return agg.map_batches(rate, batch_format="pyarrow",
                           zero_copy_batch=True)


@_hinted("events")
def q_repeat_purchase_rate(sf_dir: str):
    """Repeat-purchase census: among purchasing users, the share with
    ≥2 purchases plus the purchase-count histogram grain (one row per
    purchase count)."""
    from .stages.aggregate import two_phase_aggregate

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return pa.table({"user_id": t.column("user_id"),
                         "one": pa.nulls(t.num_rows,
                                         pa.int64()).fill_null(1)})

    per_user = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("one", "sum", "n_purchases")], num_buckets=16)
    return two_phase_aggregate(
        per_user.map_batches(
            lambda t: pa.table({
                "n_purchases": t.column("n_purchases"),
                "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["n_purchases"], [("one", "sum", "n_users")], num_buckets=2)


def q_mm_colorfulness(sf_dir: str):
    """Colorfulness census over real RGB/RGBA decodes: exact integer
    Hasler–Süsstrunk opponent moments (rg = R−G, yb = R+G−2B sums and
    squares); the float colorfulness score stays with the consumer."""
    from .generator import sf_from_dir
    from .stages.multimodal import (MediaDecoder, ensure_media,
                                    image_colorfulness)

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    return ds.map_batches(image_colorfulness, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


def q_cross_table_overlap(sf_dir: str):
    """Cross-table contamination: per source, how many document texts
    appear verbatim (content md5) anywhere in the transcript stream —
    the eval-leak check across modalities; only hashes shuffle."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint, two_phase_aggregate
    from .stages.enrich import _hash_values
    from .stages.join import bucket_hash_join

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
    dh = docs.map_batches(
        lambda t: pa.table({"h": _hash_values(t.column("text"), "md5"),
                            "source": t.column("source")}),
        batch_format="pyarrow", zero_copy_batch=True)
    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    turns = read_parquet(tdir, columns=["text"])
    with input_rows_hint(n):
        th = two_phase_aggregate(
            turns.map_batches(
                lambda t: pa.table({
                    "h": _hash_values(t.column("text"), "md5"),
                    "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
                batch_format="pyarrow", zero_copy_batch=True),
            ["h"], [("one", "max", "hit")], num_buckets=16)
    j = bucket_hash_join(dh, th, on="h", how="left", fill={"hit": 0},
                         num_buckets=16)

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.nulls(t.num_rows, pa.int64()).fill_null(1))

    return two_phase_aggregate(
        j.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("one", "sum", "n_docs"), ("hit", "sum", "n_leaked")],
        num_buckets=4)


@_hinted("lineitem")
def q_price_ladder(sf_dir: str):
    """Revenue grid by quantity band (8-unit steps) × discount cents —
    the price-ladder contingency a pricing analysis reads; exact cents,
    one bounded two-phase grid."""
    from .stages.aggregate import two_phase_aggregate

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_quantity", "l_discount",
                               "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        q = pc.cast(t.column("l_quantity"), pa.int64())
        return pa.table({
            "qty_band": pc.divide(q, 8),
            "disc_cents": _cents_arr(t.column("l_discount")),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "rev_cents": _cents_arr(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(1.0, t.column("l_discount"))))})

    return two_phase_aggregate(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["qty_band", "disc_cents"],
        [("one", "sum", "n_lines"), ("rev_cents", "sum", "revenue_cents")],
        num_buckets=8)


def q_mm_sharpness(sf_dir: str):
    """Blur/sharpness census over real decoded images: squared-Laplacian
    mass on the 16×16 integer-luma floor grid (dHash conventions)."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, ensure_media, image_sharpness

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    return ds.map_batches(image_sharpness, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


@_hinted("events")
def q_value_outliers(sf_dir: str):
    """Tukey-fence outlier census of event values per type (exact
    nearest-rank quartiles over the cents histogram)."""
    from .stages.window import value_outliers

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "value"])
    return value_outliers(ds)


@_hinted("orders")
def q_market_concentration(sf_dir: str):
    """Per-nation HHI of customer spend (1e12 = one customer owns the
    market): exact big-int squares over per-customer cents totals."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.profile import market_concentration

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("o_custkey"),
                         "cents": _cents_arr(t.column("o_totalprice"))})

    spend = two_phase_aggregate(
        orders.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["k"], [("cents", "sum", "cents")], num_buckets=16)
    members = read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    members = members.map_batches(
        lambda t: pa.table({"k": t.column("c_custkey"),
                            "c_nationkey": pc.cast(t.column("c_nationkey"),
                                                   pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return market_concentration(spend, members)


@_hinted("documents")
def q_corpus_health(sf_dir: str):
    """One-row corpus health report — the composed dashboard a curation
    run prints first: doc/source/token counts, source-mix entropy
    (micro-nats), the hottest source's e6 token share, distinct content
    hashes (exact-dup detector: n_docs − n_content = dup mass) and the
    control-char count (should be 0 on a clean corpus). Three bounded
    partial streams union into a single-row finisher."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.clean import ZAP_PATTERN

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])

    def prep(t: pa.Table) -> pa.Table:
        from .stages.enrich import _hash_values

        toks = pc.cast(pc.count_substring_regex(t.column("text"),
                                                pattern=r"\S+"), pa.int64())
        zap = pc.cast(pc.count_substring_regex(t.column("text"),
                                               pattern=ZAP_PATTERN),
                      pa.int64())
        return pa.table({"source": t.column("source"),
                         "h": _hash_values(t.column("text"), "md5"),
                         "toks": toks, "zap": zap,
                         "one": pa.nulls(t.num_rows,
                                         pa.int64()).fill_null(1)})

    narrow = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    per_source = two_phase_aggregate(
        narrow.map_batches(
            lambda t: t.select(["source", "toks", "zap", "one"]),
            batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("one", "sum", "n_docs"), ("toks", "sum", "n_tokens"),
         ("zap", "sum", "n_zap")], num_buckets=4)
    per_source = per_source.map_batches(
        lambda t: pa.table({
            "kind": pa.array(["src"] * t.num_rows),
            "v1": t.column("n_docs"), "v2": t.column("n_tokens"),
            "v3": t.column("n_zap")}),
        batch_format="pyarrow", zero_copy_batch=True)
    hashes = two_phase_aggregate(
        narrow.map_batches(
            lambda t: t.select(["h"]).append_column(
                "one", pa.nulls(t.num_rows, pa.int64()).fill_null(1)),
            batch_format="pyarrow", zero_copy_batch=True),
        ["h"], [("one", "max", "one")], num_buckets=16)
    n_content = two_phase_aggregate(
        hashes.map_batches(
            lambda t: pa.table({
                "g": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
                "one": t.column("one")}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["g"], [("one", "sum", "n")], num_buckets=1)
    n_content = n_content.map_batches(
        lambda t: pa.table({"kind": pa.array(["content"] * t.num_rows),
                            "v1": t.column("n"),
                            "v2": pa.nulls(t.num_rows,
                                           pa.int64()).fill_null(0),
                            "v3": pa.nulls(t.num_rows,
                                           pa.int64()).fill_null(0)}),
        batch_format="pyarrow", zero_copy_batch=True)

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        src = df[df["kind"] == "src"]
        n_docs = int(src["v1"].sum())
        n_tokens = int(src["v2"].sum())
        n_zap = int(src["v3"].sum())
        c = src["v2"].to_numpy().astype(np.int64)
        ent = int((c * np.floor(
            np.log(np.float64(max(n_tokens, 1)) / np.maximum(c, 1))
            * 1e6).astype(np.int64)).sum()) if len(c) else 0
        top = int(c.max()) * 1_000_000 // max(n_tokens, 1) if len(c) else 0
        nc = int(df[df["kind"] == "content"]["v1"].sum())
        return pa.table({
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_sources": pa.array([len(src)], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "mix_ent_unat": pa.array([ent], pa.int64()),
            "top_source_share_e6": pa.array([top], pa.int64()),
            "n_content_hashes": pa.array([nc], pa.int64()),
            "n_zap_chars": pa.array([n_zap], pa.int64())})

    return (per_source.union(n_content).repartition(1)
            .map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True))


def q_template_drift(sf_dir: str):
    """Log-shape regression detector: PSI between first- and second-half
    template distributions over the transcript stream (midpoint from
    footer stats)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.compact import footer_min_max
    from .stages.parse import template_drift

    tdir = ensure_transcripts(sf_dir)
    files = sorted(_glob.glob(f"{tdir}/*.parquet"))
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    mms = [footer_min_max(f, ["ts"]) for f in files]
    mid = (min(m["ts_min"] for m in mms) + max(m["ts_max"] for m in mms)) // 2
    ds = read_parquet(tdir, columns=["text", "ts"])
    with input_rows_hint(n):
        return template_drift(ds, mid)


@_hinted("documents")
def q_length_gini(sf_dir: str):
    """Per-source doc-length inequality: exact-integer Gini of token
    counts — the chunking-policy signal."""
    from .stages.textstats import length_gini

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])
    return length_gini(ds)


@_hinted("orders")
def q_revenue_grouping_sets(sf_dir: str):
    """Multi-grain revenue rollup via GROUPING SETS semantics:
    (nation, year) / nation / year / grand total from ONE base grid
    (coarser grains re-aggregate the bounded base cells — no second
    pass over the facts). NULL means 'all' exactly like SQL."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import broadcast_join, bucket_hash_join

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_orderdate",
                                   "o_totalprice"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "order_year": pc.cast(pc.year(t.column("o_orderdate")),
                                  pa.int64()),
            "cents": _cents_arr(t.column("o_totalprice"))})

    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    j = bucket_hash_join(
        orders.map_batches(o_prep, batch_format="pyarrow",
                           zero_copy_batch=True),
        cust, on="o_custkey", right_on="c_custkey", num_buckets=32)
    base = two_phase_aggregate(j, ["c_nationkey", "order_year"],
                               [("cents", "sum", "revenue_cents")],
                               num_buckets=8)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    base = broadcast_join(base, nation, left_on="c_nationkey",
                          right_on="n_nationkey", take_cols=["n_name"])

    def grains(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        out = []
        out.append(pd.DataFrame({
            "grouping_id": 0, "n_name": df["n_name"],
            "order_year": df["order_year"],
            "revenue_cents": df["revenue_cents"]}))
        g1 = df.groupby("n_name", as_index=False)["revenue_cents"].sum()
        out.append(pd.DataFrame({
            "grouping_id": 1, "n_name": g1["n_name"],
            "order_year": pd.array([None] * len(g1), dtype="Int64"),
            "revenue_cents": g1["revenue_cents"]}))
        g2 = df.groupby("order_year", as_index=False)["revenue_cents"].sum()
        out.append(pd.DataFrame({
            "grouping_id": 2, "n_name": [None] * len(g2),
            "order_year": g2["order_year"],
            "revenue_cents": g2["revenue_cents"]}))
        out.append(pd.DataFrame({
            "grouping_id": [3], "n_name": [None],
            "order_year": pd.array([None], dtype="Int64"),
            "revenue_cents": [df["revenue_cents"].sum()]}))
        res = pd.concat(out, ignore_index=True)
        return pa.table({
            "grouping_id": pa.array(res["grouping_id"].astype(np.int64)),
            "n_name": pa.array(res["n_name"], pa.string()),
            "order_year": pa.array(res["order_year"], pa.int64()),
            "revenue_cents": pa.array(
                res["revenue_cents"].astype(np.int64))})

    return base.repartition(1).map_batches(grains, batch_format="pyarrow",
                                           zero_copy_batch=True)


@_hinted("events")
def q_user_mix_kl(sf_dir: str):
    """Per-user behavioral KL vs the global event-type mix (exact
    micro-nats) — the bot/outlier score."""
    from .stages.window import user_mix_kl

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type"])
    return user_mix_kl(ds)


@_hinted("events")
def q_conversion_delay(sf_dir: str):
    """Signup→purchase conversion-delay percentiles (first purchase
    strictly after the first signup, whole hours, nearest rank)."""
    from .stages.window import conversion_delay

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type", "ts"])
    return conversion_delay(ds)


@_hinted("documents")
def q_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: the heuristic classifier's
    prediction vs the labeled lang column, counted per (label, pred)
    cell — the eval view that calibrates lang-gated curation."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.textstats import lang_id_batch

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        scored = lang_id_batch(t, "text", "doc_id")
        return pa.table({
            "lang": t.column("lang"),
            "lang_pred": scored.column("lang_pred"),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    return two_phase_aggregate(
        ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "lang_pred"], [("one", "sum", "n_docs")], num_buckets=4)


@_hinted("documents")
def q_shard_balance(sf_dir: str):
    """Training-shard balance audit: per md5 shard (the shard_assign
    rule), doc count, token mass and the e6 share of total tokens — the
    skew check a 16-way export needs before anyone trains on it."""
    from .stages.aggregate import two_phase_aggregate

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        from .stages.enrich import _hash_values

        h = _hash_values(t.column("text"), "md5")
        shard = np.array([int(x[:4], 16) % 16 for x in h.to_pylist()],
                         np.int64)
        toks = pc.cast(pc.count_substring_regex(t.column("text"),
                                                pattern=r"\S+"), pa.int64())
        return pa.table({"shard": pa.array(shard),
                         "one": pa.nulls(t.num_rows,
                                         pa.int64()).fill_null(1),
                         "toks": toks})

    agg = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["shard"], [("one", "sum", "n_docs"), ("toks", "sum", "n_tokens")],
        num_buckets=4)

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        tot = max(int(n.sum()), 1)
        return t.append_column("share_e6",
                               pa.array(n * 1_000_000 // tot))

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow",
                                          zero_copy_batch=True)


@_hinted("orders")
def q_order_seasonality(sf_dir: str):
    """Order seasonality per nation: month-of-year counts with the
    within-nation e6 share (customer bucket join + nation broadcast)."""
    from .stages.aggregate import grouped_apply, two_phase_aggregate
    from .stages.join import broadcast_join, bucket_hash_join

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey",
                                   "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "month": pc.cast(pc.month(t.column("o_orderdate")), pa.int64()),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    j = bucket_hash_join(
        orders.map_batches(o_prep, batch_format="pyarrow",
                           zero_copy_batch=True),
        cust, on="o_custkey", right_on="c_custkey", num_buckets=32)
    agg = two_phase_aggregate(j, ["c_nationkey", "month"],
                              [("one", "sum", "n_orders")], num_buckets=8)

    import pandas as pd

    def share(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"c_nationkey": pd.Series([], np.int64),
                                 "month": pd.Series([], np.int64),
                                 "n_orders": pd.Series([], np.int64),
                                 "share_e6": pd.Series([], np.int64)})
        g = g.copy()
        tot = g.groupby("c_nationkey")["n_orders"].transform("sum")
        g["share_e6"] = (g["n_orders"] * 1_000_000 // tot).astype(np.int64)
        return g[["c_nationkey", "month", "n_orders", "share_e6"]]

    shared = grouped_apply(agg, ["c_nationkey"], share, num_buckets=4)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    out = broadcast_join(shared, nation, left_on="c_nationkey",
                         right_on="n_nationkey", take_cols=["n_name"])
    return out.map_batches(
        lambda t: t.select(["n_name", "month", "n_orders", "share_e6"]),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("events")
def q_tenure_mix(sf_dir: str):
    """Behavioral drift by user tenure: event-type counts bucketed by
    days since the user's first-ever event (0 / 1–7 / 8–30 / 30+) — do
    users stop exploring after week one. First days ride a bucketed
    user join; no row carries more than 3 ints."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import bucket_hash_join

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({"user_id": t.column("user_id"),
                         "event_type": t.column("event_type"),
                         "day": pc.divide(us, 86_400_000_000)})

    narrow = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    firsts = two_phase_aggregate(
        narrow.map_batches(lambda t: t.select(["user_id", "day"]),
                           batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("day", "min", "first_day")], num_buckets=16)
    j = bucket_hash_join(narrow, firsts, on="user_id", num_buckets=16)

    def bucketize(t: pa.Table) -> pa.Table:
        d = (t.column("day").to_numpy(zero_copy_only=False)
             - t.column("first_day").to_numpy(zero_copy_only=False))
        b = np.where(d == 0, 0, np.where(d <= 7, 1,
                                         np.where(d <= 30, 2, 3)))
        return pa.table({
            "tenure_bucket": pa.array(b.astype(np.int64)),
            "event_type": t.column("event_type"),
            "one": pa.nulls(len(d), pa.int64()).fill_null(1)})

    return two_phase_aggregate(
        j.map_batches(bucketize, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["tenure_bucket", "event_type"], [("one", "sum", "n_events")],
        num_buckets=4)


def q_role_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary Jaccard between speaker roles: the
    audience_overlap kernel re-keyed on (token, role) — how much the
    assistant's lexicon overlaps the user's vs the tool stream's."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import audience_overlap

    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    ds = read_parquet(tdir, columns=["role", "text"])

    def toks(t: pa.Table) -> pa.Table:
        roles_out, toks_out = [], []
        for role, tx in zip(t.column("role").to_pylist(),
                            t.column("text").to_pylist()):
            u = np.unique(np.asarray((tx or "").split(), dtype=object))
            roles_out.extend([role] * len(u))
            toks_out.extend(u.tolist())
        return pa.table({"tok": pa.array(toks_out, pa.string()),
                         "role": pa.array(roles_out, pa.string())})

    with input_rows_hint(n):
        out = audience_overlap(
            ds.map_batches(toks, batch_format="pyarrow",
                           zero_copy_batch=True),
            user_col="tok", type_col="role")
    return out.map_batches(
        lambda t: t.rename_columns(
            ["role_a" if c == "type_a" else
             "role_b" if c == "type_b" else c for c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_mm_silence(sf_dir: str):
    """Quiet-frame share per audio clip (64-sample frames below the
    energy threshold) over real WAV decodes — the silence-trim gate."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, audio_silence, ensure_media

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    return ds.map_batches(audio_silence, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


def q_conv_roundtrips(sf_dir: str):
    """SFT round-trip histogram: adjacent user→assistant turn pairs per
    conversation, rolled up to (n_roundtrips, n_convs)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import conv_roundtrips

    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    ds = read_parquet(tdir, columns=["conv_id", "role", "turn_idx"])
    with input_rows_hint(n):
        return conv_roundtrips(ds)


@_hinted("events")
def q_session_durations(sf_dir: str):
    """Session-length distribution (p50/p95/max whole seconds) over
    30-min gap sessions — exact percentiles from the bounded seconds
    histogram."""
    from .stages.window import session_durations

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id"])
    return session_durations(ds, gap_minutes=30.0)


@_hinted("events")
def q_cumulative_users(sf_dir: str):
    """Exact user growth curve: new users per day plus the cumulative
    distinct-user count over the bounded day grid."""
    from .stages.window import cumulative_users

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    return cumulative_users(ds)


def q_dup_rate_curve(sf_dir: str):
    """Duplication growth over time: per day, the share of turns whose
    text already appeared on an earlier day (first-day per content
    hash, strictly-earlier rule)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.dedup import dup_rate_curve

    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    ds = read_parquet(tdir, columns=["text", "ts"])
    with input_rows_hint(n):
        return dup_rate_curve(ds)


def q_control_char_audit(sf_dir: str):
    """Ingest hygiene: per-source control / zero-width character counts
    over the dirtied unicode fixture, attributed through a bucketed
    doc_id join back to the documents table."""
    from .stages.aggregate import input_rows_hint
    from .stages.clean import control_char_audit, ensure_unicode_docs

    udir = ensure_unicode_docs(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = read_parquet(udir, columns=["doc_id", "text"])
    srcs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source"])
    with input_rows_hint(n):
        return control_char_audit(ds, srcs)


@_hinted("documents")
def q_mix_entropy(sf_dir: str):
    """Corpus mixture entropy by source TOKEN mass (exact micro-nats;
    effective-source-count diagnostic for training-mix design)."""
    from .stages.mix import mix_entropy

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])
    return mix_entropy(ds)


def q_mm_dup_clusters(sf_dir: str):
    """Transitive image near-dup clusters: the banded-dHash pair set fed
    through the min-label connected-components kernel, rolled up to
    (cluster_id, n_members)."""
    from .generator import sf_from_dir
    from .stages.aggregate import two_phase_aggregate
    from .stages.dedup import connected_components
    from .stages.multimodal import (MediaDecoder, dhash_images,
                                    dhash_neardup_pairs,
                                    ensure_neardup_media)

    nd_dir = ensure_neardup_media(sf_from_dir(sf_dir))
    ds = read_parquet(nd_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    ds = ds.map_batches(dhash_images, batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    pairs = dhash_neardup_pairs(ds, max_hamming=3)
    labels = connected_components(pairs, a_col="media_a", b_col="media_b",
                                  id_col="media_id",
                                  label_col="cluster_id")
    return two_phase_aggregate(
        labels.map_batches(
            lambda t: t.append_column(
                "one", pa.nulls(t.num_rows, pa.int64()).fill_null(1)),
            batch_format="pyarrow", zero_copy_batch=True),
        ["cluster_id"], [("one", "sum", "n_members")], num_buckets=8)


@_hinted("lineitem")
def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6-shaped revenue-change forecast: one filtered global sum
    of price·discount cents for 1998 shipments at discount 5–7% and
    quantity < 24 (the pure scan-filter-aggregate shape — zero
    shuffle beyond one tiny partial exchange)."""
    from .stages.aggregate import two_phase_aggregate

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_shipdate", "l_extendedprice",
                               "l_discount", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.equal(pc.year(t.column("l_shipdate")), 1998),
                    pc.less(t.column("l_quantity"), 24.0)),
            pc.and_(pc.greater_equal(t.column("l_discount"), 0.05),
                    pc.less_equal(t.column("l_discount"), 0.07)))
        t = t.filter(keep)
        return pa.table({
            "g": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "rev": _cents_arr(pc.multiply(t.column("l_extendedprice"),
                                          t.column("l_discount")))})

    agg = two_phase_aggregate(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], [("one", "sum", "n_lines"), ("rev", "sum", "revenue_cents")],
        num_buckets=1)
    return agg.map_batches(
        lambda t: t.select(["n_lines", "revenue_cents"]),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("documents")
def q_source_top_terms(sf_dir: str):
    """Top-5 terms per source by term frequency (deterministic token-asc
    tiebreak) — the corpus-exploration view behind per-source content
    drift triage; pre-combined (source, token) counts feed the bounded
    topk kernel."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.window import topk_per_group

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])

    def toks(t: pa.Table) -> pa.Table:
        import pandas as pd

        srcs, out_tok, out_n = [], [], []
        for src, tx in zip(t.column("source").to_pylist(),
                           t.column("text").to_pylist()):
            parts = (tx or "").split()
            if not parts:
                continue
            u, c = np.unique(np.asarray(parts, dtype=object),
                             return_counts=True)
            srcs.extend([src] * len(u))
            out_tok.extend(u.tolist())
            out_n.extend(c.tolist())
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "tok": pa.array(out_tok, pa.string()),
                         "n": pa.array(np.asarray(out_n, np.int64))})

    counts = two_phase_aggregate(
        ds.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "tok"], [("n", "sum", "n")], num_buckets=16)
    return topk_per_group(counts, key="source", order_col="n",
                          id_col="tok", k=5, cols=["source", "n", "tok"])


def q_mm_decode_errors(sf_dir: str):
    """Decode-failure accounting over a deterministically corrupted
    payload overlay (every 5th media truncated to 20 bytes): the lenient
    audit pass a real ingest runs before strict decode."""
    from .generator import sf_from_dir
    from .stages.multimodal import decode_audit, ensure_corrupt_media

    cdir = ensure_corrupt_media(sf_from_dir(sf_dir))
    ds = read_parquet(cdir, columns=["media_id", "codec", "payload"])
    return ds.map_batches(decode_audit, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


def q_mm_clipping(sf_dir: str):
    """Audio clipping audit over real WAV decodes: rail-sample counts
    and the longest consecutive clipped run per clip."""
    from .generator import sf_from_dir
    from .stages.multimodal import MediaDecoder, audio_clipping, ensure_media

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    return ds.map_batches(audio_clipping, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


@_hinted("lineitem")
def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5-shaped local-supplier revenue: lanes where customer and
    supplier share a nation (the correlated-equality filter on the Q7
    join chain), grouped by nation and ship year."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import broadcast_join, bucket_hash_join

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey", "l_shipdate",
                               "l_extendedprice", "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        rev = _cents_arr(pc.multiply(t.column("l_extendedprice"),
                                     pc.subtract(1.0, t.column("l_discount"))))
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_suppkey": t.column("l_suppkey"),
            "ship_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
            "rev_cents": rev})

    li = broadcast_join(
        li.map_batches(l_prep, batch_format="pyarrow", zero_copy_batch=True),
        supp, left_on="l_suppkey", right_on="s_suppkey",
        take_cols=["s_nationkey"])
    li = li.map_batches(
        lambda t: t.select(["l_orderkey", "ship_year", "rev_cents",
                            "s_nationkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    j = bucket_hash_join(li, orders, on="l_orderkey",
                         right_on="o_orderkey", num_buckets=32)
    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    j = bucket_hash_join(j, cust, on="o_custkey", right_on="c_custkey",
                         num_buckets=32)
    local = j.map_batches(
        lambda t: t.filter(pc.equal(t.column("s_nationkey"),
                                    t.column("c_nationkey"))),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = two_phase_aggregate(
        local.map_batches(
            lambda t: t.select(["s_nationkey", "ship_year", "rev_cents"]),
            batch_format="pyarrow", zero_copy_batch=True),
        ["s_nationkey", "ship_year"],
        [("rev_cents", "sum", "revenue_cents")], num_buckets=8)
    agg = broadcast_join(agg, nation, left_on="s_nationkey",
                         right_on="n_nationkey", take_cols=["n_name"])
    return agg.map_batches(
        lambda t: pa.table({"n_name": t.column("n_name"),
                            "ship_year": t.column("ship_year"),
                            "revenue_cents": t.column("revenue_cents")}),
        batch_format="pyarrow", zero_copy_batch=True)


def q_depth_profile(sf_dir: str):
    """Conversation depth profile: per (role, capped turn depth) the
    turn count and character mass — how responses grow or shrink as a
    conversation deepens."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint, two_phase_aggregate

    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    ds = read_parquet(tdir, columns=["role", "turn_idx", "text"])

    def prep(t: pa.Table) -> pa.Table:
        depth = pc.min_element_wise(
            pc.cast(t.column("turn_idx"), pa.int64()), 16)
        return pa.table({
            "role": t.column("role"),
            "depth": depth,
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64())})

    with input_rows_hint(n):
        return two_phase_aggregate(
            ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["role", "depth"],
            [("one", "sum", "n_turns"), ("chars", "sum", "sum_chars")],
            num_buckets=8)


def q_tool_chains(sf_dir: str):
    """Frequent tool-call trigrams within conversations: the path_ngrams
    kernel re-keyed on conv_id over non-empty tool turns (one session
    per conversation — the gap never fires)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import path_ngrams

    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    ds = read_parquet(tdir, columns=["conv_id", "tool", "ts", "turn_idx"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(pc.is_valid(t.column("tool")),
                                   pc.not_equal(t.column("tool"), ""))),
        batch_format="pyarrow", zero_copy_batch=True)
    with input_rows_hint(n):
        # ~95 years: pd.Timedelta caps near 1.5e8 minutes, 1e9 overflows
        return path_ngrams(ds, n=3, key="conv_id", type_col="tool",
                           id_col="turn_idx", gap_minutes=5e7)


@_hinted("documents")
def q_new_unique_docs(sf_dir: str):
    """Incremental-ingest dedup: v2-snapshot docs whose content md5 has
    NO match anywhere in v1 (new or rewritten content only — the rows an
    incremental crawl actually re-processes), via the bucketed
    anti-join; raw text never shuffles."""
    from .stages.enrich import _hash_values
    from .stages.join import bucket_anti_join
    from .stages.mix import ensure_docs_v2

    v2 = read_parquet(ensure_docs_v2(sf_dir),
                      columns=["doc_id", "source", "text"])
    v1 = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    v2h = v2.map_batches(
        lambda t: pa.table({"h": _hash_values(t.column("text"), "md5"),
                            "doc_id": t.column("doc_id"),
                            "source": t.column("source")}),
        batch_format="pyarrow", zero_copy_batch=True)
    v1h = v1.map_batches(
        lambda t: pa.table({"h": _hash_values(t.column("text"), "md5")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return bucket_anti_join(v2h, v1h, on="h", num_buckets=32)


def q_first_response(sf_dir: str):
    """Per-conversation first-response SLA: the first assistant turn
    strictly after the first user turn and the wall-clock gap between
    them."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import first_response

    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    ds = read_parquet(tdir, columns=["conv_id", "role", "turn_idx", "ts"])
    with input_rows_hint(n):
        return first_response(ds)


@_hinted("lineitem")
def q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7-shaped trade-lane volume: revenue between every
    (supplier nation, customer nation) pair per ship year. Supplier and
    nation ride broadcasts (dimensions); orders and customer are the
    real fact⋈fact legs — two bucketed joins on different keys
    (orderkey then custkey), the honest Q7 exchange shape."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import broadcast_join, bucket_hash_join

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey", "l_shipdate",
                               "l_extendedprice", "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        rev = _cents_arr(pc.multiply(t.column("l_extendedprice"),
                                     pc.subtract(1.0, t.column("l_discount"))))
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_suppkey": t.column("l_suppkey"),
            "ship_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
            "rev_cents": rev})

    li = broadcast_join(
        li.map_batches(l_prep, batch_format="pyarrow", zero_copy_batch=True),
        supp, left_on="l_suppkey", right_on="s_suppkey",
        take_cols=["s_nationkey"])
    li = li.map_batches(
        lambda t: t.select(["l_orderkey", "ship_year", "rev_cents",
                            "s_nationkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    j = bucket_hash_join(li, orders, on="l_orderkey",
                         right_on="o_orderkey", num_buckets=32)
    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    j = bucket_hash_join(j, cust, on="o_custkey", right_on="c_custkey",
                         num_buckets=32)
    agg = two_phase_aggregate(
        j.map_batches(
            lambda t: t.select(["s_nationkey", "c_nationkey", "ship_year",
                                "rev_cents"]),
            batch_format="pyarrow", zero_copy_batch=True),
        ["s_nationkey", "c_nationkey", "ship_year"],
        [("rev_cents", "sum", "revenue_cents")], num_buckets=16)
    agg = broadcast_join(agg, nation, left_on="s_nationkey",
                         right_on="n_nationkey", take_cols=["n_name"])
    agg = agg.map_batches(
        lambda t: t.rename_columns(
            [c if c != "n_name" else "supp_nation"
             for c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = broadcast_join(agg, nation, left_on="c_nationkey",
                         right_on="n_nationkey", take_cols=["n_name"])
    return agg.map_batches(
        lambda t: pa.table({"supp_nation": t.column("supp_nation"),
                            "cust_nation": t.column("n_name"),
                            "ship_year": t.column("ship_year"),
                            "revenue_cents": t.column("revenue_cents")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("lineitem")
def q_returned_revenue(sf_dir: str):
    """TPC-H Q10-shaped returned-item report: top-20 customers by
    revenue lost to returned lineitems (flag 'R'), with nation names —
    filter → bucketed orderkey join → custkey rollup → bucketed
    customer join → bounded global top-k."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import broadcast_join, bucket_hash_join
    from .stages.window import topk_per_group

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_returnflag",
                               "l_extendedprice", "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        rev = _cents_arr(pc.multiply(t.column("l_extendedprice"),
                                     pc.subtract(1.0, t.column("l_discount"))))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev_cents": rev})

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    j = bucket_hash_join(
        li.map_batches(l_prep, batch_format="pyarrow", zero_copy_batch=True),
        orders, on="l_orderkey", right_on="o_orderkey", num_buckets=32)
    per_cust = two_phase_aggregate(
        j, ["o_custkey"], [("rev_cents", "sum", "revenue_cents")],
        num_buckets=32)
    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_name", "c_nationkey"])
    j2 = bucket_hash_join(per_cust, cust, on="o_custkey",
                          right_on="c_custkey", num_buckets=32)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    j2 = broadcast_join(j2, nation, left_on="c_nationkey",
                        right_on="n_nationkey", take_cols=["n_name"])
    top = topk_per_group(
        j2.map_batches(
            lambda t: t.append_column(
                "g", pa.nulls(t.num_rows, pa.int64()).fill_null(0)),
            batch_format="pyarrow", zero_copy_batch=True),
        key="g", order_col="revenue_cents", id_col="o_custkey", k=20,
        cols=["g", "revenue_cents", "o_custkey", "c_name", "n_name"])
    return top.map_batches(
        lambda t: pa.table({"c_custkey": t.column("o_custkey"),
                            "c_name": t.column("c_name"),
                            "n_name": t.column("n_name"),
                            "revenue_cents": t.column("revenue_cents")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("documents")
def q_doc_vectors(sf_dir: str):
    """Feature-hashed bag-of-words document vectors (md5 % 32 dims,
    sparse exploded rows) — the text→vector bridge with a bit-exact
    md5-mirror oracle."""
    from .stages.textstats import doc_vectors

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return doc_vectors(ds, dims=32)


@_hinted("embeddings")
def q_mmr_select(sf_dir: str):
    """Maximal Marginal Relevance top-5 vs the vec_id=0 query (λ=0.7 in
    e3): diversity-aware retrieval over quantized-int dot products, k
    greedy streaming rounds with deterministic tiebreaks."""
    from .stages.similarity import mmr_select

    ds = read_parquet(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    return mmr_select(ds, k=5, lam_e3=700, query_id=0)


@_hinted("events")
def q_path_ngrams(sf_dir: str):
    """Frequent behavior trigrams: every 3 consecutive events inside a
    gap session joined as 'a>b>c', counted corpus-wide. 240-min gap (vs
    sessionize's 30) — the fixture's ~43-min inter-arrival would leave
    almost every session shorter than a trigram at 30."""
    from .stages.window import path_ngrams

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type", "event_id"])
    return path_ngrams(ds, n=3, gap_minutes=240.0)


@_hinted("embeddings")
def q_label_centroids(sf_dir: str):
    """Pairwise label-centroid separation over quantized embeddings —
    division-free exact ints (the cross term (s_a·c_b − s_b·c_a) scales
    the centroid difference by c_a·c_b)."""
    from .stages.similarity import label_centroids

    ds = read_parquet(f"{sf_dir}/embeddings.parquet",
                      columns=["embedding", "label"])
    return label_centroids(ds)


@_hinted("events")
def q_value_twap(sf_dir: str):
    """Time-weighted average value per event type (gauge averaging):
    each user-stream gap weights the previous event's cents value,
    rolled up per type with exact integer sums."""
    from .stages.window import value_twap

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "event_type",
                               "value", "ts"])
    return value_twap(ds)


@_hinted("events")
def q_value_mode(sf_dir: str):
    """Most frequent cents-quantized value per event type (mode with
    deterministic smaller-value tiebreak) via the bounded topk kernel
    over the pre-combined (type, cents) count table."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.window import topk_per_group

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "cents": _cents_arr(t.column("value")),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    counts = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "cents"], [("one", "sum", "n")], num_buckets=16)
    # topk orders (n desc, cents asc): mode with smaller-value tiebreak.
    # NOTE: cents as id_col requires non-negative values for the tie rule
    # to match SQL's ORDER BY n DESC, cents — true for the events fixture
    top = topk_per_group(counts, key="event_type", order_col="n",
                         id_col="cents", k=1,
                         cols=["event_type", "n", "cents"])
    return top.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "mode_cents": t.column("cents"),
                            "n_mode": t.column("n")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("events")
def q_type_correlation(sf_dir: str):
    """Pairwise Pearson moments between hourly count series of event
    types over the zero-filled hour grid — exact integer terms, r left
    to the consumer."""
    from .stages.profile import type_correlation

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "ts"])
    return type_correlation(ds)


def q_mm_neardup(sf_dir: str):
    """Image near-duplicate pairs over REAL decoded payloads: banded
    dHash (4×16-bit bands — pigeonhole-complete for Hamming ≤ 3) with
    XOR-popcount verification, over the planted near-dup PNG fixture."""
    from .generator import sf_from_dir
    from .stages.multimodal import (MediaDecoder, dhash_images,
                                    dhash_neardup_pairs,
                                    ensure_neardup_media)

    nd_dir = ensure_neardup_media(sf_from_dir(sf_dir))
    ds = read_parquet(nd_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    ds = ds.map_batches(dhash_images, batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    return dhash_neardup_pairs(ds, max_hamming=3)


@_hinted("events")
def q_user_breadth(sf_dir: str):
    """Behavioral breadth histogram: distinct event types per user
    (chained two-phase distinct), rolled up to (n_types, n_users)."""
    from .stages.aggregate import two_phase_aggregate

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type"])
    distinct = two_phase_aggregate(
        ds.map_batches(
            lambda t: t.select(["user_id", "event_type"]).append_column(
                "one", pa.nulls(t.num_rows, pa.int64()).fill_null(1)),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "event_type"], [("one", "max", "one")], num_buckets=16)
    per_user = two_phase_aggregate(distinct, ["user_id"],
                                   [("one", "sum", "n_types")],
                                   num_buckets=16)
    return two_phase_aggregate(
        per_user.map_batches(
            lambda t: pa.table({
                "n_types": t.column("n_types"),
                "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["n_types"], [("one", "sum", "n_users")], num_buckets=4)


def q_conv_verbosity(sf_dir: str):
    """Per-conversation verbosity balance: assistant vs user character
    mass (counted per batch BEFORE the shuffle — text never moves) and
    the floor-e6 assistant/user ratio."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint, two_phase_aggregate

    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    ds = read_parquet(tdir, columns=["conv_id", "role", "text"])

    def prep(t: pa.Table) -> pa.Table:
        ch = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        is_a = pc.cast(pc.equal(t.column("role"), "assistant"), pa.int64())
        is_u = pc.cast(pc.equal(t.column("role"), "user"), pa.int64())
        return pa.table({
            "conv_id": t.column("conv_id"),
            "a_chars": pc.multiply(ch, is_a),
            "u_chars": pc.multiply(ch, is_u)})

    with input_rows_hint(n):
        agg = two_phase_aggregate(
            ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["conv_id"],
            [("a_chars", "sum", "a_chars"), ("u_chars", "sum", "u_chars")],
            num_buckets=16)

    def ratio(t: pa.Table) -> pa.Table:
        a = t.column("a_chars").to_numpy(zero_copy_only=False)
        u = t.column("u_chars").to_numpy(zero_copy_only=False)
        return t.append_column(
            "ratio_e6", pa.array(a * 1_000_000 // np.maximum(u, 1)))

    return agg.map_batches(ratio, batch_format="pyarrow",
                           zero_copy_batch=True)


@_hinted("documents")
def q_winnow_matches(sf_dir: str):
    """MOSS-style winnowing near-copy candidates over the corpus: doc
    pairs sharing >= 3 winnow fingerprints (k=16 char grams, window 8)
    after dropping hashes shared by > 8 docs as boilerplate."""
    from .stages.textstats import winnow_matches

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return winnow_matches(ds, k=16, w=8, max_docs_per_hash=8,
                          min_shared=3)


@_hinted("lineitem")
def q_join_cardinality(sf_dir: str):
    """Exact lineitem⋈orders join-size diagnostic without running the
    join: per-key count tables joined bucket-wise, Σ cl·cr plus matched
    keys and the max per-key fan-out."""
    from .stages.profile import join_cardinality

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey"])
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey"])
    return join_cardinality(li, orders, left_on="l_orderkey",
                            right_on="o_orderkey")


def q_pii_density(sf_dir: str):
    """Per-role PII exposure rollup over the transcript stream: match
    counts for the scrubber's email/IPv4/phone patterns, total chars,
    and the integer per-billion-chars rate."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.pii import pii_density

    tdir = ensure_transcripts(sf_dir)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in sorted(_glob.glob(f"{tdir}/*.parquet")))
    ds = read_parquet(tdir, columns=["role", "text"])
    with input_rows_hint(n):
        return pii_density(ds, group_col="role")


@_hinted("embeddings")
def q_knn_classify(sf_dir: str):
    """Exact brute-force k-NN majority-vote classification over the
    embeddings table: every 10th vector is a query, classified by the
    majority label of its 5 nearest neighbors under the quantized-int
    dot product (deterministic similarity and vote tiebreaks)."""
    from .stages.similarity import knn_classify

    ds = read_parquet(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    return knn_classify(ds, k=5, query_mod=10)


@_hinted("events")
def q_k_anonymity(sf_dir: str):
    """k-anonymity audit of the event stream under the
    (user_id, event_type) quasi-identifier: equivalence-class size
    histogram with the at-risk (< 5) classes flagged."""
    from .stages.profile import k_anonymity

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type"])
    return k_anonymity(ds, ["user_id", "event_type"], k=5)


@_hinted("events")
def q_funnel_steps(sf_dir: str):
    """Ordered signup→view→click→purchase funnel: users reaching each
    step strictly after their earliest previous-step completion (greedy
    min-ts chain), with floor-e6 conversion vs step 0."""
    from .stages.window import ordered_funnel

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type", "ts"])
    return ordered_funnel(ds, ["signup", "view", "click", "purchase"])


@_hinted("lineitem")
def q_big_orders(sf_dir: str):
    """TPC-H Q18-shaped large-volume orders: orders whose integer
    line-quantity sum exceeds 250 (the per-batch pre-combined two-phase
    sum keyed by orderkey, a map-side HAVING filter, then the bucketed
    join back to orders for customer/date/price)."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import bucket_hash_join

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "qty": pc.cast(t.column("l_quantity"), pa.int64())})

    sums = two_phase_aggregate(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"], [("qty", "sum", "sum_qty")], num_buckets=32)
    big = sums.map_batches(
        lambda t: t.filter(pc.greater(t.column("sum_qty"), 250)),
        batch_format="pyarrow", zero_copy_batch=True)

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey",
                                   "o_orderdate", "o_totalprice"])

    def o_prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey"),
                         "o_orderdate_us": us,
                         "total_cents": _cents_arr(t.column("o_totalprice"))})

    j = bucket_hash_join(
        big, orders.map_batches(o_prep, batch_format="pyarrow",
                                zero_copy_batch=True),
        on="l_orderkey", right_on="o_orderkey", num_buckets=32)
    return j.map_batches(
        lambda t: t.select(["l_orderkey", "o_custkey", "o_orderdate_us",
                            "total_cents", "sum_qty"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_trending_tokens(sf_dir: str):
    """Daily trending terms over the transcript stream: tokens whose
    e6-quantized daily share beats 1.5× their corpus share at ≥5
    occurrences (int64-safe cross-multiplied comparison)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.textstats import trending_tokens

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["text", "ts"])
    with input_rows_hint(8 * n_turns):  # token explosion fan-out
        return trending_tokens(ds)


@_hinted("events")
def q_event_dedup(sf_dir: str):
    """Streaming dedup / alert-throttle accounting: events within 60 s
    of the previous same-(user, type) event are suppressed (lag
    semantics, event_id tie order)."""
    from .stages.window import event_dedup

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type", "ts", "event_id"])
    return event_dedup(ds)


@_hinted("events")
def q_value_psi(sf_dir: str):
    """Population Stability Index of the value distribution between the
    first and second half of the time range, per event type (exact
    big-int terms, e6 micro-nats)."""
    from .stages.compact import footer_min_max
    from .stages.window import value_psi

    mm = footer_min_max(f"{sf_dir}/events.parquet", ["ts"])
    mid = (mm["ts_min"] + mm["ts_max"]) // 2
    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "ts", "value"])
    return value_psi(ds, mid)


@_hinted("embeddings", fanout=64)
def q_label_scatter(sf_dir: str):
    """Per-label Fisher separation over int-quantized embeddings:
    within-class scatter, centroid distance to global, exact-int ratio."""
    from .stages.similarity import label_scatter

    ds = read_parquet(f"{sf_dir}/embeddings.parquet",
                      columns=["embedding", "label"])
    return label_scatter(ds)


@_hinted("events")
def q_user_lifetimes(sf_dir: str):
    """Per-user lifetime summary (events, first/last/active days)."""
    from .stages.window import user_lifetimes

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    return user_lifetimes(ds)


def q_mm_histogram(sf_dir: str):
    """Per-image 16-bin byte histogram over REAL decoded payloads
    (exposure profile); byte-level hex-replay oracle on the decode."""
    from .generator import sf_from_dir
    from .stages.multimodal import (MediaDecoder, ensure_media,
                                    image_byte_histogram)

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    return ds.map_batches(image_byte_histogram, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


def q_assortativity(sf_dir: str):
    """Degree-assortativity moments of the link graph (exact-int pieces
    of Newman's r; sqrt left to the consumer)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import assortativity_moments, ensure_link_graph

    gdir = ensure_link_graph(sf_dir)
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    with input_rows_hint(2 * n_edges):
        return assortativity_moments(edges)


def q_hapax_rate(sf_dir: str):
    """Hapax-legomenon share of each role's token mass over the
    transcript stream (lexical novelty / junk-id signal)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.textstats import hapax_rate

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["role", "text"])
    with input_rows_hint(8 * n_turns):  # token explosion fan-out
        return hapax_rate(ds)


@_hinted("lineitem")
def q_nation_share(sf_dir: str):
    """Revenue per nation with its exact share of the region total
    (window-function mirror computed on the 25-row grid)."""
    from .stages.aggregate import two_phase_aggregate
    from .stages.join import broadcast_join, bucket_hash_join

    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    rk = dict(zip(region.column("r_regionkey").to_pylist(),
                  region.column("r_name").to_pylist()))
    nat = nation.append_column("r_name", pa.array(
        [rk[v] for v in nation.column("n_regionkey").to_pylist()]))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust, left_on="o_custkey",
                            right_on="c_custkey", take_cols=["c_nationkey"])
    orders = broadcast_join(orders, nat, left_on="c_nationkey",
                            right_on="n_nationkey",
                            take_cols=["n_name", "r_name"])

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_extendedprice",
                               "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(1.0, t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev_cents": _cents_arr(rev)})

    li = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    joined = bucket_hash_join(
        li, orders.select_columns(["o_orderkey", "n_name", "r_name"]),
        on="l_orderkey", right_on="o_orderkey", num_buckets=64)
    grid = two_phase_aggregate(
        joined, ["r_name", "n_name"],
        [("rev_cents", "sum", "revenue_cents")], num_buckets=8).take_all()
    reg_tot: dict[str, int] = {}
    for r in grid:
        reg_tot[r["r_name"]] = reg_tot.get(r["r_name"], 0) + int(
            r["revenue_cents"])
    rows = sorted(grid, key=lambda r: (r["r_name"], r["n_name"]))
    return pa.table({
        "r_name": pa.array([r["r_name"] for r in rows], pa.string()),
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "revenue_cents": pa.array([int(r["revenue_cents"]) for r in rows],
                                  pa.int64()),
        "share_e6": pa.array(
            [int(r["revenue_cents"]) * 1_000_000 // reg_tot[r["r_name"]]
             for r in rows], pa.int64())})


def q_tool_success_daily(sf_dir: str):
    """Per-tool daily success rate over the parsed tool-call stream
    (exit == 0 share, e6-exact) — the SRE reliability trend."""
    from .stages.aggregate import two_phase_aggregate

    ds = _parsed(sf_dir)

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        us = (t.column("ts").combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        return pa.table({
            "tool_name": t.column("tool_name"),
            "day": pa.array(us // 86_400_000_000),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "ok": pc.cast(pc.equal(t.column("tool_exit"), 0), pa.int64())})

    agg = two_phase_aggregate(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        ["tool_name", "day"],
        [("one", "sum", "n_calls"), ("ok", "sum", "n_ok")], num_buckets=8)

    def final(t: pa.Table) -> pa.Table:
        n = t.column("n_calls").to_numpy(zero_copy_only=False)
        ok = t.column("n_ok").to_numpy(zero_copy_only=False)
        return t.append_column("ok_e6",
                               pa.array(ok * 1_000_000 // np.maximum(n, 1)))

    return agg.map_batches(final, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_tool_latency_mad(sf_dir: str):
    """Exact per-tool latency median + MAD (robust stats over the
    bounded ms-value histogram, double rank selection)."""
    from .stages.window import group_mad

    ds = _parsed(sf_dir)

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        return t.select(["tool_name", "duration_ms"])

    ds = ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    return group_mad(ds)


def q_mm_zero_cross(sf_dir: str):
    """Per-frame audio zero-crossing counts over REAL decoded payloads
    (the second VAD feature); hex-replay oracle on the decode."""
    from .generator import sf_from_dir
    from .stages.multimodal import (MediaDecoder, audio_zero_crossings,
                                    ensure_media)

    media_dir = ensure_media(sf_from_dir(sf_dir))
    ds = read_parquet(media_dir, columns=["media_id", "payload"])
    ds = ds.map_batches(MediaDecoder(), batch_format="pyarrow",
                        batch_size=256, zero_copy_batch=True)
    return ds.map_batches(audio_zero_crossings, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True)


@_hinted("documents", fanout=2)
def q_cdc_field_diff(sf_dir: str):
    """Field-level CDC diff between documents and the v2 snapshot
    (which fields changed among common doc ids; text travels as md5)."""
    from .stages.mix import cdc_field_diff, ensure_docs_v2

    v1 = read_parquet(f"{sf_dir}/documents.parquet")
    v2 = read_parquet(ensure_docs_v2(sf_dir))
    return cdc_field_diff(v1, v2)


@_hinted("events")
def q_forecast_error(sf_dir: str):
    """Naive vs seasonal-naive forecast error per event type over the
    zero-filled hourly grid (MASE-style exact ratio)."""
    from .stages.window import forecast_error

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["ts", "event_type"])
    return forecast_error(ds)


def q_conv_idle_share(sf_dir: str):
    """Per-conversation idle-time share (gaps > 5 min over the turn
    sequence) — the billable-time / abandonment signal."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import conv_idle_share

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["conv_id", "turn_idx", "ts"])
    with input_rows_hint(n_turns):
        return conv_idle_share(ds)


@_hinted("embeddings")
def q_embedding_norms(sf_dir: str):
    """Embedding-norm health histogram per label (bit_length buckets of
    the exact quantized squared norm)."""
    from .stages.similarity import embedding_norms

    ds = read_parquet(f"{sf_dir}/embeddings.parquet",
                      columns=["embedding", "label"])
    return embedding_norms(ds)


def q_lang_script_check(sf_dir: str):
    """Language-ID vs CJK-script cross-audit over the dirtied unicode
    fixture (mislabel / mojibake detector)."""
    from .stages.aggregate import input_rows_hint
    from .stages.clean import ensure_unicode_docs
    from .stages.textstats import lang_script_check

    udir = ensure_unicode_docs(sf_dir)
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = read_parquet(udir, columns=["doc_id", "text"])
    with input_rows_hint(n):
        return lang_script_check(ds)


@_hinted("lineitem")
def q_brand_pairs(sf_dir: str):
    """Market-basket brand co-occurrence within orders: part brands
    broadcast onto lineitem, then the pair_cooccurrence kernel grouped
    by order key."""
    from .stages.aggregate import pair_cooccurrence
    from .stages.join import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"])
    li = broadcast_join(li, part, left_on="l_partkey",
                        right_on="p_partkey", take_cols=["p_brand"])
    pairs = pair_cooccurrence(li, group_col="l_orderkey",
                              item_col="p_brand", num_buckets=32)
    return pairs.map_batches(
        lambda t: pa.table({"brand_a": t.column("tool_a"),
                            "brand_b": t.column("tool_b"),
                            "n_orders": t.column("n_groups")}),
        batch_format="pyarrow", zero_copy_batch=True)


@_hinted("events")
def q_stickiness_daily(sf_dir: str):
    """DAU/WAU stickiness per day: chained-distinct user-day grain, the
    7-day window explodes the GRAIN (never events), span clipped by
    footer stats."""
    from .stages.compact import footer_min_max
    from .stages.window import stickiness_daily

    st = footer_min_max(f"{sf_dir}/events.parquet", ["ts"])
    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return stickiness_daily(ds, st["ts_min"] // 86_400_000_000,
                            st["ts_max"] // 86_400_000_000)


@_hinted("events")
def q_attribution_first_touch(sf_dir: str):
    """First-touch attribution: purchases credited to their gap session's
    first event type."""
    from .stages.window import attribution_first_touch

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type", "event_id"])
    return attribution_first_touch(ds)


@_hinted("events")
def q_gap_histogram(sf_dir: str):
    """Power-of-two histogram of per-user inter-event gaps (ms) — the
    sessionization-gap calibration view; exact int sums."""
    from .stages.window import gap_histogram

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id"])
    return gap_histogram(ds)


@_hinted("documents")
def q_fair_allocation(sf_dir: str):
    """Hamilton largest-remainder apportionment of a 10⁶-slot sampling
    budget across sources by token mass: per-source quotas sum exactly
    to the budget."""
    from .stages.mix import fair_allocation

    ds = read_parquet(f"{sf_dir}/documents.parquet",
                      columns=["source", "text"])
    return fair_allocation(ds)


@_hinted("events")
def q_event_transitions(sf_dir: str):
    """Session-scoped next-event transition matrix with exact integer
    probabilities (p_e6 per from-type); pair space bounded by
    |event types|²."""
    from .stages.window import event_transitions

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type", "event_id"])
    return event_transitions(ds)


def q_edge_reciprocity(sf_dir: str):
    """Link-graph mutuality: distinct directed edges whose reverse also
    exists, as one exact-int row; bucketed self-join on the packed
    reversed key."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import edge_reciprocity, ensure_link_graph

    gdir = ensure_link_graph(sf_dir)
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    with input_rows_hint(2 * n_edges):
        return edge_reciprocity(edges)


@_hinted("events")
def q_coverage_gaps(sf_dir: str):
    """Telemetry coverage health: per event type, empty hours in the
    global span and the longest outage run. Data pass = one two-phase
    (type, hour) count; the gap scan is wall-clock-bounded."""
    from .stages.window import coverage_gaps

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["ts", "event_type"])
    return coverage_gaps(ds)


@_hinted("events")
def q_rate_limit_audit(sf_dir: str):
    """Per-user max events in any trailing 10-minute window (exact
    RANGE-frame semantics) via one bucketed composite-axis searchsorted
    pass — no per-user loop."""
    from .stages.window import rate_limit_audit

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return rate_limit_audit(ds)


def q_latency_trend(sf_dir: str):
    """Per-tool exact least-squares latency slope (micro-ms/day) over the
    parsed tool-call stream; day index anchored by footer stats so the
    distributed moment sums stay in int64."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.compact import footer_min_max
    from .stages.window import latency_trend

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    day0 = footer_min_max(tdir, ["ts"])["ts_min"] // 86_400_000_000
    ds = _parsed(sf_dir)

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "tool_call"))
        return t.select(["tool_name", "ts", "duration_ms"])

    ds = ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    with input_rows_hint(n_turns):
        return latency_trend(ds, day0)


@_hinted("events")
def q_user_burstiness(sf_dir: str):
    """Per-user Fano factor (variance/mean of active-hour counts) as two
    exact integer ratio terms — the bot-vs-human burstiness signal."""
    from .stages.window import user_burstiness

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return user_burstiness(ds)


@_hinted("events")
def q_hourly_profile(sf_dir: str):
    """Weekly seasonality matrix: events + distinct users per
    (day-of-week, hour-of-day); pure-int dow formula on both sides."""
    from .stages.window import hourly_profile

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return hourly_profile(ds)


def q_context_overflow(sf_dir: str):
    """Per-conversation context-budget audit: first turn where the running
    char total exceeds the budget (NULL when it never does). Char counts
    pre-shuffle; text never moves."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.window import context_overflow

    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{tdir}/*.parquet"))
    ds = read_parquet(tdir, columns=["conv_id", "turn_idx", "text"])
    with input_rows_hint(n_turns):
        return context_overflow(ds)


def q_two_hop_reach(sf_dir: str):
    """Per-node distinct 1-or-2-hop reach over the link graph: one
    bucketed edges-self-join on the middle vertex, two-phase dedup +
    count. Hint covers the join fan-out (out-degree capped at
    GRAPH_MAX_OUT)."""
    import glob as _glob

    from .stages.aggregate import input_rows_hint
    from .stages.graph import GRAPH_MAX_OUT, ensure_link_graph, two_hop_reach

    gdir = ensure_link_graph(sf_dir)
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in _glob.glob(f"{gdir}/*.parquet"))
    edges = read_parquet(gdir)
    with input_rows_hint(n_edges * (GRAPH_MAX_OUT + 1)):
        return two_hop_reach(edges)


@_hinted("events")
def q_zorder_layout(sf_dir: str):
    """Z-order (Morton) layout assignment over (user_id, event-minute):
    quantize both dimensions to 16 bits against footer-stat min/max (zero
    data read), interleave, assign 64 target files by top bits, and emit
    the per-file zone map. The multi-dimensional clustering step a
    100 TB lakehouse rewrite runs before scan_prune_plan prunes."""
    from .stages.compact import footer_min_max, zorder_layout

    st = footer_min_max(f"{sf_dir}/events.parquet", ["user_id", "ts"])
    stats = {"a_min": st["user_id_min"], "a_max": st["user_id_max"],
             "m_min": st["ts_min"] // 60_000_000,
             "m_max": st["ts_max"] // 60_000_000}
    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return zorder_layout(ds, stats)


@_hinted("events")
def q_autocorr_hourly(sf_dir: str):
    """Lag 1-3 autocorrelation of the hourly event-count series, scaled to
    integer r_e6 with arbitrary-precision driver math over the
    wall-clock-bounded series (HUGEINT on the oracle side)."""
    from .stages.window import autocorr_hourly

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    return autocorr_hourly(ds)


@_hinted("events")
def q_cusum_hourly(sf_dir: str):
    """CUSUM changepoint detection over the per-hour event-count series:
    s = max(0, s + (x - k)) via the vectorized reset identity
    s_i = P_i - min(0, running-min P) — prefix sum + prefix min, plain
    window functions in the oracle. k = ceil(mean hourly count),
    alert at 4k. Full hour grid (empty hours are 0)."""
    from .stages.window import cusum_hourly

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    return cusum_hourly(ds)


@_hinted("events")
def q_cohort_retention(sf_dir: str):
    """Retention triangle: users cohorted by first-activity day, distinct
    cohort members active at each day offset. One bucketed pass (users are
    bucket-local), bounded cell-count shuffle."""
    from .stages.window import cohort_retention

    ds = read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return cohort_retention(ds)


@_hinted("events")
def q_scd2_intervals(sf_dir: str):
    """SCD type-2 dimension build: per-user state runs as validity
    intervals (valid_from/valid_to, open-ended current row). One bucketed
    pass; lead within buckets."""
    from .stages.window import scd2_intervals

    ds = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type", "event_id"])
    return scd2_intervals(ds)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "parse_tool_calls": q_parse_tool_calls,
    "parse_errors": q_parse_errors,
    "tool_stats": q_tool_stats,
    "log_templates": q_log_templates,
    "retry_storms": q_retry_storms,
    "tool_latency_quantiles": q_tool_latency_quantiles,
    "conv_outcomes": q_conv_outcomes,
    "error_recovery": q_error_recovery,
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
    "rate_spikes": q_rate_spikes,
    "top_users": q_top_users,
    "dedup_exact": q_dedup_exact,
    "span_dedup": q_span_dedup,
    "span_boilerplate": q_span_boilerplate,
    "span_dedup_indoc": q_span_dedup_indoc,
    "conv_dedup": q_conv_dedup,
    "turn_latency": q_turn_latency,
    "multiline_stitch": q_multiline_stitch,
    "typo_pairs": q_typo_pairs,
    "peak_concurrency": q_peak_concurrency,
    "tool_pairs": q_tool_pairs,
    "subnet_rollup": q_subnet_rollup,
    "cms_counts": q_cms_counts,
    "pagerank": q_pagerank,
    "graph_degrees": q_graph_degrees,
    "triangle_count": q_triangle_count,
    "label_propagation": q_label_propagation,
    "rank_curation": q_rank_curation,
    "session_paths": q_session_paths,
    "skew_report": q_skew_report,
    "state_dwell": q_state_dwell,
    "event_cooccurrence": q_event_cooccurrence,
    "cusum_hourly": q_cusum_hourly,
    "cohort_retention": q_cohort_retention,
    "scd2_intervals": q_scd2_intervals,
    "two_hop_reach": q_two_hop_reach,
    "zorder_layout": q_zorder_layout,
    "autocorr_hourly": q_autocorr_hourly,
    "user_burstiness": q_user_burstiness,
    "hourly_profile": q_hourly_profile,
    "context_overflow": q_context_overflow,
    "coverage_gaps": q_coverage_gaps,
    "rate_limit_audit": q_rate_limit_audit,
    "latency_trend": q_latency_trend,
    "fair_allocation": q_fair_allocation,
    "event_transitions": q_event_transitions,
    "edge_reciprocity": q_edge_reciprocity,
    "stickiness_daily": q_stickiness_daily,
    "attribution_first_touch": q_attribution_first_touch,
    "gap_histogram": q_gap_histogram,
    "kcore_peel": q_kcore_peel,
    "token_canonical": q_token_canonical,
    "retention_audit": q_retention_audit,
    "clustering_coef": q_clustering_coef,
    "user_event_entropy": q_user_event_entropy,
    "script_mix": q_script_mix,
    "hits_scores": q_hits_scores,
    "volume_trend": q_volume_trend,
    "fertility_by_lang": q_fertility_by_lang,
    "readability": q_readability,
    "edge_overlap": q_edge_overlap,
    "anomaly_hours": q_anomaly_hours,
    "length_ks": q_length_ks,
    "props_stats": q_props_stats,
    "audience_overlap": q_audience_overlap,
    "promo_share": q_promo_share,
    "supplier_rank": q_supplier_rank,
    "ship_delay": q_ship_delay,
    "trending_tokens": q_trending_tokens,
    "event_dedup": q_event_dedup,
    "value_psi": q_value_psi,
    "label_scatter": q_label_scatter,
    "user_lifetimes": q_user_lifetimes,
    "mm_histogram": q_mm_histogram,
    "assortativity": q_assortativity,
    "hapax_rate": q_hapax_rate,
    "nation_share": q_nation_share,
    "tool_success_daily": q_tool_success_daily,
    "tool_latency_mad": q_tool_latency_mad,
    "mm_zero_cross": q_mm_zero_cross,
    "cdc_field_diff": q_cdc_field_diff,
    "forecast_error": q_forecast_error,
    "conv_idle_share": q_conv_idle_share,
    "embedding_norms": q_embedding_norms,
    "lang_script_check": q_lang_script_check,
    "brand_pairs": q_brand_pairs,
    "top_unshipped_orders": q_top_unshipped_orders,
    "order_priority_check": q_order_priority_check,
    "big_orders": q_big_orders,
    "knn_classify": q_knn_classify,
    "k_anonymity": q_k_anonymity,
    "funnel_steps": q_funnel_steps,
    "winnow_matches": q_winnow_matches,
    "join_cardinality": q_join_cardinality,
    "pii_density": q_pii_density,
    "mm_neardup": q_mm_neardup,
    "user_breadth": q_user_breadth,
    "conv_verbosity": q_conv_verbosity,
    "value_twap": q_value_twap,
    "value_mode": q_value_mode,
    "type_correlation": q_type_correlation,
    "mmr_select": q_mmr_select,
    "path_ngrams": q_path_ngrams,
    "label_centroids": q_label_centroids,
    "nation_trade_volume": q_nation_trade_volume,
    "returned_revenue": q_returned_revenue,
    "doc_vectors": q_doc_vectors,
    "tool_chains": q_tool_chains,
    "new_unique_docs": q_new_unique_docs,
    "first_response": q_first_response,
    "mm_clipping": q_mm_clipping,
    "local_supplier_volume": q_local_supplier_volume,
    "depth_profile": q_depth_profile,
    "forecast_revenue": q_forecast_revenue,
    "source_top_terms": q_source_top_terms,
    "mm_decode_errors": q_mm_decode_errors,
    "control_char_audit": q_control_char_audit,
    "mix_entropy": q_mix_entropy,
    "mm_dup_clusters": q_mm_dup_clusters,
    "session_durations": q_session_durations,
    "cumulative_users": q_cumulative_users,
    "dup_rate_curve": q_dup_rate_curve,
    "role_vocab_overlap": q_role_vocab_overlap,
    "mm_silence": q_mm_silence,
    "conv_roundtrips": q_conv_roundtrips,
    "shard_balance": q_shard_balance,
    "order_seasonality": q_order_seasonality,
    "tenure_mix": q_tenure_mix,
    "user_mix_kl": q_user_mix_kl,
    "conversion_delay": q_conversion_delay,
    "lang_confusion": q_lang_confusion,
    "template_drift": q_template_drift,
    "length_gini": q_length_gini,
    "revenue_grouping_sets": q_revenue_grouping_sets,
    "corpus_health": q_corpus_health,
    "mm_sharpness": q_mm_sharpness,
    "value_outliers": q_value_outliers,
    "market_concentration": q_market_concentration,
    "mm_colorfulness": q_mm_colorfulness,
    "cross_table_overlap": q_cross_table_overlap,
    "price_ladder": q_price_ladder,
    "column_sizes": q_column_sizes,
    "churn_flags": q_churn_flags,
    "repeat_purchase_rate": q_repeat_purchase_rate,
    "totalprice_audit": q_totalprice_audit,
    "orphan_orders": q_orphan_orders,
    "order_status_trend": q_order_status_trend,
    "late_events": q_late_events,
    "quantile_sketch": q_quantile_sketch,
    "source_lang_rollup": q_source_lang_rollup,
    "session_conversion": q_session_conversion,
    "scan_prune_plan": q_scan_prune_plan,
    "mix_balance": q_mix_balance,
    "mix_temperature": q_mix_temperature,
    "shard_assign": q_shard_assign,
    "distinct_kmv": q_distinct_kmv,
    "doc_tokens": q_doc_tokens,
    "doc_quality": q_doc_quality,
    "sim_topk": q_sim_topk,
    # --- approximate / non-SQL ops (rows-only oracle) ---
    "sim_topk_lsh": q_sim_topk_lsh,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "doc_fingerprint": q_doc_fingerprint,
    "mm_features": q_mm_features,
    "mm_frames": q_mm_frames,
    "mm_meta": q_mm_meta,
    "mm_decode": q_mm_decode,
    "mm_jpeg_decode": q_mm_jpeg_decode,
    "doc_sample": q_doc_sample,
    # --- SQL-verified additions ---
    "token_jaccard": q_token_jaccard,
    "embedding_neardup": q_embedding_neardup,
    "lang_id": q_lang_id,
    "token_count_bpe": q_token_count_bpe,
    "quality_full": q_quality_full,
    "sessionize": q_sessionize,
    "top_events_per_user": q_top_events_per_user,
    "asof_purchase_click": q_asof_purchase_click,
    "order_revenue_join": q_order_revenue_join,
    "customers_no_urgent": q_customers_no_urgent,
    "attrs_actions": q_attrs_actions,
    "redaction": q_redaction,
    "parse_json": q_parse_json,
    "parse_nginx_error": q_parse_nginx_error,
    "metrics_dim_filter": q_metrics_dim_filter,
    "file_source": q_file_source,
    "span_ids": q_span_ids,
    "events_hopping": q_events_hopping,
    "range_join": q_range_join,
    "region_revenue": q_region_revenue,
    "sim_topk_ivf": q_sim_topk_ivf,
    # --- exporter-transform operators (round 2) ---
    "attrs_flatten": q_attrs_flatten,
    "span_operation": q_span_operation,
    "span_resource": q_span_resource,
    "dd_source": q_dd_source,
    "xray_segments": q_xray_segments,
    "container_tags": q_container_tags,
    "span_meta": q_span_meta,
    "error_tags": q_error_tags,
    "embedding_kmeans_assign": q_embedding_kmeans_assign,
    "semdedup": q_semdedup,
    "ch_metrics_gauge": q_ch_metrics_gauge,
    "ch_metrics_sum": q_ch_metrics_sum,
    "ch_metrics_histogram": q_ch_metrics_histogram,
    "ch_metrics_exp_histogram": q_ch_metrics_exp_histogram,
    "ch_metrics_summary": q_ch_metrics_summary,
    "dd_span": q_dd_span,
    "decontaminate": q_decontaminate,
    "contamination_overlap": q_contamination_overlap,
    "ppl_buckets": q_ppl_buckets,
    "decontaminate_bloom": q_decontaminate_bloom,
    "vocab_growth": q_vocab_growth,
    "text_normalize": q_text_normalize,
    "gopher_rules": q_gopher_rules,
    "c4_line_filter": q_c4_line_filter,
    "conv_examples": q_conv_examples,
    "length_buckets": q_length_buckets,
    "compaction_plan": q_compaction_plan,
    "conv_split": q_conv_split,
    "char_entropy": q_char_entropy,
    "ngram_diversity": q_ngram_diversity,
    "conv_quality": q_conv_quality,
    "per_source_cap": q_per_source_cap,
    "unigram_logprob": q_unigram_logprob,
    "seq_pack": q_seq_pack,
    "tfidf_topk": q_tfidf_topk,
    "dup_ngrams": q_dup_ngrams,
    "ch_logs_row": q_ch_logs_row,
    "ch_traces_row": q_ch_traces_row,
    "metrics_emf_json": q_metrics_emf_json,
    "otlp_spans_json": q_otlp_spans_json,
    "otlp_logs_json": q_otlp_logs_json,
    "otlp_metrics_json": q_otlp_metrics_json,
    "xray_groups": q_xray_groups,
    "redaction_body": q_redaction_body,
    "file_source_gz": q_file_source_gz,
    "fluent_forward": q_fluent_forward,
    "corpus_curation": q_corpus_curation,
    "duration_quantiles": q_duration_quantiles,
    "dedup_keep": q_dedup_keep,
    "dedup_clusters": q_dedup_clusters,
    "distinct_hll": q_distinct_hll,
    "users_per_type_hll": q_users_per_type_hll,
    "weighted_sample": q_weighted_sample,
    "corpus_diff": q_corpus_diff,
    "dedup_rate_by_source": q_dedup_rate_by_source,
    "embedding_outliers": q_embedding_outliers,
    "vocab_kl": q_vocab_kl,
    "corpus_report": q_corpus_report,
    "doc_quality_rank": q_doc_quality_rank,
    "inverted_index": q_inverted_index,
    "source_lm_score": q_source_lm_score,
    "attr_mi": q_attr_mi,
    "kn_bigram_logprob": q_kn_bigram_logprob,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "source_overlap": q_source_overlap,
    "latest_with_tombstones": q_latest_with_tombstones,
    "dedup_keep_clustered": q_dedup_keep_clustered,
    "doc_repetition": q_doc_repetition,
    "doc_sample_stratified": q_doc_sample_stratified,
    "heavy_hitters": q_heavy_hitters,
    "attrs_overflow": q_attrs_overflow,
    "pii_scrub": q_pii_scrub,
    "bpe_pairs": q_bpe_pairs,
    "bpe_train": q_bpe_train,
    "hard_negatives": q_hard_negatives,
    "embedding_quantize": q_embedding_quantize,
    "dsir_weights": q_dsir_weights,
    "dsir_select": q_dsir_select,
    "pack_export": q_pack_export,
    "token_budget": q_token_budget,
    "corpus_pack": q_corpus_pack,
    "table_profile": q_table_profile,
    "global_quantiles": q_global_quantiles,
    "pq_codes": q_pq_codes,
    "pq_search": q_pq_search,
    "bigram_logprob": q_bigram_logprob,
    "norm_dedup": q_norm_dedup,
    "quality_classifier": q_quality_classifier,
    "bpe_encode": q_bpe_encode,
    "kmeans_fit_int": q_kmeans_fit_int,
    "turn_transitions": q_turn_transitions,
    "collocations": q_collocations,
    "doc_chunks": q_doc_chunks,
    "bm25_topk": q_bm25_topk,
    "rrf_fusion": q_rrf_fusion,
    "zipf_slope": q_zipf_slope,
    "oov_rate": q_oov_rate,
    "latest_event_per_user": q_latest_event_per_user,
    "embedding_covariance": q_embedding_covariance,
    "customer_order_counts": q_customer_order_counts,
    "rolling_value": q_rolling_value,
    "users_per_type_kmv": q_users_per_type_kmv,
    "dedup_keep_best": q_dedup_keep_best,
    "mm_resize": q_mm_resize,
    "mm_dhash": q_mm_dhash,
    "slo_burn": q_slo_burn,
    "mm_resample": q_mm_resample,
    "mm_loudness": q_mm_loudness,
    "mm_motion": q_mm_motion,
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
    sql["conv_outcomes"] = f"""
        WITH pc AS (
          SELECT conv_id,
                 max(CASE WHEN {SQL_IS_TOOL} THEN 1 ELSE 0 END) AS ht,
                 max(CASE WHEN {SQL_IS_ERROR} THEN 1 ELSE 0 END) AS he
          FROM {T} GROUP BY conv_id)
        SELECT ht = 1 AS has_tool, he = 1 AS has_error,
               CAST(count(*) AS BIGINT) AS n_convs
        FROM pc GROUP BY 1, 2"""
    sql["error_recovery"] = f"""
        WITH p AS (
          SELECT conv_id, turn_idx, {SQL_IS_ERROR} AS is_err,
                 ({SQL_IS_TOOL})
                   AND regexp_extract(text, 'exit=(\\d+)', 1) = '0' AS ok_tool
          FROM {T}),
        e AS (SELECT conv_id, max(turn_idx) AS le
              FROM p WHERE is_err GROUP BY conv_id),
        r AS (SELECT e.conv_id,
                     max(CASE WHEN p.ok_tool AND p.turn_idx > e.le
                              THEN 1 ELSE 0 END) AS rec
              FROM e JOIN p ON p.conv_id = e.conv_id GROUP BY e.conv_id)
        SELECT rec = 1 AS recovered, CAST(count(*) AS BIGINT) AS n_convs
        FROM r GROUP BY 1"""
    sql["tool_stats"] = f"""
        WITH tc AS (
          SELECT conv_id,
                 regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1) AS tool_name,
                 CAST(regexp_extract(text, 'exit=(\\d+)', 1) AS INTEGER) AS tool_exit,
                 CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1) AS BIGINT) AS duration_ms
          FROM {T} WHERE {SQL_IS_TOOL}),
        g AS (
          SELECT tool_name, conv_id, count(*) AS c,
                 count(*) FILTER (WHERE tool_exit != 0) AS f,
                 sum(duration_ms) AS s, max(duration_ms) AS mx
          FROM tc GROUP BY 1, 2)
        SELECT tool_name, CAST(sum(c) AS BIGINT) AS n_calls,
               CAST(sum(f) AS BIGINT) AS n_failed,
               CAST(count(*) AS BIGINT) AS n_convs,
               CAST(sum(s) AS BIGINT) AS sum_duration_ms,
               CAST(max(mx) AS BIGINT) AS max_duration_ms
        FROM g GROUP BY tool_name"""
    sql["log_templates"] = f"""
        WITH m AS (
          SELECT regexp_replace(regexp_replace(regexp_replace(text,
                   '"[^"]*"', '<STR>', 'g'),
                   '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                   '\\d+(\\.\\d+)*', '<NUM>', 'g') AS template,
                 conv_id, text
          FROM {T})
        SELECT template, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
               min(text) AS example
        FROM m GROUP BY template
        ORDER BY n_lines DESC, template LIMIT {LOG_TEMPLATE_K}"""
    sql["tool_latency_quantiles"] = f"""
        WITH tc AS (
          SELECT regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1)
                   AS tool_name,
                 CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1)
                   AS BIGINT) AS v
          FROM {T} WHERE {SQL_IS_TOOL}),
        c AS (SELECT tool_name, v, count(*) AS n FROM tc GROUP BY 1, 2),
        t AS (SELECT tool_name, sum(n) AS tot FROM c GROUP BY 1),
        r AS (
          SELECT c.tool_name, v,
                 sum(n) OVER (PARTITION BY c.tool_name ORDER BY v) AS cum,
                 t.tot
          FROM c JOIN t USING (tool_name))
        SELECT tool_name, CAST(max(tot) AS BIGINT) AS n_rows,
               CAST(min(CASE WHEN cum >= 50 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p50,
               CAST(min(CASE WHEN cum >= 95 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p95,
               CAST(min(CASE WHEN cum >= 99 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p99
        FROM r GROUP BY tool_name"""
    sql["retry_storms"] = f"""
        WITH tc AS (
          SELECT conv_id, turn_idx,
                 regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1)
                   AS tool_name,
                 CAST(regexp_extract(text, 'exit=(\\d+)', 1) AS INTEGER)
                   AS tool_exit
          FROM {T} WHERE {SQL_IS_TOOL}),
        s AS (
          SELECT *, (tool_exit != 0) AS failed,
                 row_number() OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS rn
          FROM tc),
        isl AS (
          SELECT *, rn - row_number() OVER (
                   PARTITION BY conv_id, tool_name, failed
                   ORDER BY turn_idx) AS grp
          FROM s)
        SELECT conv_id, tool_name,
               CAST(min(turn_idx) AS BIGINT) AS start_turn,
               CAST(max(turn_idx) AS BIGINT) AS end_turn,
               CAST(count(*) AS BIGINT) AS n_calls
        FROM isl WHERE failed
        GROUP BY conv_id, tool_name, grp HAVING count(*) >= 2"""
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
    sql["rate_spikes"] = f"""
        WITH c AS (
          SELECT event_type, date_trunc('minute', ts) AS ts_minute,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        w AS (
          SELECT event_type, ts_minute, n,
                 COALESCE(sum(n) OVER (PARTITION BY event_type
                   ORDER BY ts_minute ROWS BETWEEN {RATE_SPIKE_WINDOW}
                   PRECEDING AND 1 PRECEDING), 0) AS trail_sum,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY ts_minute) AS rn
          FROM c)
        SELECT event_type, ts_minute, CAST(n AS BIGINT) AS n,
               CAST(trail_sum AS BIGINT) AS trail_sum,
               (rn > {RATE_SPIKE_WINDOW} AND
                {RATE_SPIKE_DEN} * {RATE_SPIKE_WINDOW} * n >
                {RATE_SPIKE_NUM} * trail_sum) AS spike
        FROM w"""
    sql["top_users"] = f"""
        SELECT user_id, CAST(sum({cents.format(expr='value')}) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY 1 ORDER BY 2 DESC LIMIT 10"""
    sql["mix_balance"] = r"""
        WITH tot AS (
          SELECT source, SUM(len(regexp_extract_all(text, '\S+'))) AS t
          FROM documents GROUP BY source),
        g AS (SELECT SUM(t) AS ct, COUNT(*) AS ns FROM tot),
        thr AS (SELECT source,
                CASE WHEN t = 0 THEN 65536
                     ELSE LEAST(65536, CAST(((SELECT ct FROM g) // (2 * (SELECT ns FROM g)))
                                            * 65536 // t AS BIGINT))
                END AS thr FROM tot)
        SELECT d.doc_id, d.source
        FROM documents d JOIN thr USING (source)
        WHERE list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(substr(md5(d.text), 1, 4), ''),
                  c -> CAST(ascii(c) - CASE WHEN c >= 'a' THEN 87 ELSE 48 END AS BIGINT))),
              (h, x) -> h * 16 + x) < thr.thr"""
    # temperature re-weighting: ONE floor-quantized exp/ln per source (the
    # ln/exp/floor bit-agreement pattern), all downstream columns integer
    sql["mix_temperature"] = r"""
        WITH tot AS (
          SELECT source,
                 CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS t
          FROM documents GROUP BY source),
        c AS (SELECT CAST(SUM(t) AS BIGINT) AS corpus FROM tot),
        w AS (
          SELECT source, t,
                 CAST(CAST(t AS HUGEINT) * 1000000000
                      // (SELECT corpus FROM c) AS BIGINT) AS share_unat,
                 CAST(floor(exp(ln(CAST(t AS DOUBLE)
                                  / (SELECT corpus FROM c)) * 0.7) * 1e9)
                      AS BIGINT) AS temp_w_unat
          FROM tot),
        s AS (SELECT CAST(SUM(temp_w_unat) AS HUGEINT) AS sw FROM w)
        SELECT source, t AS n_tokens, share_unat, temp_w_unat,
               CAST(CAST(temp_w_unat AS HUGEINT) * 1000000000
                    // (SELECT sw FROM s) AS BIGINT) AS target_unat,
               CAST(CAST(temp_w_unat AS HUGEINT)
                    * (SELECT corpus FROM c) * 1000000
                    // ((SELECT sw FROM s) * t) AS BIGINT) AS boost_ppm
        FROM w"""
    sql["shard_assign"] = r"""
        WITH h AS (
          SELECT doc_id, md5(text) AS hh,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(substr(md5(text), 1, 4), ''),
                  c -> CAST(ascii(c) - CASE WHEN c >= 'a' THEN 87 ELSE 48 END AS BIGINT))),
              (h, x) -> h * 16 + x) % 16 AS shard
          FROM documents)
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1
                    AS BIGINT) AS pos
        FROM h"""
    sql["span_dedup"] = r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
        spans AS (
          SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
                 array_to_string(ts[(i*10+1):(i*10+10)], ' ') AS span
          FROM toks, unnest(range((len(ts)+9)//10)) AS t(i)),
        keep AS (
          SELECT doc_id, span_idx, span,
                 row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
          FROM spans)
        SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS text_dedup,
               count(*) AS n_kept
        FROM keep WHERE rn = 1 GROUP BY doc_id"""
    sql["span_boilerplate"] = r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
        spans AS (
          SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
                 array_to_string(ts[(i*10+1):(i*10+10)], ' ') AS span
          FROM toks, unnest(range((len(ts)+9)//10)) AS t(i)),
        freq AS (
          SELECT span, count(DISTINCT doc_id) AS nd FROM spans GROUP BY span)
        SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS text_dedup,
               count(*) AS n_kept
        FROM spans JOIN freq USING (span) WHERE nd < 2 GROUP BY doc_id"""
    sql["span_dedup_indoc"] = r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
        spans AS (
          SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
                 array_to_string(ts[(i*2+1):(i*2+2)], ' ') AS span
          FROM toks, unnest(range((len(ts)+1)//2)) AS t(i)),
        keep AS (
          SELECT doc_id, span_idx, span,
                 row_number() OVER (PARTITION BY doc_id, span ORDER BY span_idx) AS rn
          FROM spans)
        SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS text_dedup,
               count(*) AS n_kept
        FROM keep WHERE rn = 1 GROUP BY doc_id"""
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
    # approximate ANN over the planted fixtures: planted rows are verified
    # at build time to be retrievable (probed LSH bucket / IVF cell) and to
    # dominate every organic cosine, so the brute-force order over the
    # fixture EQUALS the approximate engine result (stages/planted.py)
    from .stages.planted import (PLANTED_NEARDUP_TAU as _PTAU,
                                 planted_neardup_path, planted_topk_path)

    # pure paths — building the SQL dict has NO fixture side effects (round-5
    # advice): the *_path helpers only read the source parquet footer for the
    # content-fingerprint cache key. The fixtures are built by the matching
    # query callables (sim_topk_lsh / sim_topk_ivf / embedding_neardup_lsh
    # all ensure_* on invocation), which every harness runs before the SQL.
    _ptopk = planted_topk_path(sf_dir)
    _pnd = planted_neardup_path(sf_dir)
    for _q in ("sim_topk_lsh", "sim_topk_ivf"):
        sql[_q] = f"""
        SELECT vec_id FROM read_parquet('{_ptopk}/*.parquet')
        ORDER BY list_cosine_similarity(embedding,
            (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC
        LIMIT 10"""
    sql["embedding_neardup_lsh"] = f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM read_parquet('{_pnd}/*.parquet') a
        JOIN read_parquet('{_pnd}/*.parquet') b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= {_PTAU}"""
    sql["token_jaccard"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_distinct(list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')) AS tk
          FROM documents)
        SELECT a.doc_id // 2 AS pair_key,
               CASE WHEN len(list_distinct(list_concat(a.tk, b.tk))) = 0 THEN 0.0
                    ELSE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.tk, b.tk))) END AS jaccard
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0"""
    sql["embedding_neardup"] = f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= {NEARDUP_TAU}"""
    from .stages.textstats import BPE_PATTERN, STOPWORDS_PATTERN, lang_id_oracle_sql

    sql["lang_id"] = lang_id_oracle_sql("documents")
    bpe_sql = BPE_PATTERN.replace("'", "''")
    sql["token_count_bpe"] = rf"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{bpe_sql}')) AS BIGINT) AS n_bpe_tokens,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents"""
    sql["quality_full"] = rf"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[^\sA-Za-z0-9]')) AS DOUBLE)
                 / greatest(length(text), 1) AS punct_ratio,
               CAST(len(regexp_extract_all(text, '{STOPWORDS_PATTERN}')) AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '\S+')), 1) AS stopword_ratio
        FROM documents"""
    sql["sessionize"] = """
        SELECT user_id, session_idx,
               count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_sum_cents
        FROM (
          SELECT user_id, ts, value,
                 CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) - 1 AS session_idx
          FROM (SELECT user_id, ts, value, event_id,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events))
        GROUP BY 1, 2"""
    sql["top_events_per_user"] = """
        SELECT user_id, value, event_id FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) <= 3"""
    sql["asof_purchase_click"] = """
        SELECT p.user_id, p.ts, p.event_id, p.value,
               c.ts AS ts_right, c.event_id AS event_id_right, c.value AS value_right
        FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts"""
    sql["customers_no_urgent"] = """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"""
    sql["order_revenue_join"] = f"""
        SELECT o_orderpriority,
               CAST(sum({cents.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT)
                 AS revenue_cents,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1"""
    sql["attrs_actions"] = rf"""
        SELECT conv_id, turn_idx, 'prod' AS env, sha256(role) AS role,
               NULLIF(regexp_extract(text, '^TOOL_CALL tool=(\w+)', 1), '') AS xtool
        FROM {T}"""
    sql["redaction"] = rf"""
        SELECT conv_id, turn_idx,
               CASE WHEN regexp_matches(remote_addr, '^10\.') THEN '[REDACTED]'
                    ELSE remote_addr END AS remote_addr,
               CAST(CASE WHEN regexp_matches(remote_addr, '^10\.') THEN 1 ELSE 0 END AS BIGINT)
                 AS redaction_masked_count
        FROM (SELECT conv_id, turn_idx, regexp_extract(text, '^(\S+) ', 1) AS remote_addr
              FROM {T} WHERE ({SQL_EVENT_TYPE}) = 'nginx_access')"""
    sql["parse_json"] = f"""
        SELECT conv_id, turn_idx,
               json_extract_string(text, '$.remote_addr') AS remote_addr,
               json_extract_string(text, '$.request') AS request,
               CAST(json_extract_string(text, '$.status') AS INTEGER) AS status,
               CAST(json_extract_string(text, '$.body_bytes_sent') AS BIGINT) AS body_bytes_sent,
               json_extract_string(text, '$.time_local') AS time_local
        FROM {T} WHERE ({SQL_EVENT_TYPE}) = 'json'"""
    sql["parse_nginx_error"] = rf"""
        SELECT conv_id, turn_idx,
               regexp_extract(text, '\[(\w+)\]', 1) AS ng_level,
               CAST(regexp_extract(text, ' (\d+)#', 1) AS INTEGER) AS ng_pid,
               CAST(regexp_extract(text, '#(\d+):', 1) AS INTEGER) AS ng_tid,
               CAST(NULLIF(regexp_extract(text, ': \*(\d+) ', 1), '') AS BIGINT) AS ng_cid,
               regexp_extract(text,
                 '^\d{{4}}/\d{{2}}/\d{{2}} \d{{2}}:\d{{2}}:\d{{2}} \[\w+\] \d+#\d+:(?: \*\d+)? (.*)$',
                 1) AS ng_message,
               {SQL_SEVERITY} AS severity_number
        FROM {T} WHERE ({SQL_EVENT_TYPE}) = 'nginx_error'"""
    sql["metrics_dim_filter"] = (
        sql["metrics_emf"]
        + " HAVING NOT (lower(name) LIKE 'km%' OR lower(name) = 'json')"
    )
    sql["file_source"] = f"""
        SELECT {SQL_EVENT_TYPE} AS event_type, {SQL_SEVERITY} AS severity_number,
               count(*) AS n
        FROM {T}
        WHERE ({SQL_EVENT_TYPE}) IN ('nginx_access', 'nginx_error', 'kmsg')
        GROUP BY 1, 2"""
    sql["span_ids"] = f"""
        SELECT conv_id, turn_idx,
               md5(conv_id) AS trace_id,
               substr(md5(conv_id || ':' || turn_idx), 1, 16) AS span_id
        FROM {T} WHERE {SQL_IS_TOOL}"""
    from .generator import sf_from_dir as _sfd
    from .stages.multimodal import media_path as _mp

    media_dir = _mp(_sfd(sf_dir))
    sql["mm_meta"] = f"""
        SELECT media_id, kind, width, height, nframes, channels,
               CAST(width AS BIGINT) * height * nframes * channels AS n_bytes
        FROM read_parquet('{media_dir}/*.parquet')"""
    sql["mm_features"] = f"""
        SELECT media_id, kind, mean_byte
        FROM read_parquet('{media_dir}/*.parquet')"""
    sql["mm_frames"] = f"""
        SELECT media_id, CAST(f AS INTEGER) AS frame_idx
        FROM (SELECT media_id,
                     unnest(CASE WHEN kind = 'video' AND nframes > 1
                                 THEN range(0, nframes, 4) ELSE [0] END) AS f
              FROM read_parquet('{media_dir}/*.parquet'))"""
    # mm_resize: replay the nearest-neighbor floor index map over the
    # generator's body_hex (raw pre-encode bytes; byte k is hex chars
    # 2k+1 / 2k+2). The engine must reproduce those bytes by REALLY
    # decoding the PNG payload (zlib inflate + un-filter), so the codec
    # itself is under oracle here, not just the resize arithmetic.
    _hd = ("(16 * (ascii(substr(hx, {p}, 1)) "
           "- CASE WHEN substr(hx, {p}, 1) >= 'A' THEN 55 ELSE 48 END) "
           "+ ascii(substr(hx, {p} + 1, 1)) "
           "- CASE WHEN substr(hx, {p} + 1, 1) >= 'A' THEN 55 ELSE 48 END)")
    _px = _hd.format(
        p="2 * (((u.i * h) // 32 * w + (v.j * w) // 32) * ch + l.c) + 1")
    sql["mm_resize"] = f"""
        WITH img AS (
          SELECT media_id, body_hex AS hx, width AS w, height AS h,
                 channels AS ch
          FROM read_parquet('{media_dir}/*.parquet') WHERE kind = 'image'),
        b AS (
          SELECT media_id, ch, u.i AS oi, v.j AS oj, l.c AS oc, {_px} AS b
          FROM img, unnest(range(0, 32)) AS u(i), unnest(range(0, 32)) AS v(j),
               unnest(range(0, ch)) AS l(c))
        SELECT media_id, CAST(count(*) AS BIGINT) AS n_px,
               CAST(sum(b) AS BIGINT) AS px_sum,
               CAST(max(CASE WHEN oi = 0 AND oj = 0 AND oc = 0 THEN b END)
                 AS BIGINT) AS first_px,
               CAST(max(CASE WHEN oi = 31 AND oj = 31 AND oc = ch - 1 THEN b
                 END) AS BIGINT) AS last_px
        FROM b GROUP BY 1"""
    # mm_dhash: replay the integer dHash (luma, 8x9 floor grid, comparison
    # bits as two int64 halves) from the decoded-blob hex — same _hd byte
    # parse, pixel (si, sj) channel c at position ((si*w + sj)*ch + c)
    _dh_b = [_hd.format(
        p=f"2 * ((((u.i * h) // 8 * w + (v.j * w) // 9) * ch + {c}) + 0) + 1")
        for c in (0, 1, 2)]
    _dh_gv = (f"CASE WHEN ch >= 3 THEN (299 * {_dh_b[0]} + 587 * {_dh_b[1]} "
              f"+ 114 * {_dh_b[2]}) // 1000 ELSE {_dh_b[0]} END")
    sql["mm_dhash"] = f"""
        WITH img AS (
          SELECT media_id, body_hex AS hx, width AS w, height AS h,
                 channels AS ch
          FROM read_parquet('{media_dir}/*.parquet') WHERE kind = 'image'),
        g AS (
          SELECT media_id, u.i AS gi, v.j AS gj, {_dh_gv} AS gv
          FROM img, unnest(range(0, 8)) AS u(i), unnest(range(0, 9)) AS v(j)),
        bits AS (
          SELECT a.media_id, a.gi * 8 + a.gj AS p,
                 CASE WHEN a.gv > c.gv THEN 1 ELSE 0 END AS bit
          FROM g a JOIN g c ON c.media_id = a.media_id AND c.gi = a.gi
                           AND c.gj = a.gj + 1
          WHERE a.gj < 8),
        hsh AS (
          SELECT media_id,
                 CAST(sum(CASE WHEN p >= 32 THEN bit * (1::BIGINT << (p - 32))
                          ELSE 0 END) AS BIGINT) AS dhash_hi,
                 CAST(sum(CASE WHEN p < 32 THEN bit * (1::BIGINT << p)
                          ELSE 0 END) AS BIGINT) AS dhash_lo
          FROM bits GROUP BY media_id),
        gs AS (
          SELECT media_id, CAST(sum(gv) AS BIGINT) AS gray_sum
          FROM g GROUP BY media_id)
        SELECT hsh.media_id, dhash_hi, dhash_lo, gray_sum
        FROM hsh JOIN gs ON gs.media_id = hsh.media_id"""
    from .stages.jpeg import jpeg_media_path as _jmp

    _jdir = _jmp(_sfd(sf_dir))
    _jb = _hd.format(p="2 * u.k + 1")
    sql["mm_jpeg_decode"] = f"""
        WITH m AS (
          SELECT media_id, width, height, channels, body_hex AS hx,
                 CAST(width AS BIGINT) * height * channels AS n
          FROM read_parquet('{_jdir}/*.parquet')),
        b AS (
          SELECT media_id, width, height, channels, n, u.k AS k, {_jb} AS b
          FROM m, unnest(range(0, n)) AS u(k))
        SELECT media_id, max(width) AS width, max(height) AS height,
               max(channels) AS channels,
               CAST(max(n) AS BIGINT) AS n_bytes,
               CAST(sum(b) AS BIGINT) AS byte_sum,
               CAST(max(CASE WHEN k = 0 THEN b END) AS BIGINT) AS first_byte,
               CAST(max(CASE WHEN k = n - 1 THEN b END) AS BIGINT) AS last_byte
        FROM b GROUP BY media_id"""
    _bk = _hd.format(p="2 * u.k + 1")
    sql["mm_decode"] = f"""
        WITH m AS (
          SELECT media_id, kind, body_hex AS hx,
                 CAST(width AS BIGINT) * height * nframes * channels AS n
          FROM read_parquet('{media_dir}/*.parquet')),
        b AS (
          SELECT media_id, kind, n, u.k AS k, {_bk} AS b
          FROM m, unnest(range(0, n)) AS u(k))
        SELECT media_id, max(kind) AS kind, CAST(max(n) AS BIGINT) AS n_bytes,
               CAST(sum(b) AS BIGINT) AS byte_sum,
               CAST(max(CASE WHEN k = 0 THEN b END) AS BIGINT) AS first_byte,
               CAST(max(CASE WHEN k = n - 1 THEN b END) AS BIGINT) AS last_byte
        FROM b GROUP BY media_id"""
    _b1 = _hd.format(p="2 * (p.p * w * h + q.k) + 1")
    _b2 = _hd.format(p="2 * ((p.p + 1) * w * h + q.k) + 1")
    sql["mm_motion"] = f"""
        WITH vid AS (
          SELECT media_id, body_hex AS hx, width AS w, height AS h,
                 nframes AS nf
          FROM read_parquet('{media_dir}/*.parquet')
          WHERE kind = 'video' AND nframes > 1),
        d AS (
          SELECT media_id, p.p,
                 CAST(sum(abs({_b1} - {_b2})) AS BIGINT) AS diff
          FROM vid, unnest(range(0, nf - 1)) AS p(p),
               unnest(range(0, w * h)) AS q(k)
          GROUP BY 1, 2),
        pk AS (
          SELECT media_id, p AS peak_pair, diff AS motion_peak,
                 row_number() OVER (PARTITION BY media_id
                                    ORDER BY diff DESC, p) AS rn
          FROM d)
        SELECT d.media_id, CAST(sum(d.diff) AS BIGINT) AS motion_total,
               CAST(max(pk.motion_peak) AS BIGINT) AS motion_peak,
               CAST(max(pk.peak_pair) AS BIGINT) AS peak_pair
        FROM d JOIN pk ON pk.media_id = d.media_id AND pk.rn = 1
        GROUP BY 1"""
    _se = _hd.format(p="2 * u.i + 1")
    sql["mm_loudness"] = f"""
        WITH aud AS (
          SELECT media_id, body_hex AS hx, width AS w
          FROM read_parquet('{media_dir}/*.parquet') WHERE kind = 'audio'),
        b AS (
          SELECT media_id, u.i AS i, {_se} AS b
          FROM aud, unnest(range(0, (w // 64) * 64)) AS u(i))
        SELECT media_id, CAST(i // 64 AS BIGINT) AS frame_idx,
               CAST(sum((b - 128) * (b - 128)) AS BIGINT) AS energy
        FROM b GROUP BY 1, 2"""
    _sa = _hd.format(p="2 * ((u.i * w) // 512) + 1")
    sql["mm_resample"] = f"""
        WITH aud AS (
          SELECT media_id, body_hex AS hx, width AS w
          FROM read_parquet('{media_dir}/*.parquet') WHERE kind = 'audio'),
        b AS (
          SELECT media_id, u.i AS oi, {_sa} AS b
          FROM aud, unnest(range(0, 512)) AS u(i))
        SELECT media_id, CAST(count(*) AS BIGINT) AS n_samples,
               CAST(sum(b) AS BIGINT) AS sample_sum,
               CAST(max(CASE WHEN oi = 0 THEN b END) AS BIGINT) AS first_sample,
               CAST(max(CASE WHEN oi = 511 THEN b END) AS BIGINT) AS last_sample
        FROM b GROUP BY 1"""
    # brute-force 3-token-shingle Jaccard (same shingle fallback as the
    # engine: docs with < 3 tokens use their distinct tokens). Exact equality
    # holds because every true pair in this corpus has j >= 0.9, where the
    # 16x4 banding's recall is ~1 (measured: no pairs in (0.2, 0.9)).
    sql["dedup_minhash"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 3 THEN
                   list_distinct(list_transform(generate_series(1, len(tk) - 2),
                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                 ELSE list_distinct(tk) END AS s
          FROM toks)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.5"""
    sql["doc_sample"] = """
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(text), 1, 1) IN ('0', '1')"""
    # simhash near-dup, bit-exact in SQL: per-token FNV-1a (HUGEINT mod-2^64),
    # per-bit majority votes -> 64-bit signature, then brute-force all-pairs
    # Hamming <= 3. EXACT equality with the engine because the 4x16-bit
    # banding gives full recall at Hamming <= 3 by pigeonhole and empty docs
    # (sig 0) are excluded on both sides. Mirrors dedup.simhash_batch.
    _B, _P, _M = 0xCBF29CE484222325, 1_099_511_628_211, 1 << 64
    sql["dedup_simhash"] = f"""
        WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM documents),
        th AS (
          SELECT doc_id, len(tk) AS n, list_transform(tk, t ->
            list_reduce(list_prepend(CAST({_B} AS HUGEINT),
              list_transform(range(1, octet_length(encode(t)) + 1),
                i -> CAST(16 * (ascii(substr(hex(encode(t)), 2*i-1, 1))
                                - CASE WHEN substr(hex(encode(t)), 2*i-1, 1) >= 'A'
                                       THEN 55 ELSE 48 END)
                          + ascii(substr(hex(encode(t)), 2*i, 1))
                          - CASE WHEN substr(hex(encode(t)), 2*i, 1) >= 'A'
                                 THEN 55 ELSE 48 END AS HUGEINT))),
              (h, x) -> xor(h, x) * {_P} % {_M}::HUGEINT)) AS hs
          FROM toks),
        sigs AS (
          SELECT doc_id,
            CASE WHEN n = 0 THEN CAST(0 AS HUGEINT) ELSE
              list_sum(list_transform(range(0, 64), b ->
                CASE WHEN 2 * len(list_filter(hs,
                            x -> (x // (CAST(1 AS HUGEINT) << b)) % 2 = 1)) > n
                     THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END)) END AS sig
          FROM th),
        sb AS (
          SELECT doc_id,
                 CAST(CASE WHEN sig >= {1 << 63} THEN sig - {_M} ELSE sig END AS BIGINT) AS s
          FROM sigs WHERE sig != 0)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
        FROM sb a JOIN sb b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= 3"""
    # KMV distinct-count sketch, bit-exact in SQL: same per-token FNV-1a and
    # 3-gram rolling-poly (P=1000003) combine as the engine's shingle stream
    # (short docs contribute raw token hashes), k smallest distinct values,
    # (k-1)*2^64 // kth estimator in HUGEINT
    sql["distinct_kmv"] = f"""
        WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM documents),
        th AS (
          SELECT doc_id, len(tk) AS n, list_transform(tk, t ->
            list_reduce(list_prepend(CAST({_B} AS HUGEINT),
              list_transform(range(1, octet_length(encode(t)) + 1),
                i -> CAST(16 * (ascii(substr(hex(encode(t)), 2*i-1, 1))
                                - CASE WHEN substr(hex(encode(t)), 2*i-1, 1) >= 'A'
                                       THEN 55 ELSE 48 END)
                          + ascii(substr(hex(encode(t)), 2*i, 1))
                          - CASE WHEN substr(hex(encode(t)), 2*i, 1) >= 'A'
                                 THEN 55 ELSE 48 END AS HUGEINT))),
              (h, x) -> xor(h, x) * {_P} % {_M}::HUGEINT)) AS hs
          FROM toks),
        sh AS (
          SELECT doc_id,
            CASE WHEN n >= 3 THEN list_transform(range(1, n - 1),
                   i -> ((hs[i] * 1000003 + hs[i+1]) % {_M}::HUGEINT * 1000003
                         + hs[i+2]) % {_M}::HUGEINT)
                 ELSE hs END AS gs
          FROM th),
        u AS (SELECT DISTINCT unnest(gs) AS h FROM sh),
        o AS (SELECT h FROM u ORDER BY h LIMIT 256),
        s AS (SELECT count(*) AS c, COALESCE(max(h), 0) AS kth FROM o)
        SELECT CAST(256 AS BIGINT) AS k,
          CAST(CASE WHEN kth >= {1 << 63} THEN kth - {_M} ELSE kth END AS BIGINT)
            AS kth_hash,
          CAST(CASE WHEN c < 256 THEN c
                    ELSE LEAST(CAST(255 AS HUGEINT) * {_M} // kth,
                               {(1 << 63) - 1}) END AS BIGINT) AS n_distinct_est
        FROM s"""
    # winnowing fingerprint, bit-exact in SQL: UTF-8 bytes via hex(encode()),
    # FNV-1a 5-gram rolling hashes and the final combine as HUGEINT
    # mod-2^64 arithmetic (products stay < 2^104 < HUGEINT range), width-4
    # window minima deduped on change — mirrors textstats._winnow_fingerprint
    _B, _P, _M = 0xCBF29CE484222325, 1_099_511_628_211, 1 << 64
    sql["doc_fingerprint"] = f"""
        WITH raw AS (
          SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
          FROM documents),
        byt AS (
          SELECT doc_id, n, list_transform(range(1, n + 1),
            i -> CAST(16 * (ascii(substr(hx, 2*i-1, 1))
                            - CASE WHEN substr(hx, 2*i-1, 1) >= 'A' THEN 55 ELSE 48 END)
                      + ascii(substr(hx, 2*i, 1))
                      - CASE WHEN substr(hx, 2*i, 1) >= 'A' THEN 55 ELSE 48 END
                      AS HUGEINT)) AS bs
          FROM raw),
        gr AS (
          SELECT doc_id,
            CASE WHEN n < 5 THEN [list_reduce(list_prepend(CAST({_B} AS HUGEINT), bs),
                                              (h, x) -> xor(h, x) * {_P} % {_M}::HUGEINT)]
                 ELSE list_transform(range(1, n - 3),
                      i -> list_reduce(list_prepend(CAST({_B} AS HUGEINT),
                                                    list_slice(bs, i, i + 4)),
                                       (h, x) -> xor(h, x) * {_P} % {_M}::HUGEINT)) END AS grams
          FROM byt),
        wn AS (
          SELECT doc_id,
            CASE WHEN len(grams) <= 4 THEN [list_min(grams)]
                 ELSE list_transform(range(1, len(grams) - 2),
                      i -> least(grams[i], grams[i+1], grams[i+2], grams[i+3])) END AS wins
          FROM gr)
        SELECT doc_id,
          CAST(list_reduce(list_prepend(CAST({_B} AS HUGEINT),
                                        list_filter(wins, (x, i) -> i = 1 OR x != wins[i-1])),
                           (h, x) -> xor(h, x) * {_P} % {_M}::HUGEINT) % {1 << 63} AS BIGINT)
            AS fingerprint
        FROM wn"""
    sql["events_hopping"] = f"""
        SELECT event_type,
               make_timestamp((epoch_us(ts) // 60000000) * 60000000 - i.i * 60000000)
                 AS window_start,
               CAST(sum({cents.format(expr='value')}) AS BIGINT) AS sum_value_cents,
               count(*) AS n
        FROM events CROSS JOIN (SELECT unnest(range(5)) AS i) i
        GROUP BY 1, 2"""
    sql["range_join"] = """
        SELECT p.event_id AS left_id, p.ts AS left_ts,
               e.event_id AS right_id, e.ts AS right_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'error') e
          ON p.user_id = e.user_id
         AND e.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR"""
    sql["attrs_flatten"] = f"""
        WITH j AS (SELECT conv_id, turn_idx, text FROM {T}
                   WHERE ({SQL_EVENT_TYPE}) = 'json'),
        l1 AS (SELECT conv_id, turn_idx, text, k,
                      json_extract(text, '$.' || k) AS v
               FROM (SELECT conv_id, turn_idx, text, unnest(json_keys(text)) AS k FROM j))
        SELECT conv_id, turn_idx, k AS attr_key,
               json_extract_string(text, '$.' || k) AS attr_value
        FROM l1 WHERE json_type(v) NOT IN ('OBJECT', 'NULL')
        UNION ALL
        SELECT conv_id, turn_idx, k || '.' || k2 AS attr_key,
               json_extract_string(text, '$.' || k || '.' || k2) AS attr_value
        FROM (SELECT conv_id, turn_idx, text, k,
                     unnest(json_keys(text, '$.' || k)) AS k2
              FROM l1 WHERE json_type(v) = 'OBJECT')
        WHERE json_type(json_extract(text, '$.' || k || '.' || k2))
              NOT IN ('OBJECT', 'NULL')"""
    fixed_list = ", ".join(f"'{k}'" for k in sorted(FIXED_JSON_KEYS))
    sql["attrs_overflow"] = f"""
        SELECT * FROM ({sql["attrs_flatten"]})
        WHERE attr_key NOT IN ({fixed_list})"""
    _TN = r"regexp_extract(text, '^TOOL_CALL tool=(\w+) ', 1)"
    sql["span_operation"] = rf"""
        SELECT conv_id, turn_idx,
          CASE
            WHEN ({SQL_EVENT_TYPE}) IN ('nginx_access', 'json') THEN 'http.server.request'
            WHEN {SQL_IS_TOOL} AND {_TN} = 'python' THEN 'sqlite.query'
            WHEN {SQL_IS_TOOL} AND {_TN} = 'search' THEN 'elasticsearch.query'
            WHEN {SQL_IS_TOOL} AND {_TN} = 'browser' THEN 'aws.s3.request'
            WHEN {SQL_IS_TOOL} AND {_TN} = 'bash' THEN 'grpc.client.request'
            WHEN {SQL_IS_TOOL} THEN 'client.request'
            ELSE 'SPAN_KIND_INTERNAL' END AS operation_name,
          CASE
            WHEN ({SQL_EVENT_TYPE}) IN ('nginx_access', 'json') THEN 'web'
            WHEN {SQL_IS_TOOL} AND {_TN} = 'python' THEN 'sql'
            WHEN {SQL_IS_TOOL} AND {_TN} = 'search' THEN 'elasticsearch'
            WHEN {SQL_IS_TOOL} THEN 'http'
            ELSE 'custom' END AS span_type
        FROM {T}"""
    # mirrors resource_name/service/env/status_code cascades over the fixture
    # derivations of q_span_resource: server spans = method+route, rpc tools
    # = method [+service], db tools = query text, fallthrough = span name
    sql["span_resource"] = rf"""
        WITH base AS (
          SELECT conv_id, turn_idx,
                 {SQL_EVENT_TYPE} AS et,
                 {_TN} AS tn,
                 regexp_extract(text, 'cmd="([^"]*)"', 1) AS cmd,
                 CASE WHEN {SQL_IS_ACCESS} THEN
                        NULLIF(regexp_extract(text,
                          '^\S+ - \S+ \[[^\]]+\] "(\S+) (\S+) [^"]*"', 1), '')
                      WHEN {SQL_IS_JSON} THEN
                        NULLIF(regexp_extract(json_extract_string(text, '$.request'),
                          '^(\S+) (\S+) ', 1), '') END AS method,
                 CASE WHEN {SQL_IS_ACCESS} THEN
                        NULLIF(regexp_extract(text,
                          '^\S+ - \S+ \[[^\]]+\] "(\S+) (\S+) [^"]*"', 2), '')
                      WHEN {SQL_IS_JSON} THEN
                        NULLIF(regexp_extract(json_extract_string(text, '$.request'),
                          '^(\S+) (\S+) ', 2), '') END AS route,
                 {SQL_STATUS} AS status
          FROM {T})
        SELECT conv_id, turn_idx,
          CASE
            WHEN method IS NOT NULL THEN method || ' ' || route
            WHEN et = 'tool_call' AND tn = 'bash' THEN tn
            WHEN et = 'tool_call' AND tn = 'browser' THEN tn || ' s3'
            WHEN et = 'tool_call' AND tn IN ('python', 'search') THEN cmd
            ELSE et END AS resource_name,
          CASE WHEN et = 'tool_call' THEN 'tool-' || tn
               ELSE 'otlpresourcenoservicename' END AS service,
          CASE WHEN et = 'nginx_access' THEN 'production'
               WHEN et = 'json' THEN 'staging' ELSE '' END AS env,
          CAST(status AS BIGINT) AS status_code
        FROM base"""
    # mirrors error_tagging's msg cascade over the fixture derivations
    sql["error_tags"] = rf"""
        WITH base AS (
          SELECT conv_id, turn_idx, {SQL_EVENT_TYPE} AS et,
                 regexp_extract(text, '^ERROR code=(\w+)', 1) AS ecode,
                 regexp_extract(text, 'msg="([^"]*)"', 1) AS emsg,
                 regexp_extract(text, 'retryable=(true|false)$', 1) = 'true' AS retry,
                 {SQL_STATUS} AS status
          FROM {T})
        SELECT conv_id, turn_idx, CAST(1 AS INTEGER) AS error,
          CASE WHEN et = 'error' AND retry THEN emsg
               WHEN et = 'error' THEN 'code=' || ecode
               WHEN status = 500 THEN '500 Internal Server Error'
               ELSE CAST(status AS VARCHAR) END AS error_msg,
          CASE WHEN et = 'error' AND retry THEN ecode END AS error_type,
          CAST(NULL AS VARCHAR) AS error_stack
        FROM base WHERE et = 'error' OR status >= 500"""
    # per-branch mirror of span_meta_tags over the constructed 6-entry map
    sql["span_meta"] = f"""
        WITH base AS (
          SELECT conv_id, turn_idx, {SQL_EVENT_TYPE} AS et, role,
                 coalesce(CAST({SQL_STATUS} AS VARCHAR), '') AS st,
                 coalesce(CASE WHEN {SQL_IS_ACCESS}
                               THEN regexp_extract(text, '"([^"]*)"$', 1) END, '') AS ua
          FROM {T})
        SELECT conv_id, turn_idx, 'meta' AS target,
               CASE WHEN st != '' THEN 'http.status_code'
                    ELSE 'http.response.status_code' END AS tag_key,
               st AS tag_value
        FROM base
        UNION ALL
        SELECT conv_id, turn_idx, 'meta', 'http.request.headers.x-trace', conv_id
        FROM base
        UNION ALL
        SELECT conv_id, turn_idx, 'metrics', '_dd1.sr.eausr',
               CASE WHEN et = 'tool_call' THEN '1.0' ELSE '0.0' END
        FROM base WHERE et != 'error'
        UNION ALL
        SELECT conv_id, turn_idx, 'meta', 'custom.key', role FROM base
        UNION ALL
        SELECT conv_id, turn_idx, 'meta',
               CASE WHEN ua != '' THEN 'http.useragent'
                    ELSE 'user_agent.original' END,
               ua
        FROM base"""
    # the 3 surviving tags per row of the constructed 6-entry attr map
    sql["container_tags"] = f"""
        SELECT conv_id, turn_idx, 'container_id' AS tag_key, conv_id AS tag_value
        FROM {T}
        UNION ALL
        SELECT conv_id, turn_idx, 'region', 'eu-' || CAST(turn_idx % 3 AS VARCHAR)
        FROM {T}
        UNION ALL
        SELECT conv_id, turn_idx, 'team', role FROM {T}"""
    # mirrors the parsed-back X-Ray segment documents structurally
    sql["xray_segments"] = rf"""
        SELECT conv_id, turn_idx,
          '1-' || lower(lpad(hex(CAST(epoch_us(ts) // 1000000 AS BIGINT)), 8, '0'))
              || '-' || substr(md5(conv_id), 1, 24) AS trace_id,
          substr(md5(conv_id || ':' || turn_idx), 1, 16) AS seg_id,
          CASE WHEN turn_idx > 0
               THEN substr(md5(conv_id || ':' || (turn_idx - 1)), 1, 16)
          END AS parent_id,
          CASE WHEN turn_idx > 0 THEN 'subsegment' ELSE 'segment' END AS seg_type,
          'nginx' AS name,
          CAST(epoch_us(ts) AS DOUBLE) / 1e6 AS start_time,
          regexp_extract(text, '^\S+ - \S+ \[[^\]]+\] "(\S+) (\S+) [^"]*"', 1) AS method,
          regexp_extract(text, '^\S+ - \S+ \[[^\]]+\] "(\S+) (\S+) [^"]*"', 2) AS url,
          regexp_extract(text, '" (\d+) \d+ "', 1) AS status,
          regexp_extract(text, '" (\d+) \d+ "', 1) LIKE '4%'
            AND regexp_extract(text, '" (\d+) \d+ "', 1) != '429' AS error,
          regexp_extract(text, '" (\d+) \d+ "', 1) LIKE '5%' AS fault,
          regexp_extract(text, '" (\d+) \d+ "', 1) = '429' AS throttle,
          conv_id || ':' || turn_idx AS request_id,
          'production' AS environment
        FROM {T} WHERE {SQL_IS_ACCESS}"""
    # mirrors source_cascade over q_dd_source's per-event-type attr
    # derivations, including the localhost discard (source.rs:64-73)
    sql["dd_source"] = rf"""
        WITH base AS (
          SELECT conv_id, turn_idx, {SQL_EVENT_TYPE} AS et, {_TN} AS tn,
                 TRY_CAST(regexp_extract(text, '^(\d+),', 1) AS INTEGER) AS km_prio,
                 TRY_CAST(regexp_extract(text, '^\d+,(\d+),', 1) AS BIGINT) AS km_seq,
                 regexp_extract(text, '^(\S+) ', 1) AS remote_addr,
                 CASE WHEN {SQL_IS_JSON}
                      THEN json_extract_string(text, '$.status') END AS jstatus,
                 regexp_extract(text, '^ERROR code=(\w+)', 1) AS ecode,
                 regexp_extract(text, '\[(\w+)\]', 1) AS nglevel
          FROM {T}),
        derived AS (
          SELECT conv_id, turn_idx,
                 CASE WHEN et = 'kmsg' AND km_seq % 2 = 0
                      THEN 'arn:ecs:' || conv_id END AS arn,
                 CASE WHEN et = 'kmsg' AND km_seq % 2 = 1
                        THEN 'ddh-' || CAST(km_prio // 8 AS VARCHAR)
                      WHEN et = 'nginx_access' THEN remote_addr
                      WHEN et = 'json'
                        THEN 'node-' || jstatus || '-c' || CAST(turn_idx % 2 AS VARCHAR)
                      WHEN et = 'tool_call' THEN 'i-' || tn
                      WHEN et = 'error' THEN 'vm-' || ecode
                      WHEN et = 'nginx_error' THEN 'ng-' || nglevel END AS hn0
          FROM base)
        SELECT conv_id, turn_idx,
          CASE WHEN arn IS NOT NULL THEN 'task_arn'
               WHEN hostname IS NOT NULL THEN 'host' END AS source_kind,
          COALESCE(arn, hostname) AS source_id
        FROM (SELECT conv_id, turn_idx, arn,
                     CASE WHEN hn0 IN ('0.0.0.0', '127.0.0.1', 'localhost',
                                       'localhost.localdomain',
                                       'localhost6.localdomain6', 'ip6-localhost')
                          THEN NULL ELSE hn0 END AS hostname
              FROM derived)"""
    # the five ClickHouse metric row shapes; array columns are canonical
    # int JSON strings on both sides (MapOrJson convention)
    _BYTES_ACC = r"""TRY_CAST(regexp_extract(text, '" (\d+) (\d+) "', 2) AS BIGINT)"""
    sql["ch_metrics_gauge"] = rf"""
        SELECT role AS service_name, 'body_bytes' AS metric_name,
               'By' AS metric_unit,
               '{{"remote_addr":"' || regexp_extract(text, '^(\S+) ', 1) || '"}}'
                 AS attributes,
               epoch_ns(ts) AS start_time_unix, epoch_ns(ts) AS time_unix,
               CAST({_BYTES_ACC} AS DOUBLE) AS value,
               CAST(0 AS INTEGER) AS flags
        FROM {T} WHERE {SQL_IS_ACCESS}"""
    sql["ch_metrics_sum"] = rf"""
        SELECT role AS service_name, 'tool_duration' AS metric_name,
               'ms' AS metric_unit,
               '{{"tool":"' || {_TN} || '"}}' AS attributes,
               epoch_ns(ts) AS start_time_unix, epoch_ns(ts) AS time_unix,
               CAST({SQL_DURATION} AS DOUBLE) AS value,
               CAST(0 AS INTEGER) AS flags,
               CAST(2 AS INTEGER) AS aggregation_temporality,
               true AS is_monotonic
        FROM {T} WHERE {SQL_IS_TOOL}"""
    sql["ch_metrics_histogram"] = f"""
        SELECT 'transcripts' AS service_name,
               'tool_duration_hist' AS metric_name, 'ms' AS metric_unit,
               '{{"conv_id":"' || conv_id || '"}}' AS attributes,
               min(epoch_ns(ts)) AS start_time_unix,
               max(epoch_ns(ts)) AS time_unix,
               count(*) AS count, CAST(sum(d) AS DOUBLE) AS sum,
               '[' || sum(CASE WHEN d <= 10 THEN 1 ELSE 0 END)
               || ',' || sum(CASE WHEN d > 10 AND d <= 100 THEN 1 ELSE 0 END)
               || ',' || sum(CASE WHEN d > 100 AND d <= 1000 THEN 1 ELSE 0 END)
               || ',' || sum(CASE WHEN d > 1000 THEN 1 ELSE 0 END) || ']'
                 AS bucket_counts,
               '[10,100,1000]' AS explicit_bounds,
               CAST(0 AS INTEGER) AS flags,
               CAST(min(d) AS DOUBLE) AS min, CAST(max(d) AS DOUBLE) AS max,
               CAST(2 AS INTEGER) AS aggregation_temporality
        FROM (SELECT conv_id, ts, {SQL_DURATION} AS d FROM {T} WHERE {SQL_IS_TOOL})
        GROUP BY conv_id"""
    sql["ch_metrics_exp_histogram"] = f"""
        WITH pts AS (
          SELECT conv_id, ts, b,
                 CASE WHEN b > 0 THEN length(bin(b)) - 1 END AS i
          FROM (SELECT conv_id, ts, {SQL_BYTES} AS b FROM {T})
          WHERE b IS NOT NULL),
        g AS (
          SELECT conv_id, min(epoch_ns(ts)) AS start_ns, max(epoch_ns(ts)) AS end_ns,
                 count(*) AS cnt, CAST(sum(b) AS DOUBLE) AS s,
                 CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zc,
                 min(i) AS off, max(i) AS mx,
                 list(i) FILTER (WHERE i IS NOT NULL) AS idxs,
                 CAST(min(b) AS DOUBLE) AS mn, CAST(max(b) AS DOUBLE) AS mxb
          FROM pts GROUP BY conv_id)
        SELECT 'transcripts' AS service_name, 'body_bytes_exp' AS metric_name,
               'By' AS metric_unit,
               '{{"conv_id":"' || conv_id || '"}}' AS attributes,
               start_ns AS start_time_unix, end_ns AS time_unix,
               cnt AS count, s AS sum, CAST(0 AS INTEGER) AS scale,
               zc AS zero_count,
               CAST(coalesce(off, 0) AS INTEGER) AS positive_offset,
               CASE WHEN off IS NULL THEN '[]'
                    ELSE '[' || array_to_string(
                      list_transform(range(off, mx + 1),
                                     k -> len(list_filter(idxs, x -> x = k))), ',')
                    || ']' END AS positive_bucket_counts,
               CAST(0 AS INTEGER) AS negative_offset,
               '[]' AS negative_bucket_counts,
               CAST(0 AS INTEGER) AS flags, mn AS min, mxb AS max,
               CAST(2 AS INTEGER) AS aggregation_temporality
        FROM g"""
    sql["ch_metrics_summary"] = f"""
        SELECT 'transcripts' AS service_name, 'status_summary' AS metric_name,
               '1' AS metric_unit,
               '{{"conv_id":"' || conv_id || '"}}' AS attributes,
               min(epoch_ns(ts)) AS start_time_unix,
               max(epoch_ns(ts)) AS time_unix,
               count(*) AS count, CAST(sum(st) AS DOUBLE) AS sum,
               '[0.5,0.95]' AS value_at_quantiles_quantile,
               '[' || quantile_disc(st, 0.5) || ',' || quantile_disc(st, 0.95)
               || ']' AS value_at_quantiles_value,
               CAST(0 AS INTEGER) AS flags
        FROM (SELECT conv_id, ts, CAST({SQL_STATUS} AS BIGINT) AS st FROM {T})
        WHERE st IS NOT NULL GROUP BY conv_id"""
    # sum/gauge/histogram/exp-histogram rows carry the five Exemplars.*
    # columns (schema.rs:177-200) — empty canonical-JSON arrays on
    # exemplar-less input, exactly what the reference serializes. Summary
    # rows do NOT (MetricsSummaryRow, schema.rs:364-380).
    from .stages.ch_metrics import EXEMPLAR_COLS as _ECOLS

    _exe = ", ".join(f"'[]' AS {c}" for c in _ECOLS)
    for _q in ("ch_metrics_gauge", "ch_metrics_sum", "ch_metrics_histogram",
               "ch_metrics_exp_histogram"):
        sql[_q] = f"SELECT *, {_exe} FROM ({sql[_q]})"
    # unigram-LM scoring: per-token log-probs are integer micro-nats
    # (floor(ln(c/total)*1e6)) so per-doc sums are exact int64 in any
    # summation order; ln agrees bit-wise between numpy and DuckDB here
    # (same libm double path), and floor absorbs any last-ulp drift
    # vocab capped to the top-2^16 tokens by (count desc, tok asc) exactly
    # like the engine's distributed top_v_counts selection; capped-out
    # tokens score as OOV = floor(ln(1/total)*1e6)
    from .stages.textstats import DEFAULT_TOP_V as _TOPV
    sql["unigram_logprob"] = rf"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(text, '\s+'), x -> x != '')) AS tok
          FROM documents),
        cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT count(*) AS n FROM toks),
        lp AS (SELECT tok,
                      CAST(floor(ln(CAST(c AS DOUBLE) / (SELECT n FROM tot))
                                 * 1000000) AS BIGINT) AS l
               FROM cnt
               QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= {_TOPV}),
        oov AS (SELECT CAST(floor(ln(1.0 / (SELECT n FROM tot))
                                  * 1000000) AS BIGINT) AS l)
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(COALESCE(lp.l, (SELECT l FROM oov))) AS BIGINT)
                 AS lp_sum_unat
        FROM toks LEFT JOIN lp USING (tok)
        GROUP BY doc_id"""
    # sequence packing: pure integer window arithmetic — the engine's
    # distributed prefix-sum must equal the single-window global cumsum
    sql["seq_pack"] = r"""
        WITH tok AS (
          SELECT doc_id, CAST(length(list_filter(
            regexp_split_to_array(text, '\s+'), x -> x != '')) AS BIGINT)
            AS n_tokens
          FROM documents),
        pos AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tok_start
          FROM tok)
        SELECT doc_id, n_tokens, tok_start,
               CASE WHEN n_tokens > 0 THEN tok_start // 512 END AS seq_first,
               CASE WHEN n_tokens > 0
                    THEN (tok_start + n_tokens - 1) // 512 END AS seq_last,
               CAST(CASE WHEN n_tokens > 0
                    THEN (tok_start + n_tokens - 1) // 512
                         - tok_start // 512 + 1
                    ELSE 0 END AS BIGINT) AS n_seqs
        FROM pos"""
    # tf-idf top-k: integer micro-nat idf (floor(ln(N/df)*1e6)) makes
    # score = tf * idf exact int64; tie-break = term ascending on both
    # sides; vocab capped to the top-2^16 terms by (df desc, tok asc) —
    # sklearn max_features semantics, mirroring the engine's distributed
    # top_v_counts selection (out-of-vocab terms are not scored)
    sql["tfidf_topk"] = rf"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(text, '\s+'), x -> x != '')) AS tok
          FROM documents),
        tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
               FROM toks GROUP BY doc_id, tok),
        df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
               QUALIFY row_number() OVER (ORDER BY count(DISTINCT doc_id) DESC,
                                          tok) <= {_TOPV}),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        idf AS (SELECT tok, CAST(floor(ln((SELECT n FROM n) / df) * 1000000)
                                 AS BIGINT) AS idf FROM df)
        SELECT doc_id, tok, tf, tf * idf AS score
        FROM tf JOIN idf USING (tok)
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tf * idf DESC, tok) <= 5"""
    # duplicate k-grams: literal gram strings stand in for the rolling-poly
    # hashes (same deterministic-collision caveat as decontaminate); short
    # docs fall back to their RAW token stream (multiplicity kept — it feeds
    # the corpus count), matching _batch_shingle_stream
    sql["dup_ngrams"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 8 THEN
                   list_transform(range(1, len(tk) - 6),
                                  i -> array_to_string(tk[i:i+7], ' '))
                 ELSE tk END AS gs
          FROM toks),
        pos AS (SELECT doc_id, unnest(gs) AS g FROM grams),
        cnt AS (SELECT g, count(*) AS c FROM pos GROUP BY g)
        SELECT doc_id, count(*) AS n_grams,
               CAST(COALESCE(sum(CASE WHEN c >= 2 THEN 1 END), 0) AS BIGINT)
                 AS n_dup
        FROM pos JOIN cnt USING (g)
        GROUP BY doc_id"""
    # benchmark decontamination: literal k-gram strings stand in for the
    # engine's rolling-poly hashes (same gram set; 64-bit collisions are the
    # only divergence and are deterministic-negligible), same <k-token
    # distinct-token fallback as the minhash shingle stream
    sql["decontaminate"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 8 THEN
                   list_distinct(list_transform(range(1, len(tk) - 6),
                                 i -> array_to_string(tk[i:i+7], ' ')))
                 ELSE list_distinct(tk) END AS gs
          FROM toks),
        ev AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 19 = 0),
        tr AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 19 <> 0)
        SELECT tr.doc_id, count(*) AS n_overlap
        FROM tr JOIN ev ON tr.g = ev.g
        GROUP BY tr.doc_id"""
    # contamination fraction per EVAL doc: same gram CTEs, reversed join
    # direction; ppm = integer floor division (nonnegative on both sides)
    sql["contamination_overlap"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 8 THEN
                   list_distinct(list_transform(range(1, len(tk) - 6),
                                 i -> array_to_string(tk[i:i+7], ' ')))
                 ELSE list_distinct(tk) END AS gs
          FROM toks),
        evp AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 19 = 0),
        trg AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 19 <> 0),
        agg AS (
          SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_hit
          FROM evp e LEFT JOIN trg t ON e.g = t.g
          GROUP BY e.doc_id)
        SELECT doc_id, n_grams, n_hit,
               CAST(n_hit * 1000000 // n_grams AS BIGINT) AS overlap_ppm
        FROM agg"""
    # Bloom-filter decontamination: bit positions = md5 double hashing of
    # the literal gram text ((h1 + j*h2) mod 2^20 with h1/h2 the first two
    # 48-bit md5 halves — stages/dedup.decontaminate_bloom), so the filter
    # AND its false positives reproduce bit-for-bit in SQL
    _MD5H = ("CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), "
             "list_transform(string_split(substr(md5(g), {off}, 12), ''), "
             "c -> CAST(ascii(c) - CASE WHEN ascii(c) >= 97 THEN 87 ELSE 48 "
             "END AS HUGEINT))), (h, d) -> h * 16 + d) AS BIGINT)")
    _BH1, _BH2 = _MD5H.format(off=1), _MD5H.format(off=13)
    _BM = 1 << 20
    sql["decontaminate_bloom"] = rf"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 8 THEN
                   list_distinct(list_transform(range(1, len(tk) - 6),
                                 i -> array_to_string(tk[i:i+7], ' ')))
                 ELSE list_distinct(tk) END AS gs
          FROM toks),
        ev AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 19 = 0),
        evp AS (SELECT DISTINCT ({_BH1} + j.j * {_BH2}) % {_BM} AS p
                FROM ev, unnest([0, 1, 2]) AS j(j)),
        tr AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 19 <> 0),
        trh AS (SELECT doc_id, {_BH1} AS h1, {_BH2} AS h2 FROM tr)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_hits
        FROM trh
        WHERE (h1          ) % {_BM} IN (SELECT p FROM evp)
          AND (h1 +     h2 ) % {_BM} IN (SELECT p FROM evp)
          AND (h1 + 2 * h2 ) % {_BM} IN (SELECT p FROM evp)
        GROUP BY doc_id"""
    # pagerank: chained-CTE bit-exact replay of the integer power iteration
    # (all values positive -> // is floor in both engines). r0/BASE literals
    # computed from the same n the engine uses.
    from .stages.graph import PR_SCALE as _PRS
    from .stages.graph import link_graph_path as _lgp

    _gdir = _lgp(sf_dir)
    _n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    _r0 = _PRS // _n_docs
    _prbase = (15 * _r0) // 100
    _iter_cte = """
        c{t} AS (
          SELECT e.dst AS v, sum(r{p}.r // e.d) AS s
          FROM ed e JOIN r{p} ON e.src = r{p}.v GROUP BY e.dst),
        r{t} AS (
          SELECT n.v, CAST({base} + 85 * COALESCE(c{t}.s, 0) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN c{t} ON n.v = c{t}.v)"""
    _pr_ctes = (
        f"""nodes AS (SELECT doc_id AS v FROM documents),
        edges AS (SELECT src, dst FROM read_parquet('{_gdir}/*.parquet')),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        ed AS (SELECT e.src, e.dst, deg.d FROM edges e JOIN deg USING (src)),
        r0 AS (SELECT v, CAST({_r0} AS BIGINT) AS r FROM nodes),"""
        + ",".join(_iter_cte.format(t=t, p=t - 1, base=_prbase)
                   for t in (1, 2, 3)))
    sql["pagerank"] = (
        "WITH " + _pr_ctes
        + """
        SELECT v AS node_id, r AS pagerank_int FROM r3""")
    # rank_curation: pagerank CTEs + quantile_disc median + the gopher keep
    # flag over the SAME reflowed docs the gopher_rules query reads
    from .stages.filterrules import gopher_rules_oracle_sql as _go
    from .stages.filterrules import lines_docs_path as _ldp

    sql["rank_curation"] = (
        "WITH " + _pr_ctes
        + f""",
        ranks AS (SELECT v AS node_id, r AS pagerank_int FROM r3),
        med AS (SELECT quantile_disc(pagerank_int, 0.5) AS m FROM ranks),
        keeps AS (SELECT doc_id FROM ({_go(_ldp(sf_dir))}) WHERE keep)
        SELECT r.node_id AS doc_id, r.pagerank_int
        FROM ranks r
        JOIN keeps k ON k.doc_id = r.node_id
        CROSS JOIN med
        WHERE r.pagerank_int >= med.m""")
    sql["typo_pairs"] = f"""
        WITH t AS (
          SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x != '')) AS g
          FROM {_trans_sql_rel(sf_dir)}),
        d AS (SELECT DISTINCT g FROM t
              WHERE regexp_matches(g, '^[A-Za-z]{{3,}}$'))
        SELECT a.g AS tok_a, b.g AS tok_b,
               CAST(levenshtein(a.g, b.g) AS BIGINT) AS dist
        FROM d a JOIN d b ON a.g < b.g AND levenshtein(a.g, b.g) <= 2"""
    sql["state_dwell"] = """
        WITH x AS (
          SELECT event_type, epoch_us(ts) AS us,
                 lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
          FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(nxt - us) AS BIGINT) AS sum_dwell_us,
               CAST(sum(nxt - us) // count(*) AS BIGINT) AS mean_dwell_us
        FROM x WHERE nxt IS NOT NULL GROUP BY event_type"""
    sql["event_cooccurrence"] = """
        WITH d AS (
          SELECT DISTINCT epoch_us(ts) // 60000000 AS m, event_type
          FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_minutes
        FROM d a JOIN d b ON a.m = b.m AND a.event_type < b.event_type
        GROUP BY 1, 2"""
    sql["skew_report"] = """
        WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        s AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM c),
        t AS (SELECT count(*) AS n, sum(c) AS tot, sum(i * c) AS s1,
                     max(c) AS mx
              FROM s)
        SELECT CAST(n AS BIGINT) AS n_keys, CAST(tot AS BIGINT) AS n_rows,
               CAST(mx AS BIGINT) AS max_count,
               CAST((1000000 * (2 * s1 - (n + 1) * tot)) // (n * tot)
                    AS BIGINT) AS gini_e6
        FROM t"""
    sql["session_paths"] = """
        WITH s AS (
          SELECT user_id, ts, event_type, event_id,
                 CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_idx
          FROM (SELECT user_id, ts, event_type, event_id,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events)),
        r AS (
          SELECT user_id, session_idx, event_type,
                 row_number() OVER (PARTITION BY user_id, session_idx
                                    ORDER BY ts, event_id) AS rn
          FROM s),
        p AS (
          SELECT user_id, session_idx,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 3 GROUP BY 1, 2)
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        FROM p GROUP BY path"""
    sql["graph_degrees"] = f"""
        WITH nodes AS (SELECT doc_id AS v FROM documents),
        edges AS (SELECT src, dst FROM read_parquet('{_gdir}/*.parquet')),
        o AS (SELECT n.v, COALESCE(c.d, 0) AS deg FROM nodes n
              LEFT JOIN (SELECT src, count(*) AS d FROM edges GROUP BY src) c
              ON n.v = c.src),
        i AS (SELECT n.v, COALESCE(c.d, 0) AS deg FROM nodes n
              LEFT JOIN (SELECT dst, count(*) AS d FROM edges GROUP BY dst) c
              ON n.v = c.dst)
        SELECT 'out' AS direction, CAST(deg AS BIGINT) AS degree,
               CAST(count(*) AS BIGINT) AS n_nodes FROM o GROUP BY deg
        UNION ALL
        SELECT 'in', CAST(deg AS BIGINT), CAST(count(*) AS BIGINT)
        FROM i GROUP BY deg"""
    _lp_round = """
        c{t} AS (
          SELECT he.v, l.lab, count(*) AS c
          FROM he JOIN l{p} l ON he.nbr = l.v GROUP BY 1, 2),
        n{t} AS (
          SELECT v, lab FROM c{t} WHERE v NOT IN (SELECT v FROM l{p})
          QUALIFY row_number() OVER (PARTITION BY v
                                     ORDER BY c DESC, lab) = 1),
        l{t} AS (SELECT v, lab FROM l{p}
                 UNION ALL SELECT v, lab FROM n{t})"""
    sql["label_propagation"] = (
        f"""
        WITH e AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM read_parquet('{_gdir}/*.parquet') WHERE src <> dst),
        he AS (SELECT a AS v, b AS nbr FROM e
               UNION ALL SELECT b AS v, a AS nbr FROM e),
        l0 AS (SELECT doc_id AS v, lang AS lab FROM documents
               WHERE doc_id % 5 = 0),"""
        + ",".join(_lp_round.format(t=t, p=t - 1) for t in (1, 2))
        + """
        SELECT v AS node_id, lab AS label FROM l2""")
    sql["triangle_count"] = f"""
        WITH e AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM read_parquet('{_gdir}/*.parquet') WHERE src <> dst),
        deg AS (
          SELECT v, count(*) AS k
          FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
          GROUP BY v),
        w AS (SELECT CAST(sum(k * (k - 1) // 2) AS BIGINT) AS n_wedges
              FROM deg),
        tri AS (
          SELECT count(*) AS t FROM e e1
          JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
               w.n_wedges, CAST(tri.t AS BIGINT) AS n_triangles
        FROM w, tri"""
    # cms_counts: replay the sketch bit-exactly — counters from EXACT global
    # token counts (mathematically identical to the engine's per-batch
    # partial accumulation: positions depend only on the token), same md5
    # double-hash family as decontaminate_bloom. Width 256, depth 4,
    # probe = top-64 by (count desc, token asc).
    sql["cms_counts"] = rf"""
        WITH toks AS (
          SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                    x -> x != '')) AS g
          FROM documents),
        cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY g),
        hs AS (SELECT g, c, {_BH1} AS h1, {_BH2} AS h2 FROM cnt),
        pos AS (SELECT r.r AS r, (h1 + r.r * h2) % 256 AS p, c
                FROM hs, unnest([0, 1, 2, 3]) AS r(r)),
        counters AS (SELECT r, p, sum(c) AS v FROM pos GROUP BY r, p),
        probe AS (SELECT g, c, h1, h2 FROM hs
                  QUALIFY row_number() OVER (ORDER BY c DESC, g) <= 64),
        pe AS (SELECT probe.g, probe.c, r.r AS r, (h1 + r.r * h2) % 256 AS p
               FROM probe, unnest([0, 1, 2, 3]) AS r(r)),
        est AS (SELECT g, c, min(v) AS e FROM pe
                JOIN counters USING (r, p) GROUP BY g, c)
        SELECT g AS token, CAST(e AS BIGINT) AS cms_estimate,
               c AS true_count, CAST(e - c AS BIGINT) AS overestimate
        FROM est"""
    sql["vocab_growth"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                    x -> x != '')) AS tok
          FROM documents),
        firsts AS (SELECT tok, min(doc_id) AS fd FROM toks GROUP BY tok),
        n AS (SELECT count(*) AS c FROM documents),
        ps AS (SELECT DISTINCT least(CAST(pow(2, j.j) AS BIGINT), c) AS p
               FROM n, unnest(range(0, 1 + CAST(ceil(log2(c)) AS BIGINT)))
                 AS j(j))
        SELECT ps.p AS prefix_docs, CAST(count(firsts.tok) AS BIGINT)
          AS vocab_size
        FROM ps LEFT JOIN firsts ON firsts.fd < ps.p
        GROUP BY ps.p"""
    sql["per_source_cap"] = f"""
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY md5(text), doc_id) - 1 AS BIGINT) AS rank
        FROM documents
        QUALIFY rank < {PER_SOURCE_CAP}"""
    # distinct-n diversity: literal gram strings stand in for the engine's
    # rolling-poly hashes (same deterministic-collision caveat as
    # dup_ngrams); docs shorter than n contribute nothing
    sql["ngram_diversity"] = r"""
        WITH toks AS (
          SELECT list_filter(regexp_split_to_array(text, '\s+'),
                             x -> x != '') AS tk
          FROM documents),
        g AS (
          SELECT 1 AS n, unnest(tk) AS gram FROM toks
          UNION ALL
          SELECT 2, array_to_string(tk[u.i:u.i+1], ' ')
          FROM toks, unnest(range(1, len(tk))) AS u(i) WHERE len(tk) >= 2
          UNION ALL
          SELECT 3, array_to_string(tk[u.i:u.i+2], ' ')
          FROM toks, unnest(range(1, len(tk) - 1)) AS u(i) WHERE len(tk) >= 3)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams,
               CAST(count(*) AS BIGINT) AS total_grams,
               CAST(count(DISTINCT gram) AS DOUBLE) / count(*) AS diversity
        FROM g GROUP BY n"""
    sql["conv_quality"] = f"""
        WITH t AS (
          SELECT conv_id, turn_idx, role, length(text) AS ch FROM {T}),
        l AS (
          SELECT conv_id, role, ch,
                 lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS prev_role
          FROM t)
        SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
               CAST(sum(ch) AS BIGINT) AS sum_chars,
               CAST(COALESCE(sum(CASE WHEN role = prev_role THEN 1 END), 0)
                 AS BIGINT) AS n_same_role_adjacent
        FROM l GROUP BY conv_id"""
    # group-keyed split: md5 last-2-hex-digit band, mirrored with the
    # usual ascii hex parse (md5 is lowercase on both engines)
    _sh1 = ("(ascii(substr(md5(conv_id), 31, 1)) - CASE WHEN "
            "ascii(substr(md5(conv_id), 31, 1)) >= 97 THEN 87 ELSE 48 END)")
    _sh2 = ("(ascii(substr(md5(conv_id), 32, 1)) - CASE WHEN "
            "ascii(substr(md5(conv_id), 32, 1)) >= 97 THEN 87 ELSE 48 END)")
    sql["conv_split"] = f"""
        SELECT conv_id, turn_idx,
               CASE WHEN (16 * {_sh1} + {_sh2}) % 100 < 90 THEN 'train'
                    WHEN (16 * {_sh1} + {_sh2}) % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM {T}"""
    # byte entropy: per-(doc, char) exact-int micro-nat terms (same
    # floor(ln)*1e6 bit-agreement as the unigram scorer; byte == char on
    # this ASCII corpus)
    sql["char_entropy"] = r"""
        WITH ch AS (
          SELECT doc_id, length(text) AS n,
                 unnest(string_split(text, '')) AS c
          FROM documents WHERE length(text) > 0),
        cc AS (SELECT doc_id, max(n) AS n, c, count(*) AS cb
               FROM ch GROUP BY doc_id, c)
        SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
               CAST(sum(cb * floor(ln(CAST(n AS DOUBLE) / cb) * 1e6))
                 AS BIGINT) AS ent_unat
        FROM cc GROUP BY doc_id"""
    # compaction planning: DuckDB's parquet_metadata exposes the same
    # per-column-chunk total_compressed_size the engine sums from footers
    from .generator import transcripts_path as _tp

    _tdir = _tp(_sfd(sf_dir))
    sql["compaction_plan"] = f"""
        WITH f AS (
          SELECT file_name,
                 CAST(sum(total_compressed_size) AS BIGINT) AS n_bytes
          FROM parquet_metadata('{_tdir}/*.parquet') GROUP BY file_name),
        c AS (
          SELECT regexp_extract(file_name, '[^/]+$') AS file, n_bytes,
                 CAST(COALESCE(sum(n_bytes) OVER (ORDER BY file_name
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS prev
          FROM f)
        SELECT file, n_bytes, prev // {COMPACT_TARGET_BYTES} AS group_id
        FROM c"""
    # turn-aligned example packing: exact-integer window cumsum (HUGEINT
    # window sums CAST back to BIGINT — the pandas-float trap)
    sql["conv_examples"] = rf"""
        WITH t AS (
          SELECT conv_id, turn_idx,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens
          FROM {T}),
        c AS (
          SELECT conv_id, turn_idx, n_tokens,
                 CAST(COALESCE(sum(n_tokens) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS prev
          FROM t)
        SELECT conv_id, turn_idx, n_tokens,
               prev // {CONV_EXAMPLE_BUDGET} AS example_id
        FROM c"""
    # pad-to-max batching bins: bit_length via length(bin(n)) (exact
    # integer, no float log2)
    sql["length_buckets"] = r"""
        WITH t AS (
          SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
          FROM documents),
        b AS (SELECT n, CAST(CASE WHEN n = 0 THEN 0
                             ELSE length(bin(n)) END AS BIGINT) AS k FROM t)
        SELECT k AS len_bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS token_sum,
               CAST(max(n) AS BIGINT) AS max_len,
               CAST(count(*) * max(n) - sum(n) AS BIGINT) AS pad_waste
        FROM b GROUP BY k"""
    # unicode normalization over the dirtied fixture: identical RE2
    # patterns on both engines; DuckDB nfc_normalize mirrors stdlib
    # unicodedata.normalize("NFC", ...)
    # scan_prune_plan: pure fixture path + a source-footer row count (the
    # documented oracle-side allowance); q_scan_prune_plan builds first
    from .stages.compact import zonemap_events_path as _zep

    _zdir = _zep(sf_dir)
    _zhalf = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows // 2
    sql["scan_prune_plan"] = f"""
        SELECT regexp_extract(file_name, '[^/]+$') AS file,
               CAST(row_group_id AS BIGINT) AS row_group_id,
               CAST(row_group_num_rows AS BIGINT) AS n_rows,
               CAST(stats_min_value AS BIGINT) AS rg_min,
               CAST(stats_max_value AS BIGINT) AS rg_max,
               CAST(stats_max_value AS BIGINT) < {_zhalf} AS skip
        FROM parquet_metadata('{_zdir}/*.parquet')
        WHERE path_in_schema = 'event_id'"""
    from .stages.window import LATE_DELAY_US as _LDU
    from .stages.window import ooo_events_path as _oep

    _ooodir = _oep(sf_dir)
    sql["session_conversion"] = """
        WITH o AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts, event_type,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM o),
        g AS (
          SELECT user_id, sid,
                 min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c1,
                 max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p1
          FROM s GROUP BY 1, 2)
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(count(c1) AS BIGINT) AS n_with_click,
               CAST(count(*) FILTER (WHERE c1 IS NOT NULL AND p1 > c1)
                    AS BIGINT) AS n_converted
        FROM g"""
    sql["source_lang_rollup"] = """
        SELECT COALESCE(source, '*') AS source, COALESCE(lang, '*') AS lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP (source, lang)"""
    sql["quantile_sketch"] = """
        WITH v AS (
          SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        mm AS (SELECT min(c) AS lo, max(c) AS hi,
                      CAST(count(*) AS BIGINT) AS n FROM v),
        b AS (SELECT ((c - lo) * 4096) // (hi - lo + 1) AS bk FROM v, mm),
        g AS (SELECT bk, count(*) AS cnt FROM b GROUP BY bk),
        cum AS (SELECT bk, sum(cnt) OVER (ORDER BY bk) AS cs FROM g),
        qs AS (SELECT unnest([500, 900, 990]) AS perm)
        SELECT CAST(perm AS BIGINT) AS perm,
               CAST(min(bk) AS BIGINT) AS bucket,
               CAST(lo + min(bk) * (hi - lo + 1) // 4096 AS BIGINT)
                 AS est_lo_cents,
               CAST((perm * (n - 1)) // 1000 AS BIGINT) AS rank
        FROM qs, cum, mm
        WHERE cs >= (perm * (n - 1)) // 1000 + 1
        GROUP BY perm, lo, hi, n"""
    sql["late_events"] = f"""
        WITH x AS (
          SELECT event_type, arrival_seq, epoch_us(ts) AS us
          FROM read_parquet('{_ooodir}/*.parquet')),
        w AS (
          SELECT event_type, us,
                 max(us) OVER (ORDER BY arrival_seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
          FROM x)
        SELECT event_type,
               (pm IS NOT NULL AND us < pm - {_LDU}) AS late,
               CAST(count(*) AS BIGINT) AS n_events
        FROM w GROUP BY 1, 2"""
    sql["tool_pairs"] = f"""
        WITH d AS (
          SELECT DISTINCT conv_id, tool FROM {T}
          WHERE tool IS NOT NULL AND tool <> ''),
        p AS (
          SELECT a.tool AS tool_a, b.tool AS tool_b
          FROM d a JOIN d b ON a.conv_id = b.conv_id AND a.tool < b.tool)
        SELECT tool_a, tool_b, CAST(count(*) AS BIGINT) AS n_groups
        FROM p GROUP BY 1, 2"""
    sql["subnet_rollup"] = f"""
        WITH a AS (
          SELECT regexp_extract(text, '^(\\d+\\.\\d+\\.\\d+)\\.', 1) AS subnet,
                 regexp_extract(text, '^\\S+ - (\\S+) ', 1) AS remote_user,
                 CAST(regexp_extract(text, '" (\\d+) (\\d+) "', 2) AS BIGINT) AS bytes
          FROM {T} WHERE ({SQL_EVENT_TYPE}) = 'nginx_access'),
        u AS (
          SELECT subnet, remote_user, count(*) AS n, sum(bytes) AS b
          FROM a GROUP BY 1, 2)
        SELECT subnet, CAST(sum(n) AS BIGINT) AS n_requests,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(b) AS BIGINT) AS sum_bytes
        FROM u GROUP BY subnet"""
    sql["peak_concurrency"] = """
        WITH sess AS (
          SELECT user_id, session_idx, min(ts) AS start_ts, max(ts) AS end_ts
          FROM (
            SELECT user_id, ts,
                   CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) - 1 AS session_idx
            FROM (SELECT user_id, ts, event_id,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                  FROM events))
          GROUP BY 1, 2),
        pts AS (
          SELECT epoch_us(start_ts) AS us, 1 AS d FROM sess
          UNION ALL
          SELECT epoch_us(end_ts) AS us, -1 AS d FROM sess),
        run AS (
          SELECT us // 3600000000 AS hour_id, d,
                 sum(d) OVER (ORDER BY us, d DESC ROWS UNBOUNDED PRECEDING) AS c
          FROM pts)
        SELECT CAST(hour_id AS BIGINT) AS hour_id,
               CAST(max(c) AS BIGINT) AS peak_concurrency,
               CAST(count(*) AS BIGINT) AS n_boundaries
        FROM run GROUP BY hour_id"""
    from .sources.text_logs import multiline_logs_path as _mlp

    _mldir = _mlp(sf_dir)
    sql["multiline_stitch"] = f"""
        WITH l AS (
          SELECT line_no, text,
                 CASE WHEN text LIKE ' %' THEN 0 ELSE 1 END AS s
          FROM read_parquet('{_mldir}/*.parquet')),
        r AS (
          SELECT line_no, text,
                 sum(s) OVER (ORDER BY line_no
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rec
          FROM l)
        SELECT CAST(rec AS BIGINT) AS record_id,
               CAST(min(line_no) AS BIGINT) AS line_no,
               CAST(count(*) AS BIGINT) AS n_lines,
               string_agg(text, chr(10) ORDER BY line_no) AS record_text
        FROM r GROUP BY rec"""
    sql["turn_latency"] = f"""
        WITH t AS (
          SELECT conv_id, role, epoch_us(ts) AS us,
                 lag(role) OVER w AS role_from,
                 lag(epoch_us(ts)) OVER w AS prev_us
          FROM {_trans_sql_rel(sf_dir)}
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        SELECT role_from, role AS role_to, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(us - prev_us) AS BIGINT) AS sum_us,
               CAST(sum(us - prev_us) // count(*) AS BIGINT) AS mean_us
        FROM t WHERE role_from IS NOT NULL
        GROUP BY role_from, role"""
    # conv_dedup: the fixture path is pure (never builds); q_conv_dedup
    # ensures the build before any harness runs the SQL. md5 + chr(31)
    # joins mirror the engine's per-turn then per-conv hashing exactly.
    from .stages.dedup import dup_convs_path as _dcp

    _dupdir = _dcp(sf_dir)
    sql["conv_dedup"] = f"""
        WITH th AS (
          SELECT conv_id, turn_idx, md5(role || chr(31) || text) AS h
          FROM read_parquet('{_dupdir}/*.parquet')),
        ch AS (
          SELECT conv_id, md5(string_agg(h, '' ORDER BY turn_idx)) AS conv_hash
          FROM th GROUP BY conv_id)
        SELECT conv_hash, min(conv_id) AS conv_id,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM ch GROUP BY conv_hash"""
    from .stages.clean import ZAP_PATTERN as _ZAP
    from .stages.clean import unicode_docs_path as _udp

    _unidir = _udp(sf_dir)
    sql["text_normalize"] = f"""
        SELECT doc_id, text_norm, text_norm <> text AS changed
        FROM (
          SELECT doc_id, text,
                 trim(regexp_replace(regexp_replace(nfc_normalize(text),
                      '{_ZAP}', '', 'g'), '[ \t]+', ' ', 'g'), ' ')
                   AS text_norm
          FROM read_parquet('{_unidir}/*.parquet'))"""
    from .stages.filterrules import (
        c4_line_filter_oracle_sql,
        gopher_rules_oracle_sql,
        lines_docs_path as _ldp,
    )

    _linedir = _ldp(sf_dir)
    sql["gopher_rules"] = gopher_rules_oracle_sql(_linedir)
    sql["c4_line_filter"] = c4_line_filter_oracle_sql(_linedir)
    # Datadog minimal DDSpan conversion: hex md5 ids folded to BE u64 in
    # HUGEINT arithmetic (fits: 16 hex digits < 2^64), truncation mirrors
    # convert_trace_id/convert_span_id (transformer.rs:455-469)
    _H2U = ("CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), "
            "list_transform(string_split({h}, ''), c -> "
            "CAST(ascii(c) - CASE WHEN ascii(c) >= 97 THEN 87 ELSE 48 END "
            "AS HUGEINT))), (h, d) -> h * 16 + d) AS UBIGINT)")
    _ET = f"({SQL_EVENT_TYPE})"
    _EXIT = r"CAST(regexp_extract(text, 'exit=(\d+)', 1) AS INTEGER)"
    _KIND = (f"CASE WHEN {_ET} = 'tool_call' THEN 'client' "
             f"WHEN {_ET} IN ('nginx_access', 'json') THEN 'server' "
             f"WHEN {_ET} = 'chat' THEN 'unspecified' ELSE 'internal' END")
    sql["dd_span"] = rf"""
        SELECT conv_id, turn_idx,
               {_H2U.format(h="substr(md5(conv_id), 17, 16)")} AS trace_id_u64,
               {_H2U.format(h="substr(md5(conv_id || ':' || turn_idx), 1, 16)")}
                 AS span_id_u64,
               CASE WHEN turn_idx = 0 THEN 0 ELSE
                 {_H2U.format(h="substr(md5(conv_id || ':' || (turn_idx - 1)), 1, 16)")}
                 END AS parent_id_u64,
               ({_KIND}) AS span_kind,
               (turn_idx = 0 OR ({_KIND}) = 'server') AS top_level,
               (({_KIND}) = 'client') AS measured,
               CAST(({_ET}) = 'error' OR (({_ET}) = 'tool_call'
                    AND TRY_CAST(regexp_extract(text, 'exit=(\d+)', 1)
                                 AS INTEGER) <> 0) AS INTEGER) AS error,
               CAST({SQL_STATUS} AS DOUBLE) AS status_code,
               epoch_ns(ts) AS start,
               coalesce({SQL_DURATION} * 1000000, 0) AS duration,
               '{{' || concat_ws(',',
                 '"_sampling_priority_v1":' || CAST(turn_idx % 2 AS VARCHAR)
                   || '.0',
                 '"custom.load":' || CAST(turn_idx // 2 AS VARCHAR)
                   || CASE WHEN turn_idx % 2 = 0 THEN '.0' ELSE '.5' END,
                 '"duration_ms":' || CAST({SQL_DURATION} AS VARCHAR) || '.0',
                 CASE WHEN {SQL_IS_TOOL} THEN '"tool.exit":'
                   || regexp_extract(text, 'exit=(\d+)', 1) || '.0' END
               ) || '}}' AS metrics_json
        FROM {T}"""
    # ClickHouse logs/traces row tables (transform_logs.rs / transform_traces.rs)
    _EXIT = r"CAST(regexp_extract(text, 'exit=(\d+)', 1) AS INTEGER)"
    _CMD = r"""regexp_extract(text, 'cmd="([^"]*)"', 1)"""
    sql["ch_logs_row"] = rf"""
        SELECT epoch_ns(ts) AS timestamp,
               CASE WHEN {SQL_IS_TOOL} THEN md5(conv_id) ELSE '' END AS trace_id,
               CASE WHEN {SQL_IS_TOOL}
                    THEN substr(md5(conv_id || ':' || turn_idx), 1, 16)
                    ELSE '' END AS span_id,
               CAST(0 AS INTEGER) AS trace_flags,
               {SQL_SEV_TEXT} AS severity_text,
               {SQL_SEVERITY} AS severity_number,
               role AS service_name,
               text AS body,
               '' AS resource_schema_url,
               '{{"service.name":"' || role || '"}}' AS resource_attributes,
               '' AS scope_schema_url,
               'rotel_ray' AS scope_name, '0.2' AS scope_version,
               '{{}}' AS scope_attributes,
               CASE ({SQL_EVENT_TYPE})
                 WHEN 'tool_call' THEN '{{"tool.exit":"' || {_EXIT}
                   || '","tool.name":"' || {_TN} || '"}}'
                 WHEN 'error' THEN '{{"error.code":"'
                   || regexp_extract(text, 'code=(\w+)', 1)
                   || '","retryable":"'
                   || regexp_extract(text, 'retryable=(true|false)$', 1) || '"}}'
                 WHEN 'nginx_access' THEN '{{"http.status":"'
                   || regexp_extract(text, '" (\d+) (\d+) "', 1)
                   || '","remote.addr":"'
                   || regexp_extract(text, '^(\S+) ', 1) || '"}}'
                 WHEN 'kmsg' THEN '{{"kmsg.facility":"'
                   || (CAST(regexp_extract(text, '^(\d+),', 1) AS INTEGER) // 8)
                   || '","kmsg.priority":"'
                   || (CAST(regexp_extract(text, '^(\d+),', 1) AS INTEGER) % 8)
                   || '"}}'
                 ELSE '{{}}' END AS log_attributes,
               ({SQL_EVENT_TYPE}) AS event_name
        FROM {T}"""
    sql["ch_traces_row"] = rf"""
        SELECT epoch_ns(ts) AS timestamp,
               md5(conv_id) AS trace_id,
               substr(md5(conv_id || ':' || turn_idx), 1, 16) AS span_id,
               CASE WHEN turn_idx = 0 THEN ''
                    ELSE substr(md5(conv_id || ':' || (turn_idx - 1)), 1, 16)
                    END AS parent_span_id,
               '' AS trace_state,
               {_TN} AS span_name,
               'Client' AS span_kind,
               role AS service_name,
               '{{"service.name":"' || role || '"}}' AS resource_attributes,
               'rotel_ray' AS scope_name, '0.2' AS scope_version,
               '{{"tool.cmd":"' || {_CMD} || '","tool.name":"' || {_TN} || '"}}'
                 AS span_attributes,
               greatest(CAST(regexp_extract(text, 'duration_ms=(\d+)$', 1)
                             AS BIGINT) * 1000000, 0) AS duration,
               CASE WHEN {_EXIT} <> 0 THEN 'Error' ELSE 'Ok' END AS status_code,
               CASE WHEN {_EXIT} <> 0 THEN 'exit=' || {_EXIT} ELSE '' END
                 AS status_message,
               CASE WHEN {_EXIT} <> 0 THEN '[' || epoch_ns(ts) || ']'
                    ELSE '[]' END AS events_timestamp,
               CASE WHEN {_EXIT} <> 0 THEN '["exception"]' ELSE '[]' END
                 AS events_name,
               CASE WHEN {_EXIT} <> 0
                    THEN '[{{"exception.message":"exit=' || {_EXIT} || '"}}]'
                    ELSE '[]' END AS events_attributes,
               '[]' AS links_trace_id, '[]' AS links_span_id,
               '[]' AS links_trace_state, '[]' AS links_attributes
        FROM {T} WHERE {SQL_IS_TOOL}"""
    # OTLP/JSON spans: the parse-back projection must equal this direct
    # computation from the raw turns (ids/times/exit mirror span_ids,
    # ch_traces_row and dd_span fragments)
    _EXIT0 = r"CAST(regexp_extract(text, 'exit=(\d+)', 1) AS BIGINT)"
    sql["otlp_spans_json"] = rf"""
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
               role AS service,
               md5(conv_id) AS trace_id,
               substr(md5(conv_id || ':' || turn_idx), 1, 16) AS span_id,
               CASE WHEN turn_idx = 0 THEN ''
                    ELSE substr(md5(conv_id || ':' || (turn_idx - 1)), 1, 16)
               END AS parent_span_id,
               regexp_extract(text, 'tool=(\w+)', 1) AS name,
               CAST(3 AS BIGINT) AS kind,
               epoch_ns(ts) AS start_ns,
               epoch_ns(ts) + coalesce({SQL_DURATION}, 0) * 1000000 AS end_ns,
               {_EXIT0} AS tool_exit,
               CAST(CASE WHEN {_EXIT0} <> 0 THEN 2 ELSE 1 END AS BIGINT)
                 AS status_code
        FROM {T} WHERE {SQL_IS_TOOL}"""
    sql["otlp_logs_json"] = rf"""
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
               role AS service,
               epoch_ns(ts) AS time_ns,
               CAST({SQL_SEVERITY} AS BIGINT) AS severity_number,
               {SQL_SEV_TEXT} AS severity_text,
               text AS body,
               {SQL_EVENT_TYPE} AS event_type,
               CASE WHEN {SQL_IS_TOOL} THEN md5(conv_id) ELSE '' END
                 AS trace_id,
               CASE WHEN {SQL_IS_TOOL}
                    THEN substr(md5(conv_id || ':' || turn_idx), 1, 16)
                    ELSE '' END AS span_id
        FROM {T}"""
    sql["otlp_metrics_json"] = f"""
        SELECT 'rotel_ray' AS namespace, {SQL_EVENT_TYPE} AS name, role,
               epoch_ms(date_trunc('minute', ts)) * 1000000 AS time_ns,
               count(*) AS value_count,
               CAST(sum(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE)
                 AS value_sum,
               CAST(min(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE)
                 AS value_min,
               CAST(max(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE)
                 AS value_max
        FROM {T} GROUP BY 1, 2, 3, 4"""
    sql["metrics_emf_json"] = f"""
        SELECT 'svc/rotel' AS namespace, {SQL_EVENT_TYPE} AS name,
               role, 'role' AS dims,
               epoch_ms(date_trunc('minute', ts)) AS timestamp_ms,
               count(*) AS value_count,
               CAST(sum(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE) AS value_sum,
               CAST(min(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE) AS value_min,
               CAST(max(coalesce({SQL_DURATION}, {SQL_BYTES}, 0)) AS DOUBLE) AS value_max
        FROM {T} GROUP BY 1, 2, 3, 4, 5"""
    sql["xray_groups"] = rf"""
        WITH acc AS (
          SELECT conv_id, turn_idx,
                 regexp_extract(text, '^(\S+) ', 1) AS remote_addr,
                 regexp_extract(text, '"(\S+) [^"]*" \d+ \d+ ', 1) AS method,
                 regexp_extract(text, '" (\d+) (\d+) "', 1) AS status
          FROM {T} WHERE ({SQL_EVENT_TYPE}) = 'nginx_access')
        SELECT conv_id, turn_idx, 'request' AS block, 'method' AS attr_key,
               method AS attr_value FROM acc
        UNION ALL SELECT conv_id, turn_idx, 'request', 'client_ip', remote_addr FROM acc
        UNION ALL SELECT conv_id, turn_idx, 'response', 'status', status FROM acc
        UNION ALL SELECT conv_id, turn_idx, 'annotations', 'conv', conv_id FROM acc
        UNION ALL SELECT conv_id, turn_idx, 'aws', 'request_id',
                         conv_id || ':' || turn_idx FROM acc
        UNION ALL SELECT conv_id, turn_idx, 'metadata', 'environment', 'production' FROM acc"""
    sql["redaction_body"] = rf"""
        SELECT conv_id, turn_idx,
               regexp_replace(json_extract_string(text, '$.remote_addr'),
                              '\d+\.\d+\.\d+\.\d+', '[REDACTED]', 'g') AS remote_addr,
               CAST(json_extract_string(text, '$.status') AS BIGINT) AS status,
               CAST(CASE WHEN regexp_matches(json_extract_string(text, '$.remote_addr'),
                                             '\d+\.\d+\.\d+\.\d+')
                         THEN 1 ELSE 0 END AS BIGINT) AS body_masked_count,
               CASE WHEN regexp_matches(json_extract_string(text, '$.remote_addr'),
                                        '\d+\.\d+\.\d+\.\d+')
                    THEN 'remote_addr' ELSE '' END AS body_masked_keys
        FROM {T} WHERE ({SQL_EVENT_TYPE}) = 'json'"""
    sql["file_source_gz"] = sql["file_source"]
    sql["fluent_forward"] = f"""
        SELECT conv_id AS tag, count(*) AS n_entries,
               min(date_trunc('second', ts)) AS first_ts,
               max(date_trunc('second', ts)) AS last_ts
        FROM {T} GROUP BY 1"""
    sql["heavy_hitters"] = rf"""
        WITH tok AS (
          SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')) AS t
          FROM {T})
        SELECT t AS token, count(*) AS n FROM tok GROUP BY 1
        HAVING count(*) >= ceil((SELECT count(*) FROM tok) * {HH_PHI})"""
    sql["dedup_keep"] = f"""
        SELECT d.doc_id, d.lang FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_b FROM ({sql["dedup_minhash"]}))"""
    # transitive closure of the verified pair graph via recursive min-label
    # walk: lbl of id = every node reachable from id; MIN over them = the
    # component representative (matches connected_components exactly)
    sql["embedding_kmeans_assign"] = f"""
        WITH c AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
                 embedding AS ce
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K})),
        sims AS (
          SELECT e.vec_id, c.cluster,
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(c.ce AS DOUBLE[])) AS sim
          FROM embeddings e CROSS JOIN c)
        SELECT vec_id, cluster FROM (
          SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cluster ASC) AS rn
          FROM sims)
        WHERE rn = 1"""
    sql["semdedup"] = f"""
        WITH assign AS ({sql["embedding_kmeans_assign"]}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        drops AS (
          SELECT y.vec_id AS vb
          FROM assign x JOIN assign y
            ON x.cluster = y.cluster AND x.vec_id < y.vec_id
          JOIN e a ON a.vec_id = x.vec_id
          JOIN e b ON b.vec_id = y.vec_id
          WHERE list_cosine_similarity(a.emb, b.emb) >= 0.95)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT vb FROM drops)"""
    sql["doc_sample_stratified"] = """
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(text), 1, 4) <
              CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000'
                        WHEN 'fr' THEN '2000' ELSE '1000' END"""
    sql["doc_repetition"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
          FROM documents),
        g AS (
          SELECT doc_id, len(tk) AS n_tokens,
                 CASE WHEN len(tk) >= 3 THEN
                   list_transform(generate_series(1, len(tk) - 2),
                                  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [] END AS g3,
                 CASE WHEN len(tk) >= 2 THEN
                   list_transform(generate_series(1, len(tk) - 1),
                                  i -> tk[i] || ' ' || tk[i+1])
                 ELSE [] END AS g2
          FROM toks)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CASE WHEN len(g3) = 0 THEN 0.0
                    ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
               END AS rep_3gram,
               CASE WHEN len(g2) = 0 THEN 0.0
                    ELSE CAST(list_max(list_transform(list_distinct(g2),
                           x -> len(list_filter(g2, y -> y = x)))) AS DOUBLE)
                         / len(g2)
               END AS top_2gram_frac
        FROM g"""
    sql["dedup_clusters"] = f"""
        WITH RECURSIVE prs AS (SELECT doc_a, doc_b FROM ({sql["dedup_minhash"]})),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                  UNION SELECT doc_b, doc_a FROM prs),
        walk(id, lbl) AS (
          SELECT * FROM (SELECT src AS id, dst AS lbl FROM edges
                         UNION SELECT src, src FROM edges)
          UNION
          SELECT e.src, w.lbl FROM edges e JOIN walk w ON w.id = e.dst
        )
        SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM walk GROUP BY id"""
    sql["dup_cluster_sizes"] = f"""
        SELECT CAST(sz AS BIGINT) AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters
        FROM (SELECT cluster_id, count(*) AS sz
              FROM ({sql["dedup_clusters"]}) GROUP BY cluster_id)
        GROUP BY sz"""
    # HyperLogLog: the register table, the exact-integer harmonic sum and
    # the fixed-order float estimate all mirror stages/sketch.py
    from .stages.sketch import HLL_P as _HP
    from .stages.sketch import HLL_RMAX as _HRMAX
    from .stages.sketch import splitmix64_sql as _smix

    _hm = 1 << _HP
    _2rmax = 1 << _HRMAX
    sql["distinct_hll"] = f"""
        WITH h AS (SELECT DISTINCT {_smix("user_id")} AS h FROM events),
        r AS (SELECT CAST(h >> {_HRMAX - 1} AS BIGINT) AS reg,
                     CAST(h % {1 << (_HRMAX - 1)}::HUGEINT AS BIGINT) AS low
              FROM h),
        rr AS (SELECT reg,
                      max(CASE WHEN low = 0 THEN {_HRMAX}
                               ELSE {_HRMAX} - length(bin(low)) END) AS r
               FROM r GROUP BY reg),
        agg AS (SELECT count(*) AS n_present,
                       CAST(sum(CAST(1::BIGINT << ({_HRMAX} - r) AS HUGEINT))
                            AS HUGEINT) AS s_present
                FROM rr),
        s AS (SELECT {_hm} - n_present AS n_zero,
                     s_present + ({_hm} - n_present)::HUGEINT
                       * {_2rmax}::HUGEINT AS s
              FROM agg),
        est AS (SELECT n_zero, s,
                       0.7213 / (1 + 1.079 / {float(_hm)!r}) * {float(_hm)!r}
                         * {float(_hm)!r} * {float(_2rmax)!r}
                         / CAST(s AS DOUBLE) AS raw
                FROM s)
        SELECT CAST({_hm} AS BIGINT) AS m, CAST(n_zero AS BIGINT) AS n_zero,
               CAST(s // 4294967296 AS BIGINT) AS s_hi,
               CAST(s % 4294967296 AS BIGINT) AS s_lo,
               CAST(floor(CASE WHEN n_zero > 0 AND raw <= 2.5 * {_hm}
                               THEN {float(_hm)!r} * ln({float(_hm)!r} / n_zero)
                               ELSE raw END * 1000) AS BIGINT) AS est_e3
        FROM est"""
    _uhll = _smix("user_id")
    sql["users_per_type_hll"] = f"""
        WITH h AS (SELECT DISTINCT event_type, {_uhll} AS h FROM events),
        r AS (SELECT event_type, CAST(h >> {_HRMAX - 1} AS BIGINT) AS reg,
                     CAST(h % {1 << (_HRMAX - 1)}::HUGEINT AS BIGINT) AS low
              FROM h),
        rr AS (SELECT event_type, reg,
                      max(CASE WHEN low = 0 THEN {_HRMAX}
                               ELSE {_HRMAX} - length(bin(low)) END) AS r
               FROM r GROUP BY 1, 2),
        agg AS (SELECT event_type, count(*) AS n_present,
                       CAST(sum(CAST(1::BIGINT << ({_HRMAX} - r) AS HUGEINT))
                            AS HUGEINT) AS s_present
                FROM rr GROUP BY 1),
        s AS (SELECT event_type, {_hm} - n_present AS n_zero,
                     s_present + ({_hm} - n_present)::HUGEINT
                       * {_2rmax}::HUGEINT AS s
              FROM agg),
        est AS (SELECT event_type, n_zero, s,
                       0.7213 / (1 + 1.079 / {float(_hm)!r}) * {float(_hm)!r}
                         * {float(_hm)!r} * {float(_2rmax)!r}
                         / CAST(s AS DOUBLE) AS raw
                FROM s)
        SELECT event_type, CAST(n_zero AS BIGINT) AS n_zero,
               CAST(s // 4294967296 AS BIGINT) AS s_hi,
               CAST(s % 4294967296 AS BIGINT) AS s_lo,
               CAST(floor(CASE WHEN n_zero > 0 AND raw <= 2.5 * {_hm}
                               THEN {float(_hm)!r} * ln({float(_hm)!r} / n_zero)
                               ELSE raw END * 1000) AS BIGINT) AS est_e3
        FROM est"""
    # Efraimidis-Spirakis weighted sample: one fixed float expression
    # (ln(u)/w * 1e9 floor) mirrored from stages/mix.py::weighted_sample
    _dhash = _smix("doc_id")
    sql["weighted_sample"] = f"""
        SELECT doc_id, n_chars, es_key_unat FROM (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(floor(ln((CAST({_dhash} AS DOUBLE) + 1.0)
                               / 18446744073709551616.0)
                            / greatest(CAST(n_chars AS DOUBLE), 1.0) * 1e9)
                      AS BIGINT) AS es_key_unat
          FROM documents)
        ORDER BY es_key_unat DESC, doc_id LIMIT 50"""
    from .stages.mix import docs_v2_path as _dv2p

    _v2dir = _dv2p(sf_dir)
    sql["corpus_diff"] = f"""
        WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents),
        v2 AS (SELECT doc_id, md5(text) AS h
               FROM read_parquet('{_v2dir}/*.parquet'))
        SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
               CASE WHEN v1.h IS NULL THEN 'added'
                    WHEN v2.h IS NULL THEN 'removed'
                    WHEN v1.h = v2.h THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id"""
    sql["dedup_rate_by_source"] = f"""
        WITH u AS (
          SELECT source, md5(text) AS h FROM documents
          UNION ALL
          SELECT source, md5(text) AS h FROM read_parquet('{_v2dir}/*.parquet')),
        g AS (SELECT source, h, CAST(count(*) AS BIGINT) AS c
              FROM u GROUP BY source, h)
        SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_unique,
               CAST(sum(c) - count(*) AS BIGINT) AS n_dup_docs
        FROM g GROUP BY source"""
    # vocab KL: identical fixed float expression per union-vocab term
    # (p recomputed textually so both engines evaluate the same tree)
    sql["vocab_kl"] = r"""
        WITH pt AS (SELECT unnest(list_filter(
                      regexp_split_to_array(text, '\s+'), x -> x != '')) AS tok
                    FROM documents WHERE lang = 'en'),
        qt AS (SELECT unnest(list_filter(
                 regexp_split_to_array(text, '\s+'), x -> x != '')) AS tok
               FROM documents WHERE lang != 'en'),
        cp AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM pt GROUP BY tok),
        cq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM qt GROUP BY tok),
        u AS (SELECT COALESCE(cp.c, 0) AS c_p, COALESCE(cq.c, 0) AS c_q
              FROM cp FULL JOIN cq ON cp.tok = cq.tok),
        st AS (SELECT CAST(count(*) AS BIGINT) AS v,
                      CAST(sum(c_p) AS BIGINT) AS np,
                      CAST(sum(c_q) AS BIGINT) AS nq FROM u)
        SELECT st.v AS vocab_size, st.np AS n_p, st.nq AS n_q,
               CAST(sum(CAST(floor(
                 ((c_p + 1.0) / (np + v))
                 * ln(((c_p + 1.0) / (np + v)) / ((c_q + 1.0) / (nq + v)))
                 * 1000000000.0) AS BIGINT)) AS BIGINT) AS kl_nanonats
        FROM u, st GROUP BY 1, 2, 3"""
    # source overlap: first-8-normalized-tokens fingerprint, normalization
    # mirrors textstats.normalize_text
    sql["source_overlap"] = r"""
        WITH d AS (
          SELECT DISTINCT source,
                 md5(array_to_string(
                   (regexp_split_to_array(trim(regexp_replace(
                      lower(text), '\s+', ' ', 'g')), ' '))[1:8], ' ')) AS h
          FROM documents)
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2"""
    sql["latest_with_tombstones"] = """
        SELECT user_id, ts, event_id, event_type FROM (
          SELECT user_id, ts, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND event_type != 'error'"""
    sql["dedup_keep_clustered"] = f"""
        SELECT d.doc_id, d.lang FROM documents d
        WHERE d.doc_id NOT IN (
          SELECT doc_id FROM ({sql["dedup_clusters"]}) WHERE doc_id != cluster_id)"""
    sql["dedup_keep_best"] = rf"""
        WITH cc AS ({sql["dedup_clusters"]}),
        tok AS (SELECT doc_id,
                       len(list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x != '')) AS n
                FROM documents),
        win AS (
          SELECT doc_id FROM (
            SELECT c.doc_id,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY t.n DESC, c.doc_id) AS rn
            FROM cc c JOIN tok t USING (doc_id)) WHERE rn = 1)
        SELECT d.doc_id, d.lang FROM documents d
        WHERE d.doc_id NOT IN (
          SELECT doc_id FROM cc
          WHERE doc_id NOT IN (SELECT doc_id FROM win))"""
    sql["corpus_curation"] = r"""
        SELECT min(doc_id) AS doc_id, min(lang) AS lang,
               CAST(min(n_tokens) AS BIGINT) AS n_tokens, count(*) AS n_dups
        FROM (
          SELECT doc_id, lang, text,
                 len(regexp_extract_all(text, '\S+')) AS n_tokens,
                 len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
                 length(text) AS n_chars
          FROM documents)
        WHERE n_tokens >= 5 AND n_alpha * 2 >= n_chars AND lang IN ('en', 'de', 'fr')
        GROUP BY md5(text)"""
    sql["duration_quantiles"] = f"""
        SELECT regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1) AS tool_name,
               count(*) AS n,
               quantile_disc(CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1) AS BIGINT), 0.5) AS p50,
               quantile_disc(CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1) AS BIGINT), 0.95) AS p95,
               quantile_disc(CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1) AS BIGINT), 0.99) AS p99
        FROM {T} WHERE {SQL_IS_TOOL} GROUP BY 1"""
    sql["slo_burn"] = f"""
        WITH t AS (
          SELECT regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1) AS tool_name,
                 ts,
                 CAST(regexp_extract(text, 'exit=(\\d+)', 1) AS INTEGER) AS exit
          FROM {T} WHERE {SQL_IS_TOOL}),
        p5 AS (
          SELECT tool_name, time_bucket(INTERVAL '5 minutes', ts) AS w5,
                 CAST(sum(CASE WHEN exit != 0 THEN 1 ELSE 0 END) AS BIGINT) AS err5,
                 CAST(count(*) AS BIGINT) AS tot5
          FROM t GROUP BY 1, 2),
        p60 AS (
          SELECT tool_name, date_trunc('hour', w5) AS w60,
                 CAST(sum(err5) AS BIGINT) AS err60,
                 CAST(sum(tot5) AS BIGINT) AS tot60
          FROM p5 GROUP BY 1, 2)
        SELECT p5.tool_name, w5, err5, tot5, err60, tot60,
               err5 * tot60 > 2 * err60 * tot5 AS burn
        FROM p5 JOIN p60 ON p5.tool_name = p60.tool_name
                        AND date_trunc('hour', w5) = p60.w60"""
    sql["region_revenue"] = f"""
        SELECT n_name,
               CAST(sum({cents.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT)
                 AS revenue_cents,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1"""
    # pii_scrub: SQL is generated from the SAME pattern constants the Ray
    # stage uses (both engines are RE2), so the two sides cannot drift.
    from .stages.pii import DEFAULT_PII_PATTERNS as _PII

    _pii_counts = ",\n               ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in _PII)
    _pii_masked = "text"
    for _, pat, repl in _PII:
        _pii_masked = f"regexp_replace({_pii_masked}, '{pat}', '{repl}', 'g')"
    sql["pii_scrub"] = f"""
        SELECT conv_id, turn_idx,
               {_pii_counts},
               {_pii_masked} AS text
        FROM {T}"""
    sql["bpe_pairs"] = f"""
        WITH toks AS (
          SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x != '')) AS w
          FROM {T}),
        pairs AS (
          SELECT ascii(w[i]) AS b1, ascii(w[i + 1]) AS b2
          FROM toks, unnest(range(1, length(w))) AS t(i))
        SELECT b1, b2, count(*) AS n
        FROM pairs GROUP BY 1, 2
        ORDER BY n DESC, b1, b2 LIMIT 50"""
    # bpe_train: generated chained-CTE program — one CTE block per merge
    # round, each applying the SAME greedy run-parity rule as the engine
    # (overlaps only exist for a == b; keep every other match in a run).
    _bpe_rounds = 8
    _parts = ["""w0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY word) AS wid, freq,
               list_transform(range(1, length(word) + 1), i -> ascii(word[i])) AS syms
        FROM (SELECT w AS word, count(*) AS freq
              FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                              x -> x != '')) AS w
                    FROM documents)
              GROUP BY 1))"""]
    for _r in range(_bpe_rounds):
        _nid = 256 + _r
        _parts.append(f"""p{_r} AS MATERIALIZED (
        SELECT w.syms[t.i] AS b1, w.syms[t.i + 1] AS b2,
               CAST(sum(w.freq) AS BIGINT) AS n
        FROM w{_r} w, unnest(range(1, len(w.syms))) AS t(i)
        GROUP BY 1, 2),
      best{_r} AS MATERIALIZED (SELECT b1, b2, n FROM p{_r} ORDER BY n DESC, b1, b2 LIMIT 1),
      mm{_r} AS MATERIALIZED (
        SELECT w.wid, t.i, row_number() OVER (PARTITION BY w.wid ORDER BY t.i) AS rn
        FROM w{_r} w, best{_r} b, unnest(range(1, len(w.syms))) AS t(i)
        WHERE w.syms[t.i] = b.b1 AND w.syms[t.i + 1] = b.b2),
      kept{_r} AS MATERIALIZED (
        SELECT wid, i FROM (
          SELECT wid, i, min(i) OVER (PARTITION BY wid, i - rn) AS run_first
          FROM mm{_r})
        WHERE (i - run_first) % 2 = 0),
      w{_r + 1} AS MATERIALIZED (
        SELECT s.wid, s.freq,
               list(CASE WHEN k1.i IS NOT NULL THEN {_nid} ELSE s.sym END
                    ORDER BY s.j) AS syms
        FROM (SELECT w.wid, w.freq, t.j, w.syms[t.j] AS sym
              FROM w{_r} w, unnest(range(1, len(w.syms) + 1)) AS t(j)) s
        LEFT JOIN kept{_r} k1 ON k1.wid = s.wid AND k1.i = s.j
        LEFT JOIN kept{_r} k2 ON k2.wid = s.wid AND k2.i = s.j - 1
        WHERE k2.i IS NULL
        GROUP BY s.wid, s.freq)""")
    _final = "\n        UNION ALL ".join(
        f"SELECT CAST({_r} AS INTEGER) AS rank, b1, b2, n, "
        f"CAST({256 + _r} AS INTEGER) AS new_id FROM best{_r}"
        for _r in range(_bpe_rounds))
    sql["bpe_train"] = "WITH " + ",\n      ".join(_parts) + "\n        " + _final
    # bpe_encode: extend the SAME round CTEs — rank distinct words exactly as
    # w0 did (row_number OVER ORDER BY word), join the final round's
    # word->symbols table back to every doc's positional words, flatten with
    # a per-doc token position, aggregate order-sensitive checksums
    _enc_parts = _parts + [f"""wr AS MATERIALIZED (
        SELECT word, row_number() OVER (ORDER BY word) AS wid
        FROM (SELECT DISTINCT w AS word
              FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                              x -> x != '')) AS w
                    FROM documents))),
      docw AS MATERIALIZED (
        SELECT d.doc_id, u.i AS wpos, d.wl[u.i] AS word
        FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                                         x -> x != '') AS wl FROM documents) d,
             unnest(range(1, len(d.wl) + 1)) AS u(i)),
      encf AS MATERIALIZED (
        SELECT e.doc_id,
               row_number() OVER (PARTITION BY e.doc_id ORDER BY e.wpos, t.j) AS pos,
               w.syms[t.j] AS sym
        FROM docw e JOIN wr USING (word)
             JOIN w{_bpe_rounds} w ON w.wid = wr.wid,
             unnest(range(1, len(w.syms) + 1)) AS t(j))"""]
    _enc_final = """SELECT d.doc_id,
               COALESCE(s.n_tokens, 0) AS n_tokens,
               COALESCE(s.sym_sum, 0) AS sym_sum,
               COALESCE(s.pos_weighted, 0) AS pos_weighted
        FROM documents d LEFT JOIN (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(sym) AS BIGINT) AS sym_sum,
                 CAST(sum(pos * sym) AS BIGINT) AS pos_weighted
          FROM encf GROUP BY doc_id) s USING (doc_id)"""
    sql["bpe_encode"] = "WITH " + ",\n      ".join(_enc_parts) + "\n        " + _enc_final
    sql["hard_negatives"] = """
        SELECT vec_id FROM embeddings
        WHERE label != (SELECT label FROM embeddings WHERE vec_id = 0)
        ORDER BY list_cosine_similarity(embedding,
            (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC
        LIMIT 10"""
    # same op order as the engine: scale = (255.0 / (hi - lo)) first, then
    # (x - lo) * scale — identical IEEE doubles on both sides
    sql["embedding_quantize"] = """
        WITH pos AS (
          SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS dim,
                 CAST(embedding[t.i] AS DOUBLE) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        st AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM pos GROUP BY dim)
        SELECT vec_id, dim,
               CASE WHEN hi = lo THEN 0
                    ELSE CAST(floor((x - lo) * (255.0 / (hi - lo)) + 0.5) AS INTEGER)
               END AS qv
        FROM pos JOIN st USING (dim)"""
    # DSIR: same FNV-1a-over-bytes HUGEINT construct as the simhash/KMV
    # oracles, shared hash space for unigrams and space-joined bigrams
    _B, _P, _M = 0xCBF29CE484222325, 1_099_511_628_211, 1 << 64

    def _fnv_sql(e: str) -> str:
        hx = f"hex(encode({e}))"
        byte = (f"CAST(16 * (ascii(substr({hx}, 2*i-1, 1)) - CASE WHEN "
                f"substr({hx}, 2*i-1, 1) >= 'A' THEN 55 ELSE 48 END) "
                f"+ ascii(substr({hx}, 2*i, 1)) - CASE WHEN substr({hx}, 2*i, 1) "
                f">= 'A' THEN 55 ELSE 48 END AS HUGEINT)")
        return (f"list_reduce(list_prepend(CAST({_B} AS HUGEINT), "
                f"list_transform(range(1, octet_length(encode({e})) + 1), i -> {byte})), "
                f"(h, x) -> xor(h, x) * {_P} % {_M}::HUGEINT)")

    sql["dsir_weights"] = f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM documents),
        grams AS (
          SELECT doc_id, lang, unnest(tk) AS g FROM toks
          UNION ALL
          SELECT doc_id, lang, array_to_string(tk[i:i+1], ' ') AS g
          FROM toks, unnest(range(1, len(tk))) AS t(i)),
        feats AS (SELECT doc_id, lang, CAST({_fnv_sql('g')} % 1024 AS INTEGER) AS f
                  FROM grams),
        cnt AS (SELECT f, CAST(count(*) AS BIGINT) AS c_r,
                       CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS c_t
                FROM feats GROUP BY f),
        tot AS (SELECT sum(c_r) AS r_tot, sum(c_t) AS t_tot FROM cnt),
        delta AS (SELECT f,
            CAST(floor(ln((c_t + 1.0) / (t_tot + 1024.0)) * 1e6) AS BIGINT)
          - CAST(floor(ln((c_r + 1.0) / (r_tot + 1024.0)) * 1e6) AS BIGINT) AS d
          FROM cnt, tot)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
               CAST(sum(d) AS BIGINT) AS w_unat
        FROM feats JOIN delta USING (f)
        GROUP BY doc_id"""
    sql["dsir_select"] = f"""
        SELECT doc_id, w_unat, rnk FROM (
          SELECT doc_id, w_unat,
                 CAST(row_number() OVER (ORDER BY w_unat DESC, doc_id) AS BIGINT) AS rnk,
                 count(*) OVER () AS n
          FROM ({sql['dsir_weights']}))
        WHERE rnk <= (n + 3) // 4"""
    # bm25_topk: generated from the SAME term list + constants the engine
    # uses; every float op in the same order (Lucene +1 idf, k1=1.2, b=0.75)
    from .stages.textstats import BM25_B as _BB, BM25_K1 as _BK

    _bm_df = ",\n               ".join(
        f"CAST(count(*) FILTER (WHERE len(list_filter(tk, x -> x = '{w}')) > 0)"
        f" AS BIGINT) AS df_{i}" for i, w in enumerate(BM25_QUERY_TERMS))

    def _bm_term(i: int, w: str) -> str:
        tf = f"len(list_filter(tk, x -> x = '{w}'))"
        ratio = "(CAST(len(tk) AS DOUBLE) / (CAST(n_toks AS DOUBLE) / n_docs))"
        return (f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
                f" * ((CAST({tf} AS DOUBLE) * ({_BK} + 1.0))"
                f" / ({tf} + {_BK} * (1.0 - {_BB} + {_BB} * {ratio})))")

    _bm_sum = "\n                 + ".join(
        _bm_term(i, w) for i, w in enumerate(BM25_QUERY_TERMS))
    sql["bm25_topk"] = f"""
        WITH tk AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM documents),
        st AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(COALESCE(sum(len(tk)), 0) AS BIGINT) AS n_toks,
               {_bm_df}
          FROM tk)
        SELECT doc_id,
               CAST(floor(({_bm_sum}) * 1e6) AS BIGINT) AS score_unat
        FROM tk, st
        ORDER BY score_unat DESC, doc_id LIMIT 10"""
    sql["oov_rate"] = r"""
        WITH tk AS (
          SELECT source, list_filter(regexp_split_to_array(text, '\s+'),
                                     t -> t != '') AS tk
          FROM documents),
        uni AS (
          SELECT t.w, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(tk) AS w FROM tk) t GROUP BY 1),
        vocab AS (SELECT w FROM uni ORDER BY c DESC, w LIMIT 16),
        flat AS (SELECT source, unnest(tk) AS w FROM tk)
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab))
                    AS BIGINT) AS n_oov
        FROM flat GROUP BY source"""
    # zipf_slope: milli-nat int quantization on both axes -> exact integer
    # regression sums (HUGEINT in SQL, int64 in numpy; all < 2^53 so the
    # final double division sees identical operands)
    sql["zipf_slope"] = r"""
        WITH tk AS (
          SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                    t -> t != '')) AS tok
          FROM documents),
        uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY tok),
        top AS (
          SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
          FROM uni ORDER BY c DESC, tok LIMIT 256),
        q AS (
          SELECT CAST(floor(ln(CAST(c AS DOUBLE)) * 1000.0) AS BIGINT) AS y,
                 CAST(floor(ln(CAST(r AS DOUBLE)) * 1000.0) AS BIGINT) AS x
          FROM top),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x*y) AS sxy, sum(x*x) AS sxx
          FROM q)
        SELECT n AS n_tokens,
               CAST(floor(1e6 * CAST(n*sxy - sx*sy AS DOUBLE)
                          / CAST(n*sxx - sx*sx AS DOUBLE)) AS BIGINT) AS slope_micro
        FROM s"""
    # rrf_fusion: the lexical CTEs mirror bm25_topk verbatim (LIMIT 50); the
    # dense side is the integer-exact dot-product ranking (floor(x*1e6) per
    # element on query and corpus, every product/partial sum an exact
    # float64 integer, so sum() is order-independent); the fusion is two
    # divisions + one add in IEEE doubles, floor(x*1e9) nano-units
    sql["rrf_fusion"] = f"""
        WITH tk AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM documents),
        st AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(COALESCE(sum(len(tk)), 0) AS BIGINT) AS n_toks,
               {_bm_df}
          FROM tk),
        lexs AS (
          SELECT doc_id, CAST(floor(({_bm_sum}) * 1e6) AS BIGINT) AS score_unat
          FROM tk, st),
        lex AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY score_unat DESC, doc_id) AS r_lex
          FROM lexs ORDER BY score_unat DESC, doc_id LIMIT 50),
        qi AS (
          SELECT list_transform(embedding,
                                x -> floor(CAST(x AS DOUBLE) * 1000000.0)) AS q
          FROM embeddings WHERE vec_id = 0),
        ip AS (
          SELECT e.vec_id AS doc_id,
                 CAST(sum(floor(CAST(e.embedding[u.i] AS DOUBLE) * 1000000.0)
                          * qi.q[u.i]) AS BIGINT) AS ip
          FROM embeddings e, qi, unnest(range(1, len(e.embedding) + 1)) AS u(i)
          GROUP BY e.vec_id),
        dense AS (
          SELECT doc_id, row_number() OVER (ORDER BY ip DESC, doc_id) AS r_dense
          FROM ip ORDER BY ip DESC, doc_id LIMIT 50),
        fused AS (
          SELECT COALESCE(dense.doc_id, lex.doc_id) AS doc_id,
                 COALESCE(1.0 / (60 + r_dense), 0.0)
                   + COALESCE(1.0 / (60 + r_lex), 0.0) AS s
          FROM dense FULL OUTER JOIN lex ON dense.doc_id = lex.doc_id)
        SELECT doc_id, CAST(floor(s * 1e9) AS BIGINT) AS rrf_nano
        FROM fused ORDER BY rrf_nano DESC, doc_id LIMIT 20"""
    # collocations: identical float expression on both sides — one division
    # per ln, fixed subtraction order, floor(x*1e6) micro-nats
    sql["collocations"] = """
        WITH tk AS (
          SELECT list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM documents),
        uni AS (SELECT t.w, CAST(count(*) AS BIGINT) AS c1
                FROM (SELECT unnest(tk) AS w FROM tk) t GROUP BY 1),
        tot1 AS (SELECT CAST(sum(c1) AS BIGINT) AS n1 FROM uni),
        big AS (SELECT tk[u.i] AS w1, tk[u.i + 1] AS w2,
                       CAST(count(*) AS BIGINT) AS c2
                FROM tk, unnest(range(1, len(tk))) AS u(i) GROUP BY 1, 2),
        tot2 AS (SELECT CAST(sum(c2) AS BIGINT) AS n2 FROM big)
        SELECT w1, w2, c2 AS n,
               CAST(floor((ln(CAST(c2 AS DOUBLE) / n2)
                           - ln(CAST(a.c1 AS DOUBLE) / n1)
                           - ln(CAST(b.c1 AS DOUBLE) / n1)) * 1e6) AS BIGINT) AS pmi_unat
        FROM big JOIN uni a ON a.w = w1 JOIN uni b ON b.w = w2, tot1, tot2
        WHERE c2 >= 5
        ORDER BY pmi_unat DESC, w1, w2 LIMIT 50"""
    from .stages.sketch import KMV_MIX as _KMIX

    _M64 = 1 << 64
    sql["users_per_type_kmv"] = f"""
        WITH h AS (
          SELECT DISTINCT event_type,
                 CAST(user_id AS HUGEINT) * {_KMIX} % {_M64}::HUGEINT AS h
          FROM events),
        r AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS nd
          FROM h)
        SELECT event_type, CAST(least(nd, {KMV_GROUP_K}) AS BIGINT) AS k_used,
               CAST(CASE WHEN nd < {KMV_GROUP_K} THEN nd
                         ELSE {(KMV_GROUP_K - 1) * (1 << 64)}::HUGEINT // h
                    END AS BIGINT) AS n_distinct_est
        FROM r WHERE rn = least(nd, {KMV_GROUP_K})"""
    sql["customer_order_counts"] = """
        SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
               COALESCE(o.n_orders, 0) AS n_orders
        FROM customer LEFT JOIN (
          SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1) o ON o_custkey = c_custkey"""
    sql["rolling_value"] = """
        SELECT user_id, ts, event_id,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents
        FROM events"""
    # embedding_outliers: same division-free all-integer tree as the engine
    # (BIGINT squares < 2^62; HUGEINT sum; no centroid division, whose
    # floor-vs-truncate semantics differ between Python and DuckDB)
    sql["embedding_outliers"] = """
        WITH x AS (
          SELECT vec_id, label, u.i AS i,
                 CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000.0)
                      AS BIGINT) AS xi
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
        s AS (
          SELECT label, i, CAST(sum(xi) AS BIGINT) AS sum_i,
                 CAST(count(*) AS BIGINT) AS n
          FROM x GROUP BY label, i),
        d AS (
          SELECT x.vec_id, x.label,
                 CAST(sum((s.n * x.xi - s.sum_i) * (s.n * x.xi - s.sum_i))
                      AS BIGINT) AS dist2
          FROM x JOIN s ON s.label = x.label AND s.i = x.i
          GROUP BY x.vec_id, x.label)
        SELECT vec_id, label, dist2
        FROM d ORDER BY dist2 DESC, vec_id LIMIT 20"""
    sql["embedding_covariance"] = """
        WITH pos AS (
          SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS dim,
                 CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0) AS BIGINT) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        sums AS (SELECT dim, CAST(sum(x) AS BIGINT) AS s,
                        CAST(count(*) AS BIGINT) AS n
                 FROM pos GROUP BY dim)
        SELECT a.dim AS i, b.dim AS j,
               sa.n AS n, sa.s AS sum_i, sb.s AS sum_j,
               CAST(sum(a.x * b.x) AS BIGINT) AS s_ij
        FROM pos a JOIN pos b ON a.vec_id = b.vec_id AND b.dim >= a.dim
        JOIN sums sa ON sa.dim = a.dim JOIN sums sb ON sb.dim = b.dim
        GROUP BY 1, 2, 3, 4, 5"""
    sql["latest_event_per_user"] = """
        SELECT user_id, ts, event_id, event_type FROM (
          SELECT user_id, ts, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1"""
    sql["turn_transitions"] = f"""
        WITH s AS (
          SELECT role,
                 lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
          FROM {T})
        SELECT role AS from_state, nxt AS to_state, CAST(count(*) AS BIGINT) AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2"""
    # kmeans_fit_int: generated chained-CTE program — init from the k
    # lowest-id vectors, per round assign (argmin dist, ties -> lowest cid)
    # then FLOOR-division centroid update (empty cluster keeps its previous
    # centroid), final round emits the assignment. All-integer arithmetic.
    _km_parts = [f"""kpos AS MATERIALIZED (
        SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS dim,
               CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0) AS BIGINT) AS x
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      kc0 AS MATERIALIZED (
        SELECT CAST(vec_id AS INTEGER) AS cid, dim, x AS c
        FROM kpos WHERE vec_id < {KMEANS_K})"""]
    for _r in range(KMEANS_FIT_ROUNDS):
        _km_parts.append(f"""kd{_r} AS MATERIALIZED (
        SELECT p.vec_id, c.cid,
               CAST(sum((p.x - c.c) * (p.x - c.c)) AS BIGINT) AS dist
        FROM kpos p JOIN kc{_r} c USING (dim)
        GROUP BY 1, 2),
      ka{_r} AS MATERIALIZED (
        SELECT vec_id, cid, dist FROM (
          SELECT vec_id, cid, dist,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
          FROM kd{_r}) WHERE rn = 1)""")
        if _r < KMEANS_FIT_ROUNDS - 1:
            _km_parts.append(f"""kc{_r + 1} AS MATERIALIZED (
        SELECT c.cid, c.dim,
               CASE WHEN u.n IS NULL THEN c.c
                    WHEN u.s >= 0 THEN u.s // u.n
                    ELSE -((-u.s + u.n - 1) // u.n) END AS c
        FROM kc{_r} c LEFT JOIN (
          SELECT a.cid, p.dim, CAST(sum(p.x) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM ka{_r} a JOIN kpos p USING (vec_id) GROUP BY 1, 2) u
        ON u.cid = c.cid AND u.dim = c.dim)""")
    sql["kmeans_fit_int"] = (
        "WITH " + ",\n      ".join(_km_parts)
        + f"\n        SELECT vec_id, cid AS cluster, dist FROM ka{KMEANS_FIT_ROUNDS - 1}")
    # quality_classifier: same FNV hash space; weight formula interpolated
    # from the SAME constants stages.textstats._clf_weights uses
    from .stages.textstats import (
        CLF_BIAS as _CB,
        CLF_DIM as _CD,
        CLF_MIX as _CM,
        CLF_WMOD as _CWM,
        CLF_WOFF as _CWO,
    )

    sql["quality_classifier"] = f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM documents),
        f AS (
          SELECT doc_id, CAST({_fnv_sql('tk[u.i]')} % {_CD} AS BIGINT) AS j
          FROM toks, unnest(range(1, len(tk) + 1)) AS u(i)),
        s AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum((j * {_CM}) % {_CWM} - {_CWO}) AS BIGINT) AS wsum
          FROM f GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(s.n_tokens, 0) AS n_tokens,
               COALESCE(s.wsum, 0) + {_CB} AS score,
               COALESCE(s.wsum, 0) + {_CB} > 0 AS keep
        FROM documents d LEFT JOIN s USING (doc_id)"""
    # global quality rank: the classifier score ranked (desc, id asc) over
    # ALL docs — mirrors global_topfrac(num=1, den=1)
    sql["doc_quality_rank"] = f"""
        WITH sc AS (
          SELECT doc_id, score FROM ({sql["quality_classifier"]}))
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS rnk
        FROM sc"""
    # per-source LM quality: reuse the per-doc unigram scoring (cap mirror
    # included), group by source; mean = exact FLOOR division via the
    # mathematical-mod identity (DuckDB // truncates toward zero)
    # CCNet perplexity tertiles: chained unigram scoring -> mathematical
    # floor per-token score (floor-mod identity; n_tokens >= 1 by
    # construction) -> per-source rank window -> rank * 3 // n
    sql["ppl_buckets"] = f"""
        WITH per_doc AS ({sql["unigram_logprob"]}),
        s AS (
          SELECT p.doc_id, d.source,
                 CAST((p.lp_sum_unat
                       - ((p.lp_sum_unat % p.n_tokens) + p.n_tokens)
                         % p.n_tokens) / p.n_tokens AS BIGINT) AS per_tok_unat
          FROM per_doc p JOIN documents d USING (doc_id)),
        r AS (
          SELECT doc_id, source, per_tok_unat,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY per_tok_unat DESC, doc_id) - 1 AS rk,
                 count(*) OVER (PARTITION BY source) AS n
          FROM s)
        SELECT doc_id, source, per_tok_unat,
               CAST(rk * 3 // n AS BIGINT) AS ppl_bucket
        FROM r"""
    sql["source_lm_score"] = f"""
        WITH per_doc AS ({sql["unigram_logprob"]}),
        j AS (SELECT d.source, p.n_tokens, p.lp_sum_unat
              FROM per_doc p JOIN documents d USING (doc_id)),
        a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                     CAST(sum(lp_sum_unat) AS BIGINT) AS lp_sum_unat
              FROM j GROUP BY source)
        SELECT source, n_docs, n_tokens, lp_sum_unat,
               CAST((lp_sum_unat
                     - ((lp_sum_unat % greatest(n_tokens, 1))
                        + greatest(n_tokens, 1)) % greatest(n_tokens, 1))
                    / greatest(n_tokens, 1) AS BIGINT) AS mean_lp_unat
        FROM a"""
    # attr MI: identical fixed per-cell float expression on both engines
    sql["attr_mi"] = """
        WITH j AS (SELECT lang AS x, source AS y,
                          CAST(count(*) AS BIGINT) AS c
                   FROM documents GROUP BY 1, 2),
        st AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                      CAST(count(*) AS BIGINT) AS n_cells FROM j),
        mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM j GROUP BY x),
        my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM j GROUP BY y)
        SELECT st.n AS n_rows, st.n_cells,
               (SELECT CAST(count(*) AS BIGINT) FROM mx) AS n_x,
               (SELECT CAST(count(*) AS BIGINT) FROM my) AS n_y,
               CAST(sum(CAST(floor(
                 (j.c / CAST(st.n AS DOUBLE))
                 * ln((j.c / CAST(st.n AS DOUBLE))
                      / ((mx.cx / CAST(st.n AS DOUBLE))
                         * (my.cy / CAST(st.n AS DOUBLE))))
                 * 1000000000.0) AS BIGINT)) AS BIGINT) AS mi_nanonats
        FROM j JOIN mx USING (x) JOIN my USING (y), st
        GROUP BY 1, 2, 3, 4"""
    sql["inverted_index"] = r"""
        WITH toks AS (
          SELECT DISTINCT doc_id, unnest(list_filter(
            regexp_split_to_array(text, '\s+'), x -> x != '')) AS tok
          FROM documents)
        SELECT tok AS token, CAST(count(*) AS BIGINT) AS df,
               array_to_string(list_sort(list(doc_id)), ',') AS postings,
               false AS truncated
        FROM toks GROUP BY tok"""
    sql["corpus_report"] = r"""
        WITH tok AS (
          SELECT source, lang, n_chars,
                 len(list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x != '')) AS nt,
                 md5(text) AS h
          FROM documents),
        base AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(nt) AS BIGINT) AS n_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS n_chars,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_en
          FROM tok GROUP BY source),
        g AS (SELECT source, h, count(*) AS n FROM tok GROUP BY 1, 2),
        d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct_texts,
                     CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_groups
              FROM g GROUP BY source)
        SELECT base.*, d.n_distinct_texts, d.n_dup_groups
        FROM base JOIN d USING (source)"""
    sql["doc_chunks"] = f"""
        WITH tk AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM documents),
        ch AS (
          SELECT doc_id, tk,
                 CAST(u.s // {DOC_CHUNK_STRIDE} AS BIGINT) AS chunk_idx, u.s AS s
          FROM tk, unnest(range(0, len(tk), {DOC_CHUNK_STRIDE})) AS u(s)),
        tok AS (
          SELECT doc_id, chunk_idx,
                 CAST({_fnv_sql('tk[j.i]')} % 65536 AS BIGINT) AS tid
          FROM ch, unnest(range(s + 1, least(s + {DOC_CHUNK_SIZE}, len(tk)) + 1)) AS j(i))
        SELECT doc_id, chunk_idx, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(tid) AS BIGINT) AS tok_sum
        FROM tok GROUP BY 1, 2"""
    def _pack_sql(doc_rel: str, seq_len: int) -> str:
        return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
          FROM {doc_rel}),
        base AS (
          SELECT doc_id, tk,
                 COALESCE(sum(len(tk)) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
          FROM toks),
        tok AS (
          SELECT doc_id, CAST((b + u.i - 1) // {seq_len} AS BIGINT) AS seq_id,
                 CAST({_fnv_sql('tk[u.i]')} % 65536 AS BIGINT) AS tid
          FROM base, unnest(range(1, len(tk) + 1)) AS u(i))
        SELECT seq_id, CAST(sum(tid) AS BIGINT) AS tok_sum,
               CAST(count(*) AS BIGINT) AS n_tok,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM tok GROUP BY seq_id"""

    sql["pack_export"] = _pack_sql("documents", 2048)
    sql["corpus_pack"] = _pack_sql(r"""(
          SELECT d.doc_id, d.text FROM documents d JOIN (
            SELECT min(doc_id) AS doc_id
            FROM (
              SELECT doc_id, lang, text,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
                     length(text) AS n_chars
              FROM documents)
            WHERE n_tokens >= 5 AND n_alpha * 2 >= n_chars
              AND lang IN ('en', 'de', 'fr')
            GROUP BY md5(text)) k USING (doc_id))""", 1024)
    sql["token_budget"] = r"""
        WITH t AS (
          SELECT doc_id, md5(text) AS h,
                 CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                      x -> x != '')) AS BIGINT) AS n
          FROM documents),
        c AS (
          SELECT doc_id, n,
                 CAST(COALESCE(sum(n) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
          FROM t)
        SELECT doc_id, n AS n_tokens, cum_before
        FROM c WHERE cum_before < 8192"""
    sql["table_profile"] = " UNION ALL ".join(
        f"""SELECT '{c}' AS col_name, count(*) AS n,
               count(*) - count({c}) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               {f'min({c})' if is_int else 'CAST(NULL AS BIGINT)'} AS min_i,
               {f'max({c})' if is_int else 'CAST(NULL AS BIGINT)'} AS max_i
            FROM events"""
        for c, is_int in [("event_id", True), ("user_id", True),
                          ("event_type", False), ("props", False)])
    sql["global_quantiles"] = f"""
        WITH d AS (
          SELECT CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1) AS BIGINT) AS v
          FROM {T} WHERE {SQL_IS_TOOL})
        SELECT CAST(0.5 AS DOUBLE) AS q, quantile_disc(v, 0.5) AS value FROM d
        UNION ALL
        SELECT CAST(0.95 AS DOUBLE), quantile_disc(v, 0.95) FROM d
        UNION ALL
        SELECT CAST(0.99 AS DOUBLE), quantile_disc(v, 0.99) FROM d"""
    _pq_cte = """
        WITH pos AS (
          SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS dim,
                 CAST(embedding[t.i] AS DOUBLE) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        st AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM pos GROUP BY dim),
        q AS (
          SELECT vec_id, dim, dim // 8 AS sub,
                 CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
                      ELSE CAST(floor((x - lo) * (255.0 / (hi - lo)) + 0.5) AS BIGINT)
                 END AS qv
          FROM pos JOIN st USING (dim)),
        cb AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code,
                 vec_id AS cvid
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        cq AS (SELECT cb.code, q.dim, q.qv AS cqv
               FROM cb JOIN q ON q.vec_id = cb.cvid),
        dist AS (
          SELECT q.vec_id, q.sub, cq.code,
                 sum((q.qv - cq.cqv) * (q.qv - cq.cqv)) AS d2
          FROM q JOIN cq ON q.dim = cq.dim
          GROUP BY 1, 2, 3),
        codes AS (
          SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2, code) AS rn
            FROM dist)
          WHERE rn = 1)"""
    sql["pq_codes"] = _pq_cte + """
        SELECT vec_id, CAST(sub AS INTEGER) AS sub, code FROM codes"""
    sql["pq_search"] = _pq_cte + """,
        qq AS (SELECT dim, sub, qv FROM q WHERE vec_id = 0),
        dtab AS (
          SELECT qq.sub, cq.code,
                 sum((qq.qv - cq.cqv) * (qq.qv - cq.cqv)) AS d2
          FROM qq JOIN cq ON qq.dim = cq.dim
          GROUP BY 1, 2)
        SELECT c.vec_id, CAST(sum(t.d2) AS BIGINT) AS adc
        FROM codes c JOIN dtab t ON t.sub = c.sub AND t.code = c.code
        GROUP BY 1
        ORDER BY adc, c.vec_id LIMIT 10"""
    # interpolated Kneser-Ney: same positions CTE; continuation terms use
    # the fixed expression greatest(c2-d,0)/c1 + d*left/c1 * (right/T)
    # exactly as stages/textstats.py::kn_bigram_logprob evaluates it
    sql["kn_bigram_logprob"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
          FROM documents),
        pos AS (
          SELECT doc_id, t.i AS i, tk[t.i] AS w,
                 CASE WHEN t.i > 1 THEN tk[t.i - 1] END AS wp
          FROM toks, unnest(range(1, len(tk) + 1)) AS t(i)),
        c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY w),
        tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM c1),
        c2 AS (SELECT wp, w, CAST(count(*) AS BIGINT) AS c
               FROM pos WHERE wp IS NOT NULL GROUP BY 1, 2),
        lft AS (SELECT wp, CAST(count(*) AS BIGINT) AS n FROM c2 GROUP BY wp),
        rgt AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM c2 GROUP BY w),
        ts AS (SELECT CAST(count(*) AS DOUBLE) AS ty FROM c2),
        terms AS (
          SELECT p.doc_id,
                 CASE WHEN p.wp IS NULL
                      THEN CAST(floor(ln(u.c / t.s) * 1e6) AS BIGINT)
                      ELSE CAST(floor(ln(
                        greatest(b.c - 0.75, 0) / up.c
                        + 0.75 * l.n / up.c * (r.n / ts.ty)) * 1e6) AS BIGINT)
                 END AS lp
          FROM pos p
          JOIN c1 u ON u.w = p.w
          LEFT JOIN c1 up ON up.w = p.wp
          LEFT JOIN c2 b ON b.wp = p.wp AND b.w = p.w
          LEFT JOIN lft l ON l.wp = p.wp
          LEFT JOIN rgt r ON r.w = p.w
          CROSS JOIN tot t CROSS JOIN ts)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(lp) AS BIGINT) AS lp_unat
        FROM terms GROUP BY doc_id"""
    sql["bigram_logprob"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
          FROM documents),
        pos AS (
          SELECT doc_id, t.i AS i, tk[t.i] AS w,
                 CASE WHEN t.i > 1 THEN tk[t.i - 1] END AS wp
          FROM toks, unnest(range(1, len(tk) + 1)) AS t(i)),
        c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY w),
        tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s,
                       CAST(count(*) AS BIGINT) AS v FROM c1),
        c2 AS (SELECT wp, w, CAST(count(*) AS BIGINT) AS c
               FROM pos WHERE wp IS NOT NULL GROUP BY 1, 2),
        terms AS (
          SELECT p.doc_id,
                 CASE WHEN p.wp IS NULL
                      THEN CAST(floor(ln(u.c / t.s) * 1e6) AS BIGINT)
                      ELSE CAST(floor(ln((COALESCE(b.c, 0) + 1.0)
                                         / (up.c + t.v)) * 1e6) AS BIGINT)
                 END AS lp
          FROM pos p
          JOIN c1 u ON u.w = p.w
          LEFT JOIN c1 up ON up.w = p.wp
          LEFT JOIN c2 b ON b.wp = p.wp AND b.w = p.w
          CROSS JOIN tot t)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(lp) AS BIGINT) AS lp_unat
        FROM terms GROUP BY doc_id"""
    sql["norm_dedup"] = f"""
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_hash,
               min(conv_id || '#' || CAST(turn_idx AS VARCHAR)) AS keep_key,
               count(*) AS n_dups
        FROM {T}
        GROUP BY 1"""
    # k-core: chained-CTE replay of the fixed peel schedule (k=2, 3 rounds)
    _kc = [f"""e0 AS (SELECT DISTINCT least(src, dst) AS a,
                             greatest(src, dst) AS b
               FROM read_parquet('{_gdir}/*.parquet') WHERE src != dst)"""]
    _pe = "e0"
    for _r in (1, 2, 3):
        _kc.append(f"h{_r} AS (SELECT a AS v, b AS nbr FROM {_pe} "
                   f"UNION ALL SELECT b, a FROM {_pe})")
        _kc.append(f"d{_r} AS (SELECT v, count(*) AS deg FROM h{_r} GROUP BY v)")
        if _r < 3:
            _kc.append(f"k{_r} AS (SELECT v FROM d{_r} WHERE deg >= 2)")
            _kc.append(f"e{_r} AS (SELECT a, b FROM {_pe} "
                       f"WHERE a IN (SELECT v FROM k{_r}) "
                       f"AND b IN (SELECT v FROM k{_r}))")
            _pe = f"e{_r}"
    sql["kcore_peel"] = ("WITH " + ",\n".join(_kc) + """
        SELECT v AS node_id, CAST(deg AS BIGINT) AS degree
        FROM d3 WHERE deg >= 2""")
    sql["token_canonical"] = f"""
        WITH RECURSIVE prs AS (SELECT tok_a, tok_b FROM ({sql["typo_pairs"]})),
        edges AS (SELECT tok_a AS src, tok_b AS dst FROM prs
                  UNION SELECT tok_b, tok_a FROM prs),
        walk(id, lbl) AS (
          SELECT * FROM (SELECT src AS id, dst AS lbl FROM edges
                         UNION SELECT src, src FROM edges)
          UNION
          SELECT e.src, w.lbl FROM edges e JOIN walk w ON w.id = e.dst
        )
        SELECT id AS tok, MIN(lbl) AS canonical FROM walk GROUP BY id"""
    sql["retention_audit"] = """
        WITH b AS (SELECT max(epoch_us(ts)) AS now_us FROM events)
        SELECT event_type,
               CAST(sum(CASE WHEN epoch_us(ts) < now_us - 604800000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
               CAST(sum(CASE WHEN epoch_us(ts) < now_us - 604800000000
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
               CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS oldest_day,
               CAST(max(epoch_us(ts) // 86400000000) AS BIGINT) AS newest_day
        FROM events CROSS JOIN b GROUP BY event_type"""
    # local clustering coefficient: wedge-check per center (all ints
    # non-negative -> // floors in both engines)
    sql["clustering_coef"] = f"""
        WITH e AS (SELECT DISTINCT least(src, dst) AS a,
                          greatest(src, dst) AS b
                   FROM read_parquet('{_gdir}/*.parquet') WHERE src != dst),
        h AS (SELECT a AS v, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT v, count(*) AS deg FROM h GROUP BY v),
        tri AS (SELECT h1.v AS v, count(*) AS n_tri
                FROM h h1 JOIN h h2 ON h1.v = h2.v AND h1.nbr < h2.nbr
                JOIN e ON e.a = h1.nbr AND e.b = h2.nbr
                GROUP BY h1.v)
        SELECT deg.v AS node_id, CAST(deg.deg AS BIGINT) AS degree,
               CAST(COALESCE(tri.n_tri, 0) AS BIGINT) AS n_tri,
               CAST(CASE WHEN deg.deg >= 2
                    THEN COALESCE(tri.n_tri, 0) * 1000000
                         // (deg.deg * (deg.deg - 1) // 2)
                    ELSE 0 END AS BIGINT) AS cc_e6
        FROM deg LEFT JOIN tri ON tri.v = deg.v"""
    # behavioral entropy: same floor(ln*1e6) micro-nat mirror as
    # char_entropy (floor absorbs the <=1-ulp libm gap)
    sql["user_event_entropy"] = """
        WITH c AS (SELECT user_id, event_type, count(*) AS c
                   FROM events GROUP BY 1, 2),
        t AS (SELECT user_id, c,
                     sum(c) OVER (PARTITION BY user_id) AS n FROM c)
        SELECT user_id,
               CAST(max(n) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(c * CAST(floor(ln(CAST(n AS DOUBLE) / c) * 1e6)
                    AS BIGINT)) AS BIGINT) AS ent_unat
        FROM t GROUP BY user_id"""
    # UTF-8 width classes by codepoint range == encoded-width lead-byte
    # classes (RE2 \\x{..} ranges; length() is codepoints in DuckDB)
    _wcls = {"n_ascii": r"[\x{00}-\x{7F}]", "n_w2": r"[\x{80}-\x{7FF}]",
             "n_w3": r"[\x{800}-\x{FFFF}]",
             "n_w4": r"[\x{10000}-\x{10FFFF}]"}
    _wsum = ",\n               ".join(
        f"CAST(sum(length(u.text) - length(regexp_replace(u.text, "
        f"'{p}', '', 'g'))) AS BIGINT) AS {c}" for c, p in _wcls.items())
    sql["script_mix"] = f"""
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
               {_wsum}
        FROM read_parquet('{_unidir}/*.parquet') u
        JOIN documents d USING (doc_id)
        GROUP BY d.source"""
    # HITS: chained-CTE replay of the unnormalized integer recurrence
    # (2 rounds; all values non-negative ints)
    _hits_iter = """
        a{t} AS (SELECT e.dst AS v, sum(h{p}.h) AS s
                 FROM ed e JOIN h{p} ON e.src = h{p}.v GROUP BY e.dst),
        a{t}f AS (SELECT nodes.v, CAST(COALESCE(a{t}.s, 0) AS BIGINT) AS a
                  FROM nodes LEFT JOIN a{t} ON nodes.v = a{t}.v),
        hs{t} AS (SELECT e.src AS v, sum(a{t}f.a) AS s
                  FROM ed e JOIN a{t}f ON e.dst = a{t}f.v GROUP BY e.src),
        h{t} AS (SELECT nodes.v, CAST(COALESCE(hs{t}.s, 0) AS BIGINT) AS h
                 FROM nodes LEFT JOIN hs{t} ON nodes.v = hs{t}.v)"""
    sql["hits_scores"] = (f"""
        WITH ed AS (SELECT src, dst FROM read_parquet('{_gdir}/*.parquet')),
        nodes AS (SELECT range AS v FROM range({_n_docs})),
        h0 AS (SELECT v, CAST(1000000 AS BIGINT) AS h FROM nodes),"""
        + _hits_iter.format(t=1, p=0) + ","
        + _hits_iter.format(t=2, p=1) + """
        SELECT nodes.v AS node_id, a2f.a AS auth_int, h2.h AS hub_int
        FROM nodes JOIN a2f ON nodes.v = a2f.v JOIN h2 ON nodes.v = h2.v""")
    # volume trend: latency_trend's HUGEINT closed form over the hourly
    # count series (observed hours only)
    sql["volume_trend"] = """
        WITH t0 AS (SELECT min(epoch_us(ts)) // 3600000000 AS h0
                    FROM events),
        hc AS (SELECT event_type,
                      epoch_us(ts) // 3600000000 - t0.h0 AS x,
                      count(*) AS y
               FROM events CROSS JOIN t0 GROUP BY 1, 2),
        m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(x * y) AS HUGEINT) AS sxy,
                     CAST(sum(x * x) AS HUGEINT) AS sxx
              FROM hc GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n_hours,
               CAST(sy AS BIGINT) AS n_events,
               CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    ELSE CAST((1000000 * (n * sxy - sx * sy))
                              // (n * sxx - sx * sx) AS BIGINT)
               END AS slope_e6
        FROM m"""
    sql["fertility_by_lang"] = r"""
        WITH c AS (SELECT lang,
                          CAST(len(regexp_extract_all(text, '\S+'))
                               AS BIGINT) AS tok,
                          CAST(length(text) AS BIGINT) AS ch
                   FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS n_tokens,
               CAST(sum(ch) AS BIGINT) AS n_chars,
               CAST(CASE WHEN sum(tok) > 0
                    THEN sum(ch) * 1000000 // sum(tok)
                    ELSE 0 END AS BIGINT) AS chars_per_tok_e6
        FROM c GROUP BY lang"""
    sql["readability"] = r"""
        WITH c AS (SELECT doc_id,
            CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
            CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
            CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
                 AS BIGINT) AS v
        FROM documents)
        SELECT doc_id, w AS n_words, s AS n_sents, v AS n_vgroups,
               CAST(w * 1000 // greatest(s, 1) AS BIGINT)
                 AS words_per_sent_e3,
               CAST(CASE WHEN w > 0 THEN v * 1000 // w ELSE 0 END
                 AS BIGINT) AS syll_per_word_e3
        FROM c"""
    # edge overlap: common neighbors per edge == triangles containing it
    sql["edge_overlap"] = f"""
        WITH e AS (SELECT DISTINCT least(src, dst) AS a,
                          greatest(src, dst) AS b
                   FROM read_parquet('{_gdir}/*.parquet') WHERE src != dst),
        h AS (SELECT a AS v, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM h GROUP BY v),
        cn AS (SELECT e.a, e.b, count(*) AS c
               FROM e JOIN h ha ON ha.v = e.a
                      JOIN h hb ON hb.v = e.b AND hb.nbr = ha.nbr
               GROUP BY e.a, e.b)
        SELECT e.a, e.b, da.deg AS deg_a, db.deg AS deg_b,
               CAST(COALESCE(cn.c, 0) AS BIGINT) AS n_common,
               CAST(CASE WHEN da.deg + db.deg - 2 - COALESCE(cn.c, 0) > 0
                    THEN COALESCE(cn.c, 0) * 1000000
                         // (da.deg + db.deg - 2 - COALESCE(cn.c, 0))
                    ELSE 0 END AS BIGINT) AS jac_e6
        FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
        LEFT JOIN cn ON cn.a = e.a AND cn.b = e.b"""
    # anomaly hours: division-free z^2 in HUGEINT (exact at any size)
    sql["anomaly_hours"] = """
        WITH t0 AS (SELECT min(epoch_us(ts)) // 3600000000 AS h0
                    FROM events),
        hc AS (SELECT event_type,
                      epoch_us(ts) // 3600000000 - t0.h0 AS x,
                      CAST(count(*) AS HUGEINT) AS y
               FROM events CROSS JOIN t0 GROUP BY 1, 2),
        st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS hh,
                      CAST(sum(y) AS HUGEINT) AS s,
                      CAST(sum(y * y) AS HUGEINT) AS ss
               FROM hc GROUP BY 1)
        SELECT hc.event_type, CAST(hc.x AS BIGINT) AS hour_idx,
               CAST(hc.y AS BIGINT) AS n,
               CAST((st.hh * hc.y - st.s) * (st.hh * hc.y - st.s)
                    * 1000000 // (st.hh * st.ss - st.s * st.s)
                    AS BIGINT) AS zsq_e6
        FROM hc JOIN st USING (event_type)
        WHERE st.hh * st.ss - st.s * st.s > 0
          AND (st.hh * hc.y - st.s) * (st.hh * hc.y - st.s) * 1000000
              > 4000000 * (st.hh * st.ss - st.s * st.s)"""
    # exact KS over 64-char length buckets, all HUGEINT
    sql["length_ks"] = """
        WITH c AS (SELECT source, n_chars // 64 AS bk,
                          CAST(count(*) AS HUGEINT) AS c
                   FROM documents GROUP BY 1, 2),
        grid AS (SELECT s.source, b.bk
                 FROM (SELECT DISTINCT source FROM c) s
                 CROSS JOIN (SELECT DISTINCT bk FROM c) b),
        j AS (SELECT g.source, g.bk, COALESCE(c.c, 0) AS c
              FROM grid g LEFT JOIN c ON c.source = g.source
                                     AND c.bk = g.bk),
        cums AS (SELECT source, bk,
                        sum(c) OVER (PARTITION BY source ORDER BY bk) AS cs
                 FROM j),
        gc AS (SELECT bk, sum(c) OVER (ORDER BY bk) AS cg
               FROM (SELECT bk, sum(c) AS c FROM c GROUP BY bk)),
        nsrc AS (SELECT source, CAST(count(*) AS HUGEINT) AS ns
                 FROM documents GROUP BY source),
        tot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM documents)
        SELECT cums.source, CAST(nsrc.ns AS BIGINT) AS n_docs,
               CAST(max(abs(cums.cs * tot.n - gc.cg * nsrc.ns)) * 1000000
                    // (nsrc.ns * tot.n) AS BIGINT) AS ks_e6
        FROM cums JOIN gc USING (bk) JOIN nsrc USING (source)
        CROSS JOIN tot
        GROUP BY cums.source, nsrc.ns, tot.n"""
    sql["props_stats"] = r"""
        WITH k AS (SELECT event_type,
                          CAST(regexp_extract(props, '"k": (\d+)', 1)
                               AS BIGINT) AS k
                   FROM events
                   WHERE regexp_extract(props, '"k": (\d+)', 1) <> '')
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_with_k,
               CAST(sum(k) AS BIGINT) AS sum_k,
               CAST(min(k) AS BIGINT) AS min_k,
               CAST(max(k) AS BIGINT) AS max_k
        FROM k GROUP BY event_type"""
    sql["audience_overlap"] = """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
        n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
              FROM d GROUP BY 1),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     CAST(count(*) AS BIGINT) AS n_common
              FROM d a JOIN d b ON a.user_id = b.user_id
                              AND a.event_type < b.event_type
              GROUP BY 1, 2)
        SELECT type_a, type_b, n_common, na.n AS n_a, nb.n AS n_b,
               CAST(n_common * 1000000 // (na.n + nb.n - n_common)
                    AS BIGINT) AS jac_e6
        FROM p JOIN n na ON na.event_type = type_a
               JOIN n nb ON nb.event_type = type_b"""
    sql["promo_share"] = f"""
        WITH li AS (
          SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
                 {cents.format(expr='l_extendedprice * (1 - l_discount)')}
                   AS rc,
                 CAST(p_type = 'PROMO' AS BIGINT) AS promo
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT ship_year,
               CAST(sum(rc * promo) AS BIGINT) AS promo_cents,
               CAST(sum(rc) AS BIGINT) AS total_cents,
               CAST(CASE WHEN sum(rc) > 0
                    THEN sum(rc * promo) * 1000000 // sum(rc)
                    ELSE 0 END AS BIGINT) AS share_e6
        FROM li GROUP BY 1"""
    sql["supplier_rank"] = """
        SELECT n_name, s_suppkey, s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        QUALIFY row_number() OVER (
            PARTITION BY s_nationkey
            ORDER BY s_acctbal DESC, s_suppkey) <= 3"""
    # ship delay: +10000-day offset keeps // positive (trunc == floor)
    sql["ship_delay"] = """
        WITH d AS (
          SELECT o_orderpriority,
                 (epoch_us(l_shipdate) - epoch_us(o_orderdate)
                  + 10000 * 86400000000) // 86400000000 - 10000 AS v
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        c AS (SELECT o_orderpriority, v, count(*) AS n FROM d GROUP BY 1, 2),
        t AS (SELECT o_orderpriority, sum(n) AS tot FROM c GROUP BY 1),
        r AS (SELECT c.o_orderpriority, v,
                     sum(n) OVER (PARTITION BY c.o_orderpriority
                                  ORDER BY v) AS cum, t.tot
              FROM c JOIN t USING (o_orderpriority))
        SELECT o_orderpriority, CAST(max(tot) AS BIGINT) AS n_rows,
               CAST(min(CASE WHEN cum >= 50 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p50,
               CAST(min(CASE WHEN cum >= 95 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p95
        FROM r GROUP BY o_orderpriority"""
    sql["top_unshipped_orders"] = f"""
        WITH r AS (
          SELECT l_orderkey,
                 CAST(sum({cents.format(
                     expr='l_extendedprice * (1 - l_discount)')})
                      AS BIGINT) AS revenue_cents,
                 CAST(min(epoch_us(o_orderdate)) AS BIGINT)
                   AS o_orderdate_us
          FROM customer JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND l_shipdate > TIMESTAMP '1998-01-01'
          GROUP BY l_orderkey)
        SELECT l_orderkey, revenue_cents, o_orderdate_us FROM r
        QUALIFY row_number() OVER (
            ORDER BY revenue_cents DESC, l_orderkey) <= 10"""
    sql["order_priority_check"] = """
        WITH p AS (
          SELECT o_orderkey, o_orderpriority,
                 max(CAST(epoch_us(l_shipdate) - epoch_us(o_orderdate)
                          > 90 * 86400000000 AS BIGINT)) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2)
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(late) AS BIGINT) AS n_late,
               CAST(sum(late) * 1000000 // count(*) AS BIGINT) AS late_e6
        FROM p GROUP BY 1"""
    sql["big_orders"] = f"""
        WITH s AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY 1
          HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        SELECT l_orderkey, o_custkey,
               CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
               {cents.format(expr='o_totalprice')} AS total_cents, sum_qty
        FROM s JOIN orders ON l_orderkey = o_orderkey"""
    # knn: quantized entries ≤ ~530 so each 64-dim int dot ≤ 1.8e7 — the
    # DOUBLE list_inner_product sums integers far below 2^53, hence exact
    sql["knn_classify"] = """
        WITH e AS (
          SELECT vec_id, label,
                 list_transform(embedding,
                     x -> floor(CAST(x AS DOUBLE) * 1000.0)) AS q
          FROM embeddings),
        qs AS (SELECT vec_id AS qid, q FROM e WHERE vec_id % 10 = 0),
        d AS (SELECT qid, n.vec_id AS nid, n.label,
                     CAST(list_inner_product(qs.q, n.q) AS BIGINT) AS dot
              FROM qs JOIN e n ON n.vec_id != qs.qid),
        topk AS (SELECT * FROM d QUALIFY row_number() OVER (
                     PARTITION BY qid ORDER BY dot DESC, nid) <= 5),
        v AS (SELECT qid, label, count(*) AS c FROM topk GROUP BY 1, 2)
        SELECT qid AS vec_id, CAST(label AS BIGINT) AS pred_label,
               CAST(c AS BIGINT) AS n_votes
        FROM v QUALIFY row_number() OVER (
            PARTITION BY qid ORDER BY c DESC, label) = 1"""
    sql["k_anonymity"] = """
        WITH g AS (SELECT user_id, event_type, count(*) AS gs
                   FROM events GROUP BY 1, 2)
        SELECT CAST(gs AS BIGINT) AS group_size,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(gs * count(*) AS BIGINT) AS n_rows,
               CAST(gs < 5 AS BIGINT) AS at_risk
        FROM g GROUP BY gs"""
    sql["funnel_steps"] = """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
                   FROM events
                   WHERE event_type IN ('signup','view','click','purchase')),
        s0 AS (SELECT user_id, min(t) AS t FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        s1 AS (SELECT e.user_id, min(e.t) AS t FROM e
               JOIN s0 ON e.user_id = s0.user_id AND e.t > s0.t
               WHERE e.event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.t) AS t FROM e
               JOIN s1 ON e.user_id = s1.user_id AND e.t > s1.t
               WHERE e.event_type = 'click' GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.t) AS t FROM e
               JOIN s2 ON e.user_id = s2.user_id AND e.t > s2.t
               WHERE e.event_type = 'purchase' GROUP BY 1),
        u AS (SELECT CAST(0 AS BIGINT) AS step_idx, 'signup' AS step,
                     CAST(count(*) AS BIGINT) AS n_users FROM s0
              UNION ALL SELECT 1, 'view', count(*) FROM s1
              UNION ALL SELECT 2, 'click', count(*) FROM s2
              UNION ALL SELECT 3, 'purchase', count(*) FROM s3),
        c0 AS (SELECT greatest(count(*), 1) AS n0 FROM s0)
        SELECT step_idx, step, n_users,
               CAST(n_users * 1000000 // n0 AS BIGINT) AS conv_e6
        FROM u, c0"""
    # winnow_matches: same FNV polynomial as doc_fingerprint but k=16
    # grams / window 8, the SET of window minima (not the combined
    # digest), 63-bit-masked before DISTINCT exactly like the engine
    _B, _P, _M = 0xCBF29CE484222325, 1_099_511_628_211, 1 << 64
    sql["winnow_matches"] = f"""
        WITH raw AS (
          SELECT doc_id, hex(encode(text)) AS hx,
                 octet_length(encode(text)) AS n
          FROM documents),
        byt AS (
          SELECT doc_id, n, list_transform(range(1, n + 1),
            i -> CAST(16 * (ascii(substr(hx, 2*i-1, 1))
                            - CASE WHEN substr(hx, 2*i-1, 1) >= 'A'
                              THEN 55 ELSE 48 END)
                      + ascii(substr(hx, 2*i, 1))
                      - CASE WHEN substr(hx, 2*i, 1) >= 'A'
                        THEN 55 ELSE 48 END
                      AS HUGEINT)) AS bs
          FROM raw),
        gr AS (
          SELECT doc_id,
            CASE WHEN n < 16 THEN
              [list_reduce(list_prepend(CAST({_B} AS HUGEINT), bs),
                           (h, x) -> xor(h, x) * {_P} % {_M}::HUGEINT)]
            ELSE list_transform(range(1, n - 14),
              i -> list_reduce(list_prepend(CAST({_B} AS HUGEINT),
                                            list_slice(bs, i, i + 15)),
                               (h, x) -> xor(h, x) * {_P}
                                         % {_M}::HUGEINT)) END AS grams
          FROM byt),
        wn AS (
          SELECT doc_id,
            CASE WHEN len(grams) <= 8 THEN [list_min(grams)]
                 ELSE list_transform(range(1, len(grams) - 6),
                      i -> least(grams[i], grams[i+1], grams[i+2],
                                 grams[i+3], grams[i+4], grams[i+5],
                                 grams[i+6], grams[i+7])) END AS wins
          FROM gr),
        fp AS (
          SELECT DISTINCT doc_id,
                 CAST(u.x % {1 << 63} AS BIGINT) AS h
          FROM wn, unnest(wins) AS u(x)),
        keep AS (
          SELECT h FROM fp GROUP BY h HAVING count(*) <= 8),
        f2 AS (SELECT fp.doc_id, fp.h FROM fp JOIN keep USING (h))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM f2 a JOIN f2 b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 3"""
    sql["join_cardinality"] = """
        WITH l AS (SELECT l_orderkey AS k, count(*) AS c
                   FROM lineitem GROUP BY 1),
        r AS (SELECT o_orderkey AS k, count(*) AS c
              FROM orders GROUP BY 1),
        j AS (SELECT l.c * r.c AS p FROM l JOIN r USING (k))
        SELECT CAST(sum(p) AS BIGINT) AS n_join_rows,
               CAST(count(*) AS BIGINT) AS n_matched_keys,
               CAST(max(p) AS BIGINT) AS max_key_fanout
        FROM j"""
    sql["pii_density"] = f"""
        WITH c AS (
          SELECT role, {_pii_counts},
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM {T})
        SELECT role,
               CAST(sum(n_email) AS BIGINT) AS n_email,
               CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4,
               CAST(sum(n_phone) AS BIGINT) AS n_phone,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               CAST((sum(n_email) + sum(n_ipv4) + sum(n_phone))
                    * 1000000000 // greatest(sum(n_chars), 1)
                    AS BIGINT) AS pii_e9
        FROM c GROUP BY 1"""
    # mm_neardup: replay dHash from the fixture's pre-encode body_hex
    # (same _dh_gv grid math as mm_dhash) and brute-force ALL pairs at
    # Hamming <= 3 — the engine's 4x16-bit banding is pigeonhole-complete
    # at that radius, so the two sets must be identical
    from .stages.multimodal import neardup_media_path as _ndmp

    _nd_dir = _ndmp(_sfd(sf_dir))
    sql["mm_neardup"] = f"""
        WITH img AS (
          SELECT media_id, body_hex AS hx, width AS w, height AS h,
                 channels AS ch
          FROM read_parquet('{_nd_dir}/*.parquet')),
        g AS (
          SELECT media_id, u.i AS gi, v.j AS gj, {_dh_gv} AS gv
          FROM img, unnest(range(0, 8)) AS u(i), unnest(range(0, 9)) AS v(j)),
        bits AS (
          SELECT a.media_id, a.gi * 8 + a.gj AS p,
                 CASE WHEN a.gv > c.gv THEN 1 ELSE 0 END AS bit
          FROM g a JOIN g c ON c.media_id = a.media_id AND c.gi = a.gi
                           AND c.gj = a.gj + 1
          WHERE a.gj < 8),
        hsh AS (
          SELECT media_id,
                 CAST(sum(CASE WHEN p >= 32 THEN bit * (1::BIGINT << (p - 32))
                          ELSE 0 END) AS BIGINT) AS hi,
                 CAST(sum(CASE WHEN p < 32 THEN bit * (1::BIGINT << p)
                          ELSE 0 END) AS BIGINT) AS lo
          FROM bits GROUP BY media_id)
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               CAST(bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        FROM hsh a JOIN hsh b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.hi, b.hi))
              + bit_count(xor(a.lo, b.lo)) <= 3"""
    sql["user_breadth"] = """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
        pu AS (SELECT user_id, count(*) AS nt FROM d GROUP BY 1)
        SELECT CAST(nt AS BIGINT) AS n_types,
               CAST(count(*) AS BIGINT) AS n_users
        FROM pu GROUP BY 1"""
    sql["conv_verbosity"] = f"""
        SELECT conv_id,
               CAST(sum(CASE WHEN role = 'assistant' THEN length(text)
                        ELSE 0 END) AS BIGINT) AS a_chars,
               CAST(sum(CASE WHEN role = 'user' THEN length(text)
                        ELSE 0 END) AS BIGINT) AS u_chars,
               CAST(sum(CASE WHEN role = 'assistant' THEN length(text)
                        ELSE 0 END) * 1000000
                    // greatest(sum(CASE WHEN role = 'user'
                                    THEN length(text) ELSE 0 END), 1)
                    AS BIGINT) AS ratio_e6
        FROM {T} GROUP BY 1"""
    sql["value_twap"] = f"""
        WITH e AS (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS t,
                 {cents.format(expr='value')} AS c
          FROM events),
        l AS (
          SELECT event_type, c,
                 (lead(t) OVER (PARTITION BY user_id
                                ORDER BY t, event_id) - t) // 1000 AS dt
          FROM e)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(c * dt) AS BIGINT) AS sum_vdt_cms,
               CAST(sum(dt) AS BIGINT) AS sum_dt_ms,
               CAST(sum(c * dt) // greatest(sum(dt), 1) AS BIGINT)
                 AS twap_cents
        FROM l WHERE dt IS NOT NULL GROUP BY 1"""
    sql["value_mode"] = f"""
        WITH c AS (
          SELECT event_type, {cents.format(expr='value')} AS cents,
                 count(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT event_type, CAST(cents AS BIGINT) AS mode_cents,
               CAST(n AS BIGINT) AS n_mode
        FROM c QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY n DESC, cents) = 1"""
    sql["type_correlation"] = """
        WITH c AS (SELECT event_type AS t,
                          epoch_us(ts) // 3600000000 AS h,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
        s AS (SELECT t, sum(n) AS sx, sum(n * n) AS sxx FROM c GROUP BY 1),
        g AS (SELECT max(h) - min(h) + 1 AS nh FROM c),
        p AS (SELECT a.t AS ta, b.t AS tb, sum(a.n * b.n) AS sxy
              FROM c a JOIN c b ON a.h = b.h AND a.t < b.t GROUP BY 1, 2)
        SELECT sa.t AS type_a, sb.t AS type_b,
               CAST(nh AS BIGINT) AS n_hours,
               CAST(coalesce(p.sxy, 0) AS BIGINT) AS sxy,
               CAST(sa.sx AS BIGINT) AS sx_a, CAST(sb.sx AS BIGINT) AS sx_b,
               CAST(sa.sxx AS BIGINT) AS sxx_a,
               CAST(sb.sxx AS BIGINT) AS sxx_b
        FROM s sa JOIN s sb ON sa.t < sb.t
        LEFT JOIN p ON p.ta = sa.t AND p.tb = sb.t, g"""
    # mmr_select: generated chained-CTE greedy program, one pick CTE per
    # round (the bpe_train pattern) — round 1 has no penalty (max over the
    # empty selected set is 0), later rounds re-rank the remaining
    # candidates with max-sim penalties against every pick so far
    _MK, _ML = 5, 700
    _mmr = ["""e AS MATERIALIZED (
          SELECT vec_id, list_transform(embedding,
              x -> floor(CAST(x AS DOUBLE) * 1000.0)) AS q
          FROM embeddings)""",
            """rel AS MATERIALIZED (
          SELECT e.vec_id, CAST(list_inner_product(
              e.q, (SELECT q FROM e WHERE vec_id = 0)) AS BIGINT) AS r
          FROM e WHERE e.vec_id != 0)"""]
    _picked: list[int] = []
    for _r in range(1, _MK + 1):
        if not _picked:
            _mmr.append(f"""p1 AS (
          SELECT rel.vec_id, CAST({_ML} * rel.r AS BIGINT) AS score
          FROM rel
          QUALIFY row_number() OVER (
              ORDER BY {_ML} * rel.r DESC, rel.vec_id) = 1)""")
        else:
            _sel = " UNION ALL ".join(f"SELECT vec_id FROM p{i}"
                                      for i in _picked)
            _mmr.append(f"""pen{_r} AS (
          SELECT rel.vec_id, rel.r,
                 max(CAST(list_inner_product(ce.q, se.q) AS BIGINT)) AS p
          FROM rel JOIN e ce ON ce.vec_id = rel.vec_id,
               (SELECT q FROM e WHERE vec_id IN ({_sel})) se
          WHERE rel.vec_id NOT IN ({_sel})
          GROUP BY 1, 2)""")
            _mmr.append(f"""p{_r} AS (
          SELECT vec_id,
                 CAST({_ML} * r - {1000 - _ML} * p AS BIGINT) AS score
          FROM pen{_r}
          QUALIFY row_number() OVER (
              ORDER BY {_ML} * r - {1000 - _ML} * p DESC, vec_id) = 1)""")
        _picked.append(_r)
    _mmr_final = " UNION ALL ".join(
        f"SELECT {i} AS mmr_rank, vec_id, score FROM p{i}" for i in _picked)
    sql["mmr_select"] = ("WITH " + ",\n        ".join(_mmr)
                         + f"""
        SELECT CAST(mmr_rank AS BIGINT) AS rank, vec_id, score
        FROM ({_mmr_final})""")
    sql["path_ngrams"] = """
        WITH o AS (
          SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 14400000000 THEN 1 ELSE 0 END AS ns
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        g AS (SELECT user_id, event_type, t, event_id,
                     sum(ns) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS s
              FROM o),
        tri AS (
          SELECT event_type || '>' || lead(event_type, 1) OVER w
                 || '>' || lead(event_type, 2) OVER w AS path,
                 s, lead(s, 2) OVER w AS s2
          FROM g WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
        SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM tri WHERE s = s2 GROUP BY 1"""
    sql["label_centroids"] = """
        WITH q AS (
          SELECT label, t.i - 1 AS dim,
                 CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0)
                      AS BIGINT) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        s AS (SELECT label, dim, sum(x) AS s, count(*) AS c
              FROM q GROUP BY 1, 2)
        SELECT CAST(a.label AS BIGINT) AS label_a,
               CAST(b.label AS BIGINT) AS label_b,
               CAST(max(a.c) AS BIGINT) AS n_a,
               CAST(max(b.c) AS BIGINT) AS n_b,
               CAST(sum((CAST(a.s AS HUGEINT) * b.c - CAST(b.s AS HUGEINT)
                         * a.c) * (CAST(a.s AS HUGEINT) * b.c
                                   - CAST(b.s AS HUGEINT) * a.c))
                    // (CAST(max(a.c) AS HUGEINT) * max(b.c)
                        * max(a.c) * max(b.c)) AS BIGINT) AS dist2_q
        FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
        GROUP BY 1, 2"""
    sql["nation_trade_volume"] = f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum({cents.format(
                   expr='l_extendedprice * (1 - l_discount)')})
                    AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY 1, 2, 3"""
    sql["returned_revenue"] = f"""
        WITH r AS (
          SELECT o_custkey,
                 CAST(sum({cents.format(
                     expr='l_extendedprice * (1 - l_discount)')})
                      AS BIGINT) AS revenue_cents
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R' GROUP BY 1)
        SELECT c_custkey, c_name, n_name, revenue_cents
        FROM r JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
        QUALIFY row_number() OVER (
            ORDER BY revenue_cents DESC, c_custkey) <= 20"""
    # doc_vectors: dim = first 48 md5 bits of the token, mod 32 — the
    # _MD5H hex-walk fragment defined above for the bloom/cms replays
    _DVH = _MD5H.format(off=1).replace("md5(g)", "md5(tok)")
    sql["doc_vectors"] = rf"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                    x -> x != '')) AS tok
          FROM documents)
        SELECT doc_id, CAST({_DVH} % 32 AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2"""
    sql["tool_chains"] = f"""
        WITH f AS (SELECT conv_id, tool, epoch_us(ts) AS t, turn_idx
                   FROM {T} WHERE tool IS NOT NULL AND tool != ''),
        tri AS (
          SELECT tool || '>' || lead(tool, 1) OVER w
                 || '>' || lead(tool, 2) OVER w AS path
          FROM f WINDOW w AS (PARTITION BY conv_id ORDER BY t, turn_idx))
        SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM tri WHERE path IS NOT NULL GROUP BY 1"""
    sql["new_unique_docs"] = f"""
        WITH v1 AS (SELECT md5(text) AS h FROM documents),
        v2 AS (SELECT md5(text) AS h, doc_id, source
               FROM read_parquet('{_v2dir}/*.parquet'))
        SELECT h, doc_id, source FROM v2
        WHERE h NOT IN (SELECT h FROM v1)"""
    sql["first_response"] = f"""
        WITH b AS (SELECT conv_id, turn_idx, role, epoch_us(ts) AS us
                   FROM {T}),
        u AS (SELECT conv_id, turn_idx AS fu, us AS fu_us FROM b
              WHERE role = 'user'
              QUALIFY row_number() OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) = 1),
        a AS (SELECT b.conv_id, b.turn_idx AS fa, b.us AS fa_us
              FROM b JOIN u USING (conv_id)
              WHERE role = 'assistant' AND b.turn_idx > u.fu
              QUALIFY row_number() OVER (
                  PARTITION BY b.conv_id ORDER BY b.turn_idx) = 1)
        SELECT u.conv_id, CAST(u.fu AS BIGINT) AS user_turn,
               CAST(a.fa AS BIGINT) AS assist_turn,
               CAST(a.fa_us - u.fu_us AS BIGINT) AS response_us
        FROM u JOIN a USING (conv_id)"""
    # mm_clipping: replay rail samples (0x00 / 0xFF) from the pre-encode
    # body_hex; clip runs become gap-and-island groups (i - row_number)
    sql["mm_clipping"] = f"""
        WITH au AS (
          SELECT media_id, body_hex AS hx, width AS w
          FROM read_parquet('{media_dir}/*.parquet') WHERE kind = 'audio'),
        b AS (
          SELECT media_id, w, t.i AS i,
                 {_hd.format(p='2 * t.i + 1')} AS byte
          FROM au, unnest(range(0, w)) AS t(i)),
        c AS (SELECT media_id, i FROM b WHERE byte IN (0, 255)),
        r AS (SELECT media_id,
                     i - row_number() OVER (PARTITION BY media_id
                                            ORDER BY i) AS grp
              FROM c),
        runs AS (SELECT media_id, grp, count(*) AS run_len
                 FROM r GROUP BY 1, 2),
        agg AS (SELECT media_id, CAST(max(run_len) AS BIGINT) AS max_run,
                       CAST(sum(run_len) AS BIGINT) AS n_clip
                FROM runs GROUP BY 1)
        SELECT au.media_id, CAST(au.w AS BIGINT) AS n_samples,
               coalesce(agg.n_clip, 0) AS n_clipped,
               coalesce(agg.max_run, 0) AS max_clip_run
        FROM au LEFT JOIN agg ON au.media_id = agg.media_id"""
    sql["local_supplier_volume"] = f"""
        SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum({cents.format(
                   expr='l_extendedprice * (1 - l_discount)')})
                    AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_nationkey = c_nationkey
        GROUP BY 1, 2"""
    sql["depth_profile"] = f"""
        SELECT role, CAST(least(turn_idx, 16) AS BIGINT) AS depth,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(sum(length(text)) AS BIGINT) AS sum_chars
        FROM {T} GROUP BY 1, 2"""
    sql["forecast_revenue"] = f"""
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum({cents.format(
                   expr='l_extendedprice * l_discount')}) AS BIGINT)
                 AS revenue_cents
        FROM lineitem
        WHERE year(l_shipdate) = 1998 AND l_quantity < 24
          AND l_discount >= 0.05 AND l_discount <= 0.07"""
    sql["source_top_terms"] = r"""
        WITH tk AS (
          SELECT source,
                 unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                    x -> x != '')) AS tok
          FROM documents),
        c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
              FROM tk GROUP BY 1, 2)
        SELECT source, n, tok FROM c
        QUALIFY row_number() OVER (
            PARTITION BY source ORDER BY n DESC, tok) <= 5"""
    # mm_decode_errors: the corruption overlay is deterministic
    # (media_id % 5 truncated below every container's minimum parseable
    # size), so ok replays directly from the id
    from .stages.multimodal import corrupt_media_path as _cmp

    _cm_dir = _cmp(_sfd(sf_dir))
    sql["mm_decode_errors"] = f"""
        SELECT media_id, codec,
               CAST(media_id % 5 != 0 AS BIGINT) AS ok
        FROM read_parquet('{_cm_dir}/*.parquet')"""
    sql["control_char_audit"] = f"""
        WITH z AS (
          SELECT u.doc_id, d.source,
                 CAST(len(regexp_extract_all(u.text, '{_ZAP}'))
                      AS BIGINT) AS zap,
                 CAST(length(u.text) AS BIGINT) AS chars
          FROM read_parquet('{_unidir}/*.parquet') u
          JOIN documents d USING (doc_id))
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(zap > 0 AS BIGINT)) AS BIGINT)
                 AS n_docs_affected,
               CAST(sum(zap) AS BIGINT) AS n_zap_chars,
               CAST(sum(chars) AS BIGINT) AS n_chars
        FROM z GROUP BY 1"""
    sql["mix_entropy"] = r"""
        WITH c AS (
          SELECT source,
                 sum(len(regexp_extract_all(text, '\S+'))) AS c
          FROM documents GROUP BY 1),
        n AS (SELECT sum(c) AS n FROM c)
        SELECT CAST(count(*) AS BIGINT) AS n_sources,
               CAST(max(n.n) AS BIGINT) AS n_tokens,
               CAST(sum(c * CAST(floor(ln(CAST(n.n AS DOUBLE) / c) * 1e6)
                    AS BIGINT)) AS BIGINT) AS ent_unat
        FROM c, n"""
    # mm_dup_clusters: min-label CC over the mm_neardup pair set — the
    # token_canonical recursive-walk construction (components here are
    # planted 2-cliques, so the walk stays tiny)
    sql["mm_dup_clusters"] = f"""
        WITH RECURSIVE prs AS (
          SELECT media_a, media_b FROM ({sql["mm_neardup"]})),
        edges AS (SELECT media_a AS src, media_b AS dst FROM prs
                  UNION SELECT media_b, media_a FROM prs),
        walk(id, lbl) AS (
          SELECT * FROM (SELECT src AS id, dst AS lbl FROM edges
                         UNION SELECT src, src FROM edges)
          UNION
          SELECT e.src, w.lbl FROM edges e JOIN walk w ON w.id = e.dst
        ),
        lab AS (SELECT id AS media_id, MIN(lbl) AS cluster_id
                FROM walk GROUP BY id)
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
        FROM lab GROUP BY 1"""
    sql["session_durations"] = """
        WITH o AS (
          SELECT user_id, epoch_us(ts) AS t, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800000000 THEN 1 ELSE 0 END AS ns
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        g AS (SELECT user_id, t,
                     sum(ns) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS s
              FROM o),
        d AS (SELECT (max(t) - min(t)) // 1000000 AS v
              FROM g GROUP BY user_id, s),
        c AS (SELECT v, count(*) AS n FROM d GROUP BY 1),
        tt AS (SELECT sum(n) AS tot FROM c),
        r AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum, tot FROM c, tt)
        SELECT CAST(max(tot) AS BIGINT) AS n_sessions,
               CAST(min(CASE WHEN cum >= 50 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p50_s,
               CAST(min(CASE WHEN cum >= 95 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p95_s,
               CAST(max(v) AS BIGINT) AS max_s
        FROM r"""
    sql["cumulative_users"] = """
        WITH f AS (SELECT user_id,
                          min(epoch_us(ts) // 86400000000) AS d
                   FROM events GROUP BY 1),
        p AS (SELECT d AS day, count(*) AS n_new FROM f GROUP BY 1)
        SELECT CAST(day AS BIGINT) AS day, CAST(n_new AS BIGINT) AS n_new,
               CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS n_cum
        FROM p"""
    sql["dup_rate_curve"] = f"""
        WITH h AS (SELECT md5(text) AS h,
                          epoch_us(ts) // 86400000000 AS day
                   FROM {T}),
        f AS (SELECT h, min(day) AS fd FROM h GROUP BY 1)
        SELECT CAST(day AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(day > fd AS BIGINT)) AS BIGINT) AS n_dups,
               CAST(sum(CAST(day > fd AS BIGINT)) * 1000000 // count(*)
                    AS BIGINT) AS dup_e6
        FROM h JOIN f USING (h) GROUP BY 1"""
    sql["role_vocab_overlap"] = rf"""
        WITH d AS (
          SELECT DISTINCT role,
                 unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                    x -> x != '')) AS tok
          FROM {T}),
        n AS (SELECT role, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        p AS (SELECT a.role AS role_a, b.role AS role_b,
                     CAST(count(*) AS BIGINT) AS n_common
              FROM d a JOIN d b ON a.tok = b.tok AND a.role < b.role
              GROUP BY 1, 2)
        SELECT role_a, role_b, n_common, na.n AS n_a, nb.n AS n_b,
               CAST(n_common * 1000000 // (na.n + nb.n - n_common)
                    AS BIGINT) AS jac_e6
        FROM p JOIN n na ON na.role = role_a
               JOIN n nb ON nb.role = role_b"""
    sql["mm_silence"] = f"""
        WITH au AS (
          SELECT media_id, body_hex AS hx, width AS w
          FROM read_parquet('{media_dir}/*.parquet')
          WHERE kind = 'audio' AND w >= 64),
        e AS (
          SELECT media_id, t.i // 64 AS f,
                 sum(({_hd.format(p='2 * t.i + 1')} - 128)
                     * ({_hd.format(p='2 * t.i + 1')} - 128)) AS energy
          FROM au, unnest(range(0, (w // 64) * 64)) AS t(i)
          GROUP BY 1, 2),
        c AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
                     CAST(sum(CAST(energy < 300000 AS BIGINT)) AS BIGINT)
                       AS n_quiet
              FROM e GROUP BY 1)
        SELECT media_id, n_frames, n_quiet,
               CAST(n_quiet * 1000000 // n_frames AS BIGINT) AS quiet_e6
        FROM c"""
    sql["conv_roundtrips"] = f"""
        WITH b AS (
          SELECT conv_id, role,
                 lead(role) OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx) AS nxt
          FROM {T}),
        per AS (SELECT conv_id,
                       CAST(sum(CASE WHEN role = 'user'
                                AND nxt = 'assistant' THEN 1 ELSE 0 END)
                            AS BIGINT) AS r
                FROM b GROUP BY 1)
        SELECT r AS n_roundtrips, CAST(count(*) AS BIGINT) AS n_convs
        FROM per GROUP BY 1"""
    sql["shard_balance"] = """
        WITH h AS (
          SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substr(md5(text), 1, 4), ''),
                     c -> CAST(ascii(c) - CASE WHEN c >= 'a' THEN 87
                               ELSE 48 END AS BIGINT))),
                 (h, x) -> h * 16 + x) % 16 AS shard,
                 len(regexp_extract_all(text, '\\S+')) AS toks
          FROM documents),
        s AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(toks) AS BIGINT) AS n_tokens
              FROM h GROUP BY 1),
        t AS (SELECT greatest(sum(n_tokens), 1) AS tot FROM s)
        SELECT shard, n_docs, n_tokens,
               CAST(n_tokens * 1000000 // tot AS BIGINT) AS share_e6
        FROM s, t"""
    sql["order_seasonality"] = """
        WITH m AS (
          SELECT n_name, CAST(month(o_orderdate) AS BIGINT) AS month,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2)
        SELECT n_name, month, n_orders,
               CAST(n_orders * 1000000
                    // sum(n_orders) OVER (PARTITION BY n_name)
                    AS BIGINT) AS share_e6
        FROM m"""
    sql["tenure_mix"] = """
        WITH d AS (SELECT user_id, event_type,
                          epoch_us(ts) // 86400000000 AS day
                   FROM events),
        f AS (SELECT user_id, min(day) AS fd FROM d GROUP BY 1),
        b AS (SELECT CASE WHEN day - fd = 0 THEN 0
                          WHEN day - fd <= 7 THEN 1
                          WHEN day - fd <= 30 THEN 2 ELSE 3 END
                       AS tenure_bucket,
                     event_type
              FROM d JOIN f USING (user_id))
        SELECT CAST(tenure_bucket AS BIGINT) AS tenure_bucket, event_type,
               CAST(count(*) AS BIGINT) AS n_events
        FROM b GROUP BY 1, 2"""
    sql["user_mix_kl"] = """
        WITH c AS (SELECT user_id, event_type, count(*) AS c
                   FROM events GROUP BY 1, 2),
        g AS (SELECT event_type, sum(c) AS ct FROM c GROUP BY 1),
        n AS (SELECT sum(ct) AS n FROM g),
        t AS (SELECT user_id, c.c, g.ct,
                     sum(c.c) OVER (PARTITION BY user_id) AS nu
              FROM c JOIN g USING (event_type))
        SELECT user_id, CAST(max(nu) AS BIGINT) AS n_events,
               CAST(sum(c * CAST(floor(ln((CAST(c AS DOUBLE) * n.n)
                    / (CAST(nu AS DOUBLE) * ct)) * 1e6) AS BIGINT))
                    AS BIGINT) AS kl_unat
        FROM t, n GROUP BY user_id"""
    sql["conversion_delay"] = """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                   FROM events
                   WHERE event_type IN ('signup', 'purchase')),
        s AS (SELECT user_id, min(us) AS s_us FROM e
              WHERE event_type = 'signup' GROUP BY 1),
        p AS (SELECT e.user_id, min(e.us) AS p_us FROM e
              JOIN s ON e.user_id = s.user_id AND e.us > s.s_us
              WHERE e.event_type = 'purchase' GROUP BY 1),
        d AS (SELECT (p_us - s_us) // 3600000000 AS v
              FROM p JOIN s USING (user_id)),
        c AS (SELECT v, count(*) AS n FROM d GROUP BY 1),
        tt AS (SELECT sum(n) AS tot FROM c),
        r AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum, tot FROM c, tt)
        SELECT CAST(max(tot) AS BIGINT) AS n_converted,
               CAST(min(CASE WHEN cum >= 50 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p50_h,
               CAST(min(CASE WHEN cum >= 95 * (tot - 1) // 100 + 1
                        THEN v END) AS BIGINT) AS p95_h,
               CAST(max(v) AS BIGINT) AS max_h
        FROM r"""
    sql["lang_confusion"] = f"""
        WITH l AS ({lang_id_oracle_sql("documents")})
        SELECT d.lang, l.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents d JOIN l USING (doc_id) GROUP BY 1, 2"""
    # template_drift: same masks as log_templates, same sign-safe PSI as
    # value_psi, bins = templates
    from .stages.parse import TEMPLATE_MASKS as _TM

    _tm_expr = "text"
    for _pat, _repl in _TM:
        _pq = _pat.replace("'", "''")
        _tm_expr = f"regexp_replace({_tm_expr}, '{_pq}', '{_repl}', 'g')"
    sql["template_drift"] = f"""
        WITH mm AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                      AS mid FROM {T}),
        g AS (
          SELECT {_tm_expr} AS template,
                 sum(CASE WHEN epoch_us(ts) < mid THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN epoch_us(ts) < mid THEN 0 ELSE 1 END) AS c2
          FROM {T}, mm GROUP BY 1),
        n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM g),
        terms AS (
          SELECT CAST(c1 > 0 AND c2 > 0 AS BIGINT) AS common,
                 CAST(c1 > 0 AND c2 = 0 AS BIGINT) AS only1,
                 CAST(c1 = 0 AND c2 > 0 AS BIGINT) AS only2,
                 CASE WHEN c1 > 0 AND c2 > 0 THEN
                   (c1 * n.n2 - c2 * n.n1)
                   * CAST(floor(ln(CAST(c1 * n.n2 AS DOUBLE)
                                   / CAST(c2 * n.n1 AS DOUBLE)) * 1e6)
                          AS HUGEINT)
                 ELSE 0 END AS num
          FROM g, n)
        SELECT CAST(sum(common) AS BIGINT) AS n_templates_common,
               CAST(sum(only1) AS BIGINT) AS n_only_first,
               CAST(sum(only2) AS BIGINT) AS n_only_second,
               CAST(sum(num) // (max(n.n1) * max(n.n2)) AS BIGINT)
                 AS psi_e6
        FROM terms, n"""
    sql["length_gini"] = r"""
        WITH v AS (SELECT source,
                          CAST(len(regexp_extract_all(text, '\S+'))
                               AS BIGINT) AS v
                   FROM documents),
        r AS (SELECT source, v, row_number() OVER (
                  PARTITION BY source ORDER BY v) AS i FROM v),
        a AS (SELECT source, count(*) AS n, sum(v) AS t,
                     sum(i * v) AS s1
              FROM r GROUP BY 1)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               CAST(t AS BIGINT) AS token_sum,
               CAST((2 * s1 - (n + 1) * t) * 1000000
                    // greatest(n * t, 1) AS BIGINT) AS gini_e6
        FROM a"""
    sql["revenue_grouping_sets"] = f"""
        SELECT CAST(CASE WHEN GROUPING(n_name) = 0 AND GROUPING(yr) = 0
                         THEN 0
                         WHEN GROUPING(n_name) = 0 THEN 1
                         WHEN GROUPING(yr) = 0 THEN 2
                         ELSE 3 END AS BIGINT) AS grouping_id,
               n_name, CAST(yr AS BIGINT) AS order_year,
               CAST(sum(c) AS BIGINT) AS revenue_cents
        FROM (
          SELECT n_name, year(o_orderdate) AS yr,
                 {cents.format(expr='o_totalprice')} AS c
          FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey)
        GROUP BY GROUPING SETS ((n_name, yr), (n_name), (yr), ())"""
    sql["corpus_health"] = rf"""
        WITH s AS (
          SELECT source, count(*) AS n_docs,
                 sum(len(regexp_extract_all(text, '\S+'))) AS c,
                 sum(len(regexp_extract_all(text, '{_ZAP}'))) AS zap
          FROM documents GROUP BY 1),
        t AS (SELECT sum(c) AS n FROM s),
        h AS (SELECT count(DISTINCT md5(text)) AS nc FROM documents)
        SELECT CAST(sum(s.n_docs) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_sources,
               CAST(max(t.n) AS BIGINT) AS n_tokens,
               CAST(sum(s.c * CAST(floor(ln(CAST(greatest(t.n, 1) AS DOUBLE)
                    / greatest(s.c, 1)) * 1e6) AS BIGINT)) AS BIGINT)
                 AS mix_ent_unat,
               CAST(max(s.c) * 1000000 // greatest(max(t.n), 1) AS BIGINT)
                 AS top_source_share_e6,
               CAST(max(h.nc) AS BIGINT) AS n_content_hashes,
               CAST(sum(s.zap) AS BIGINT) AS n_zap_chars
        FROM s, t, h"""
    # mm_sharpness: the dHash luma/floor-grid rules at 16x16, Laplacian
    # via 4 neighbor self-joins over the grid interior
    _sh_b = [_hd.format(
        p=f"2 * ((((u.i * h) // 16 * w + (v.j * w) // 16) * ch + {c}) "
          f"+ 0) + 1") for c in (0, 1, 2)]
    _sh_gv = (f"CASE WHEN ch >= 3 THEN (299 * {_sh_b[0]} + 587 * {_sh_b[1]}"
              f" + 114 * {_sh_b[2]}) // 1000 ELSE {_sh_b[0]} END")
    sql["mm_sharpness"] = f"""
        WITH img AS (
          SELECT media_id, body_hex AS hx, width AS w, height AS h,
                 channels AS ch
          FROM read_parquet('{media_dir}/*.parquet') WHERE kind = 'image'),
        g AS (
          SELECT media_id, u.i AS gi, v.j AS gj, {_sh_gv} AS gv
          FROM img, unnest(range(0, 16)) AS u(i),
               unnest(range(0, 16)) AS v(j)),
        lap AS (
          SELECT c.media_id,
                 4 * c.gv - up.gv - dn.gv - lf.gv - rt.gv AS l
          FROM g c
          JOIN g up ON up.media_id = c.media_id AND up.gi = c.gi - 1
                    AND up.gj = c.gj
          JOIN g dn ON dn.media_id = c.media_id AND dn.gi = c.gi + 1
                    AND dn.gj = c.gj
          JOIN g lf ON lf.media_id = c.media_id AND lf.gi = c.gi
                    AND lf.gj = c.gj - 1
          JOIN g rt ON rt.media_id = c.media_id AND rt.gi = c.gi
                    AND rt.gj = c.gj + 1
          WHERE c.gi BETWEEN 1 AND 14 AND c.gj BETWEEN 1 AND 14)
        SELECT media_id, CAST(count(*) AS BIGINT) AS n_interior,
               CAST(sum(l * l) AS BIGINT) AS lap_sq_sum
        FROM lap GROUP BY 1"""
    sql["value_outliers"] = f"""
        WITH c AS (SELECT event_type, {cents.format(expr='value')} AS v,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1),
        r AS (SELECT c.event_type, v, n,
                     sum(n) OVER (PARTITION BY c.event_type
                                  ORDER BY v) AS cum, tot
              FROM c JOIN t USING (event_type)),
        q AS (SELECT event_type,
                     min(CASE WHEN cum >= 25 * (tot - 1) // 100 + 1
                         THEN v END) AS q1,
                     min(CASE WHEN cum >= 75 * (tot - 1) // 100 + 1
                         THEN v END) AS q3,
                     max(tot) AS tot
              FROM r GROUP BY 1)
        SELECT q.event_type, CAST(q.q1 AS BIGINT) AS q1_cents,
               CAST(q.q3 AS BIGINT) AS q3_cents,
               CAST(coalesce(sum(CASE WHEN c.v < q.q1
                        - 3 * (q.q3 - q.q1) // 2 THEN c.n END), 0)
                    AS BIGINT) AS n_low,
               CAST(coalesce(sum(CASE WHEN c.v > q.q3
                        + 3 * (q.q3 - q.q1) // 2 THEN c.n END), 0)
                    AS BIGINT) AS n_high,
               CAST(max(q.tot) AS BIGINT) AS n_total
        FROM q JOIN c USING (event_type) GROUP BY 1, q.q1, q.q3"""
    sql["market_concentration"] = f"""
        WITH s AS (SELECT o_custkey AS k,
                          CAST(sum({cents.format(expr='o_totalprice')})
                               AS HUGEINT) AS c
                   FROM orders GROUP BY 1),
        j AS (SELECT c_nationkey, c FROM s
              JOIN customer ON k = c_custkey)
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(c) AS BIGINT) AS total_cents,
               CAST(CASE WHEN sum(c) > 0 THEN
                    sum(c * c) * 1000000000000 // (sum(c) * sum(c))
                    ELSE 0 END AS BIGINT) AS hhi_e12
        FROM j GROUP BY 1"""
    # mm_colorfulness: per-pixel opponent components replayed from the
    # decoded-blob hex (ch >= 3 images only; alpha ignored by the math)
    _cf_b = [_hd.format(p=f"2 * ((q.k * ch) + {c}) + 1") for c in (0, 1, 2)]
    sql["mm_colorfulness"] = f"""
        WITH img AS (
          SELECT media_id, body_hex AS hx, width AS w, height AS h,
                 channels AS ch
          FROM read_parquet('{media_dir}/*.parquet')
          WHERE kind = 'image' AND channels >= 3),
        px AS (
          SELECT media_id, w * h AS n_pixels,
                 {_cf_b[0]} - {_cf_b[1]} AS rg,
                 {_cf_b[0]} + {_cf_b[1]} - 2 * {_cf_b[2]} AS yb
          FROM img, unnest(range(0, w * h)) AS q(k))
        SELECT media_id, CAST(max(n_pixels) AS BIGINT) AS n_pixels,
               CAST(sum(rg) AS BIGINT) AS rg_sum,
               CAST(sum(rg * rg) AS BIGINT) AS rg_sq_sum,
               CAST(sum(yb) AS BIGINT) AS yb_sum,
               CAST(sum(yb * yb) AS BIGINT) AS yb_sq_sum
        FROM px GROUP BY 1"""
    sql["cross_table_overlap"] = f"""
        WITH th AS (SELECT DISTINCT md5(text) AS h FROM {T})
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN md5(d.text) IN (SELECT h FROM th)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
        FROM documents d GROUP BY 1"""
    sql["price_ladder"] = f"""
        SELECT CAST(CAST(l_quantity AS BIGINT) // 8 AS BIGINT) AS qty_band,
               {cents.format(expr='l_discount')} AS disc_cents,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum({cents.format(
                   expr='l_extendedprice * (1 - l_discount)')})
                    AS BIGINT) AS revenue_cents
        FROM lineitem GROUP BY 1, 2"""
    sql["column_sizes"] = f"""
        SELECT path_in_schema AS column,
               CAST(sum(num_values) AS BIGINT) AS n_values,
               CAST(sum(total_compressed_size) AS BIGINT)
                 AS compressed_bytes,
               CAST(sum(total_uncompressed_size) AS BIGINT)
                 AS uncompressed_bytes,
               CAST(sum(total_compressed_size) * 1000000
                    // greatest(sum(total_uncompressed_size), 1)
                    AS BIGINT) AS ratio_e6
        FROM parquet_metadata('{sf_dir}/events.parquet')
        GROUP BY 1"""
    sql["churn_flags"] = """
        WITH b AS (SELECT max(epoch_us(ts)) - 30 * 86400000000 AS cutoff
                   FROM events),
        l AS (SELECT user_id, max(epoch_us(ts)) AS last_us
              FROM events GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CAST(last_us < cutoff AS BIGINT)) AS BIGINT)
                 AS n_churned,
               CAST(sum(CAST(last_us < cutoff AS BIGINT)) * 1000000
                    // greatest(count(*), 1) AS BIGINT) AS churn_e6
        FROM l, b"""
    sql["repeat_purchase_rate"] = """
        WITH p AS (SELECT user_id, count(*) AS n_purchases
                   FROM events WHERE event_type = 'purchase' GROUP BY 1)
        SELECT CAST(n_purchases AS BIGINT) AS n_purchases,
               CAST(count(*) AS BIGINT) AS n_users
        FROM p GROUP BY 1"""
    sql["totalprice_audit"] = f"""
        WITH l AS (
          SELECT l_orderkey,
                 sum({cents.format(
                     expr='l_extendedprice * (1 + l_tax) '
                          '* (1 - l_discount)')}) AS line_cents
          FROM lineitem GROUP BY 1),
        g AS (
          SELECT abs({cents.format(expr='o_totalprice')} - line_cents)
                   AS a
          FROM orders JOIN l ON o_orderkey = l_orderkey),
        b AS (SELECT CASE WHEN a = 0 THEN 0
                          ELSE length(bin(a)) END AS gap_bucket, a
              FROM g)
        SELECT CAST(gap_bucket AS BIGINT) AS gap_bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(a) AS BIGINT) AS sum_abs_gap
        FROM b GROUP BY 1"""
    sql["orphan_orders"] = """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(count(*) AS BIGINT) AS n_orphans
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey)
        GROUP BY 1"""
    sql["order_status_trend"] = """
        WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
                          o_orderstatus,
                          CAST(count(*) AS BIGINT) AS n_orders
                   FROM orders GROUP BY 1, 2)
        SELECT order_year, o_orderstatus, n_orders,
               CAST(n_orders * 1000000
                    // sum(n_orders) OVER (PARTITION BY order_year)
                    AS BIGINT) AS share_e6
        FROM m"""
    sql["trending_tokens"] = rf"""
        WITH tk AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
                 unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                    t -> t != '')) AS tok
          FROM {T}),
        c AS (SELECT tok, day, CAST(count(*) AS BIGINT) AS n
              FROM tk GROUP BY 1, 2),
        ct AS (SELECT tok, sum(n) AS c_tok FROM c GROUP BY 1),
        cd AS (SELECT day, sum(n) AS c_day FROM c GROUP BY 1),
        tot AS (SELECT sum(n) AS total FROM c)
        SELECT c.day, c.tok, c.n,
               CAST(c.n * 1000000 // cd.c_day AS BIGINT) AS share_day_e6,
               CAST(ct.c_tok * 1000000 // tot.total AS BIGINT)
                 AS share_all_e6
        FROM c JOIN ct USING (tok) JOIN cd USING (day) CROSS JOIN tot
        WHERE c.n >= 5
          AND (c.n * 1000000 // cd.c_day) * 1000000
              > 1500000 * (ct.c_tok * 1000000 // tot.total)"""
    sql["event_dedup"] = """
        WITH x AS (
          SELECT event_type,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                      WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                           >= 60000000 THEN 1
                      ELSE 0 END AS kept
          FROM events
          WINDOW w AS (PARTITION BY user_id, event_type
                       ORDER BY epoch_us(ts), event_id))
        SELECT event_type, CAST(sum(kept) AS BIGINT) AS n_kept,
               CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped
        FROM x GROUP BY 1"""
    # PSI: every term has (p-q) and ln(p/q) the same sign, so the HUGEINT
    # sum is non-negative and // floors identically to the engine
    sql["value_psi"] = """
        WITH m AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                     AS mid FROM events),
        b AS (SELECT event_type, CAST(floor(value * 10) AS BIGINT) AS bin,
                     CASE WHEN epoch_us(ts) < m.mid THEN 1 ELSE 0 END AS h1
              FROM events CROSS JOIN m),
        c AS (SELECT event_type, bin, CAST(sum(h1) AS HUGEINT) AS c1,
                     CAST(sum(1 - h1) AS HUGEINT) AS c2
              FROM b GROUP BY 1, 2),
        n AS (SELECT event_type, sum(c1) AS n1, sum(c2) AS n2
              FROM c GROUP BY 1)
        SELECT c.event_type,
               CAST(count(*) FILTER (WHERE c1 > 0 AND c2 > 0) AS BIGINT)
                 AS n_bins_common,
               CAST(count(*) FILTER (WHERE c1 > 0 AND c2 = 0) AS BIGINT)
                 AS n_only_first,
               CAST(count(*) FILTER (WHERE c1 = 0 AND c2 > 0) AS BIGINT)
                 AS n_only_second,
               CAST(sum(CASE WHEN c1 > 0 AND c2 > 0 THEN
                        (c1 * n.n2 - c2 * n.n1)
                        * CAST(floor(ln(CAST(c1 * n.n2 AS DOUBLE)
                                        / CAST(c2 * n.n1 AS DOUBLE))
                                     * 1e6) AS HUGEINT)
                        ELSE 0 END)
                    // (max(n.n1) * max(n.n2)) AS BIGINT) AS psi_e6
        FROM c JOIN n USING (event_type) GROUP BY c.event_type"""
    # Fisher label scatter: n·Q − S² >= 0 (Cauchy–Schwarz) and squares,
    # so every HUGEINT // floors identically to the Python big ints
    sql["label_scatter"] = """
        WITH pos AS (
          SELECT vec_id, label, CAST(t.i - 1 AS INTEGER) AS dim,
                 CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0)
                      AS HUGEINT) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        g AS (SELECT label, dim, CAST(count(*) AS HUGEINT) AS n,
                     sum(x) AS s, sum(x * x) AS q
              FROM pos GROUP BY 1, 2),
        gl AS (SELECT dim, sum(s) AS gs FROM g GROUP BY dim),
        dd AS (SELECT CAST(count(DISTINCT dim) AS HUGEINT) AS d FROM g),
        tot AS (SELECT CAST(count(*) AS HUGEINT) AS nn FROM embeddings)
        SELECT CAST(g.label AS BIGINT) AS label,
               CAST(max(g.n) AS BIGINT) AS n,
               CAST(sum(g.n * g.q - g.s * g.s)
                    // (max(g.n) * max(g.n) * max(dd.d)) AS BIGINT)
                 AS within_avg,
               CAST(sum((g.s * tot.nn - gl.gs * g.n)
                        * (g.s * tot.nn - gl.gs * g.n))
                    // (max(g.n) * max(g.n) * tot.nn * tot.nn * max(dd.d))
                    AS BIGINT) AS between_avg,
               CAST((sum((g.s * tot.nn - gl.gs * g.n)
                         * (g.s * tot.nn - gl.gs * g.n))
                     // (max(g.n) * max(g.n) * tot.nn * tot.nn * max(dd.d)))
                    * 1000000
                    // greatest(sum(g.n * g.q - g.s * g.s)
                                // (max(g.n) * max(g.n) * max(dd.d)), 1)
                    AS BIGINT) AS fisher_e6
        FROM g JOIN gl USING (dim) CROSS JOIN dd CROSS JOIN tot
        GROUP BY g.label, tot.nn"""
    sql["user_lifetimes"] = """
        WITH g AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                          count(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
               CAST(min(day) AS BIGINT) AS first_day,
               CAST(max(day) AS BIGINT) AS last_day,
               CAST(count(*) AS BIGINT) AS active_days,
               CAST(max(day) - min(day) + 1 AS BIGINT) AS lifetime_days
        FROM g GROUP BY user_id"""
    sql["mm_histogram"] = f"""
        WITH img AS (
          SELECT media_id, body_hex AS hx,
                 CAST(width AS BIGINT) * height * nframes * channels AS n
          FROM read_parquet('{media_dir}/*.parquet') WHERE kind = 'image'),
        b AS (SELECT media_id, {_bk} AS b
              FROM img, unnest(range(0, n)) AS u(k))
        SELECT media_id, CAST(b // 16 AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_bytes
        FROM b GROUP BY 1, 2"""
    sql["assortativity"] = f"""
        WITH e AS (SELECT DISTINCT least(src, dst) AS a,
                          greatest(src, dst) AS b
                   FROM read_parquet('{_gdir}/*.parquet') WHERE src != dst),
        h AS (SELECT a AS v, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT v, CAST(count(*) AS HUGEINT) AS deg
                FROM h GROUP BY v),
        m AS (SELECT CAST(count(*) AS HUGEINT) AS m,
                     sum(dx.deg) AS sx, sum(dy.deg) AS sy,
                     sum(dx.deg * dy.deg) AS sxy,
                     sum(dx.deg * dx.deg) AS sxx,
                     sum(dy.deg * dy.deg) AS syy
              FROM h JOIN deg dx ON dx.v = h.v
                     JOIN deg dy ON dy.v = h.nbr)
        SELECT CAST(m AS BIGINT) AS m_halfedges,
               CAST(m * sxy - sx * sy AS BIGINT) AS sxy_num,
               CAST(m * sxx - sx * sx AS BIGINT) AS varx_num,
               CAST(m * syy - sy * sy AS BIGINT) AS vary_num
        FROM m"""
    sql["hapax_rate"] = rf"""
        WITH tk AS (
          SELECT role AS grp,
                 unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                    t -> t != '')) AS tok
          FROM {T}),
        gt AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS n
               FROM tk GROUP BY 1, 2),
        gl AS (SELECT tok, sum(n) AS c_glob FROM gt GROUP BY 1)
        SELECT grp AS role, CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c_glob = 1 THEN n ELSE 0 END) AS BIGINT)
                 AS n_hapax,
               CAST(sum(CASE WHEN c_glob = 1 THEN n ELSE 0 END) * 1000000
                    // greatest(sum(n), 1) AS BIGINT) AS hapax_e6
        FROM gt JOIN gl USING (tok) GROUP BY grp"""
    sql["nation_share"] = f"""
        WITH rev AS (
          SELECT r_name, n_name,
                 CAST(sum({cents.format(expr='l_extendedprice * (1 - l_discount)')})
                      AS BIGINT) AS revenue_cents
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2)
        SELECT r_name, n_name, revenue_cents,
               CAST(revenue_cents * 1000000
                    // sum(revenue_cents) OVER (PARTITION BY r_name)
                    AS BIGINT) AS share_e6
        FROM rev"""
    sql["tool_success_daily"] = f"""
        WITH tc AS (
          SELECT regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1)
                   AS tool_name,
                 CAST(regexp_extract(text, 'exit=(\\d+)', 1) AS INTEGER)
                   AS tool_exit,
                 epoch_us(ts) // 86400000000 AS day
          FROM {T} WHERE {SQL_IS_TOOL})
        SELECT tool_name, CAST(day AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n_calls,
               CAST(count(*) FILTER (WHERE tool_exit = 0) AS BIGINT)
                 AS n_ok,
               CAST(count(*) FILTER (WHERE tool_exit = 0) * 1000000
                    // count(*) AS BIGINT) AS ok_e6
        FROM tc GROUP BY 1, 2"""
    sql["tool_latency_mad"] = f"""
        WITH tc AS (
          SELECT regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1)
                   AS tool_name,
                 CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1)
                   AS BIGINT) AS v
          FROM {T} WHERE {SQL_IS_TOOL}),
        c AS (SELECT tool_name, v, count(*) AS n FROM tc GROUP BY 1, 2),
        t AS (SELECT tool_name, sum(n) AS tot FROM c GROUP BY 1),
        r AS (SELECT c.tool_name, v,
                     sum(n) OVER (PARTITION BY c.tool_name ORDER BY v)
                       AS cum, t.tot
              FROM c JOIN t USING (tool_name)),
        med AS (SELECT tool_name, CAST(max(tot) AS BIGINT) AS n_rows,
                       CAST(min(CASE WHEN cum >= 50 * (tot - 1) // 100 + 1
                                THEN v END) AS BIGINT) AS median
                FROM r GROUP BY tool_name),
        d AS (SELECT c.tool_name, abs(c.v - med.median) AS dv,
                     sum(c.n) AS n
              FROM c JOIN med USING (tool_name) GROUP BY 1, 2),
        rd AS (SELECT d.tool_name, dv,
                      sum(n) OVER (PARTITION BY d.tool_name ORDER BY dv)
                        AS cum, t.tot
               FROM d JOIN t USING (tool_name))
        SELECT med.tool_name, med.n_rows, med.median,
               CAST(min(CASE WHEN rd.cum >= 50 * (rd.tot - 1) // 100 + 1
                        THEN rd.dv END) AS BIGINT) AS mad
        FROM rd JOIN med USING (tool_name)
        GROUP BY med.tool_name, med.n_rows, med.median"""
    # zero crossings: strictly sign-opposed adjacent pairs within frames
    _zb1 = _hd.format(p="2 * u.i + 1")
    _zb2 = _hd.format(p="2 * (u.i + 1) + 1")
    sql["mm_zero_cross"] = f"""
        WITH aud AS (
          SELECT media_id, body_hex AS hx, width AS w
          FROM read_parquet('{media_dir}/*.parquet') WHERE kind = 'audio'),
        p AS (
          SELECT media_id, u.i AS i,
                 ({_zb1} - 128) * ({_zb2} - 128) AS prod
          FROM aud, unnest(range(0, (w // 64) * 64 - 1)) AS u(i)
          WHERE u.i % 64 != 63)
        SELECT media_id, CAST(i // 64 AS BIGINT) AS frame_idx,
               CAST(count(*) FILTER (WHERE prod < 0) AS BIGINT) AS n_cross
        FROM p GROUP BY 1, 2"""
    sql["cdc_field_diff"] = f"""
        WITH a AS (SELECT doc_id, md5(text) AS th, lang, source, n_chars
                   FROM documents),
        b AS (SELECT doc_id, md5(text) AS th, lang, source, n_chars
              FROM read_parquet('{_v2dir}/*.parquet')),
        j AS (SELECT CAST(a.th <> b.th AS BIGINT) AS c_text,
                     CAST(a.lang <> b.lang AS BIGINT) AS c_lang,
                     CAST(a.source <> b.source AS BIGINT) AS c_source,
                     CAST(a.n_chars <> b.n_chars AS BIGINT) AS c_n_chars
              FROM a JOIN b USING (doc_id)),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n_common,
                     CAST(sum(c_text) AS BIGINT) AS f_text,
                     CAST(sum(c_lang) AS BIGINT) AS f_lang,
                     CAST(sum(c_source) AS BIGINT) AS f_source,
                     CAST(sum(c_n_chars) AS BIGINT) AS f_n_chars
              FROM j)
        SELECT f.field, s.n_common,
               CASE f.field WHEN 'text' THEN s.f_text
                            WHEN 'lang' THEN s.f_lang
                            WHEN 'source' THEN s.f_source
                            ELSE s.f_n_chars END AS n_changed
        FROM (VALUES ('text'), ('lang'), ('source'), ('n_chars'))
             f(field) CROSS JOIN s"""
    sql["forecast_error"] = """
        WITH hc AS (SELECT event_type, epoch_us(ts) // 3600000000 AS x,
                           count(*) AS y
                    FROM events GROUP BY 1, 2),
        mm AS (SELECT min(x) AS h0, max(x) AS h1 FROM hc),
        grid AS (SELECT t.event_type, g.x
                 FROM (SELECT DISTINCT event_type FROM hc) t
                 CROSS JOIN (SELECT h0 + u.i AS x
                             FROM mm, unnest(range(0, h1 - h0 + 1))
                                  AS u(i)) g),
        f AS (SELECT grid.event_type, grid.x,
                     CAST(COALESCE(hc.y, 0) AS HUGEINT) AS y
              FROM grid LEFT JOIN hc ON hc.event_type = grid.event_type
                                    AND hc.x = grid.x),
        l AS (SELECT event_type, y,
                     lag(y, 1) OVER w AS y1, lag(y, 24) OVER w AS y24
              FROM f WINDOW w AS (PARTITION BY event_type ORDER BY x)),
        s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                     sum(CASE WHEN y1 IS NOT NULL
                              THEN abs(y - y1) ELSE 0 END) AS a,
                     sum(CASE WHEN y24 IS NOT NULL
                              THEN abs(y - y24) ELSE 0 END) AS s24
              FROM l GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n_hours,
               CAST(a AS BIGINT) AS sae_naive,
               CAST(s24 AS BIGINT) AS sae_seasonal,
               CASE WHEN a > 0 AND n > 24
                    THEN CAST(s24 * (n - 1) * 1000000
                              // (a * (n - 24)) AS BIGINT)
                    ELSE NULL END AS mase_e6
        FROM s"""
    sql["conv_idle_share"] = f"""
        WITH x AS (SELECT conv_id, turn_idx, epoch_us(ts) AS us FROM {T}),
        g AS (SELECT conv_id, us, turn_idx,
                     greatest(us - COALESCE(lag(us) OVER (
                         PARTITION BY conv_id ORDER BY turn_idx), us),
                         0) AS gap
              FROM x)
        SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
               CAST(greatest(arg_max(us, turn_idx) - arg_min(us, turn_idx),
                    0) AS BIGINT) AS span_us,
               CAST(sum(CASE WHEN gap > 300000000 THEN gap ELSE 0 END)
                    AS BIGINT) AS idle_us_total,
               CAST(sum(CASE WHEN gap > 300000000 THEN gap ELSE 0 END)
                    * 1000000
                    // greatest(greatest(arg_max(us, turn_idx)
                                         - arg_min(us, turn_idx), 0), 1)
                    AS BIGINT) AS idle_e6
        FROM g GROUP BY conv_id"""
    sql["embedding_norms"] = """
        WITH q AS (
          SELECT vec_id, label,
                 CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000.0)
                      AS BIGINT) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        n2 AS (SELECT vec_id, label, sum(x * x) AS n2
               FROM q GROUP BY 1, 2)
        SELECT CAST(label AS BIGINT) AS label,
               CAST(CASE WHEN n2 = 0 THEN 0
                    ELSE length(bin(n2)) END AS BIGINT) AS norm2_bucket,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(min(n2) AS BIGINT) AS min_norm2,
               CAST(max(n2) AS BIGINT) AS max_norm2
        FROM n2 GROUP BY 1, 2"""
    sql["lang_script_check"] = f"""
        WITH l AS ({lang_id_oracle_sql(f"read_parquet('{_unidir}/*.parquet')")}),
        c AS (SELECT doc_id,
                     CAST(len(regexp_extract_all(text,
                          '[\\x{{4e00}}-\\x{{9fff}}]')) > 0 AS BIGINT)
                       AS has_cjk
              FROM read_parquet('{_unidir}/*.parquet'))
        SELECT l.lang_pred, c.has_cjk, CAST(count(*) AS BIGINT) AS n_docs
        FROM l JOIN c USING (doc_id) GROUP BY 1, 2"""
    sql["brand_pairs"] = """
        WITH d AS (SELECT DISTINCT l_orderkey, p_brand
                   FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                         AND a.p_brand < b.p_brand
        GROUP BY 1, 2"""
    sql["stickiness_daily"] = """
        WITH g AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day
                   FROM events),
        b AS (SELECT max(day) AS hi FROM g),
        e AS (SELECT DISTINCT user_id, g.day + os.o AS d
              FROM g
              CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) os
              CROSS JOIN b
              WHERE g.day + os.o <= b.hi),
        w AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS wau
              FROM e GROUP BY 1),
        a AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
              FROM g GROUP BY 1)
        SELECT w.day, COALESCE(a.dau, 0) AS dau, w.wau,
               CAST(1000000 * COALESCE(a.dau, 0) // w.wau AS BIGINT)
                 AS stickiness_e6
        FROM w LEFT JOIN a USING (day)"""
    sql["attribution_first_touch"] = """
        WITH l AS (SELECT user_id, ts, event_type, event_id,
                          lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_ts
                   FROM events),
        s AS (SELECT user_id, ts, event_type, event_id,
                     CAST(sum(CASE WHEN prev_ts IS NULL
                                     OR ts - prev_ts > INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
              FROM l),
        f AS (SELECT user_id, sess, event_type AS first_type
              FROM s
              QUALIFY row_number() OVER (PARTITION BY user_id, sess
                                         ORDER BY ts, event_id) = 1),
        p AS (SELECT user_id, sess FROM s WHERE event_type = 'purchase')
        SELECT f.first_type, CAST(count(*) AS BIGINT) AS n_targets
        FROM p JOIN f USING (user_id, sess) GROUP BY 1"""
    sql["gap_histogram"] = """
        WITH o AS (SELECT user_id, ts,
                          lead(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
                   FROM events),
        g AS (SELECT (epoch_us(nxt) - epoch_us(ts)) // 1000 AS ms
              FROM o WHERE nxt IS NOT NULL)
        SELECT CAST(CASE WHEN ms = 0 THEN 0
                         ELSE length(bin(ms)) END AS BIGINT) AS gap_bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(ms) AS BIGINT) AS sum_gap_ms
        FROM g GROUP BY 1"""
    sql["fair_allocation"] = r"""
        WITH w AS (SELECT source,
                          CAST(sum(len(regexp_extract_all(text, '\S+')))
                               AS BIGINT) AS n_tokens
                   FROM documents GROUP BY 1),
        tot AS (SELECT sum(n_tokens) AS W FROM w),
        q AS (SELECT source, n_tokens,
                     1000000 * n_tokens // tot.W AS base,
                     1000000 * n_tokens % tot.W AS rem
              FROM w CROSS JOIN tot),
        lo AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS leftover FROM q),
        r AS (SELECT source, n_tokens, base,
                     row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
              FROM q)
        SELECT source, n_tokens,
               CAST(base + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM r CROSS JOIN lo"""
    sql["event_transitions"] = """
        WITH o AS (SELECT user_id, event_type, ts, event_id,
                          lead(event_type) OVER w AS nxt,
                          lead(ts) OVER w AS nxt_ts
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        p AS (SELECT event_type AS from_type, nxt AS to_type
              FROM o
              WHERE nxt IS NOT NULL
                AND nxt_ts - ts <= INTERVAL 30 MINUTE),
        n AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
              FROM p GROUP BY 1, 2),
        ft AS (SELECT from_type, sum(n) AS tot FROM n GROUP BY 1)
        SELECT n.from_type, n.to_type, n.n,
               CAST(1000000 * n.n // ft.tot AS BIGINT) AS p_e6
        FROM n JOIN ft USING (from_type)"""
    sql["edge_reciprocity"] = f"""
        WITH e AS (SELECT DISTINCT src, dst
                   FROM read_parquet('{_gdir}/*.parquet')),
        r AS (SELECT count(*) AS nr
              FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src),
        t AS (SELECT count(*) AS ne FROM e)
        SELECT CAST(ne AS BIGINT) AS n_edges,
               CAST(nr AS BIGINT) AS n_reciprocal,
               CAST(1000000 * nr // ne AS BIGINT) AS mutuality_e6
        FROM t CROSS JOIN r"""
    sql["coverage_gaps"] = """
        WITH b AS (SELECT epoch_us(min(ts)) // 3600000000 AS lo,
                          epoch_us(max(ts)) // 3600000000 AS hi
                   FROM events),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT t.event_type, g.h AS hour_id
                 FROM types t
                 CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS h
                             FROM b) g),
        cnt AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
                       count(*) AS x
                FROM events GROUP BY 1, 2),
        empty AS (SELECT g.event_type, g.hour_id
                  FROM grid g LEFT JOIN cnt c
                    ON c.event_type = g.event_type
                   AND c.hour_id = g.hour_id
                  WHERE c.x IS NULL),
        isl AS (SELECT event_type,
                       hour_id - row_number() OVER (PARTITION BY event_type
                                                    ORDER BY hour_id) AS grp
                FROM empty),
        runs AS (SELECT event_type, CAST(count(*) AS BIGINT) AS len
                 FROM isl GROUP BY event_type, grp)
        SELECT t.event_type,
               CAST(COALESCE(sum(r.len), 0) AS BIGINT) AS n_empty_hours,
               CAST(COALESCE(max(r.len), 0) AS BIGINT) AS max_gap_hours
        FROM types t LEFT JOIN runs r USING (event_type)
        GROUP BY t.event_type"""
    sql["rate_limit_audit"] = """
        WITH w AS (SELECT user_id,
                          count(*) OVER (PARTITION BY user_id ORDER BY ts
                                         RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                                               AND CURRENT ROW) AS c
                   FROM events)
        SELECT user_id, CAST(max(c) AS BIGINT) AS max_in_window
        FROM w GROUP BY user_id"""
    sql["latency_trend"] = f"""
        WITH t0 AS (SELECT min(epoch_us(ts)) // 86400000000 AS d0
                    FROM {_trans_sql_rel(sf_dir)}),
        tc AS (SELECT regexp_extract(text, '^TOOL_CALL tool=(\\w+) ', 1)
                        AS tool_name,
                      CAST(regexp_extract(text, 'duration_ms=(\\d+)$', 1)
                        AS BIGINT) AS y,
                      epoch_us(ts) // 86400000000 - t0.d0 AS x
               FROM {_trans_sql_rel(sf_dir)} CROSS JOIN t0
               WHERE {SQL_IS_TOOL}),
        m AS (SELECT tool_name, CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(x * y) AS HUGEINT) AS sxy,
                     CAST(sum(x * x) AS HUGEINT) AS sxx
              FROM tc GROUP BY 1)
        SELECT tool_name, CAST(n AS BIGINT) AS n_calls,
               CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    ELSE CAST((1000000 * (n * sxy - sx * sy))
                              // (n * sxx - sx * sx) AS BIGINT)
               END AS slope_e6
        FROM m"""
    sql["user_burstiness"] = """
        WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
                          CAST(count(*) AS BIGINT) AS c
                   FROM events GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_active_hours,
               CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS BIGINT) AS fano_num,
               CAST(count(*) * sum(c) AS BIGINT) AS fano_den
        FROM h GROUP BY user_id"""
    sql["hourly_profile"] = """
        WITH d AS (SELECT (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
                          (epoch_us(ts) // 3600000000) % 24 AS hod,
                          user_id
                   FROM events),
        g AS (SELECT dow, hod, user_id, count(*) AS c FROM d GROUP BY 1, 2, 3)
        SELECT dow, hod, CAST(sum(c) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_users
        FROM g GROUP BY 1, 2"""
    sql["context_overflow"] = f"""
        WITH c AS (SELECT conv_id, turn_idx, length(text) AS ch
                   FROM {_trans_sql_rel(sf_dir)}),
        w AS (SELECT conv_id, turn_idx,
                     sum(ch) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                   ROWS UNBOUNDED PRECEDING) AS cum
              FROM c),
        o AS (SELECT conv_id, min(turn_idx) AS overflow_turn
              FROM w WHERE cum > 500 GROUP BY 1),
        t AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                     CAST(sum(ch) AS BIGINT) AS total_chars
              FROM c GROUP BY 1)
        SELECT t.conv_id, t.n_turns, t.total_chars, o.overflow_turn
        FROM t LEFT JOIN o USING (conv_id)"""
    sql["two_hop_reach"] = f"""
        WITH e AS (SELECT src, dst FROM read_parquet('{_gdir}/*.parquet')),
        r AS (SELECT src AS s, dst AS w FROM e
              UNION
              SELECT e1.src AS s, e2.dst AS w
              FROM e e1 JOIN e e2 ON e1.dst = e2.src
              WHERE e2.dst != e1.src)
        SELECT s AS node_id, CAST(count(*) AS BIGINT) AS n_reach
        FROM r GROUP BY s"""
    # zorder: 16-bit Morton interleave, unrolled as plain bit algebra so
    # the oracle replays the magic-mask ladder exactly
    _mort_a = " + ".join(f"(((qa >> {b}) & 1) << {2 * b + 1})"
                         for b in range(16))
    _mort_m = " + ".join(f"(((qm >> {b}) & 1) << {2 * b})"
                         for b in range(16))
    sql["zorder_layout"] = f"""
        WITH b AS (SELECT min(user_id) AS a_lo, max(user_id) AS a_hi,
                          min(epoch_us(ts)) // 60000000 AS m_lo,
                          max(epoch_us(ts)) // 60000000 AS m_hi
                   FROM events),
        q AS (SELECT user_id AS a, epoch_us(ts) // 60000000 AS m,
                     (user_id - a_lo) * 65536
                        // greatest(1, a_hi - a_lo + 1) AS qa,
                     (epoch_us(ts) // 60000000 - m_lo) * 65536
                        // greatest(1, m_hi - m_lo + 1) AS qm
              FROM events CROSS JOIN b),
        z AS (SELECT ({_mort_a} + {_mort_m}) >> 26 AS zfile, a, m FROM q)
        SELECT zfile, CAST(count(*) AS BIGINT) AS n_rows,
               min(a) AS a_min, max(a) AS a_max,
               min(m) AS m_min, max(m) AS m_max
        FROM z GROUP BY zfile"""
    sql["autocorr_hourly"] = """
        WITH b AS (SELECT epoch_us(min(ts)) // 3600000000 AS lo,
                          epoch_us(max(ts)) // 3600000000 AS hi
                   FROM events),
        grid AS (SELECT unnest(generate_series(lo, hi)) AS hour_id FROM b),
        cnt AS (SELECT epoch_us(ts) // 3600000000 AS hour_id, count(*) AS x
                FROM events GROUP BY 1),
        ser AS (SELECT g.hour_id, CAST(COALESCE(c.x, 0) AS HUGEINT) AS x
                FROM grid g LEFT JOIN cnt c USING (hour_id)),
        tot AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s FROM ser),
        res AS (SELECT hour_id, tot.n * x - tot.s AS r
                FROM ser CROSS JOIN tot),
        den AS (SELECT sum(r * r) AS d FROM res),
        lags AS (SELECT unnest(generate_series(1, 3)) AS lag),
        num AS (SELECT l.lag, sum(a.r * c.r) AS nm,
                       CAST(count(*) AS BIGINT) AS n_terms
                FROM lags l
                JOIN res a ON TRUE
                JOIN res c ON c.hour_id = a.hour_id + l.lag
                GROUP BY l.lag)
        SELECT lag, CAST((1000000 * nm) // den.d AS BIGINT) AS r_e6, n_terms
        FROM num CROSS JOIN den"""
    sql["cusum_hourly"] = """
        WITH b AS (SELECT epoch_us(min(ts)) // 3600000000 AS lo,
                          epoch_us(max(ts)) // 3600000000 AS hi,
                          count(*) AS total
                   FROM events),
        par AS (SELECT lo, hi, (total + (hi - lo + 1) - 1) // (hi - lo + 1) AS k
                FROM b),
        grid AS (SELECT unnest(generate_series(lo, hi)) AS hour_id FROM b),
        cnt AS (SELECT epoch_us(ts) // 3600000000 AS hour_id,
                       count(*) AS x
                FROM events GROUP BY 1),
        ser AS (SELECT g.hour_id, COALESCE(c.x, 0) AS x
                FROM grid g LEFT JOIN cnt c USING (hour_id)),
        p AS (SELECT hour_id, x,
                     sum(x - par.k) OVER (ORDER BY hour_id
                                          ROWS UNBOUNDED PRECEDING) AS pfx
              FROM ser CROSS JOIN par),
        s AS (SELECT hour_id, x,
                     pfx - least(0, min(pfx) OVER (ORDER BY hour_id
                                                   ROWS UNBOUNDED PRECEDING)) AS s_pos
              FROM p)
        SELECT hour_id, CAST(x AS BIGINT) AS x, CAST(s_pos AS BIGINT) AS s_pos,
               CAST(CASE WHEN s_pos >= 4 * par.k THEN 1 ELSE 0 END AS BIGINT) AS alert
        FROM s CROSS JOIN par"""
    sql["cohort_retention"] = """
        WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
                   FROM events),
        f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
        a AS (SELECT DISTINCT d.user_id, f.cohort_day,
                              d.day - f.cohort_day AS day_offset
              FROM d JOIN f USING (user_id))
        SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
        FROM a GROUP BY 1, 2"""
    sql["scd2_intervals"] = """
        WITH o AS (SELECT user_id, event_type, ts, event_id,
                          lag(event_type) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS prev
                   FROM events),
        st AS (SELECT user_id, event_type, ts, event_id
               FROM o WHERE prev IS NULL OR prev != event_type),
        v AS (SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
                     lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS valid_to_us
              FROM st)
        SELECT user_id, event_type, valid_from_us, valid_to_us,
               CAST(valid_to_us IS NULL AS BIGINT) AS is_current
        FROM v"""
    return sql
