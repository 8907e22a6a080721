"""Aggregate stage: two-phase grouped aggregation, EMF-style metric
grouping, and the cumulative->delta window operator.

Reference semantics re-expressed:

- EMF group-by (src/exporters/awsemf/transformer.rs:116-137,224-295): data
  points grouped by GroupKey{namespace, sorted label k/v, timestamp, type};
  histogram -> {Count, Sum, Min, Max} stat set (transformer.rs:392-438).
- Delta calculator (transformer.rs:797-844): stateful cumulative->delta per
  MetricKey — prev-value cache, emit max(delta, 0), first sighting dropped
  unless retain_initial_value. Batch world: sort within group + lag diff
  (no wall-clock expiry needed; the 5-min cache TTL at transformer.rs:813-819
  exists only because the reference streams unboundedly).
- Trace grouping (src/exporters/datadog/transform/transformer.rs:105-135):
  spans grouped by trace id -> for us, groupby(conv_id).

Scale strategy (SURVEY.md §7.4): every aggregation here is **two-phase** —
partial (combiner) aggregation inside ``map_batches`` bounds per-key state at
batch granularity, then a final ``groupby().aggregate()`` over the (much
smaller) partials. This is what makes Zipf-skewed conv_ids survivable: a
2000-turn conversation contributes ~1 partial row per batch instead of 2000
rows into one reducer; for a GLOBAL hot key whose per-batch partials would
still flood one merge task at corpus scale, ``two_phase_aggregate(salt=n)``
shards the merge and re-combines exactly (algebraic functions only).
``grouped_apply`` operators dilute skew by hashing keys across buckets and
keeping the per-bucket function vectorized across all keys in the bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# generic two-phase aggregation (bucketed hash aggregate)
#
# Ray's built-in groupby().aggregate() sorts every row by the full key tuple
# (sort-based shuffle) — measured 12.3s for 167k partial rows at sf0.1.
# This implementation instead: (1) combines per batch with Arrow's hash
# group_by, (2) assigns each partial row a bucket = hash(key)%B, (3) shuffles
# only by the single int bucket column and finishes each bucket with another
# Arrow group_by. Same result, ~19x faster, and the bucket count B is the
# explicit parallelism knob for a multi-node shuffle.
# ---------------------------------------------------------------------------

_PARTIAL_FUNCS = {"sum": "sum", "count": "count", "min": "min", "max": "max"}
_MERGE_FUNCS = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

DEFAULT_BUCKETS = 64


def auto_buckets(n_rows: int, rows_per_bucket: int = 4096,
                 lo: int = 8, hi: int = 65536) -> int:
    """Power-of-2 shuffle fan-out sized to the data: each sort-based
    exchange costs roughly per-partition overhead x buckets, so a fixed
    64-way fan-out wastes seconds on small inputs while capping parallelism
    on huge ones (measured: minhash at 5 k docs, 64 -> 8 buckets = -35%
    wall). Power of 2 keeps grouped_apply's int-key fast path valid."""
    b = 1 << max(0, (max(1, n_rows // rows_per_bucket)).bit_length() - 1)
    return min(hi, max(lo, b))


def _key_strings(t: pa.Table, keys: list[str]) -> pa.Array:
    parts = []
    for k in keys:
        col = t.column(k)
        if not pa.types.is_string(col.type):
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.int64())
            col = pc.cast(col, pa.string())
        parts.append(pc.fill_null(col, "\x00null"))
    if len(parts) == 1:
        joined = parts[0]
    else:
        joined = pc.binary_join_element_wise(*parts, "\x1f")
    return joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined


def _vec_hash_strings(arr: pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash per string, fully vectorized over the Arrow
    byte buffer (positional polynomial + splitmix64 finalizer). No per-row or
    per-distinct-value Python — the round-1 per-distinct crc32 loop was a
    hidden row loop whenever the key itself was high-cardinality (text_hash
    buckets, minhash pair keys)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    if pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    out = np.zeros(n, np.uint64)
    total = int(lens.sum())
    if total:
        seg = data[offs[0] : offs[-1]].astype(np.uint64)
        starts_rel = offs[:-1] - offs[0]
        # position of each byte within its own string -> P^pos weight
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts_rel, lens)
        P = np.uint64(0x100000001B3)
        maxlen = int(lens.max())
        pows = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(maxlen - 1, P, np.uint64)))
        ) if maxlen > 1 else np.array([np.uint64(1)])
        vals = (seg + np.uint64(0x9E3779B97F4A7C15)) * pows[pos]
        ne = lens > 0
        out[ne] = np.add.reduceat(vals, starts_rel[ne])
    h = out ^ lens.astype(np.uint64)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def add_hash_bucket(t: pa.Table, keys: list[str], num_buckets: int, col: str = "__bucket") -> pa.Table:
    """Append a deterministic hash-bucket column over `keys` (vectorized
    64-bit hash of the canonical key string — the order-independent key
    hashing of the reference's Kafka partition-by-resource-attributes,
    src/exporters/kafka/exporter.rs:140-162)."""
    h = _vec_hash_strings(_key_strings(t, keys))
    bucket = pa.array((h % np.uint64(num_buckets)).astype(np.int64))
    # strip parquet-born b'pandas' schema metadata: pa.Schema with it is
    # unhashable ("Failed to hash the schemas" spam in every shuffle reduce)
    return t.append_column(col, bucket).replace_schema_metadata(None)


LOCAL_COALESCE_ROWS = 1 << 18

_ROWS_HINT = __import__("contextvars").ContextVar("rotel_input_rows_hint",
                                                  default=None)


def input_rows_hint(n_rows: int | None):
    """Plan-construction-scoped optimizer hint: an upper bound on the row
    count feeding every exchange built inside the ``with`` block, sourced
    from parquet metadata (never a count() execution). At or below
    ``LOCAL_COALESCE_ROWS``, :func:`grouped_apply` and
    :func:`two_phase_aggregate` collapse their bucketed sort exchange to a
    single-task coalesce — the Spark-AQE small-exchange regime where sort
    launch latency dominates (~1.5 s per all-to-all here vs ~0.1 s
    coalesced). Correctness is hint-independent: the reduce fns group by
    their keys internally, so one task over all rows computes exactly what
    the bucketed plan computes; an under-estimate only costs single-task
    parallelism, never results. At corpus scale the hint exceeds the
    threshold and plans are unchanged."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        tok = _ROWS_HINT.set(n_rows)
        try:
            yield
        finally:
            _ROWS_HINT.reset(tok)

    return _cm()


def bounded_take_all(ds, limit: int, what: str = "table") -> list[dict]:
    """take_all with a hard row bound: pulls at most ``limit + 1`` rows
    (distributed limit — the driver never materializes more) and raises a
    loud, actionable error instead of silently OOM-ing the driver when an
    assumed-bounded broadcast side turns out not to be. Use for vocab-style
    broadcast tables whose size is a corpus property, not a constant."""
    rows = ds.limit(limit + 1).take_all()
    if len(rows) > limit:
        raise ValueError(
            f"{what} exceeds the {limit}-row driver broadcast bound; "
            "cap it with a distributed top-V selection "
            "(textstats.top_v_counts) or a hashed feature space before "
            "broadcasting")
    return rows


def _coalesce_small(local_rows_hint: int | None) -> bool:
    hint = local_rows_hint if local_rows_hint is not None else _ROWS_HINT.get()
    return hint is not None and hint <= LOCAL_COALESCE_ROWS


def grouped_apply(ds, keys: list[str], fn, *, num_buckets: int = DEFAULT_BUCKETS,
                  batch_format: str = "pandas", select: list[str] | None = None,
                  local_rows_hint: int | None = None):
    """Group-apply with bounded task count: rows are hash-bucketed by `keys`
    (the shuffle moves ONE extra int column, and produces `num_buckets`
    reduce tasks instead of one per distinct key), and ``fn`` is called once
    per bucket with every row of every key in that bucket — so ``fn`` must
    group by `keys` internally (vectorized, e.g. pandas groupby / sorted
    numpy segments). This is the scale shape for per-key window operators:
    task count is O(buckets), key skew is diluted by hashing, and no task
    ever holds more than ~1/buckets of the data.

    ``local_rows_hint``: caller-supplied upper bound on the input row count
    (from parquet metadata — never a count() execution). At or below
    ``LOCAL_COALESCE_ROWS`` the bucketed sort exchange collapses to a
    single-block coalesce + ONE reduce task over the whole (tiny) table —
    the Spark-AQE small-exchange coalesce, measured ~3x cheaper per
    exchange here. Results are identical because ``fn`` groups by `keys`
    internally either way; above the threshold (any real corpus) the
    normal bucketed path runs."""
    if _coalesce_small(local_rows_hint):
        def run_all(g):
            out = fn(g)
            if isinstance(out, pd.DataFrame):
                out = pa.Table.from_pandas(out, preserve_index=False) \
                              .replace_schema_metadata(None)
            return out

        src = ds
        if select:
            src = ds.map_batches(lambda t: t.select(select),
                                 batch_format="pyarrow", zero_copy_batch=True)
        return src.repartition(1).map_batches(run_all, batch_format=batch_format,
                                              batch_size=None)

    def add_bucket(t: pa.Table) -> pa.Table:
        if select:
            t = t.select(select)
        if len(keys) == 1 and pa.types.is_integer(t.schema.field(keys[0]).type):
            v = pc.cast(t.column(keys[0]), pa.int64())
            bucket = pc.bit_wise_and(v, num_buckets - 1)  # num_buckets power of 2
            return t.append_column("__bucket", bucket).replace_schema_metadata(None)
        return add_hash_bucket(t, keys, num_buckets)

    def run_bucket(g):
        if hasattr(g, "drop_columns"):  # pyarrow
            out = fn(g.drop_columns(["__bucket"]))
        else:
            out = fn(g.drop(columns=["__bucket"]))
        if isinstance(out, pd.DataFrame):
            # convert pandas reduce output to Arrow HERE, metadata-free:
            # Ray's own pandas->arrow block conversion attaches b'pandas'
            # schema metadata, which is unhashable (schema-dedup warning
            # spam) and makes empty object columns trip its size estimator
            out = pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("__bucket").map_groups(run_bucket, batch_format=batch_format)


_SALT_COUNTER = __import__("itertools").count()


def two_phase_aggregate(
    ds,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    batch_size: int = 65536,
    num_buckets: int = DEFAULT_BUCKETS,
    salt: int = 1,
):
    """``specs`` = [(column, fn, alias)] with fn in {sum,count,min,max}.

    Phase 1 (map_batches): Arrow hash group_by within each batch -> one
    partial row per key per batch, tagged with a hash bucket. Phase 2:
    shuffle by bucket only, Arrow group_by again per bucket.

    ``salt > 1`` is the GLOBAL hot-key guard: the per-batch combiner already
    bounds each key to one partial row per batch, but at corpus scale a
    single planetary key still funnels one partial row per input batch
    (millions) into ONE merge task. Salting spreads each batch's partials
    across ``salt`` shards of the key's bucket (deterministic results — the
    shard only routes load), and a second, tiny merge pass combines the
    ``<= salt`` shard rows per key. All spec functions here are algebraic,
    so the re-merge is exact.
    """
    aliases = [alias for _, _, alias in specs]

    def partial(t: pa.Table) -> pa.Table:
        aggs = [(col, _PARTIAL_FUNCS[fn]) for col, fn, _ in specs]
        g = t.group_by(keys).aggregate(aggs)
        names = {f"{col}_{_PARTIAL_FUNCS[fn]}": alias for col, fn, alias in specs}
        g = g.rename_columns([names.get(c, c) for c in g.column_names])
        g = g.select(keys + aliases)
        g = add_hash_bucket(g, keys, num_buckets)
        if salt > 1:
            # per-call shard shift: spreads successive batches' partials for
            # the SAME key over `salt` distinct buckets (load routing only)
            shift = next(_SALT_COUNTER) % salt
            b = pc.add(pc.multiply(g.column("__bucket"), salt), shift)
            g = g.set_column(g.column_names.index("__bucket"), "__bucket", b)
        return g

    def merge(t: pa.Table) -> pa.Table:
        aggs = [(alias, _MERGE_FUNCS[fn]) for _, fn, alias in specs]
        g = t.group_by(keys).aggregate(aggs)
        names = {f"{alias}_{_MERGE_FUNCS[fn]}": alias for _, fn, alias in specs}
        g = g.rename_columns([names.get(c, c) for c in g.column_names])
        return g.select(keys + aliases)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
    if _coalesce_small(None):
        # small-exchange coalesce (see input_rows_hint): partials are even
        # smaller than the hinted input; one merge task replaces the sort
        merged = partials.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None)
    else:
        merged = partials.groupby("__bucket").map_groups(merge, batch_format="pyarrow")
    if salt == 1:
        return merged
    # second (tiny) merge: <= salt shard rows per key remain
    respec = [(alias, _MERGE_FUNCS[fn], alias) for _, fn, alias in specs]
    return two_phase_aggregate(merged, keys, respec, batch_size=batch_size,
                               num_buckets=num_buckets, salt=1)


# ---------------------------------------------------------------------------
# conversation aggregate (the north-rule groupby(conv_id))
# ---------------------------------------------------------------------------


def _conv_partial(t: pa.Table) -> pa.Table:
    one = pc.cast(pc.is_valid(t.column("conv_id")), pa.int64())
    is_tool = pc.cast(pc.equal(t.column("event_type"), "tool_call"), pa.int64())
    is_err = pc.cast(pc.is_valid(t.column("error_code")), pa.int64())
    dur = pc.fill_null(t.column("duration_ms"), 0)
    tmp = pa.table(
        {
            "conv_id": t.column("conv_id"),
            "n_turns": one,
            "n_tool_calls": is_tool,
            "n_errors": is_err,
            "total_duration_ms": dur,
            "max_severity": t.column("severity_number"),
            "first_ts": t.column("ts"),
            "last_ts": t.column("ts"),
        }
    )
    g = tmp.group_by(["conv_id"]).aggregate(
        [
            ("n_turns", "sum"),
            ("n_tool_calls", "sum"),
            ("n_errors", "sum"),
            ("total_duration_ms", "sum"),
            ("max_severity", "max"),
            ("first_ts", "min"),
            ("last_ts", "max"),
        ]
    )
    return g.rename_columns(
        ["conv_id", "n_turns", "n_tool_calls", "n_errors", "total_duration_ms", "max_severity", "first_ts", "last_ts"]
    )


_CONV_COLS = ["conv_id", "n_turns", "n_tool_calls", "n_errors", "total_duration_ms",
              "max_severity", "first_ts", "last_ts"]


def conv_aggregate(parsed_ds, batch_size: int = 65536, num_buckets: int = DEFAULT_BUCKETS):
    """groupby(conv_id) summary — two-phase (combiner inside map_batches,
    bucketed merge), so Zipf-head conversations never concentrate raw rows
    on one reducer."""

    def partial(t: pa.Table) -> pa.Table:
        return add_hash_bucket(_conv_partial(t), ["conv_id"], num_buckets)

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["conv_id"]).aggregate(
            [
                ("n_turns", "sum"),
                ("n_tool_calls", "sum"),
                ("n_errors", "sum"),
                ("total_duration_ms", "sum"),
                ("max_severity", "max"),
                ("first_ts", "min"),
                ("last_ts", "max"),
            ]
        )
        return g.rename_columns(_CONV_COLS)

    partials = parsed_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# EMF-style grouped metrics (the metrics sink payload)
# ---------------------------------------------------------------------------


def _metrics_partial(t: pa.Table, namespace: str | None = "rotel_ray") -> pa.Table:
    from .transform import derive_namespace

    n = t.num_rows
    # namespace fallback chain (awsemf/transformer.rs:746-766): explicit
    # config -> service.namespace/name resource attrs -> "default"
    namespace = derive_namespace(t, namespace=namespace)
    name = t.column("event_type")
    # GroupKey's sorted-label determinism (transformer.rs:118): single label
    # role=<role> serialized canonically
    group_key = pc.binary_join_element_wise(
        pa.nulls(n, pa.string()).fill_null("role="), t.column("role"), ""
    )
    ts_minute = pc.floor_temporal(t.column("ts"), unit="minute")
    value = pc.cast(
        pc.coalesce(t.column("duration_ms"), t.column("body_bytes_sent"), pa.scalar(0, pa.int64())),
        pa.float64(),
    )
    tmp = pa.table(
        {
            "namespace": namespace,
            "name": name,
            "group_key": group_key,
            "ts_minute": ts_minute,
            "value_count": pc.cast(pc.is_valid(value), pa.int64()),
            "value_sum": value,
            "value_min": value,
            "value_max": value,
        }
    )
    g = tmp.group_by(["namespace", "name", "group_key", "ts_minute"]).aggregate(
        [("value_count", "sum"), ("value_sum", "sum"), ("value_min", "min"), ("value_max", "max")]
    )
    return g.rename_columns(
        ["namespace", "name", "group_key", "ts_minute", "value_count", "value_sum", "value_min", "value_max"]
    )


_METRIC_KEYS = ["namespace", "name", "group_key", "ts_minute"]
_METRIC_COLS = _METRIC_KEYS + ["value_count", "value_sum", "value_min", "value_max"]


def metrics_aggregate(parsed_ds, batch_size: int = 65536, num_buckets: int = DEFAULT_BUCKETS,
                      namespace: str | None = "rotel_ray"):
    """EMF GroupedMetric analogue: {Count, Sum, Min, Max} per
    (namespace, name, sorted-label key, minute bucket). Two-phase bucketed.
    ``namespace=None`` derives it from service.namespace/service.name
    resource-attr columns with the "default" fallback."""

    def partial(t: pa.Table) -> pa.Table:
        return add_hash_bucket(_metrics_partial(t, namespace), _METRIC_KEYS, num_buckets)

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(_METRIC_KEYS).aggregate(
            [("value_count", "sum"), ("value_sum", "sum"), ("value_min", "min"), ("value_max", "max")]
        )
        return g.rename_columns(_METRIC_COLS)

    partials = parsed_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fused metrics + conv aggregate (one shuffle for both flagship consumers)
# ---------------------------------------------------------------------------

_FUSED_COLS: list[tuple[str, pa.DataType]] = [
    ("namespace", pa.string()), ("name", pa.string()), ("group_key", pa.string()),
    ("ts_minute", pa.timestamp("us")), ("value_count", pa.int64()),
    ("value_sum", pa.float64()), ("value_min", pa.float64()), ("value_max", pa.float64()),
    ("conv_id", pa.string()), ("n_turns", pa.int64()), ("n_tool_calls", pa.int64()),
    ("n_errors", pa.int64()), ("total_duration_ms", pa.int64()),
    ("max_severity", pa.int32()), ("first_ts", pa.timestamp("us")),
    ("last_ts", pa.timestamp("us")),
]


def _pad_to_fused(t: pa.Table, agg: str) -> pa.Table:
    n = t.num_rows
    arrays = []
    for c, typ in _FUSED_COLS:
        if c in t.column_names:
            arrays.append(pc.cast(t.column(c).combine_chunks(), typ))
        else:
            arrays.append(pa.nulls(n, typ))
    out = pa.table(dict(zip([c for c, _ in _FUSED_COLS], arrays)))
    return out.append_column("__agg", pa.nulls(n, pa.string()).fill_null(agg))


def fused_partial_batch(t: pa.Table, num_buckets: int = DEFAULT_BUCKETS,
                        namespace: str | None = "rotel_ray") -> pa.Table:
    """One batch's fused (metrics + conv) partial rows, tagged and bucketed
    (conv buckets offset into a disjoint space -> homogeneous merge groups)."""
    m = _metrics_partial(t, namespace)
    mb = add_hash_bucket(m, _METRIC_KEYS, num_buckets).column("__bucket")
    c = _conv_partial(t)
    cb = pc.add(add_hash_bucket(c, ["conv_id"], num_buckets).column("__bucket"),
                num_buckets)
    return pa.concat_tables([
        _pad_to_fused(m, "metrics").append_column("__bucket", mb),
        _pad_to_fused(c, "conv_agg").append_column("__bucket", pc.cast(cb, pa.int64())),
    ])


def fused_merge_batch(t: pa.Table) -> pa.Table:
    """Merge one homogeneous bucket group of fused partial rows."""
    agg = t.column("__agg")[0].as_py()
    if agg == "metrics":
        g = t.select(_METRIC_COLS).group_by(_METRIC_KEYS).aggregate(
            [("value_count", "sum"), ("value_sum", "sum"),
             ("value_min", "min"), ("value_max", "max")]
        )
        g = g.rename_columns(_METRIC_COLS)
    else:
        g = t.select(_CONV_COLS).group_by(["conv_id"]).aggregate(
            [("n_turns", "sum"), ("n_tool_calls", "sum"), ("n_errors", "sum"),
             ("total_duration_ms", "sum"), ("max_severity", "max"),
             ("first_ts", "min"), ("last_ts", "max")]
        )
        g = g.rename_columns(_CONV_COLS)
    return _pad_to_fused(g, agg)


def fused_metrics_conv_aggregate(parsed_ds, batch_size: int = 65536,
                                 num_buckets: int = DEFAULT_BUCKETS,
                                 namespace: str | None = "rotel_ray"):
    """Both flagship aggregates (EMF metrics grouping + conv summary) in ONE
    bucketed shuffle: each batch emits both partial sets padded to a shared
    schema with an ``__agg`` tag, conv buckets offset into a disjoint bucket
    space so every reduce group is homogeneous, and the merge dispatches on
    the tag. Halves the flagship's aggregate-side fixed latency (one
    streaming-executor launch + one sort instead of two) — the
    parallelism-independent F term that caps measured scaling efficiency at
    small corpus sizes (see BASELINE.md)."""

    partials = parsed_ds.map_batches(
        lambda t: fused_partial_batch(t, num_buckets, namespace),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
    )
    return partials.groupby("__bucket").map_groups(fused_merge_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cumulative -> delta (windowed lag within group)
# ---------------------------------------------------------------------------


def delta_within_group(
    ds,
    key: str = "conv_id",
    order: str = "turn_idx",
    value: str = "km_seq",
    retain_initial_value: bool = False,
):
    """Per-key cumulative->delta: sort by `order` within each key group,
    delta = max(v - lag(v), 0); the first sighting is dropped unless
    `retain_initial_value` (then delta = v). Exactly the delta-calculator
    contract of awsemf/transformer.rs:797-844, minus the streaming TTL.

    Groups are bounded by conversation length (<= a few thousand rows), so
    map_groups with pandas is safe; for unbounded keys use the two-phase
    pattern with per-batch deltas + boundary stitching instead.
    """

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across keys: one sort, shift masked at key boundaries
        g = g.sort_values([key, order], kind="mergesort")
        first_of_key = (g[key] != g[key].shift()).to_numpy()
        prev = g[value].shift(1)
        delta = (g[value] - prev).clip(lower=0)
        delta[first_of_key] = np.nan
        if retain_initial_value:
            out = g.assign(delta=delta.fillna(g[value]))
        else:
            out = g.assign(delta=delta)
            out = out[out["delta"].notna()]
        return out[[key, order, value, "delta"]]

    filtered = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column(value))).select([key, order, value]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_apply(filtered, [key], per_bucket)


def pair_cooccurrence(ds, *, group_col: str = "conv_id",
                      item_col: str = "tool", num_buckets: int = 64):
    """Unordered item-pair co-occurrence: for every group, every pair of
    DISTINCT items (a < b lexicographically) that appear together, counted
    over groups — the market-basket / tool-affinity view.

    Scale shape: phase 1 is a two-phase distinct on (group, item) — the
    only pass over raw rows; phase 2 buckets the distinct rows by group
    and explodes each group's k items into k(k-1)/2 pairs fully
    vectorized (repeat/arange index algebra, no per-group Python), with
    per-bucket pair-count pre-aggregation; phase 3 sums the bounded
    (item_a, item_b) partials. The pair fan-out is k per row, bounded by
    the item vocabulary, and only (group, item) ints + item strings ever
    shuffle."""
    import pandas as pd

    def narrow(t: pa.Table) -> pa.Table:
        g = t.column(group_col)
        it = t.column(item_col)
        keep = pc.and_(pc.is_valid(it), pc.not_equal(it, ""))
        return pa.table({group_col: g, item_col: it}).filter(keep)

    rows = ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    distinct = two_phase_aggregate(rows, [group_col, item_col],
                                   [(item_col, "count", "_n")],
                                   num_buckets=num_buckets)

    def explode_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"tool_a": pd.Series([], dtype=str),
                                 "tool_b": pd.Series([], dtype=str),
                                 "n_groups": pd.Series([], dtype=np.int64)})
        g = g.sort_values([group_col, item_col], kind="mergesort")
        gv = g[group_col].to_numpy()
        items = g[item_col].to_numpy()
        n = len(gv)
        seg_first = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]])
        k = np.diff(np.r_[seg_first, n])
        row_seg_start = np.repeat(seg_first, k)
        li = np.arange(n) - row_seg_start          # local index within group
        right_rows = np.repeat(np.arange(n), li)   # item j appears j times
        grp_start = np.repeat(np.cumsum(li) - li, li)
        left_rows = np.repeat(row_seg_start, li) + (
            np.arange(int(li.sum())) - grp_start)  # items 0..j-1
        out = (pd.DataFrame({"tool_a": items[left_rows],
                             "tool_b": items[right_rows]})
               .groupby(["tool_a", "tool_b"], sort=False)
               .size().rename("n_groups").reset_index())
        out["n_groups"] = out["n_groups"].astype(np.int64)
        return out

    partials = grouped_apply(distinct, [group_col], explode_pairs,
                             num_buckets=num_buckets)
    return two_phase_aggregate(partials, ["tool_a", "tool_b"],
                               [("n_groups", "sum", "n_groups")],
                               num_buckets=16)
