"""Windowed / ordered operators: sessionization, per-group top-k, as-of join.

Operators Ray Data lacks natively, composed per SURVEY.md's custom-operator
rule: ``map_batches`` partials + ``groupby().map_groups`` with an explicit
partitioning assumption — each group (a user's event stream) fits in one
task. That assumption holds for per-user/per-conversation keys whose size is
bounded by human activity; for unbounded keys, salt + two-phase instead
(see stages/aggregate.py).

- ``sessionize``      — gap-based sessions per key (the streaming-window
                        analogue of the reference's count+timeout batching,
                        src/topology/batch.rs:15-23, restated for batch).
- ``topk_per_group``  — per-batch partial top-k bounds shuffle input to
                        num_batches*k rows per group, then a final per-group
                        top-k. Deterministic ties via the id column.
- ``asof_join_backward`` — for each left event, the most recent right event
                        of the same key at ts <= left.ts (pandas merge_asof
                        within co-grouped keys; inclusive match, mirroring
                        DuckDB ASOF JOIN semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(ds, *, key: str = "user_id", ts_col: str = "ts", value_col: str = "value",
               id_col: str = "event_id", gap_minutes: float = 30.0):
    """Gap-based sessionization: a new session starts when the time since the
    key's previous event exceeds the gap. Returns one row per session:
    (key, session_idx, n_events, start_ts, end_ts, value_sum_cents)."""
    from .aggregate import grouped_apply

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every key in the bucket: one sort, shift-based
        # boundaries, no per-key Python
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        key_change = (g[key] != g[key].shift()).to_numpy()
        gap_break = ((g[ts_col] - g[ts_col].shift()) > gap).to_numpy()
        new_sess = key_change | gap_break
        sess_global = np.cumsum(new_sess)
        key_start = pd.Series(np.where(key_change, sess_global, np.nan)).ffill().to_numpy()
        sess_idx = (sess_global - key_start).astype(np.int64)
        cents = np.floor(g[value_col].to_numpy() * 100 + 0.5).astype(np.int64)
        out = (
            pd.DataFrame({key: g[key].to_numpy(), "session_idx": sess_idx,
                          ts_col: g[ts_col].to_numpy(), "cents": cents})
            .groupby([key, "session_idx"], as_index=False, sort=False)
            .agg(n_events=(ts_col, "size"), start_ts=(ts_col, "min"),
                 end_ts=(ts_col, "max"), value_sum_cents=("cents", "sum"))
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return grouped_apply(ds, [key], per_bucket, select=[key, ts_col, value_col, id_col])


def topk_per_group(ds, *, key: str = "user_id", order_col: str = "value",
                   id_col: str = "event_id", k: int = 3, cols: list[str] | None = None):
    """Top-k rows per key by (order_col desc, id_col asc) — deterministic.

    Phase 1 keeps at most k rows per key per batch (bounded shuffle);
    phase 2 finishes per key."""
    cols = cols or [key, order_col, id_col]

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        idx = pc.sort_indices(
            t, sort_keys=[(key, "ascending"), (order_col, "descending"), (id_col, "ascending")]
        )
        t = t.take(idx)
        keys = t.column(key).to_numpy(zero_copy_only=False)
        # rank within key (keys sorted): position - first position of key
        first = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        starts = np.repeat(first, np.diff(np.r_[first, len(keys)]))
        rank = np.arange(len(keys)) - starts
        return t.filter(pa.array(rank < k))

    from .aggregate import grouped_apply

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # `partial` is already vectorized across keys, so it doubles as the
    # per-bucket finisher
    return grouped_apply(partials, [key], partial, batch_format="pyarrow")


def hopping_window_aggregate(ds, *, ts_col: str = "ts", value_col: str = "value",
                             group_col: str = "event_type", window_minutes: int = 5,
                             hop_minutes: int = 1):
    """Hopping (sliding) window aggregate: each event fans out to every
    window that contains it (window/hop grid), then a two-phase grouped sum.
    The fan-out factor is window/hop (5 here) — a map-side flat_map, no
    duplicate shuffle passes. Tumbling windows are the hop==window case
    (see queries.events_minute)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .aggregate import two_phase_aggregate

    fanout = window_minutes // hop_minutes
    hop_us = hop_minutes * 60_000_000

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        base = (ts // hop_us) * hop_us  # hop-aligned bin containing the event
        # windows starting at base, base-hop, ..., base-(fanout-1)*hop
        starts = (base[:, None] - np.arange(fanout)[None, :] * hop_us).reshape(-1)
        idx = np.repeat(np.arange(n), fanout)
        cents = np.floor(
            t.column(value_col).to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)[idx]
        return pa.table(
            {
                "window_start": pa.array(starts).cast(pa.timestamp("us")),
                group_col: pc.take(t.column(group_col).combine_chunks(), pa.array(idx)),
                "value_cents": pa.array(cents),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return two_phase_aggregate(
        exploded, [group_col, "window_start"],
        [("value_cents", "sum", "sum_value_cents"), ("value_cents", "count", "n")],
    )


def range_join_time(left_ds, right_ds, *, ts_col: str = "ts", key: str | None = None,
                    before_minutes: float = 1.0, after_minutes: float = 1.0,
                    left_id: str = "event_id", right_id: str = "event_id",
                    bin_minutes: float | None = None):
    """Time-range join: pair each left row with every right row whose ts is
    within [left.ts - before, left.ts + after] (optionally same `key`).

    Ray-native shape: both sides are binned on a time grid sized to the
    range; each left row is routed to its bin plus enough neighbor bins to
    cover the range, so every qualifying pair co-locates in exactly one
    bin-group; the exact predicate filters within groups. Shuffle key = one
    int column; no all-pairs anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .aggregate import grouped_apply

    bin_minutes = bin_minutes or max(before_minutes, after_minutes)
    bin_us = int(bin_minutes * 60_000_000)
    before_us = int(before_minutes * 60_000_000)
    after_us = int(after_minutes * 60_000_000)
    # right rows go to their own bin; left rows replicate over the bins its
    # range can touch
    lo_off = -(-before_us // bin_us)  # ceil
    hi_off = -(-after_us // bin_us)

    def tag(side: int, id_col: str, replicate: bool):
        def f(t: pa.Table) -> pa.Table:
            ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            keys = t.column(key).to_numpy(zero_copy_only=False) if key else None
            base = ts // bin_us
            if replicate:
                offs = np.arange(-lo_off, hi_off + 1)
                bins = (base[:, None] + offs[None, :]).reshape(-1)
                idx = np.repeat(np.arange(len(ts)), len(offs))
            else:
                bins = base
                idx = np.arange(len(ts))
            cols = {
                "bin": pa.array(bins.astype(np.int64)),
                "rid": pa.array(ids[idx]),
                "rts": pa.array(ts[idx]),
                "side": pa.array(np.full(len(idx), side, np.int8)),
            }
            if key:
                cols["k"] = pa.array(keys[idx])
            return pa.table(cols)

        return f

    lt = left_ds.map_batches(tag(0, left_id, True), batch_format="pyarrow", zero_copy_batch=True)
    rt = right_ds.map_batches(tag(1, right_id, False), batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # a right row lives in exactly ONE bin while the left row is
        # replicated across every bin its range touches, so each qualifying
        # pair materializes in exactly one bin-group — no dedup needed
        out = []
        for _, gb in g.groupby("bin", sort=False):
            l = gb[gb["side"] == 0]
            r = gb[gb["side"] == 1]
            if l.empty or r.empty:
                continue
            if key:
                m = l.merge(r, on="k", how="inner", suffixes=("_l", "_r"))
            else:
                m = l.merge(r, how="cross", suffixes=("_l", "_r"))
            m = m[(m["rts_r"] >= m["rts_l"] - before_us) & (m["rts_r"] <= m["rts_l"] + after_us)]
            out.append(m[["rid_l", "rts_l", "rid_r", "rts_r"]])
        if not out:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in ("left_id", "left_ts", "right_id", "right_ts")})
        res = pd.concat(out)
        res.columns = ["left_id", "left_ts", "right_id", "right_ts"]
        return res

    joined = grouped_apply(both, ["bin"], per_bucket)

    def finish(t: pa.Table) -> pa.Table:
        for c in ("left_ts", "right_ts"):
            t = t.set_column(t.column_names.index(c), c,
                             pc.cast(pc.cast(t.column(c), pa.int64()), pa.timestamp("us")))
        return t

    return joined.map_batches(finish, batch_format="pyarrow")


def asof_join_backward(left_ds, right_ds, *, key: str = "user_id", ts_col: str = "ts",
                       left_cols: list[str] | None = None,
                       right_cols: list[str] | None = None,
                       right_suffix: str = "_right"):
    """For each left row, attach the latest right row of the same key with
    right.ts <= left.ts (inclusive; unmatched left rows dropped).

    Implementation: tag + union both sides, co-group by key, merge_asof
    within each group — one shuffle on the shared key, the partitioning
    assumption (one key's rows fit a task) documented above."""
    l_schema = dict(zip(left_ds.schema().names, left_ds.schema().types))
    r_schema = dict(zip(right_ds.schema().names, right_ds.schema().types))
    left_cols = left_cols or [c for c in l_schema if c not in (key, ts_col)]
    right_cols = right_cols or [c for c in r_schema if c not in (key, ts_col)]
    # union schema: both sides padded with typed nulls for the other's columns
    all_cols = [key, ts_col] + left_cols + [c for c in right_cols if c not in left_cols]
    col_type = {**r_schema, **l_schema}

    def tag(side: str, keep: list[str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays = []
            for c in all_cols:
                arrays.append(
                    t.column(c) if c in keep or c in (key, ts_col) else pa.nulls(n, col_type[c])
                )
            out = pa.table(dict(zip(all_cols, arrays)))
            return out.append_column("__side", pa.array([side] * n, pa.string()))

        return f

    lt = left_ds.map_batches(tag("l", left_cols), batch_format="pyarrow", zero_copy_batch=True)
    rt = right_ds.map_batches(tag("r", right_cols), batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # merge_asof with by=key handles every key in the bucket in one
        # vectorized pass (both frames sorted by ts)
        l = g[g["__side"] == "l"].sort_values(ts_col, kind="mergesort")
        r = g[g["__side"] == "r"].sort_values(ts_col, kind="mergesort")
        merged = pd.merge_asof(
            l[[key, ts_col] + left_cols],
            r[[key, ts_col] + right_cols].rename(
                columns={ts_col: ts_col + right_suffix,
                         **{c: c + right_suffix for c in right_cols if c in left_cols}}
            ),
            left_on=ts_col,
            right_on=ts_col + right_suffix,
            by=key,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged.dropna(subset=[ts_col + right_suffix])

    from .aggregate import grouped_apply

    return grouped_apply(both, [key], per_bucket)


def global_topfrac(ds, *, value_col: str, id_col: str, num: int = 1, den: int = 4,
                   bins: int = 4096, num_buckets: int = 64):
    """Exact global top-``num/den`` fraction by ``(value_col desc, id_col
    asc)`` with each kept row's exact global rank — the selection step of
    importance resampling / quality filtering.

    Scale shape (exact distributed rank, no global sort materialized on any
    single task):

    1. one two-phase pass reduces the table to a single (lo, hi, n) row —
       global value range and row count;
    2. every row gets an integer range bin ``(v - lo) * bins // span`` (pure
       int64 math — deterministic); per-bin counts go through the generic
       two-phase aggregate, so the driver sees <= ``bins`` rows and
       exclusive-cumsums them in DESCENDING bin order into per-bin rank
       bases (a few KB, broadcast in the task closure);
    3. a bucketed ``grouped_apply`` over the bin key sorts each bin's rows
       (vectorized across the bins sharing a shuffle bucket), adds the bin
       base, and filters to ``rank <= ceil(n * num / den)`` — rows are
       dropped inside the reduce task, before any concat.

    Degenerate skew: if every value is identical all rows land in one bin
    (one task sorts everything) — same caveat as any range partitioning;
    ``bins`` only bounds driver state, the per-task load follows the value
    distribution.

    Values must be integers (the engine's exact-arithmetic convention).
    Output: (id_col, value_col, rnk), only the kept rows.
    """
    from .aggregate import grouped_apply, two_phase_aggregate

    # three consumers (range stats, bin counts, the rank pass) — checkpoint
    # the narrow (id, value) table once instead of re-running the upstream
    # pipeline per consumer (same rationale as seq_pack's counts table)
    ds = ds.materialize()

    def stat_partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        return pa.table({"k": pa.array([0], pa.int32()),
                         "lo": pa.array([pc.min(v).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(v).as_py()], pa.int64()),
                         "n": pa.array([len(t)], pa.int64())})

    stats = two_phase_aggregate(
        ds.map_batches(stat_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], [("lo", "min", "lo"), ("hi", "max", "hi"), ("n", "sum", "n")],
        num_buckets=1).take_all()
    if not stats:
        import ray
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()), value_col: pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64())}))
    lo, hi, total = int(stats[0]["lo"]), int(stats[0]["hi"]), int(stats[0]["n"])
    span = max(hi - lo + 1, 1)
    k = -(-total * num // den)  # ceil(total * num / den), int math

    def add_bin(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.int64()).to_numpy(zero_copy_only=False)
        b = (v - lo) * bins // span
        return t.append_column("__bin", pa.array(b)).replace_schema_metadata(None)

    binned = ds.map_batches(add_bin, batch_format="pyarrow", zero_copy_batch=True)

    def bin_counts(t: pa.Table) -> pa.Table:
        ub, uc = np.unique(t.column("__bin").to_numpy(zero_copy_only=False),
                           return_counts=True)
        return pa.table({"__bin": pa.array(ub), "c": pa.array(uc.astype(np.int64))})

    cnts = two_phase_aggregate(
        binned.map_batches(bin_counts, batch_format="pyarrow", zero_copy_batch=True),
        ["__bin"], [("c", "sum", "c")], num_buckets=num_buckets).take_all()
    per_bin = np.zeros(bins, np.int64)
    for r in cnts:
        per_bin[r["__bin"]] = r["c"]
    # rank bases: rows in HIGHER-value bins rank first
    above = np.concatenate([np.cumsum(per_bin[::-1])[::-1][1:], [0]])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__bin", value_col, id_col],
                            ascending=[True, False, True], kind="mergesort")
        within = df.groupby("__bin", sort=False).cumcount().to_numpy()
        rnk = above[df["__bin"].to_numpy()] + within + 1
        out = df[[id_col, value_col]].copy()
        out["rnk"] = rnk
        return out[out.rnk <= k]

    return grouped_apply(binned, ["__bin"], per_bucket, num_buckets=num_buckets)


def global_quantiles(ds, *, value_col: str, qs: tuple = (0.5, 0.95, 0.99),
                     bins: int = 4096, num_buckets: int = 8):
    """EXACT global quantiles of an int64 column without any global sort —
    iterative range bisection (the classic distributed-selection algorithm).

    ``quantile_disc`` semantics (inverted CDF): result for q is the value at
    1-based rank ``max(1, ceil(q*n))`` of the ascending order.

    Each pass histograms the values into ``bins`` equal-width ranges of each
    still-unresolved target's current interval (one shared scan for ALL
    targets), the driver walks the <= bins counts to find the bin holding
    the target rank, and the interval narrows by ~bins x. Int64 ranges
    resolve in <= ceil(64 / log2(bins)) = 6 passes; driver state is
    O(bins * len(qs)) counts. The value table is materialized once
    (one int64 column) so passes don't re-run the upstream pipeline.
    """
    from .aggregate import two_phase_aggregate

    vals = ds.map_batches(
        lambda t: pa.table({"v": pc.cast(t.column(value_col), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    stats = two_phase_aggregate(
        vals.map_batches(
            lambda t: pa.table({"k": pa.array([0], pa.int32()),
                                "lo": pa.array([pc.min(t.column("v")).as_py()], pa.int64()),
                                "hi": pa.array([pc.max(t.column("v")).as_py()], pa.int64()),
                                "n": pa.array([len(t)], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["k"], [("lo", "min", "lo"), ("hi", "max", "hi"), ("n", "sum", "n")],
        num_buckets=1).take_all()
    import ray
    if not stats or not stats[0]["n"] or stats[0]["lo"] is None:
        return ray.data.from_arrow(pa.table({
            "q": pa.array([], pa.float64()), "value": pa.array([], pa.int64())}))
    lo0, hi0, n = int(stats[0]["lo"]), int(stats[0]["hi"]), int(stats[0]["n"])

    # per-target state: interval [lo, hi] and 1-based rank within it;
    # ceil(q*n) in exact int math (q as the rational it was written as, so
    # 0.95 means 95/100 — no float-product edge at rank boundaries)
    from fractions import Fraction

    state = {}
    for i, q in enumerate(qs):
        r = Fraction(q).limit_denominator(10**6) * n
        state[i] = (lo0, hi0, max(1, -(-r.numerator // r.denominator)))

    result = {}
    while state:
        for i, (lo, hi, r) in list(state.items()):
            if lo == hi:
                result[i] = lo
                del state[i]
        if not state:
            break
        iv = {i: s for i, s in state.items()}

        def hist(t: pa.Table, iv=dict(iv)) -> pa.Table:
            v = t.column("v").to_numpy(zero_copy_only=False)
            ts, bs, cs = [], [], []
            for i, (lo, hi, _r) in iv.items():
                m = v[(v >= lo) & (v <= hi)]
                if len(m) == 0:
                    continue
                width = hi - lo + 1
                b = (m - lo) * bins // width
                ub, uc = np.unique(b, return_counts=True)
                ts.append(np.full(len(ub), i, np.int64))
                bs.append(ub)
                cs.append(uc.astype(np.int64))
            if not ts:
                return pa.table({"t": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({"t": pa.array(np.concatenate(ts)),
                             "b": pa.array(np.concatenate(bs)),
                             "c": pa.array(np.concatenate(cs))})

        counts = two_phase_aggregate(
            vals.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
            ["t", "b"], [("c", "sum", "c")], num_buckets=num_buckets).take_all()
        per = {}
        for row in counts:
            per.setdefault(row["t"], {})[row["b"]] = row["c"]
        for i, (lo, hi, r) in list(state.items()):
            width = hi - lo + 1
            acc = 0
            for b in range(bins):
                c = per.get(i, {}).get(b, 0)
                if acc + c >= r:
                    # exact bin-b value range under v -> (v-lo)*bins//width:
                    # [lo + ceil(b*width/bins), lo + ceil((b+1)*width/bins) - 1]
                    # — the carried rank r-acc is the rank WITHIN exactly
                    # this value set (floor edges would leak bin b-1 values
                    # into the next pass and shift ranks)
                    nlo = lo + (-(-b * width // bins))
                    nhi = min(hi, lo + (-(-(b + 1) * width // bins)) - 1)
                    state[i] = (nlo, nhi, r - acc)
                    break
                acc += c

    import ray
    return ray.data.from_arrow(pa.table({
        "q": pa.array([float(q) for q in qs]),
        "value": pa.array([result[i] for i in range(len(qs))], pa.int64()),
    }))


def transition_counts(ds, *, key: str = "conv_id", order_col: str = "turn_idx",
                      state_col: str = "role", num_buckets: int = 64):
    """Global Markov transition counts over per-group ordered sequences —
    the state-machine statistic of conversation/session analytics (who
    speaks after whom; which tool follows which). Two bounded shuffles:
    sequences co-partition by ``key`` hash bucket (grouped_apply — one sort
    + shift per bucket, vectorized across groups), each bucket emits its
    (from, to, n) partial, and a tiny two-phase reduce sums partials over
    the state-space-bounded result."""
    from .aggregate import grouped_apply, two_phase_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        kv = g[key].to_numpy()
        sv = g[state_col].to_numpy()
        same = kv[:-1] == kv[1:] if len(g) else np.zeros(0, bool)
        out = (pd.DataFrame({"from_state": sv[:-1][same], "to_state": sv[1:][same]})
               .groupby(["from_state", "to_state"], as_index=False, sort=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = grouped_apply(ds, [key], per_bucket,
                          select=[key, order_col, state_col],
                          num_buckets=num_buckets)
    return two_phase_aggregate(parts, ["from_state", "to_state"],
                               [("n", "sum", "n")], num_buckets=8)


def latest_per_key(ds, *, key: str = "user_id", order_cols: list[str] | None = None,
                   num_buckets: int = 64):
    """Latest-wins compaction: one surviving row per key — the newest by
    ``order_cols`` (default ts desc, then the last column desc as the
    uniqueness tie-break), i.e. the CDC upsert / changelog-compaction
    semantics of a keyed event stream.

    Scale shape: per-batch PRE-compaction first (each batch keeps at most
    one row per key it sees — the combiner step, so the shuffle moves one
    row per (batch, key), never the stream), then the bucketed grouped_apply
    picks the global winner per key."""
    from .aggregate import grouped_apply

    order_cols = order_cols or ["ts", "event_id"]

    def keep_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols],
                          ascending=[True] + [False] * len(order_cols),
                          kind="mergesort")
        return g[~g[key].duplicated()].reset_index(drop=True)

    def pre(t: pa.Table) -> pa.Table:
        # Arrow-native combiner: sort (key asc, order desc) + first-per-key
        # mask — no pandas round-trip on the full-stream path
        idx = pc.sort_indices(
            t, [(key, "ascending")] + [(c, "descending") for c in order_cols])
        t = t.take(idx)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        first = np.r_[True, kv[1:] != kv[:-1]] if len(kv) else np.zeros(0, bool)
        return t.filter(pa.array(first)).replace_schema_metadata(None)

    pre_ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(pre_ds, [key], keep_latest, num_buckets=num_buckets)


def rolling_sum(ds, *, key: str, order_cols: list[str], value_col: str,
                window: int = 5, num_buckets: int = 64):
    """Per-key rolling row-window sum (``window`` rows ending at the current
    row, fewer at the head) over cents-integer values — ROWS BETWEEN n-1
    PRECEDING AND CURRENT ROW semantics, exact int64.

    One bucketed shuffle; inside a bucket the window is a prefix-sum
    difference over the (key, order) sort with per-key head correction —
    vectorized across all keys in the bucket, no per-key Python."""
    from .aggregate import grouped_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="mergesort")
        cents = np.floor(g[value_col].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(g)
        pref = np.r_[0, np.cumsum(cents)]
        # first row index of each key's run
        kv = g[key].to_numpy()
        new_key = np.r_[True, kv[1:] != kv[:-1]] if n else np.zeros(0, bool)
        run_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        lo = np.maximum(np.arange(n) - window + 1, run_start)
        roll = pref[np.arange(n) + 1] - pref[lo]
        out = g[[key, *order_cols]].copy()
        out["roll_cents"] = roll
        return out.reset_index(drop=True)

    return grouped_apply(ds, [key], per_bucket,
                         select=[key, *order_cols, value_col],
                         num_buckets=num_buckets)


def latest_with_tombstones(ds, *, key: str = "user_id",
                           order_cols: list[str] | None = None,
                           tombstone_col: str = "event_type",
                           tombstones: tuple = ("error",),
                           num_buckets: int = 64):
    """CDC compaction WITH deletes: latest-wins per key, then any key whose
    winning row is a tombstone disappears entirely — the Kafka
    log-compaction / Debezium delete-marker semantics (a delete only wins
    if nothing newer re-upserts the key). Built on :func:`latest_per_key`;
    the tombstone filter is a stateless post-pass, so the scale shape
    (per-batch pre-compaction, one bucketed shuffle) is unchanged."""
    latest = latest_per_key(ds, key=key, order_cols=order_cols,
                            num_buckets=num_buckets)

    def drop_tombstones(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(t.column(tombstone_col),
                                  value_set=pa.array(list(tombstones))))
        return t.filter(keep)

    return latest.map_batches(drop_tombstones, batch_format="pyarrow",
                              zero_copy_batch=True)


def conv_quality(ds, *, key: str = "conv_id", order_col: str = "turn_idx",
                 role_col: str = "role", text_col: str = "text",
                 num_buckets: int = 64):
    """Conversation-level SFT curation rollup: per conversation the turn
    count, exact char sum, and the number of role-alternation violations
    (adjacent turns by the same speaker — the broken-dialogue signal SFT
    filters drop on). Char counts come from the vectorized Arrow length
    kernel BEFORE the shuffle, so the exchange moves (key, order, role,
    int) — never text; inside the reduce everything is vectorized across
    all conversations in the bucket (sorted scan + reduceat). Output:
    (key, n_turns, sum_chars, n_same_role_adjacent)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .aggregate import grouped_apply

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            order_col: t.column(order_col),
            role_col: t.column(role_col),
            "n_chars": pc.cast(pc.fill_null(
                pc.utf8_length(t.column(text_col).combine_chunks()), 0),
                pa.int64()),
        })

    counted = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        kv = g[key].to_numpy()
        rv = g[role_col].to_numpy()
        ch = g["n_chars"].to_numpy().astype(np.int64)
        same = (kv[:-1] == kv[1:]) & (rv[:-1] == rv[1:]) if len(g) \
            else np.zeros(0, bool)
        first = np.r_[True, kv[1:] != kv[:-1]] if len(g) else np.zeros(0, bool)
        starts = np.flatnonzero(first)
        n_turns = np.diff(np.r_[starts, len(kv)])
        sum_chars = np.add.reduceat(ch, starts) if len(kv) else np.empty(0, np.int64)
        viol_flags = np.r_[False, same]  # violation charged to the LATER turn
        viol = np.add.reduceat(viol_flags.astype(np.int64), starts) \
            if len(kv) else np.empty(0, np.int64)
        return pd.DataFrame({
            key: kv[starts],
            "n_turns": n_turns.astype(np.int64),
            "sum_chars": sum_chars.astype(np.int64),
            "n_same_role_adjacent": viol,
        })

    return grouped_apply(counted, [key], per_bucket,
                         num_buckets=num_buckets)


def turn_latency(ds, *, key: str = "conv_id", order_col: str = "turn_idx",
                 role_col: str = "role", ts_col: str = "ts",
                 num_buckets: int = 64):
    """Inter-turn latency rollup by (role_from -> role_to) speaker pair —
    the conversational-analytics twin of the events sessionizer: for every
    adjacent turn pair within a conversation, the microsecond gap is
    charged to the (previous role, current role) transition; output one row
    per pair with exact integer (n, sum_us, mean_us = sum_us // n).

    Scale shape: timestamps collapse to int64 micros on the map side and
    the bucketed shuffle carries (conv, order, role, int) — never text;
    each bucket pre-aggregates its pairs to per-(role_from, role_to)
    partials with one sorted scan, so the final exchange is a handful of
    rows per bucket."""
    from .aggregate import grouped_apply, two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            order_col: t.column(order_col),
            role_col: t.column(role_col),
            "us": t.column(ts_col).combine_chunks().cast(pa.int64()),
        })

    narrowed = ds.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"role_from": pd.Series([], dtype=str),
                                 "role_to": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64),
                                 "sum_us": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, order_col], kind="mergesort")
        kv = g[key].to_numpy()
        rv = g[role_col].to_numpy()
        us = g["us"].to_numpy().astype(np.int64)
        same = kv[1:] == kv[:-1]
        pair = pd.DataFrame({"role_from": rv[:-1][same],
                             "role_to": rv[1:][same],
                             "d": us[1:][same] - us[:-1][same]})
        out = (pair.groupby(["role_from", "role_to"], sort=False)
               .agg(n=("d", "size"), sum_us=("d", "sum")).reset_index())
        out["n"] = out["n"].astype(np.int64)
        out["sum_us"] = out["sum_us"].astype(np.int64)
        return out

    partials = grouped_apply(narrowed, [key], per_bucket,
                             num_buckets=num_buckets)
    rolled = two_phase_aggregate(
        partials, ["role_from", "role_to"],
        [("n", "sum", "n"), ("sum_us", "sum", "sum_us")],
        num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        s = t.column("sum_us").to_numpy(zero_copy_only=False)
        return t.append_column("mean_us", pa.array(s // n))

    return rolled.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# watermark / late-data accounting (bounded out-of-orderness)
# ---------------------------------------------------------------------------

OOO_VERSION = 1
OOO_WINDOW = 64            # max rank displacement (bounded disorder)
LATE_DELAY_US = 3_600_000_000  # 1 h allowed lateness


def ooo_events_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (never builds) — safe to embed in oracle SQL."""
    import os

    from .planted import source_tag

    tag = source_tag(f"{sf_dir}/events.parquet")
    return os.path.join(root, f"oooevents_g{OOO_VERSION}_{tag}")


def ensure_ooo_events(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Events with a deterministic BOUNDED-disorder arrival order (the
    Flink out-of-orderness model): rows sort by ts, then each rank is
    jittered forward by md5(event_id) % OOO_WINDOW and the stable argsort
    of the jittered rank becomes ``arrival_seq``. Pure function of the
    source, cached with the content-fingerprint key."""
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq

    out = ooo_events_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "ts", "event_type"])
    order = pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                          ("event_id", "ascending")])
    t = t.take(order)
    eids = t.column("event_id").to_numpy(zero_copy_only=False)
    jit = np.array([int(hashlib.md5(str(int(e)).encode()).hexdigest()[:8], 16)
                    % OOO_WINDOW for e in eids], np.int64)
    keyed = np.arange(len(eids), dtype=np.int64) + jit
    arrival = np.empty(len(eids), np.int64)
    arrival[np.argsort(keyed, kind="stable")] = np.arange(len(eids))
    t = t.append_column("arrival_seq", pa.array(arrival))
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, os.path.join(tmp, "part-0000.parquet"),
                   row_group_size=16384)
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def late_events(ds, *, delay_us: int = LATE_DELAY_US,
                seq_col: str = "arrival_seq", ts_col: str = "ts",
                type_col: str = "event_type", chunk: int = 4096,
                num_buckets: int = 16):
    """Watermark late-data accounting under bounded out-of-orderness: the
    watermark at arrival i is max(ts of arrivals < i) − ``delay_us``; an
    event is LATE iff its ts falls below that watermark (the row a
    streaming engine would drop or side-output). Output: one row per
    (event_type, late) with exact counts.

    Scale shape: the running prefix-max decomposes by arrival chunks —
    phase 1 reduces each ``chunk``-arrival range to one (chunk, max_ts)
    row two-phase; the driver folds the per-chunk maxima into carry-ins
    (one int per chunk — size n/chunk, the same driver-bounded shape as
    compaction_plan's per-file rows; scale ``chunk`` with the corpus) and
    broadcasts them; phase 2 buckets by chunk and finishes each chunk
    with one vectorized cummax. No global sort of the data — only int
    metadata crosses the driver."""
    import ray

    from .aggregate import grouped_apply, two_phase_aggregate

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "seq": t.column(seq_col),
            "us": t.column(ts_col).combine_chunks().cast(pa.int64()),
            type_col: t.column(type_col),
        })

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def chunk_ids(t: pa.Table) -> pa.Table:
        seq = t.column("seq").to_numpy(zero_copy_only=False)
        return t.append_column("chunk", pa.array(seq // chunk))

    chunked = rows.map_batches(chunk_ids, batch_format="pyarrow",
                               zero_copy_batch=True)
    cmax = two_phase_aggregate(chunked, ["chunk"],
                               [("us", "max", "mx")],
                               num_buckets=num_buckets).take_all()
    cmax.sort(key=lambda r: r["chunk"])
    n_chunks = cmax[-1]["chunk"] + 1 if cmax else 0
    carry = np.full(n_chunks, np.iinfo(np.int64).min // 4, np.int64)
    run = np.iinfo(np.int64).min // 4
    for r in cmax:
        carry[r["chunk"]] = run
        run = max(run, r["mx"])
    ref = ray.put(carry)

    def per_bucket(g):
        import pandas as pd

        if not len(g):
            return pd.DataFrame({type_col: pd.Series([], dtype=str),
                                 "late": pd.Series([], dtype=bool),
                                 "n_events": pd.Series([], dtype=np.int64)})
        carry_l = ray.get(ref)
        g = g.sort_values("seq", kind="mergesort")
        seq = g["seq"].to_numpy()
        us = g["us"].to_numpy().astype(np.int64)
        ch = g["chunk"].to_numpy()
        starts = np.flatnonzero(np.r_[True, ch[1:] != ch[:-1]])
        wm_prev = np.empty(len(us), np.int64)
        for s, e in zip(starts, np.r_[starts[1:], len(us)]):
            cm = np.maximum.accumulate(us[s:e])
            wm_prev[s:e] = np.r_[carry_l[ch[s]],
                                 np.maximum(cm[:-1], carry_l[ch[s]])]
        late = us < wm_prev - delay_us
        out = (pd.DataFrame({type_col: g[type_col].to_numpy(),
                             "late": late})
               .groupby([type_col, "late"], sort=False)
               .size().rename("n_events").reset_index())
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    partials = grouped_apply(chunked, ["chunk"], per_bucket,
                             num_buckets=num_buckets)
    return two_phase_aggregate(partials, [type_col, "late"],
                               [("n_events", "sum", "n_events")],
                               num_buckets=4)


def session_conversion(ds, *, key: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type", id_col: str = "event_id",
                       gap_minutes: float = 30.0, click: str = "click",
                       purchase: str = "purchase", num_buckets: int = 64):
    """Session conversion funnel: inside each gap-based session (same
    break rule as :func:`sessionize` — a >``gap_minutes`` silence starts a
    new one), did a ``purchase`` land strictly after the first ``click``?
    Output is ONE row: (n_sessions, n_with_click, n_converted) exact
    int64 — the product-analytics funnel restated over the event stream.

    Scale shape: one bucketed shuffle by user key; each bucket resolves
    all its users' sessions with one sort + shift-based breaks (the
    sessionize kernel) and two grouped min/max reductions, then emits a
    3-int partial; the final exchange merges num_buckets rows."""
    from .aggregate import grouped_apply, two_phase_aggregate

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"k": pd.Series([], dtype=np.int64),
                "n_sessions": pd.Series([], dtype=np.int64),
                "n_with_click": pd.Series([], dtype=np.int64),
                "n_converted": pd.Series([], dtype=np.int64)}
        if not len(g):
            return pd.DataFrame(cols)
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        key_change = (g[key] != g[key].shift()).to_numpy()
        gap_break = ((g[ts_col] - g[ts_col].shift()) > gap).to_numpy()
        sid = np.cumsum(key_change | gap_break)
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g[type_col].to_numpy()
        big = np.iinfo(np.int64).max
        f = pd.DataFrame({
            "sid": sid,
            "c_us": np.where(et == click, us, big),    # min -> first click
            "p_us": np.where(et == purchase, us, -1),  # max -> last purchase
        })
        agg = f.groupby("sid").agg(c1=("c_us", "min"), p1=("p_us", "max"))
        n_sessions = len(agg)
        n_click = int((agg.c1 < big).sum())
        n_conv = int(((agg.c1 < big) & (agg.p1 > agg.c1)).sum())
        return pd.DataFrame({"k": np.array([0], np.int64),
                             "n_sessions": np.array([n_sessions], np.int64),
                             "n_with_click": np.array([n_click], np.int64),
                             "n_converted": np.array([n_conv], np.int64)})

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col, type_col, id_col],
                             num_buckets=num_buckets)
    out = two_phase_aggregate(
        partials, ["k"],
        [("n_sessions", "sum", "n_sessions"),
         ("n_with_click", "sum", "n_with_click"),
         ("n_converted", "sum", "n_converted")], num_buckets=2)
    return out.drop_columns(["k"])


def rate_spikes(ds, *, type_col: str = "event_type", ts_col: str = "ts",
                window: int = 16, factor_num: int = 3, factor_den: int = 2,
                num_buckets: int = 16):
    """Alerting-style rate-spike detection: bucket events into minutes, then
    flag any (type, minute) whose count exceeds ``factor_num/factor_den``
    times its trailing-``window``-minute average — evaluated as the integer
    cross-multiplication ``factor_den * window * n > factor_num * trail_sum``
    (rational factors without ever dividing) so the rule is
    division-free and exactly SQL-mirrorable (ROWS BETWEEN window PRECEDING
    AND 1 PRECEDING; only full windows can flag). The trailing window is
    over OBSERVED minutes (rows), not calendar minutes — the convention that
    stays well-defined across sparse series; document the choice, don't
    hide it.

    Scale shape: the raw stream collapses to (type, minute) partial counts
    inside each batch before any shuffle (two-phase count), then ONE bucketed
    exchange of the minute series; inside a bucket the trailing sum is a
    prefix-sum difference vectorized across every type in the bucket
    (per-key head correction, no per-key Python) — the rolling_sum shape."""
    from .aggregate import grouped_apply, two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            type_col: t.column(type_col),
            "ts_minute": pc.floor_temporal(t.column(ts_col), unit="minute"),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
        })

    counts = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [type_col, "ts_minute"], [("one", "sum", "n")],
        num_buckets=num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(type_col, "ascending"),
                                            ("ts_minute", "ascending")])
        t = t.take(idx)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        kv = np.asarray(t.column(type_col).to_pylist(), dtype=object)
        m = len(n)
        pref = np.r_[0, np.cumsum(n)]
        new_key = np.r_[True, kv[1:] != kv[:-1]] if m else np.zeros(0, bool)
        run_start = np.maximum.accumulate(
            np.where(new_key, np.arange(m), 0)) if m else np.zeros(0, np.int64)
        lo = np.maximum(np.arange(m) - window, run_start)
        trail = pref[np.arange(m)] - pref[lo]
        full = (np.arange(m) - run_start) >= window
        spike = full & (factor_den * window * n > factor_num * trail)
        return pa.table({
            type_col: t.column(type_col),
            "ts_minute": t.column("ts_minute"),
            "n": pa.array(n),
            "trail_sum": pa.array(trail.astype(np.int64)),
            "spike": pa.array(spike),
        })

    return grouped_apply(counts, [type_col], per_bucket,
                         num_buckets=num_buckets, batch_format="pyarrow")


def retry_storms(ds, *, key: str = "conv_id", order_col: str = "turn_idx",
                 group_col: str = "tool_name", fail_col: str = "tool_exit",
                 min_run: int = 2, num_buckets: int = 64):
    """Retry-storm mining: maximal runs of CONSECUTIVE failed calls to the
    same tool within a conversation (consecutive in the tool-call
    subsequence — intervening chat turns don't break a run, matching how an
    agent actually retries). One row per run of length >= ``min_run``:
    (conv, tool, start/end turn, call count). The gaps-and-islands shape —
    value-change islands, where sessionize is the time-gap variant.

    Scale shape: rows are filtered to tool calls and narrowed to 4 columns
    BEFORE the one bucketed exchange; island detection inside a bucket is a
    boundary-mask + ``reduceat`` over the (key, order) sort, vectorized
    across every conversation in the bucket."""
    from .aggregate import grouped_apply

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                            (order_col, "ascending")])
        t = t.take(idx)
        n = t.num_rows
        conv = np.asarray(t.column(key).to_pylist(), dtype=object)
        tool = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        turn = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        failed = pc.not_equal(t.column(fail_col), 0).to_numpy(
            zero_copy_only=False)
        if n == 0:
            return pa.table({key: pa.array([], pa.string()),
                             group_col: pa.array([], pa.string()),
                             "start_turn": pa.array([], pa.int64()),
                             "end_turn": pa.array([], pa.int64()),
                             "n_calls": pa.array([], pa.int64())})
        boundary = np.r_[True, (conv[1:] != conv[:-1])
                         | (tool[1:] != tool[:-1])
                         | (failed[1:] != failed[:-1])]
        starts = np.flatnonzero(boundary)
        ends = np.r_[starts[1:], n] - 1
        lens = ends - starts + 1
        keep = failed[starts] & (lens >= min_run)
        s, e = starts[keep], ends[keep]
        return pa.table({
            key: pa.array(conv[s], pa.string()),
            group_col: pa.array(tool[s], pa.string()),
            "start_turn": pa.array(turn[s]),
            "end_turn": pa.array(turn[e]),
            "n_calls": pa.array((e - s + 1).astype(np.int64)),
        })

    return grouped_apply(ds, [key], per_bucket, num_buckets=num_buckets,
                         batch_format="pyarrow")


def group_quantiles(ds, *, key: str = "tool_name",
                    value_col: str = "duration_ms",
                    percents: tuple = (50, 95, 99), num_buckets: int = 16):
    """Exact per-group percentiles over a bounded-cardinality integer value
    (latency-style columns: ms durations, status codes, sizes-in-KB): the
    stream collapses to (key, value) -> count partials inside each batch, so
    the shuffle is bounded by the DISTINCT value count per group — never the
    row count — and the per-group rank selection is a cumsum over the sorted
    value histogram. Rank convention: 0-based floor rank
    ``p * (n - 1) // 100`` (the window.global_quantiles convention), so
    every reported percentile is an actually-observed value.

    Scale note: this is the exact path for value domains like ms-granular
    latencies (<=~10^6 distinct); for unbounded/continuous domains use
    sketch.quantile_sketch's equal-width binning instead."""
    from .aggregate import grouped_apply, two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            "v": pc.cast(t.column(value_col), pa.int64()),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
        })

    counts = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [key, "v"], [("one", "sum", "n")], num_buckets=num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                            ("v", "ascending")])
        t = t.take(idx)
        kv = np.asarray(t.column(key).to_pylist(), dtype=object)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        m = len(v)
        out_k, out_n, out_p = [], [], {p: [] for p in percents}
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]]) if m else []
        bounds = np.r_[starts, m] if m else np.array([0])
        for a, b in zip(bounds[:-1], bounds[1:]):
            cum = np.cumsum(n[a:b])
            tot = int(cum[-1])
            out_k.append(kv[a])
            out_n.append(tot)
            for p in percents:
                rank = p * (tot - 1) // 100
                out_p[p].append(int(v[a + int(np.searchsorted(cum, rank + 1))]))
        cols = {key: pa.array(out_k, pa.string()),
                "n_rows": pa.array(out_n, pa.int64())}
        for p in percents:
            cols[f"p{p}"] = pa.array(out_p[p], pa.int64())
        return pa.table(cols)

    return grouped_apply(counts, [key], per_bucket, num_buckets=num_buckets,
                         batch_format="pyarrow")


# ---------------------------------------------------------------------------
# interval sweep-line: peak concurrent sessions per hour
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000


def peak_concurrency(ds, *, gap_minutes: float = 30.0,
                     num_buckets: int = 16):
    """Peak concurrent sessions per calendar hour — the capacity-planning
    view (how many users were active at once): sessionize, then sweep the
    session boundary events (+1 at start, -1 at end, starts before ends at
    ties) and report, per hour, the maximum of the running concurrency over
    the boundaries observed in that hour, plus the boundary count.

    Scale shape (the late_events chunked-prefix pattern with chunk ==
    hour): the all-instants running sum decomposes into per-hour carry-ins
    (total delta of all earlier hours — a two-phase int aggregate, then a
    driver prefix over #hours ints) plus a within-hour cumsum; one
    grouped_apply keyed by hour finishes every hour with one vectorized
    sort+cumsum+reduceat. No global sort; the exchange moves 3-int rows
    (two per session), never events."""
    import ray

    from .aggregate import grouped_apply, two_phase_aggregate

    sessions = sessionize(ds, gap_minutes=gap_minutes)

    def pts(t: pa.Table) -> pa.Table:
        s = (t.column("start_ts").combine_chunks()
             .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy())
        e = (t.column("end_ts").combine_chunks()
             .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy())
        us = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), np.int64),
                            np.full(len(e), -1, np.int64)])
        return pa.table({"hour_id": pa.array(us // HOUR_US),
                         "us": pa.array(us), "d": pa.array(d)})

    points = sessions.map_batches(pts, batch_format="pyarrow",
                                  zero_copy_batch=True)

    hsum = two_phase_aggregate(points, ["hour_id"], [("d", "sum", "dsum")],
                               num_buckets=num_buckets).take_all()
    hsum.sort(key=lambda r: r["hour_id"])
    if hsum:
        lo = hsum[0]["hour_id"]
        span = hsum[-1]["hour_id"] - lo + 1
        carry = np.zeros(span, np.int64)
        run = 0
        for r in hsum:
            carry[r["hour_id"] - lo] = run
            run += r["dsum"]
    else:
        lo, carry = 0, np.zeros(0, np.int64)
    ref = ray.put((lo, carry))

    def per_bucket(g):
        import pandas as pd

        if not len(g):
            return pd.DataFrame({"hour_id": pd.Series([], dtype=np.int64),
                                 "peak_concurrency": pd.Series([], dtype=np.int64),
                                 "n_boundaries": pd.Series([], dtype=np.int64)})
        lo_l, carry_l = ray.get(ref)
        g = g.sort_values(["hour_id", "us", "d"],
                          ascending=[True, True, False], kind="mergesort")
        h = g["hour_id"].to_numpy()
        d = g["d"].to_numpy()
        cs = np.cumsum(d)
        seg_first = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        seg_id = np.cumsum(np.r_[0, (h[1:] != h[:-1]).astype(np.int64)])
        before_seg = np.r_[0, cs[seg_first[1:] - 1]]
        c = cs - before_seg[seg_id] + carry_l[h - lo_l]
        peak = np.maximum.reduceat(c, seg_first)
        n = np.diff(np.r_[seg_first, len(c)])
        return pd.DataFrame({"hour_id": h[seg_first],
                             "peak_concurrency": peak,
                             "n_boundaries": n.astype(np.int64)})

    return grouped_apply(points, ["hour_id"], per_bucket,
                         num_buckets=num_buckets)


def session_paths(ds, *, key: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type", id_col: str = "event_id",
                  gap_minutes: float = 30.0, depth: int = 3,
                  num_buckets: int = 64):
    """Session path mining: the ordered event-type sequence of each
    session's first ``depth`` events ('click>view>purchase'), counted over
    sessions — the entry-funnel view product analytics starts from.

    Scale shape: one bucketed pass (grouped_apply by key) does
    sessionization, per-session rank and path assembly vectorized across
    every key in the bucket, emitting per-bucket (path, n) partials; a
    bounded two-phase sum finishes. Paths are at most depth event-type
    names — the partial space is |event_types|^depth, far below row
    count."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"path": pd.Series([], dtype=str),
                                 "n_sessions": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        key_change = (g[key] != g[key].shift()).to_numpy()
        gap_break = ((g[ts_col] - g[ts_col].shift()) > gap).to_numpy()
        new_sess = key_change | gap_break
        sess_id = np.cumsum(new_sess)
        starts = np.flatnonzero(new_sess)
        counts = np.diff(np.r_[starts, len(sess_id)])
        rank = np.arange(len(sess_id)) - np.repeat(starts, counts)
        kept = rank < depth
        out = (pd.DataFrame({"sess": sess_id[kept],
                             "t": g[type_col].to_numpy()[kept]})
               .groupby("sess", sort=False)["t"].agg(">".join)
               .value_counts())
        return pd.DataFrame({"path": out.index.to_numpy(),
                             "n_sessions": out.to_numpy().astype(np.int64)})

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col, type_col, id_col],
                             num_buckets=num_buckets)
    return two_phase_aggregate(partials, ["path"],
                               [("n_sessions", "sum", "n_sessions")],
                               num_buckets=4)


def state_dwell(ds, *, key: str = "user_id", ts_col: str = "ts",
                type_col: str = "event_type", id_col: str = "event_id",
                num_buckets: int = 64):
    """Time-in-state accounting: each inter-event gap is attributed to the
    PREVIOUS event's type (the state the user was in while the clock ran) —
    the state-machine dwell rollup behind "how long do users sit in
    checkout". Exact int64 microseconds; per-bucket partial sums so only
    (type, n, sum) rows shuffle after the keyed pass."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({type_col: pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64),
                                 "sum_dwell_us": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        same_key = (g[key] == g[key].shift(-1)).to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        dwell = np.r_[us[1:] - us[:-1], 0]
        out = (pd.DataFrame({type_col: g[type_col].to_numpy()[same_key],
                             "dwell": dwell[same_key]})
               .groupby(type_col, sort=False)
               .agg(n=("dwell", "size"), sum_dwell_us=("dwell", "sum"))
               .reset_index())
        out["n"] = out["n"].astype(np.int64)
        out["sum_dwell_us"] = out["sum_dwell_us"].astype(np.int64)
        return out

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col, type_col, id_col],
                             num_buckets=num_buckets)
    rolled = two_phase_aggregate(partials, [type_col],
                                 [("n", "sum", "n"),
                                  ("sum_dwell_us", "sum", "sum_dwell_us")],
                                 num_buckets=4)
    return rolled.map_batches(
        lambda t: t.append_column(
            "mean_dwell_us",
            pa.array(t.column("sum_dwell_us").to_numpy(zero_copy_only=False)
                     // t.column("n").to_numpy(zero_copy_only=False))),
        batch_format="pyarrow", zero_copy_batch=True)


DAY_US = 86_400_000_000


def cusum_hourly(ds, *, ts_col: str = "ts", h_mult: int = 4,
                 num_buckets: int = 16):
    """CUSUM changepoint detection over the per-hour event-count series
    (Page 1954): s_i = max(0, s_{i-1} + (x_i - k)) with drift allowance
    k = ceil(mean hourly count) and decision threshold h = h_mult * k —
    the sustained-shift detector that complements rate_spikes' trailing
    window (CUSUM accumulates small persistent drifts a single-window
    threshold never sees). Emits the full hour grid (empty hours count 0)
    with (hour_id, x, s_pos, alert) — exact int64 end-to-end.

    The max(0, ·) recurrence is NOT computed sequentially: by the classic
    reset identity s_i = P_i - min(0, min_{j<=i} P_j) with
    P_i = cumsum(x_i - k), it's a prefix-sum plus a prefix-min — both
    vectorized here and plain window functions in the DuckDB oracle.

    Scale shape: the only pass over the data is a two-phase per-hour count;
    the hourly series itself is O(wall-clock hours) — bounded by time, not
    data size (a year is 8 760 rows at ANY corpus scale), so the driver
    finishing pass over it is constant-sized by construction (same
    justification as peak_concurrency's carry prefix)."""
    from .aggregate import two_phase_aggregate

    def hours(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).combine_chunks().cast(pa.timestamp("us")) \
              .cast(pa.int64())
        return pa.table({"hour_id": pc.divide(us, HOUR_US),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    cnt = two_phase_aggregate(
        ds.map_batches(hours, batch_format="pyarrow", zero_copy_batch=True),
        ["hour_id"], [("one", "sum", "x")], num_buckets=num_buckets).take_all()
    if not cnt:
        return pa.table({"hour_id": pa.array([], pa.int64()),
                         "x": pa.array([], pa.int64()),
                         "s_pos": pa.array([], pa.int64()),
                         "alert": pa.array([], pa.int64())})
    cnt.sort(key=lambda r: r["hour_id"])
    lo, hi = cnt[0]["hour_id"], cnt[-1]["hour_id"]
    x = np.zeros(hi - lo + 1, np.int64)
    for r in cnt:
        x[r["hour_id"] - lo] = r["x"]
    total, span = int(x.sum()), len(x)
    k = (total + span - 1) // span           # ceil(mean), exact int
    p = np.cumsum(x - k)
    s = p - np.minimum(0, np.minimum.accumulate(p))
    alert = (s >= h_mult * k).astype(np.int64)
    return pa.table({"hour_id": pa.array(lo + np.arange(span, dtype=np.int64)),
                     "x": pa.array(x), "s_pos": pa.array(s),
                     "alert": pa.array(alert)})


def cohort_retention(ds, *, key: str = "user_id", ts_col: str = "ts",
                     num_buckets: int = 64):
    """Cohort retention matrix: users are cohorted by their first-activity
    day; each cell (cohort_day, day_offset) counts the distinct cohort
    members active day_offset days after joining — the product-analytics
    retention triangle.

    Scale shape: ONE bucketed pass — hashing by user puts every user's
    rows in a single bucket, so first-day assignment, offset computation
    and per-(user, cohort, offset) dedup are all bucket-local and
    vectorized across keys; only (cohort_day, day_offset, partial count)
    rows shuffle into the bounded two-phase sum (cell space is
    O(active-days²), time-bounded like the hour grid)."""
    from .aggregate import grouped_apply, two_phase_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"cohort_day": pd.Series([], dtype=np.int64),
                                 "day_offset": pd.Series([], dtype=np.int64),
                                 "n_users": pd.Series([], dtype=np.int64)})
        day = (g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
               // DAY_US)
        d = pd.DataFrame({"u": g[key].to_numpy(), "day": day})
        d["cohort_day"] = d.groupby("u", sort=False)["day"].transform("min")
        d["day_offset"] = d["day"] - d["cohort_day"]
        cells = d.drop_duplicates(["u", "day_offset"])
        out = (cells.groupby(["cohort_day", "day_offset"], sort=False)
               .size().reset_index(name="n_users"))
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col], num_buckets=num_buckets)
    return two_phase_aggregate(partials, ["cohort_day", "day_offset"],
                               [("n_users", "sum", "n_users")],
                               num_buckets=4)


def scd2_intervals(ds, *, key: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type", id_col: str = "event_id",
                   num_buckets: int = 64):
    """Slowly-changing-dimension type-2 build: collapse each key's ordered
    event stream into state runs (consecutive rows with the same type) and
    emit one validity interval per run — (key, state, valid_from_us,
    valid_to_us, is_current), valid_to open (NULL) for the key's last run.
    The warehouse-dimension view of the same state machine state_dwell
    rolls up.

    Scale shape: one bucketed pass; run detection is a shift-compare, the
    interval bounds a lead within the bucket (keys are bucket-local). The
    output is a transform (~one row per state change), not an aggregate —
    it streams back out."""
    from .aggregate import grouped_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({key: pd.Series([], dtype=np.int64),
                                 type_col: pd.Series([], dtype=str),
                                 "valid_from_us": pd.Series([], dtype=np.int64),
                                 "valid_to_us": pd.Series([], dtype="Int64"),
                                 "is_current": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        kv = g[key].to_numpy()
        tv = g[type_col].to_numpy()
        new_key = np.r_[True, kv[1:] != kv[:-1]]
        run_start = new_key | np.r_[True, tv[1:] != tv[:-1]]
        starts = np.flatnonzero(run_start)
        # valid_to = start of the key's NEXT run; open for the last run
        nxt = np.r_[us[starts[1:]], 0]
        last_of_key = np.r_[new_key[starts[1:]], True]
        vt = pd.Series(np.where(last_of_key, 0, nxt), dtype="Int64")
        vt[last_of_key] = pd.NA
        return pd.DataFrame({
            key: kv[starts],
            type_col: tv[starts],
            "valid_from_us": us[starts],
            "valid_to_us": vt,
            "is_current": last_of_key.astype(np.int64)})

    return grouped_apply(ds, [key], per_bucket,
                         select=[key, ts_col, type_col, id_col],
                         num_buckets=num_buckets)


def autocorr_hourly(ds, *, ts_col: str = "ts", max_lag: int = 3,
                    num_buckets: int = 16):
    """Lag-k autocorrelation of the per-hour event-count series (k = 1..
    max_lag) — the seasonality detector (a daily cycle shows as a bump at
    lag 24). Division-free exact-int preparation: with residuals scaled by
    n (r_i = n·x_i − S, so no mean division), emits per lag the scaled
    correlation r_e6 = (10⁶ · Σ r_i r_{i+k}) / Σ r_i² as a truncated-
    toward-zero integer (matching SQL integer division; numerator may be
    negative). Products are computed in arbitrary-precision Python ints —
    n·x overflows int64 at extreme corpus scale — and only the bounded
    r_e6 (|r_e6| ≤ 10⁶) lands in the output.

    Scale shape: identical to cusum_hourly — one two-phase per-hour count
    over the data; the hourly series is wall-clock-bounded, so the driver
    finishing pass is constant-sized at any corpus scale."""
    from .aggregate import two_phase_aggregate

    def hours(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).combine_chunks().cast(pa.timestamp("us")) \
              .cast(pa.int64())
        return pa.table({"hour_id": pc.divide(us, HOUR_US),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    cnt = two_phase_aggregate(
        ds.map_batches(hours, batch_format="pyarrow", zero_copy_batch=True),
        ["hour_id"], [("one", "sum", "x")], num_buckets=num_buckets).take_all()
    if not cnt:
        return pa.table({"lag": pa.array([], pa.int64()),
                         "r_e6": pa.array([], pa.int64()),
                         "n_terms": pa.array([], pa.int64())})
    cnt.sort(key=lambda r: r["hour_id"])
    lo, hi = cnt[0]["hour_id"], cnt[-1]["hour_id"]
    x = np.zeros(hi - lo + 1, np.int64)
    for r in cnt:
        x[r["hour_id"] - lo] = r["x"]
    n = len(x)
    S = int(x.sum())
    res = [n * int(v) - S for v in x]          # python ints: no overflow
    den = sum(v * v for v in res)
    lags, r6, terms = [], [], []
    for k in range(1, max_lag + 1):
        num = sum(res[i] * res[i + k] for i in range(n - k))
        v = 1_000_000 * num
        q = -((-v) // den) if v < 0 else v // den  # truncate toward zero (SQL //)
        lags.append(k)
        r6.append(q)
        terms.append(n - k)
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "r_e6": pa.array(r6, pa.int64()),
                     "n_terms": pa.array(terms, pa.int64())})


def user_burstiness(ds, *, key: str = "user_id", ts_col: str = "ts",
                    num_buckets: int = 32):
    """Per-user burstiness (Fano factor of the user's ACTIVE-hour counts):
    fano = variance/mean = fano_num / fano_den with
    fano_num = m·Σc² − (Σc)² and fano_den = m·Σc (m = active hours) —
    emitted as the two exact BIGINT terms, never divided, so the result
    is bit-exact (bots/agents show fano ≫ 1, steady humans ≈ 1).
    Overflow bound: per-user-hour count < 3·10⁴ and m ≤ wall-clock hours
    keeps fano_num < 2⁶³ (documented, generous for per-user activity).

    Scale shape: two chained two-phase aggregates — (user, hour) counts,
    then per-user moment sums (count/sum/sum-of-squares as three int
    columns); the final ratio terms are a stateless per-batch map."""
    from .aggregate import two_phase_aggregate

    def hours(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).combine_chunks().cast(pa.timestamp("us")) \
              .cast(pa.int64())
        return pa.table({key: t.column(key),
                         "hour_id": pc.divide(us, HOUR_US),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    per_hour = two_phase_aggregate(
        ds.map_batches(hours, batch_format="pyarrow", zero_copy_batch=True),
        [key, "hour_id"], [("one", "sum", "c")], num_buckets=num_buckets)

    def square(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({key: t.column(key), "c": t.column("c"),
                         "c2": pa.array(c * c)})

    moments = two_phase_aggregate(
        per_hour.map_batches(square, batch_format="pyarrow",
                             zero_copy_batch=True),
        [key], [("c", "count", "m"), ("c", "sum", "s"), ("c2", "sum", "q")],
        num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        m = t.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        q = t.column("q").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({key: t.column(key),
                         "n_active_hours": pa.array(m),
                         "fano_num": pa.array(m * q - s * s),
                         "fano_den": pa.array(m * s)})

    return moments.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)


def hourly_profile(ds, *, key: str = "user_id", ts_col: str = "ts",
                   num_buckets: int = 16):
    """Weekly seasonality heat map: events and distinct users per
    (day-of-week, hour-of-day) cell. Day-of-week is the pure integer
    formula (epoch_days + 3) % 7 with 0 = Monday (1970-01-01 was a
    Thursday) on BOTH engine and oracle — no calendar builtin semantics
    to disagree about. Distinct users via the chained two-phase pattern
    (grain (cell, user) first, then cell) — no distinct set
    materializes."""
    from .aggregate import two_phase_aggregate

    def cells(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        return pa.table({"dow": pa.array((us // DAY_US + 3) % 7),
                         "hod": pa.array((us // HOUR_US) % 24),
                         key: t.column(key)})

    grain = two_phase_aggregate(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        ["dow", "hod", key], [(key, "count", "c")], num_buckets=num_buckets)
    return two_phase_aggregate(grain, ["dow", "hod"],
                               [("c", "sum", "n_events"),
                                ("c", "count", "n_users")],
                               num_buckets=4)


CONTEXT_BUDGET_CHARS = 500


def context_overflow(ds, *, key: str = "conv_id", order_col: str = "turn_idx",
                     text_col: str = "text",
                     budget: int = CONTEXT_BUDGET_CHARS,
                     num_buckets: int = 64):
    """Context-window budget audit: per conversation, the first turn at
    which the running char total exceeds ``budget`` (NULL if it never
    does) plus turn/char totals — the truncation planning view an SFT
    packer runs before deciding chunk boundaries.

    Scale shape: char counts come from the Arrow length kernel BEFORE the
    shuffle (text never moves — only (key, order, n_chars) int rows);
    one bucketed pass finishes every conversation with a segment cumsum
    + first-over scan vectorized across the bucket's keys."""
    from .aggregate import grouped_apply

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            order_col: t.column(order_col),
            "n_chars": pc.cast(pc.fill_null(
                pc.utf8_length(t.column(text_col).combine_chunks()), 0),
                pa.int64()),
        })

    counted = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({key: pd.Series([], dtype=str),
                                 "n_turns": pd.Series([], dtype=np.int64),
                                 "total_chars": pd.Series([], dtype=np.int64),
                                 "overflow_turn": pd.Series([], dtype="Int64")})
        g = g.sort_values([key, order_col], kind="mergesort")
        kv = g[key].to_numpy()
        ch = g["n_chars"].to_numpy().astype(np.int64)
        ti = g[order_col].to_numpy().astype(np.int64)
        first = np.r_[True, kv[1:] != kv[:-1]]
        starts = np.flatnonzero(first)
        seg_id = np.cumsum(first) - 1
        cs = np.cumsum(ch)
        before = np.r_[0, cs[starts[1:] - 1]]
        cum = cs - before[seg_id]
        over = cum > budget
        # first over-budget row per segment: reduceat(argmax) via minimum
        # of row index where over, sentinel len(g) when never over
        idx = np.where(over, np.arange(len(g)), len(g))
        first_over = np.minimum.reduceat(idx, starts)
        n_turns = np.diff(np.r_[starts, len(kv)])
        total = np.add.reduceat(ch, starts)
        ot = pd.Series(np.where(first_over < len(g),
                                ti[np.minimum(first_over, len(g) - 1)], 0),
                       dtype="Int64")
        ot[first_over >= len(g)] = pd.NA
        return pd.DataFrame({key: kv[starts],
                             "n_turns": n_turns.astype(np.int64),
                             "total_chars": total.astype(np.int64),
                             "overflow_turn": ot})

    return grouped_apply(counted, [key], per_bucket,
                         num_buckets=num_buckets)


def coverage_gaps(ds, *, ts_col: str = "ts", type_col: str = "event_type",
                  num_buckets: int = 16):
    """Missing-data detector: per event type, how many hours of the global
    wall-clock span had NO events and the longest such outage run — the
    telemetry-coverage health check run before trusting any rate metric.

    Scale shape: the data pass is one two-phase (type, hour) count; the
    per-type hour series is wall-clock-bounded (types × hours, constant in
    corpus size), so the gap scan finishes on the driver like
    cusum_hourly."""
    from .aggregate import two_phase_aggregate

    def hours(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).combine_chunks().cast(pa.timestamp("us")) \
              .cast(pa.int64())
        return pa.table({type_col: t.column(type_col),
                         "hour_id": pc.divide(us, HOUR_US),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    cnt = two_phase_aggregate(
        ds.map_batches(hours, batch_format="pyarrow", zero_copy_batch=True),
        [type_col, "hour_id"], [("one", "sum", "x")],
        num_buckets=num_buckets).take_all()
    if not cnt:
        return pa.table({type_col: pa.array([], pa.string()),
                         "n_empty_hours": pa.array([], pa.int64()),
                         "max_gap_hours": pa.array([], pa.int64())})
    lo = min(r["hour_id"] for r in cnt)
    hi = max(r["hour_id"] for r in cnt)
    span = hi - lo + 1
    present: dict = {}
    for r in cnt:
        present.setdefault(r[type_col], np.zeros(span, bool))[
            r["hour_id"] - lo] = True
    types, n_empty, max_gap = [], [], []
    for tname in sorted(present):
        p = present[tname]
        empty = ~p
        # longest run of True in `empty`: reset-counter via cumsum trick
        idx = np.arange(span)
        run = idx - np.maximum.accumulate(np.where(p, idx, -1))
        types.append(tname)
        n_empty.append(int(empty.sum()))
        max_gap.append(int((run * empty).max()) if span else 0)
    return pa.table({type_col: pa.array(types),
                     "n_empty_hours": pa.array(n_empty, pa.int64()),
                     "max_gap_hours": pa.array(max_gap, pa.int64())})


RATE_WINDOW_US = 600_000_000  # 10 minutes


def rate_limit_audit(ds, *, key: str = "user_id", ts_col: str = "ts",
                     window_us: int = RATE_WINDOW_US, num_buckets: int = 64):
    """Sliding-window rate audit: per user, the maximum number of events in
    ANY trailing ``window_us`` window [t − W, t] anchored at an event —
    the exact check a rate limiter's threshold is tuned against (mirrors
    SQL's RANGE BETWEEN INTERVAL W PRECEDING frame, which counts ALL rows
    in the closed interval including equal-timestamp peers).

    Scale shape: one bucketed pass; within a bucket, users' sorted streams
    are packed onto a single composite axis (segment_id · stride + relative
    ts, stride > span + 2W) so ONE pair of vectorized searchsorted calls
    answers every row's window count across all users at once — no
    per-user loop. Bound: segments_per_bucket × (span + 2W) < 2⁶³
    (documented; raise num_buckets for denser keys)."""
    from .aggregate import grouped_apply, two_phase_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({key: pd.Series([], dtype=np.int64),
                                 "max_in_window": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col], kind="mergesort")
        kv = g[key].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        first = np.r_[True, kv[1:] != kv[:-1]]
        seg_id = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rel = us - np.repeat(us[starts], np.diff(np.r_[starts, len(us)]))
        stride = int(rel.max()) + 2 * window_us + 1 if len(rel) else 1
        axis = seg_id * stride + rel
        left = np.searchsorted(axis, axis - window_us, side="left")
        right = np.searchsorted(axis, axis, side="right")
        c = right - left
        mx = np.maximum.reduceat(c, starts)
        return pd.DataFrame({key: kv[starts],
                             "max_in_window": mx.astype(np.int64)})

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col], num_buckets=num_buckets)
    # keys are bucket-local, so partials already hold one row per key; the
    # pass-through aggregate only restores a stable schema
    return two_phase_aggregate(partials, [key],
                               [("max_in_window", "max", "max_in_window")],
                               num_buckets=4)


def latency_trend(ds, day0: int, *, tool_col: str = "tool_name",
                  ts_col: str = "ts", y_col: str = "duration_ms",
                  num_buckets: int = 16):
    """Per-tool latency trend: exact least-squares slope of duration
    against day index (micro-ms per day, truncated toward zero like SQL
    integer division) — the regression SRE dashboards fit to catch slow
    drift a threshold alert misses. ``day0`` anchors the day index at the
    corpus start (from parquet footer stats — zero data read) so the
    moment sums stay small: with x ≤ wall-clock days and y = millis,
    int64 partials hold past 10¹² rows per tool (documented bound).

    Scale shape: one two-phase pass accumulates the five regression
    moments (n, Σx, Σy, Σxy, Σx²) per tool; the closed-form slope runs on
    the driver over the per-tool table (rows = |tools|) in
    arbitrary-precision ints, so the final products can never overflow."""
    from .aggregate import two_phase_aggregate

    def xy(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        x = us // DAY_US - day0
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({tool_col: t.column(tool_col),
                         "x": pa.array(x), "y": pa.array(y),
                         "xy": pa.array(x * y), "xx": pa.array(x * x)})

    m = two_phase_aggregate(
        ds.map_batches(xy, batch_format="pyarrow", zero_copy_batch=True),
        [tool_col],
        [("x", "count", "n"), ("x", "sum", "sx"), ("y", "sum", "sy"),
         ("xy", "sum", "sxy"), ("xx", "sum", "sxx")],
        num_buckets=num_buckets).take_all()
    tools, ns, slopes = [], [], []
    for r in sorted(m, key=lambda r: r[tool_col]):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        den = n * int(r["sxx"]) - sx * sx
        tools.append(r[tool_col])
        ns.append(n)
        if den == 0:
            slopes.append(None)
        else:
            v = 1_000_000 * (n * int(r["sxy"]) - sx * sy)
            slopes.append(-((-v) // den) if v < 0 else v // den)
    return pa.table({tool_col: pa.array(tools),
                     "n_calls": pa.array(ns, pa.int64()),
                     "slope_e6": pa.array(slopes, pa.int64())})


def event_transitions(ds, *, key: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type", id_col: str = "event_id",
                      gap_minutes: float = 30.0, num_buckets: int = 64):
    """Session-scoped Markov transition matrix: consecutive event-type
    pairs within the same gap session, with the exact transition
    probability p_e6 = 10⁶·n(from→to) // n(from→·) — the next-action
    model product analytics and prefetch heuristics read.

    Scale shape: one bucketed pass emits per-bucket (from, to, n)
    partials (pair space is |types|², tiny); the probability join runs
    over that bounded matrix, never the events."""
    from .aggregate import grouped_apply, two_phase_aggregate

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"from_type": pd.Series([], dtype=str),
                                 "to_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        same_key = (g[key] == g[key].shift(-1)).to_numpy()
        in_sess = same_key & ~((g[ts_col].shift(-1) - g[ts_col]) > gap).to_numpy()
        tv = g[type_col].to_numpy()
        out = (pd.DataFrame({"from_type": tv[:-1][in_sess[:-1]],
                             "to_type": tv[1:][in_sess[:-1]]})
               .groupby(["from_type", "to_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return out

    pairs = two_phase_aggregate(
        grouped_apply(ds, [key], per_bucket,
                      select=[key, ts_col, type_col, id_col],
                      num_buckets=num_buckets),
        ["from_type", "to_type"], [("n", "sum", "n")], num_buckets=4)
    rows = pairs.take_all()   # bounded: |event types|² rows
    rows.sort(key=lambda r: (r["from_type"], r["to_type"]))
    from_tot: dict = {}
    for r in rows:
        from_tot[r["from_type"]] = from_tot.get(r["from_type"], 0) + int(r["n"])
    return pa.table({
        "from_type": pa.array([r["from_type"] for r in rows]),
        "to_type": pa.array([r["to_type"] for r in rows]),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "p_e6": pa.array([1_000_000 * int(r["n"]) // from_tot[r["from_type"]]
                          for r in rows], pa.int64()),
    })


def stickiness_daily(ds, day_lo: int, day_hi: int, *, key: str = "user_id",
                     ts_col: str = "ts", window_days: int = 7,
                     num_buckets: int = 32):
    """DAU / WAU stickiness: per day, the distinct daily actives, the
    distinct trailing-``window_days`` actives, and their exact ratio
    (stickiness_e6) — the engagement metric growth teams track.
    ``day_lo``/``day_hi`` come from parquet footer stats (zero data
    read) and clip the window explosion to the observed span.

    Scale shape: collapse to the distinct (user, day) grain first (one
    two-phase pass over the data); the window then explodes that GRAIN
    — ×window_days on user-days, never on events — into a second
    chained-distinct count. The per-day series is wall-clock-bounded, so
    the DAU/WAU join finishes on the driver like cusum_hourly."""
    from .aggregate import two_phase_aggregate

    def days(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).combine_chunks().cast(pa.timestamp("us")) \
              .cast(pa.int64())
        return pa.table({key: t.column(key),
                         "day": pc.divide(us, DAY_US)})

    grain = two_phase_aggregate(
        ds.map_batches(days, batch_format="pyarrow", zero_copy_batch=True),
        [key, "day"], [("day", "count", "_n")], num_buckets=num_buckets)

    def explode(t: pa.Table) -> pa.Table:
        u = t.column(key).to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        k = window_days
        uu = np.repeat(u, k)
        dd = np.repeat(d, k) + np.tile(np.arange(k, dtype=np.int64), len(d))
        keep = dd <= day_hi
        return pa.table({key: pa.array(uu[keep]), "d": pa.array(dd[keep])})

    wgrain = two_phase_aggregate(
        grain.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True),
        [key, "d"], [("d", "count", "_n")], num_buckets=num_buckets)
    wau = two_phase_aggregate(wgrain, ["d"], [("d", "count", "wau")],
                              num_buckets=4).take_all()
    dau = two_phase_aggregate(grain, ["day"], [("day", "count", "dau")],
                              num_buckets=4).take_all()
    dau_by_day = {r["day"]: int(r["dau"]) for r in dau}
    rows = sorted((r["d"], int(r["wau"])) for r in wau)
    days_out = [d for d, _ in rows]
    wau_out = [w for _, w in rows]
    dau_out = [dau_by_day.get(d, 0) for d in days_out]
    return pa.table({
        "day": pa.array(days_out, pa.int64()),
        "dau": pa.array(dau_out, pa.int64()),
        "wau": pa.array(wau_out, pa.int64()),
        "stickiness_e6": pa.array(
            [1_000_000 * a // w for a, w in zip(dau_out, wau_out)],
            pa.int64()),
    })


def attribution_first_touch(ds, *, key: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            id_col: str = "event_id",
                            target: str = "purchase",
                            gap_minutes: float = 30.0,
                            num_buckets: int = 64):
    """First-touch attribution: every ``target`` event is credited to the
    FIRST event type of its gap session — which entry channel produces
    conversions. Output (first_type, n_targets).

    Scale shape: one bucketed pass (sessionization + per-session first +
    target counting all vectorized across the bucket's keys) emitting
    per-bucket (first_type, n) partials into a types-bounded sum."""
    from .aggregate import grouped_apply, two_phase_aggregate

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"first_type": pd.Series([], dtype=str),
                                 "n_targets": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        key_change = (g[key] != g[key].shift()).to_numpy()
        gap_break = ((g[ts_col] - g[ts_col].shift()) > gap).to_numpy()
        new_sess = key_change | gap_break
        sess_id = np.cumsum(new_sess) - 1
        starts = np.flatnonzero(new_sess)
        tv = g[type_col].to_numpy()
        first_of_sess = tv[starts]
        hits = tv == target
        out = (pd.DataFrame({"first_type": first_of_sess[sess_id[hits]]})
               .groupby("first_type", sort=False)
               .size().reset_index(name="n_targets"))
        out["n_targets"] = out["n_targets"].astype(np.int64)
        return out

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col, type_col, id_col],
                             num_buckets=num_buckets)
    return two_phase_aggregate(partials, ["first_type"],
                               [("n_targets", "sum", "n_targets")],
                               num_buckets=4)


def gap_histogram(ds, *, key: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", num_buckets: int = 32):
    """Inter-event gap histogram: per-user consecutive gaps, binned by
    bit_length(gap_ms) (power-of-two latency bins, the length_buckets
    convention) — the burst-vs-idle shape check behind choosing a
    sessionization gap. Output (gap_bucket, n, sum_gap_ms).

    Scale shape: one bucketed keyed pass emits ≤64-bin partials; the
    reduce is constant-sized."""
    from .aggregate import grouped_apply, two_phase_aggregate

    powers = np.left_shift(np.int64(1), np.arange(63))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"gap_bucket": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "sum_gap_ms": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        same = (g[key] == g[key].shift(-1)).to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        gaps_ms = (np.r_[us[1:] - us[:-1], 0] // 1000)[same]
        k = np.searchsorted(powers, gaps_ms, side="right").astype(np.int64)
        n = np.bincount(k, minlength=64).astype(np.int64)
        sums = np.zeros(64, np.int64)
        np.add.at(sums, k, gaps_ms)        # exact int64 (bincount weights
        nz = np.flatnonzero(n)             # would round-trip via float64)
        return pd.DataFrame({"gap_bucket": nz.astype(np.int64),
                             "n": n[nz],
                             "sum_gap_ms": sums[nz]})

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col, id_col],
                             num_buckets=num_buckets)
    return two_phase_aggregate(partials, ["gap_bucket"],
                               [("n", "sum", "n"),
                                ("sum_gap_ms", "sum", "sum_gap_ms")],
                               num_buckets=4)


def retention_audit(ds, now_us: int, *, ttl_days: int = 7,
                    ts_col: str = "ts", type_col: str = "event_type",
                    num_buckets: int = 8):
    """Retention-policy (TTL) audit: per event type, how many rows a
    ``ttl_days`` deletion policy anchored at ``now_us`` (the corpus max
    timestamp, from footer stats) would expire vs keep, plus the
    oldest/newest day present — the data-governance dry run before a
    GDPR-style purge. One stateless pass into a types-bounded
    two-phase reduce."""
    from .aggregate import two_phase_aggregate

    cutoff = now_us - ttl_days * DAY_US

    def flags(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        exp = (us < cutoff).astype(np.int64)
        return pa.table({type_col: t.column(type_col),
                         "n_expired": pa.array(exp),
                         "n_kept": pa.array(1 - exp),
                         "day": pa.array(us // DAY_US)})

    return two_phase_aggregate(
        ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True),
        [type_col],
        [("n_expired", "sum", "n_expired"), ("n_kept", "sum", "n_kept"),
         ("day", "min", "oldest_day"), ("day", "max", "newest_day")],
        num_buckets=num_buckets)


def user_event_entropy(ds, *, user_col: str = "user_id",
                       type_col: str = "event_type", num_buckets: int = 32):
    """Per-user behavioral entropy over the event-type distribution — the
    bot/monoculture detector (a user who only ever fires one event type
    scores 0; a uniform mixer scores ln(n_types)):

        ent_unat = sum_t c_t * floor(ln(n_u / c_t) * 1e6)

    exact int64 micro-nats (the char_entropy floor-absorbs-ulp argument;
    divide by n_u downstream for nats/event). Output
    (user_id, n_events, n_types, ent_unat).

    Scale shape: one two-phase (user, type) count shrinks the stream to
    the distinct-pair mass, then a bucketed per-user reduce vectorized
    across all users in the bucket (reduceat over sorted segments)."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    counts = two_phase_aggregate(
        ds.map_batches(lambda t: t.select([user_col, type_col]),
                       batch_format="pyarrow", zero_copy_batch=True),
        [user_col, type_col], [(type_col, "count", "c")],
        num_buckets=num_buckets)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({user_col: pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64),
                                 "n_types": pd.Series([], dtype=np.int64),
                                 "ent_unat": pd.Series([], dtype=np.int64)})
        g = g.sort_values(user_col, kind="mergesort")
        u = g[user_col].to_numpy()
        c = g["c"].to_numpy().astype(np.int64)
        seg = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        k = np.diff(np.r_[seg, len(u)])
        n_u = np.add.reduceat(c, seg)
        terms = c * np.floor(
            np.log(np.repeat(n_u, k).astype(np.float64) / c) * 1e6
        ).astype(np.int64)
        return pd.DataFrame({user_col: u[seg],
                             "n_events": n_u,
                             "n_types": k.astype(np.int64),
                             "ent_unat": np.add.reduceat(terms, seg)})

    return grouped_apply(counts, [user_col], per_user,
                         num_buckets=num_buckets)


def volume_trend(ds, hour0: int, *, type_col: str = "event_type",
                 ts_col: str = "ts", num_buckets: int = 8):
    """Per-type log-volume trend: exact least-squares slope of the hourly
    event-count series against the hour index (micro-events/hour per
    hour, truncated toward zero) — the capacity-planning drift signal
    next to rate_spikes' threshold alerts. Hours with zero events are
    excluded from the fit (the observed-series convention; coverage_gaps
    owns the zero-hour view). ``hour0`` anchors the index at the corpus
    start (footer stats) so moments stay small.

    Scale shape: one two-phase (type, hour) count collapses the stream
    to the hour grid, a second accumulates the five regression moments
    per type, and the closed form runs on the driver over |types| rows
    in arbitrary-precision ints (the latency_trend convention)."""
    from .aggregate import two_phase_aggregate

    def hours(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        return pa.table({type_col: t.column(type_col),
                         "x": pa.array(us // HOUR_US - hour0)})

    hourly = two_phase_aggregate(
        ds.map_batches(hours, batch_format="pyarrow", zero_copy_batch=True),
        [type_col, "x"], [("x", "count", "y")], num_buckets=num_buckets)

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table({type_col: t.column(type_col),
                         "x": pa.array(x), "y": pa.array(y),
                         "xy": pa.array(x * y), "xx": pa.array(x * x)})

    m = two_phase_aggregate(
        hourly.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True),
        [type_col],
        [("x", "count", "n"), ("x", "sum", "sx"), ("y", "sum", "sy"),
         ("xy", "sum", "sxy"), ("xx", "sum", "sxx")],
        num_buckets=4).take_all()
    types, ns, totals, slopes = [], [], [], []
    for r in sorted(m, key=lambda r: r[type_col]):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        den = n * int(r["sxx"]) - sx * sx
        types.append(r[type_col])
        ns.append(n)
        totals.append(sy)
        if den == 0:
            slopes.append(None)
        else:
            v = 1_000_000 * (n * int(r["sxy"]) - sx * sy)
            slopes.append(-((-v) // den) if v < 0 else v // den)
    return pa.table({type_col: pa.array(types),
                     "n_hours": pa.array(ns, pa.int64()),
                     "n_events": pa.array(totals, pa.int64()),
                     "slope_e6": pa.array(slopes, pa.int64())})


ANOM_Z2_E6 = 4_000_000  # flag hours with z^2 > 4 (|z| > 2)


def anomaly_hours(ds, hour0: int, *, type_col: str = "event_type",
                  ts_col: str = "ts", z2_e6: int = ANOM_Z2_E6,
                  num_buckets: int = 8):
    """Hourly volume anomalies per event type: hours whose count sits
    more than |z| std-devs from that type's mean hourly count, via the
    division-free identity z² = (H·y − S)² / (H·SS − S²) over the
    observed-hour series (H hours, S = Σy, SS = Σy²) — the
    alert-worthy-spike view next to volume_trend's drift. All
    comparisons run in arbitrary-precision Python ints, so no overflow
    at any corpus size. Output (event_type, hour_idx, n, zsq_e6).

    Scale shape: one two-phase (type, hour) count collapses the stream
    to the time grid; the grid (|types| × |hours| rows — bounded by the
    calendar, not the data) comes to the driver for the exact big-int
    scoring, the latency_trend convention."""
    from .aggregate import two_phase_aggregate

    def hours(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        return pa.table({type_col: t.column(type_col),
                         "x": pa.array(us // HOUR_US - hour0)})

    hourly = two_phase_aggregate(
        ds.map_batches(hours, batch_format="pyarrow", zero_copy_batch=True),
        [type_col, "x"], [("x", "count", "y")],
        num_buckets=num_buckets).take_all()

    stats: dict[str, list[int]] = {}
    for r in hourly:
        h, s, ss = stats.setdefault(r[type_col], [0, 0, 0])
        stats[r[type_col]] = [h + 1, s + int(r["y"]), ss + int(r["y"]) ** 2]
    types, xs, ys, zs = [], [], [], []
    for r in sorted(hourly, key=lambda r: (r[type_col], r["x"])):
        h, s, ss = stats[r[type_col]]
        den = h * ss - s * s
        num = (h * int(r["y"]) - s) ** 2 * 1_000_000
        if den > 0 and num > z2_e6 * den:
            types.append(r[type_col])
            xs.append(int(r["x"]))
            ys.append(int(r["y"]))
            zs.append(num // den)
    return pa.table({type_col: pa.array(types, pa.string()),
                     "hour_idx": pa.array(xs, pa.int64()),
                     "n": pa.array(ys, pa.int64()),
                     "zsq_e6": pa.array(zs, pa.int64())})


PROPS_K_RE = r'"k": (\d+)'


def props_stats(ds, *, type_col: str = "event_type",
                props_col: str = "props", num_buckets: int = 8):
    """Side-payload extraction rollup: pull the integer ``k`` field out
    of the JSON ``props`` string with one vectorized RE2 extract (the
    pattern is shared verbatim with the DuckDB oracle) and reduce per
    event type — the dynamic-attribute → typed-column promotion every
    telemetry store does at ingest. Output
    (event_type, n_with_k, sum_k, min_k, max_k)."""
    from .aggregate import two_phase_aggregate

    def f(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t.column(props_col).combine_chunks(),
                               r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        tbl = pa.table({type_col: t.column(type_col), "k": k,
                        "one": pa.array(np.ones(t.num_rows, np.int64))})
        return tbl.filter(pc.is_valid(k))

    return two_phase_aggregate(
        ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        [type_col],
        [("one", "sum", "n_with_k"), ("k", "sum", "sum_k"),
         ("k", "min", "min_k"), ("k", "max", "max_k")],
        num_buckets=num_buckets)


def audience_overlap(ds, *, user_col: str = "user_id",
                     type_col: str = "event_type", num_buckets: int = 32):
    """Pairwise audience overlap between event types: for every type
    pair (a < b), the number of distinct users who fired both, plus each
    type's distinct-user count and the exact Jaccard
    jac_e6 = floor(1e6·common / (n_a + n_b − common)) — the
    feature-adjacency matrix product analytics reads.

    Scale shape: the pair_cooccurrence kernel grouped by user (only
    (user, type) distinct ints shuffle; the pair space is |types|²,
    tiny), with the per-type distinct-user counts (|types| rows) applied
    driver-side. Output (type_a, type_b, n_common, n_a, n_b, jac_e6)."""
    from .aggregate import pair_cooccurrence, two_phase_aggregate

    pairs = pair_cooccurrence(ds, group_col=user_col, item_col=type_col,
                              num_buckets=num_buckets)

    distinct = two_phase_aggregate(
        ds.map_batches(lambda t: t.select([user_col, type_col]),
                       batch_format="pyarrow", zero_copy_batch=True),
        [user_col, type_col], [(type_col, "count", "_n")],
        num_buckets=num_buckets)
    per_type = two_phase_aggregate(distinct, [type_col],
                                   [("_n", "count", "n")],
                                   num_buckets=4).take_all()
    n_of = {r[type_col]: int(r["n"]) for r in per_type}

    def final(t: pa.Table) -> pa.Table:
        a = t.column("tool_a").to_pylist()
        b = t.column("tool_b").to_pylist()
        c = t.column("n_groups").to_numpy(zero_copy_only=False)
        na = np.array([n_of[x] for x in a], np.int64)
        nb = np.array([n_of[x] for x in b], np.int64)
        den = na + nb - c
        jac = np.where(den > 0, c * 1_000_000 // np.maximum(den, 1), 0)
        return pa.table({"type_a": pa.array(a, pa.string()),
                         "type_b": pa.array(b, pa.string()),
                         "n_common": pa.array(c.astype(np.int64)),
                         "n_a": pa.array(na), "n_b": pa.array(nb),
                         "jac_e6": pa.array(jac.astype(np.int64))})

    return pairs.map_batches(final, batch_format="pyarrow",
                             zero_copy_batch=True)


DEDUP_WINDOW_US = 60_000_000


def event_dedup(ds, *, user_col: str = "user_id",
                type_col: str = "event_type", ts_col: str = "ts",
                id_col: str = "event_id",
                window_us: int = DEDUP_WINDOW_US, num_buckets: int = 32):
    """Streaming event dedup / alert throttling: an event is suppressed
    when it follows the PREVIOUS event of the same (user, type) by less
    than ``window_us`` (lag semantics — the collector-side dedup rule;
    ties order by event_id so equal timestamps are deterministic).
    Output per type: (event_type, n_kept, n_dropped).

    Scale shape: only (user, type, ts, id) ints shuffle, bucketed by
    user; each bucket sorts once and lags vectorized across all its
    (user, type) segments; per-bucket (type, kept) partials feed a
    types-bounded final reduce."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            user_col: t.column(user_col),
            type_col: t.column(type_col),
            "us": t.column(ts_col).combine_chunks()
                   .cast(pa.timestamp("us")).cast(pa.int64()),
            id_col: t.column(id_col)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({type_col: pd.Series([], dtype=str),
                                 "n_kept": pd.Series([], dtype=np.int64),
                                 "n_dropped": pd.Series([], dtype=np.int64)})
        g = g.sort_values([user_col, type_col, "us", id_col],
                          kind="mergesort")
        u = g[user_col].to_numpy()
        ty = g[type_col].to_numpy()
        us = g["us"].to_numpy()
        first = np.r_[True, (u[1:] != u[:-1]) | (ty[1:] != ty[:-1])]
        gap = np.r_[np.int64(0), us[1:] - us[:-1]]
        kept = first | (gap >= window_us)
        out = (pd.DataFrame({type_col: ty, "k": kept.astype(np.int64)})
               .groupby(type_col, sort=False)["k"]
               .agg(n_kept="sum", n_dropped=lambda s: int((1 - s).sum()))
               .reset_index())
        out["n_kept"] = out["n_kept"].astype(np.int64)
        out["n_dropped"] = out["n_dropped"].astype(np.int64)
        return out

    partials = grouped_apply(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        [user_col], per_bucket, num_buckets=num_buckets)
    return two_phase_aggregate(partials, [type_col],
                               [("n_kept", "sum", "n_kept"),
                                ("n_dropped", "sum", "n_dropped")],
                               num_buckets=4)


def value_psi(ds, mid_us: int, *, type_col: str = "event_type",
              ts_col: str = "ts", val_col: str = "value",
              num_buckets: int = 8):
    """Population Stability Index between the first and second half of
    the time range, per event type, over 0.1-wide value bins — the
    standard drift score a feature monitor computes, as exact integers:

        psi_e6 = floor(1e6 · Σ_bins (c1·n2 − c2·n1) · floor(1e6·ln(c1·n2 / (c2·n1))) / (n1·n2·1e6))

    restricted to bins populated in BOTH halves (one-sided bins are
    reported as counts). Every term has (p−q) and ln(p/q) the same sign,
    so the sum is non-negative and // floors identically. Output
    (event_type, n_bins_common, n_only_first, n_only_second, psi_e6).

    Scale shape: one two-phase (type, bin, half) count collapses the
    stream to the value grid; the exact big-int scoring runs driver-side
    over that grid (value-range-bounded, the latency_trend convention)."""
    import math

    from .aggregate import two_phase_aggregate

    def bins(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        h1 = (us < mid_us).astype(np.int64)
        return pa.table({type_col: t.column(type_col),
                         "bin": pa.array(np.floor(v * 10).astype(np.int64)),
                         "c1": pa.array(h1), "c2": pa.array(1 - h1)})

    grid = two_phase_aggregate(
        ds.map_batches(bins, batch_format="pyarrow", zero_copy_batch=True),
        [type_col, "bin"], [("c1", "sum", "c1"), ("c2", "sum", "c2")],
        num_buckets=num_buckets).take_all()

    n1: dict[str, int] = {}
    n2: dict[str, int] = {}
    for r in grid:
        n1[r[type_col]] = n1.get(r[type_col], 0) + int(r["c1"])
        n2[r[type_col]] = n2.get(r[type_col], 0) + int(r["c2"])
    acc: dict[str, list[int]] = {}
    for r in grid:
        ty, c1, c2 = r[type_col], int(r["c1"]), int(r["c2"])
        a = acc.setdefault(ty, [0, 0, 0, 0])  # common, only1, only2, num
        if c1 > 0 and c2 > 0:
            x, y = c1 * n2[ty], c2 * n1[ty]
            a[0] += 1
            # float(x)/float(y): the same two HUGEINT→DOUBLE casts DuckDB
            # does, so ln sees a bit-identical argument
            a[3] += (x - y) * math.floor(
                math.log(float(x) / float(y)) * 1e6)
        elif c1 > 0:
            a[1] += 1
        else:
            a[2] += 1
    types = sorted(acc)
    return pa.table({
        type_col: pa.array(types, pa.string()),
        "n_bins_common": pa.array([acc[t][0] for t in types], pa.int64()),
        "n_only_first": pa.array([acc[t][1] for t in types], pa.int64()),
        "n_only_second": pa.array([acc[t][2] for t in types], pa.int64()),
        "psi_e6": pa.array(
            [acc[t][3] // (n1[t] * n2[t]) if n1[t] and n2[t] else 0
             for t in types], pa.int64()),
    })


def user_lifetimes(ds, *, user_col: str = "user_id", ts_col: str = "ts",
                   num_buckets: int = 16):
    """Per-user lifetime summary: total events, first/last active day,
    distinct active days, and calendar lifetime — the cohort-analysis
    base table. One two-phase (user, day) distinct-with-count pass, then
    a per-user reduce over the day grain. Output
    (user_id, n_events, first_day, last_day, active_days,
    lifetime_days = last − first + 1)."""
    from .aggregate import two_phase_aggregate

    def days(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        return pa.table({user_col: t.column(user_col),
                         "day": pa.array(us // DAY_US),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    grain = two_phase_aggregate(
        ds.map_batches(days, batch_format="pyarrow", zero_copy_batch=True),
        [user_col, "day"], [("one", "sum", "n")], num_buckets=num_buckets)
    per_user = two_phase_aggregate(
        grain.map_batches(
            lambda t: t.append_column("active",
                                      pa.array(np.ones(t.num_rows,
                                                       np.int64))),
            batch_format="pyarrow", zero_copy_batch=True),
        [user_col],
        [("n", "sum", "n_events"), ("day", "min", "first_day"),
         ("day", "max", "last_day"), ("active", "sum", "active_days")],
        num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        f = t.column("first_day").to_numpy(zero_copy_only=False)
        lt = t.column("last_day").to_numpy(zero_copy_only=False)
        return t.append_column("lifetime_days",
                               pa.array((lt - f + 1).astype(np.int64)))

    return per_user.map_batches(final, batch_format="pyarrow",
                                zero_copy_batch=True)


def group_mad(ds, *, key: str = "tool_name", value_col: str = "duration_ms",
              num_buckets: int = 16):
    """Exact per-group median + MAD (median absolute deviation) over a
    bounded-cardinality integer value — the robust-statistics pair an
    SRE latency monitor prefers over mean/std under outliers. Rank
    convention is group_quantiles' 0-based floor rank on p=50, applied
    twice: once over the value histogram, once over the |v − median|
    histogram (equal deviations need no merge: the first cum ≥ rank+1
    row carries the right value either way). Output
    (key, n_rows, median, mad)."""
    from .aggregate import grouped_apply, two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            "v": pc.cast(t.column(value_col), pa.int64()),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    counts = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [key, "v"], [("one", "sum", "n")], num_buckets=num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                            ("v", "ascending")])
        t = t.take(idx)
        kv = np.asarray(t.column(key).to_pylist(), dtype=object)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        m = len(v)
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]]) if m else []
        bounds = np.r_[starts, m] if m else np.array([0])
        out_k, out_n, out_med, out_mad = [], [], [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            cum = np.cumsum(n[a:b])
            tot = int(cum[-1])
            rank = 50 * (tot - 1) // 100
            med = int(v[a + int(np.searchsorted(cum, rank + 1))])
            dv = np.abs(v[a:b] - med)
            order = np.argsort(dv, kind="stable")
            cumd = np.cumsum(n[a:b][order])
            mad = int(dv[order][int(np.searchsorted(cumd, rank + 1))])
            out_k.append(kv[a])
            out_n.append(tot)
            out_med.append(med)
            out_mad.append(mad)
        return pa.table({key: pa.array(out_k, pa.string()),
                         "n_rows": pa.array(out_n, pa.int64()),
                         "median": pa.array(out_med, pa.int64()),
                         "mad": pa.array(out_mad, pa.int64())})

    return grouped_apply(counts, [key], per_bucket,
                         num_buckets=num_buckets, batch_format="pyarrow")


FORECAST_SEASON = 24


def forecast_error(ds, *, type_col: str = "event_type", ts_col: str = "ts",
                   season: int = FORECAST_SEASON, num_buckets: int = 8):
    """Forecast-baseline error audit per event type over the FULL hourly
    grid (zero hours filled): sum of absolute errors of the naive
    (lag-1) and seasonal-naive (lag-``season``) predictors, plus the
    MASE-style ratio

        mase_e6 = floor(1e6 · sae_seasonal·(n−1) / (sae_naive·(n−season)))

    — the sanity floor every volume-forecasting model must beat
    (< 1e6 means daily seasonality is real). Exact big ints driver-side.
    Output (event_type, n_hours, sae_naive, sae_seasonal, mase_e6;
    NULL ratio when a denominator term is 0).

    Scale shape: one two-phase (type, hour) count collapses the stream
    to the calendar grid; the lag algebra runs driver-side over it (the
    anomaly_hours convention)."""
    from .aggregate import two_phase_aggregate

    def hours(t: pa.Table) -> pa.Table:
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        return pa.table({type_col: t.column(type_col),
                         "x": pa.array(us // HOUR_US)})

    grid = two_phase_aggregate(
        ds.map_batches(hours, batch_format="pyarrow", zero_copy_batch=True),
        [type_col, "x"], [("x", "count", "y")],
        num_buckets=num_buckets).take_all()
    if not grid:
        return pa.table({type_col: pa.array([], pa.string()),
                         "n_hours": pa.array([], pa.int64()),
                         "sae_naive": pa.array([], pa.int64()),
                         "sae_seasonal": pa.array([], pa.int64()),
                         "mase_e6": pa.array([], pa.int64())})
    hmin = min(int(r["x"]) for r in grid)
    hmax = max(int(r["x"]) for r in grid)
    n = hmax - hmin + 1
    series: dict[str, np.ndarray] = {}
    for r in grid:
        y = series.setdefault(r[type_col], np.zeros(n, np.int64))
        y[int(r["x"]) - hmin] = int(r["y"])
    types = sorted(series)
    sn, ss, ratio = [], [], []
    for ty in types:
        y = series[ty]
        a = int(np.abs(np.diff(y)).sum())
        s = int(np.abs(y[season:] - y[:-season]).sum()) if n > season else 0
        sn.append(a)
        ss.append(s)
        ratio.append(s * (n - 1) * 1_000_000 // (a * (n - season))
                     if a > 0 and n > season else None)
    return pa.table({type_col: pa.array(types, pa.string()),
                     "n_hours": pa.array([n] * len(types), pa.int64()),
                     "sae_naive": pa.array(sn, pa.int64()),
                     "sae_seasonal": pa.array(ss, pa.int64()),
                     "mase_e6": pa.array(ratio, pa.int64())})


def conv_idle_share(ds, *, conv_col: str = "conv_id",
                    ts_col: str = "ts", order_col: str = "turn_idx",
                    idle_us: int = 300_000_000, num_buckets: int = 32):
    """Per-conversation idle-time share: total span, time spent in
    turn-to-turn gaps longer than ``idle_us`` (5 min default), and the
    idle fraction — the billable-time / abandonment signal a
    conversational-agent dashboard reads. Turn order is ``order_col``
    (deterministic), gaps clamp at 0. Output
    (conv_id, n_turns, span_us, idle_us_total, idle_e6).

    Scale shape: only (conv, turn_idx, ts) ints shuffle, bucketed by
    conv; each bucket sorts once and diffs vectorized across all its
    conversation segments."""
    import pandas as pd

    from .aggregate import grouped_apply

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            conv_col: t.column(conv_col),
            order_col: t.column(order_col),
            "us": t.column(ts_col).combine_chunks()
                   .cast(pa.timestamp("us")).cast(pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({conv_col: pd.Series([], dtype=str),
                                 "n_turns": pd.Series([], dtype=np.int64),
                                 "span_us": pd.Series([], dtype=np.int64),
                                 "idle_us_total": pd.Series([], dtype=np.int64),
                                 "idle_e6": pd.Series([], dtype=np.int64)})
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        cv = g[conv_col].to_numpy()
        us = g["us"].to_numpy()
        first = np.r_[True, cv[1:] != cv[:-1]]
        seg = np.flatnonzero(first)
        k = np.diff(np.r_[seg, len(cv)])
        gap = np.r_[np.int64(0), np.maximum(us[1:] - us[:-1], 0)]
        gap[first] = 0
        idle = np.where(gap > idle_us, gap, 0)
        idle_tot = np.add.reduceat(idle, seg)
        span = us[seg + k - 1] - us[seg]
        span = np.maximum(span, 0)
        return pd.DataFrame({
            conv_col: cv[seg], "n_turns": k.astype(np.int64),
            "span_us": span, "idle_us_total": idle_tot,
            "idle_e6": idle_tot * 1_000_000 // np.maximum(span, 1)})

    return grouped_apply(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        [conv_col], per_bucket, num_buckets=num_buckets)


def ordered_funnel(ds, steps: list[str], *, user_col: str = "user_id",
                   type_col: str = "event_type", ts_col: str = "ts",
                   num_buckets: int = 32):
    """Ordered multi-step funnel: a user reaches step i when they have a
    step-i event strictly after their earliest step-(i-1) completion
    time (greedy min-ts chaining — earliest completion is optimal, so
    this counts exactly the users with an ordered occurrence of the
    step sequence). Output (step_idx, step, n_users, conv_e6) where
    conv_e6 is the floor-e6 share of step-0 users.

    Scale shape: one pruned pass keeps only funnel-step events as
    (user, step_idx, ts_us) ints, grouped by hashed user bucket; inside
    each bucket the chain is len(steps) vectorized segment-min passes
    (no Python loop over users); the exchange after that is ≤
    len(steps) rows per bucket."""
    from .aggregate import grouped_apply, two_phase_aggregate

    step_idx = {s: i for i, s in enumerate(steps)}

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column(type_col), value_set=pa.array(steps))
        t = t.filter(mask)
        si = pc.index_in(t.column(type_col).combine_chunks(),
                         pa.array(steps))
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        return pa.table({user_col: t.column(user_col),
                         "si": pc.cast(si, pa.int64()), "ts_us": us})

    narrow = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)

    def chain(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(user_col, "ascending"),
                                            ("ts_us", "ascending")])
        t = t.take(idx)
        u = t.column(user_col).to_numpy(zero_copy_only=False)
        si = t.column("si").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        first = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        seg = np.repeat(np.arange(len(first)), np.diff(np.r_[first, len(u)]))
        n_seg = len(first)
        BIG = np.int64(2 ** 62)
        cur = np.full(n_seg, -BIG)          # step -1 "completed" at -inf
        counts = np.zeros(len(steps), np.int64)
        for i in range(len(steps)):
            ok = (si == i) & (ts > cur[seg])
            nxt = np.full(n_seg, BIG)
            np.minimum.at(nxt, seg[ok], ts[ok])
            cur = nxt
            counts[i] = int((nxt < BIG).sum())
        return pa.table({"step_idx": pa.array(np.arange(len(steps),
                                                        dtype=np.int64)),
                         "n_users": pa.array(counts)})

    per_bucket = grouped_apply(narrow, [user_col], chain,
                               num_buckets=num_buckets,
                               batch_format="pyarrow")
    agg = two_phase_aggregate(per_bucket, ["step_idx"],
                              [("n_users", "sum", "n_users")],
                              num_buckets=1)

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("step_idx", "ascending")])
        t = t.take(idx)
        i = t.column("step_idx").to_numpy(zero_copy_only=False)
        n = t.column("n_users").to_numpy(zero_copy_only=False)
        n0 = max(int(n[0]) if len(n) and i[0] == 0 else 0, 1)
        return pa.table({
            "step_idx": t.column("step_idx"),
            "step": pa.array([steps[j] for j in i]),
            "n_users": t.column("n_users"),
            "conv_e6": pa.array(n * 1_000_000 // n0)})

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow",
                                          zero_copy_batch=True)


def value_twap(ds, *, key: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type", value_col: str = "value",
               id_col: str = "event_id", num_buckets: int = 64):
    """Time-weighted average value (TWAP) per type: each inter-event gap
    in a user's stream weights the PREVIOUS event's cents-quantized
    value (the step-function integral behind gauge averaging — the
    state_dwell shape with a value payload). Output
    (event_type, n_intervals, sum_vdt_cms, sum_dt_ms, twap_cents) where
    sum_vdt_cms = Σ value_cents·gap_ms (gaps floored to ms BEFORE the
    multiply, identically in both engines, so the running sums keep
    ~3 orders of int64 headroom at corpus scale) and twap_cents floors
    the ratio.

    Exact int64 throughout; per-bucket partial sums so only
    (type, n, Σ) rows shuffle after the user-keyed pass."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({type_col: pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64),
                                 "sum_vdt_cms": pd.Series([], dtype=np.int64),
                                 "sum_dt_ms": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        same = (g[key] == g[key].shift(-1)).to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        dt = np.r_[(us[1:] - us[:-1]) // 1000, 0]   # whole milliseconds
        cents = np.floor(g[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        out = (pd.DataFrame({type_col: g[type_col].to_numpy()[same],
                             "vdt": (cents * dt)[same], "dt": dt[same]})
               .groupby(type_col, sort=False)
               .agg(n=("dt", "size"), sum_vdt_cms=("vdt", "sum"),
                    sum_dt_ms=("dt", "sum"))
               .reset_index())
        return out.astype({"n": np.int64, "sum_vdt_cms": np.int64,
                           "sum_dt_ms": np.int64})

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col, type_col, value_col,
                                     id_col],
                             num_buckets=num_buckets)
    rolled = two_phase_aggregate(partials, [type_col],
                                 [("n", "sum", "n_intervals"),
                                  ("sum_vdt_cms", "sum", "sum_vdt_cms"),
                                  ("sum_dt_ms", "sum", "sum_dt_ms")],
                                 num_buckets=4)

    def finish(t: pa.Table) -> pa.Table:
        v = t.column("sum_vdt_cms").to_numpy(zero_copy_only=False)
        d = t.column("sum_dt_ms").to_numpy(zero_copy_only=False)
        return t.append_column(
            "twap_cents", pa.array(v // np.maximum(d, 1)))

    return rolled.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def path_ngrams(ds, *, n: int = 3, key: str = "user_id", ts_col: str = "ts",
                type_col: str = "event_type", id_col: str = "event_id",
                gap_minutes: float = 30.0, num_buckets: int = 64):
    """Frequent behavior n-grams: every run of ``n`` CONSECUTIVE events
    inside one gap-session (same break rule as :func:`sessionize`),
    joined as 'a>b>c' and counted corpus-wide — the sequence-mining
    sibling of session_paths (which keeps only each session's entry
    path). Output (path, n_occurrences).

    Scale shape: one bucketed user-keyed pass assembles n-grams
    vectorized across every session in the bucket; the shuffle after it
    moves (path, n) partials bounded by |event_types|^n."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < n:
            return pd.DataFrame({"path": pd.Series([], dtype=str),
                                 "n_occurrences": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        key_change = (g[key] != g[key].shift()).to_numpy()
        gap_break = ((g[ts_col] - g[ts_col].shift()) > gap).to_numpy()
        sess_id = np.cumsum(key_change | gap_break)
        types = g[type_col].to_numpy()
        ok = sess_id[: len(sess_id) - n + 1] == sess_id[n - 1:]
        if not ok.any():
            return pd.DataFrame({"path": pd.Series([], dtype=str),
                                 "n_occurrences": pd.Series([], dtype=np.int64)})
        parts = [pd.Series(types[j: len(types) - n + 1 + j][ok])
                 for j in range(n)]
        path = parts[0].str.cat(parts[1:], sep=">")
        out = (path.value_counts().rename_axis("path")
               .rename("n_occurrences").reset_index())
        out["n_occurrences"] = out["n_occurrences"].astype(np.int64)
        return out

    partials = grouped_apply(ds, [key], per_bucket,
                             select=[key, ts_col, type_col, id_col],
                             num_buckets=num_buckets)
    return two_phase_aggregate(partials, ["path"],
                               [("n_occurrences", "sum", "n_occurrences")],
                               num_buckets=4)


def first_response(ds, *, conv_col: str = "conv_id", role_col: str = "role",
                   turn_col: str = "turn_idx", ts_col: str = "ts",
                   num_buckets: int = 64):
    """First-response SLA per conversation: the first assistant turn
    strictly after the first user turn (turn order, not wall clock,
    decides "after" — ties are impossible on the unique turn index) and
    the wall-clock latency between them. Convs with no user turn or no
    assistant follow-up drop. Output
    (conv_id, user_turn, assist_turn, response_us).

    Scale shape: conv-keyed buckets; inside each bucket the firsts are
    drop_duplicates over the sorted frame — vectorized across convs."""
    import pandas as pd

    from .aggregate import grouped_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({conv_col: pd.Series([], dtype=str),
                              "user_turn": pd.Series([], dtype=np.int64),
                              "assist_turn": pd.Series([], dtype=np.int64),
                              "response_us": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        g = g.sort_values([conv_col, turn_col], kind="mergesort")
        g["us"] = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        u = (g[g[role_col] == "user"]
             .drop_duplicates(conv_col)[[conv_col, turn_col, "us"]]
             .rename(columns={turn_col: "fu", "us": "fu_us"}))
        a = g[g[role_col] == "assistant"].merge(u, on=conv_col)
        a = (a[a[turn_col] > a["fu"]].sort_values([conv_col, turn_col],
                                                  kind="mergesort")
             .drop_duplicates(conv_col))
        if not len(a):
            return empty
        return pd.DataFrame({
            conv_col: a[conv_col].to_numpy(),
            "user_turn": a["fu"].to_numpy().astype(np.int64),
            "assist_turn": a[turn_col].to_numpy().astype(np.int64),
            "response_us": (a["us"] - a["fu_us"]).to_numpy().astype(np.int64)})

    return grouped_apply(ds, [conv_col], per_bucket,
                         select=[conv_col, role_col, turn_col, ts_col],
                         num_buckets=num_buckets)


def session_durations(ds, *, key: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id", gap_minutes: float = 30.0,
                      num_buckets: int = 64):
    """Session-duration distribution: gap sessions (the sessionize break
    rule), each session's wall-clock span in whole seconds, reduced to
    exact percentiles over the bounded seconds histogram — the
    engagement metric product analytics quotes (p50/p95 session length).
    Single-event sessions count with duration 0. Output one row
    (n_sessions, p50_s, p95_s, max_s).

    Scale shape: user-keyed buckets compute per-session spans vectorized
    (reduceat over session segments); the exchange after that is
    (seconds, count) histogram partials."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"dur_s": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        new_sess = ((g[key] != g[key].shift())
                    | ((g[ts_col] - g[ts_col].shift()) > gap)).to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], len(us)] - 1
        dur = (us[ends] - us[starts]) // 1_000_000
        u, c = np.unique(dur, return_counts=True)
        return pd.DataFrame({"dur_s": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    hist = two_phase_aggregate(
        grouped_apply(ds, [key], per_bucket,
                      select=[key, ts_col, id_col],
                      num_buckets=num_buckets),
        ["dur_s"], [("n", "sum", "n")], num_buckets=4)

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("dur_s", "ascending")])
        t = t.take(idx)
        d = t.column("dur_s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        tot = int(n.sum())
        cum = np.cumsum(n)
        # nearest-rank on the value histogram (the group_quantiles rule)
        def pick(p):
            r = p * (tot - 1) // 100 + 1
            return int(d[np.searchsorted(cum, r)])
        return pa.table({"n_sessions": pa.array([tot], pa.int64()),
                         "p50_s": pa.array([pick(50)], pa.int64()),
                         "p95_s": pa.array([pick(95)], pa.int64()),
                         "max_s": pa.array([int(d[-1])], pa.int64())})

    return hist.repartition(1).map_batches(finish, batch_format="pyarrow",
                                           zero_copy_batch=True)


def cumulative_users(ds, *, user_col: str = "user_id", ts_col: str = "ts",
                     num_buckets: int = 32):
    """User growth curve: per day, the number of NEW users (first-ever
    activity that day) and the cumulative distinct-user count — exact,
    no approximate sketch. Output (day, n_new, n_cum).

    Scale shape: a two-phase min-day per user (distinct-pair mass), a
    tiny per-day count, then the cumulative sum over the bounded day
    grid in a single-row-group task."""
    from .aggregate import two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        return pa.table({user_col: t.column(user_col),
                         "day": pc.divide(us, 86_400_000_000)})

    first = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [user_col], [("day", "min", "first_day")], num_buckets=num_buckets)
    per_day = two_phase_aggregate(
        first.map_batches(
            lambda t: pa.table({
                "day": t.column("first_day"),
                "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["day"], [("one", "sum", "n_new")], num_buckets=4)

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("day", "ascending")])
        t = t.take(idx)
        n = t.column("n_new").to_numpy(zero_copy_only=False)
        return t.append_column("n_cum", pa.array(np.cumsum(n)))

    return per_day.repartition(1).map_batches(finish,
                                              batch_format="pyarrow",
                                              zero_copy_batch=True)


def conv_roundtrips(ds, *, conv_col: str = "conv_id", role_col: str = "role",
                    turn_col: str = "turn_idx", num_buckets: int = 64):
    """Round-trip histogram: a round trip is an ADJACENT user→assistant
    turn pair (turn order) inside one conversation — the SFT exchange
    count a fine-tuning mix is balanced on. Output
    (n_roundtrips, n_convs).

    Scale shape: conv-keyed buckets count transitions vectorized across
    every conversation in the bucket; the exchange after that is a
    bounded (count, n) histogram."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"n_roundtrips": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        g = g.sort_values([conv_col, turn_col], kind="mergesort")
        cv = g[conv_col].to_numpy()
        rl = g[role_col].to_numpy()
        same = cv[1:] == cv[:-1]
        rt = same & (rl[:-1] == "user") & (rl[1:] == "assistant")
        seg_first = np.flatnonzero(np.r_[True, cv[1:] != cv[:-1]])
        seg = np.repeat(np.arange(len(seg_first)),
                        np.diff(np.r_[seg_first, len(cv)]))
        per_conv = np.zeros(len(seg_first), np.int64)
        np.add.at(per_conv, seg[:-1][rt], 1)
        u, c = np.unique(per_conv, return_counts=True)
        return pd.DataFrame({"n_roundtrips": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    hist = grouped_apply(ds, [conv_col], per_bucket,
                         select=[conv_col, role_col, turn_col],
                         num_buckets=num_buckets)
    return two_phase_aggregate(hist, ["n_roundtrips"],
                               [("n", "sum", "n_convs")], num_buckets=4)


def user_mix_kl(ds, *, user_col: str = "user_id",
                type_col: str = "event_type", num_buckets: int = 32):
    """Per-user behavioral divergence: exact-integer micro-nat KL of the
    user's event-type mix against the GLOBAL mix — the bot/outlier
    detector that catches users whose behavior doesn't look like the
    population (0 = perfectly typical). Terms use the cross-multiplied
    log ln((c_ut·N)/(n_u·C_t)) with the floor-absorbs-ulp convention, so
    both engines agree bit-for-bit. Output (user_id, n_events, kl_unat).

    Scale shape: one two-phase (user, type) count; the |types|-row
    global table is a driver-side constant (the kmeans centroid-loop
    rule); the per-user reduce is vectorized across the bucket."""
    import pandas as pd

    from .aggregate import two_phase_aggregate

    counts = two_phase_aggregate(
        ds.map_batches(lambda t: t.select([user_col, type_col]),
                       batch_format="pyarrow", zero_copy_batch=True),
        [user_col, type_col], [(type_col, "count", "c")],
        num_buckets=num_buckets)
    gl = two_phase_aggregate(
        ds.map_batches(lambda t: t.select([type_col]),
                       batch_format="pyarrow", zero_copy_batch=True),
        [type_col], [(type_col, "count", "ct")], num_buckets=1).to_pandas()
    ct = dict(zip(gl[type_col], gl["ct"].astype(np.int64)))
    n_total = int(gl["ct"].sum())

    from .aggregate import grouped_apply

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({user_col: pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64),
                                 "kl_unat": pd.Series([], dtype=np.int64)})
        g = g.sort_values(user_col, kind="mergesort")
        u = g[user_col].to_numpy()
        c = g["c"].to_numpy().astype(np.int64)
        gt = g[type_col].map(ct).to_numpy().astype(np.int64)
        seg = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        k = np.diff(np.r_[seg, len(u)])
        n_u = np.repeat(np.add.reduceat(c, seg), k)
        terms = c * np.floor(np.log(
            (c.astype(np.float64) * n_total) / (n_u.astype(np.float64) * gt)
        ) * 1e6).astype(np.int64)
        return pd.DataFrame({
            user_col: u[seg],
            "n_events": np.add.reduceat(c, seg).astype(np.int64),
            "kl_unat": np.add.reduceat(terms, seg).astype(np.int64)})

    return grouped_apply(counts, [user_col], per_user,
                         num_buckets=num_buckets)


def conversion_delay(ds, *, user_col: str = "user_id",
                     type_col: str = "event_type", ts_col: str = "ts",
                     from_type: str = "signup", to_type: str = "purchase",
                     num_buckets: int = 64):
    """Time-to-convert distribution: per user, the gap from the first
    ``from_type`` event to the first ``to_type`` event strictly after
    it, reduced to exact nearest-rank percentiles over a whole-hours
    histogram. Output one row (n_converted, p50_h, p95_h, max_h)."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"delay_h": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        g = g.sort_values([user_col, ts_col], kind="mergesort")
        g["us"] = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        s = (g[g[type_col] == from_type].drop_duplicates(user_col)
             [[user_col, "us"]].rename(columns={"us": "s_us"}))
        p = g[g[type_col] == to_type].merge(s, on=user_col)
        p = (p[p["us"] > p["s_us"]].sort_values([user_col, "us"],
                                                kind="mergesort")
             .drop_duplicates(user_col))
        if not len(p):
            return empty
        d = ((p["us"] - p["s_us"]) // 3_600_000_000).to_numpy()
        u, c = np.unique(d, return_counts=True)
        return pd.DataFrame({"delay_h": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    hist = two_phase_aggregate(
        grouped_apply(ds, [user_col], per_bucket,
                      select=[user_col, type_col, ts_col],
                      num_buckets=num_buckets),
        ["delay_h"], [("n", "sum", "n")], num_buckets=4)

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("delay_h", "ascending")])
        t = t.take(idx)
        d = t.column("delay_h").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        tot = int(n.sum())
        cum = np.cumsum(n)

        def pick(p):
            r = p * (tot - 1) // 100 + 1
            return int(d[np.searchsorted(cum, r)])

        return pa.table({"n_converted": pa.array([tot], pa.int64()),
                         "p50_h": pa.array([pick(50)], pa.int64()),
                         "p95_h": pa.array([pick(95)], pa.int64()),
                         "max_h": pa.array([int(d[-1])], pa.int64())})

    return hist.repartition(1).map_batches(finish, batch_format="pyarrow",
                                           zero_copy_batch=True)


def value_outliers(ds, *, type_col: str = "event_type",
                   val_col: str = "value", num_buckets: int = 16):
    """Tukey-fence outlier census per type: exact nearest-rank Q1/Q3
    over the cents histogram, integer fences Q1 − 3·IQR//2 and
    Q3 + 3·IQR//2, and the counts outside them — computed entirely FROM
    the histogram (no second pass over the rows). Output
    (event_type, q1_cents, q3_cents, n_low, n_high, n_total)."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column(val_col).to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({type_col: t.column(type_col),
                         "cents": pa.array(cents),
                         "one": pa.nulls(len(cents),
                                         pa.int64()).fill_null(1)})

    hist = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [type_col, "cents"], [("one", "sum", "n")],
        num_buckets=num_buckets)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({type_col: pd.Series([], dtype=str),
                                 "q1_cents": pd.Series([], dtype=np.int64),
                                 "q3_cents": pd.Series([], dtype=np.int64),
                                 "n_low": pd.Series([], dtype=np.int64),
                                 "n_high": pd.Series([], dtype=np.int64),
                                 "n_total": pd.Series([], dtype=np.int64)})
        rows = []
        for ty, sub in g.groupby(type_col, sort=False):
            sub = sub.sort_values("cents", kind="mergesort")
            v = sub["cents"].to_numpy()
            n = sub["n"].to_numpy().astype(np.int64)
            tot = int(n.sum())
            cum = np.cumsum(n)

            def pick(p):
                r = p * (tot - 1) // 100 + 1
                return int(v[np.searchsorted(cum, r)])

            q1, q3 = pick(25), pick(75)
            iqr3h = 3 * (q3 - q1) // 2
            lo, hi = q1 - iqr3h, q3 + iqr3h
            rows.append((ty, q1, q3, int(n[v < lo].sum()),
                         int(n[v > hi].sum()), tot))
        out = pd.DataFrame(rows, columns=[type_col, "q1_cents", "q3_cents",
                                          "n_low", "n_high", "n_total"])
        return out.astype({c: np.int64 for c in out.columns
                           if c != type_col})

    return grouped_apply(hist, [type_col], per_type, num_buckets=4)
