"""Table profiling: per-column row/null/distinct counts and int ranges.

The corpus-engineering "what is in this table" operator. Scale shape:

- n / n_null / min / max flow as ONE partial row per column per batch
  through the generic two-phase aggregate (trivial shuffle);
- exact distinct counts reduce per-batch ``pc.unique`` partials by
  (column, value) — the shuffle carries one row per distinct value per
  batch, exactly the cost of SQL ``count(DISTINCT x)`` — then a second,
  tiny two-phase counts rows per column. For planetary-cardinality columns
  the mergeable KMV sketch (stages/sketch.py) is the documented estimate
  path; this operator is the exact one.

Values are stringified internally to share one partial schema across
column types (int64 -> decimal string is injective, so distinct counts are
preserved); the DuckDB oracle uses native ``count(DISTINCT col)``.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import two_phase_aggregate


def table_profile(ds, columns: list[str], *, num_buckets: int = 32):
    """Profile ``columns`` of ``ds``: one output row per column with
    (col_name, n, n_null, n_distinct, min_i, max_i) — min/max only for
    integer columns (null otherwise)."""
    import ray

    def stat_partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in columns:
            col = t.column(c)
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
            if pa.types.is_integer(col.type) and len(col) > col.null_count:
                mins.append(pc.min(col).as_py())
                maxs.append(pc.max(col).as_py())
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table({"col_name": pa.array(names),
                         "n": pa.array(ns, pa.int64()),
                         "n_null": pa.array(nulls, pa.int64()),
                         "min_i": pa.array(mins, pa.int64()),
                         "max_i": pa.array(maxs, pa.int64())})

    stats = two_phase_aggregate(
        ds.map_batches(stat_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["col_name"],
        [("n", "sum", "n"), ("n_null", "sum", "n_null"),
         ("min_i", "min", "min_i"), ("max_i", "max", "max_i")],
        num_buckets=1)

    def distinct_partial(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in columns:
            u = pc.unique(pc.cast(t.column(c), pa.string())).drop_null()
            names.extend([c] * len(u))
            vals.append(u)
        flat = pa.concat_arrays(vals) if vals else pa.array([], pa.string())
        return pa.table({"col_name": pa.array(names, pa.string()),
                         "v": flat,
                         "one": pa.array(np.ones(len(flat), np.int64))})

    pairs = two_phase_aggregate(
        ds.map_batches(distinct_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["col_name", "v"], [("one", "min", "one")], num_buckets=num_buckets)
    dist = two_phase_aggregate(pairs, ["col_name"], [("one", "sum", "n_distinct")],
                               num_buckets=1)

    empty = {"n": 0, "n_null": 0, "min_i": None, "max_i": None}
    srows = {r["col_name"]: r for r in stats.take_all()}
    drows = {r["col_name"]: r["n_distinct"] for r in dist.take_all()}
    out = pa.table({
        "col_name": pa.array(columns),
        "n": pa.array([srows.get(c, empty)["n"] for c in columns], pa.int64()),
        "n_null": pa.array([srows.get(c, empty)["n_null"] for c in columns], pa.int64()),
        "n_distinct": pa.array([drows.get(c, 0) for c in columns], pa.int64()),
        "min_i": pa.array([srows.get(c, empty)["min_i"] for c in columns], pa.int64()),
        "max_i": pa.array([srows.get(c, empty)["max_i"] for c in columns], pa.int64()),
    })
    return ray.data.from_arrow(out)


def attr_mi(ds, *, x_col: str, y_col: str, num_buckets: int = 16,
            scale: int = 10**9, marginal_limit: int = 1 << 20):
    """Exact-integer mutual information between two categorical columns —
    the attribute-dependency statistic (cf. the ICDE'24 cross-table MI
    estimation line; here the exact plug-in MI over one table):

        MI(X;Y) = sum_xy p_xy * ln(p_xy / (p_x * p_y))

    evaluated per joint cell as ONE fixed float expression then
    ``floor(x * scale)`` int64 nano-nats, so the final sum is exact integer
    arithmetic in any order. Scale shape: the joint-cell table is a
    vocab-bounded two-phase aggregate (|X|*|Y| cells at most — never the
    rows); the marginals are derived FROM it and broadcast (bounded_take_all
    guards the pull); scoring is one stateless pass over the cells and the
    result a single-row integer reduce.

    Output: (n_rows, n_cells, n_x, n_y, mi_nanonats)."""
    import ray

    from .aggregate import bounded_take_all, two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        tmp = pa.table({"x": pc.cast(t.column(x_col), pa.string()),
                        "y": pc.cast(t.column(y_col), pa.string())})
        g = tmp.group_by(["x", "y"]).aggregate([("x", "count")])
        return g.rename_columns(["x", "y", "c"])

    joint = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["x", "y"], [("c", "sum", "c")], num_buckets=num_buckets).materialize()
    n = int(joint.sum("c"))
    n_cells = joint.count()

    xm = bounded_take_all(
        two_phase_aggregate(joint, ["x"], [("c", "sum", "c")],
                            num_buckets=num_buckets),
        marginal_limit, "attr_mi x marginal")
    ym = bounded_take_all(
        two_phase_aggregate(joint, ["y"], [("c", "sum", "c")],
                            num_buckets=num_buckets),
        marginal_limit, "attr_mi y marginal")
    cx = {r["x"]: r["c"] for r in xm}
    cy = {r["y"]: r["c"] for r in ym}
    ref = ray.put((cx, cy))

    def score(t: pa.Table) -> pa.Table:
        cx_l, cy_l = ray.get(ref)
        cxy = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        px = np.array([cx_l[v] for v in t.column("x").to_pylist()],
                      np.float64) / n
        py = np.array([cy_l[v] for v in t.column("y").to_pylist()],
                      np.float64) / n
        pxy = cxy / n
        term = pxy * np.log(pxy / (px * py))
        return pa.table({"mi": pa.array(np.floor(term * scale).astype(np.int64))})

    mi = int(joint.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True).sum("mi"))
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_cells": pa.array([n_cells], pa.int64()),
        "n_x": pa.array([len(cx)], pa.int64()),
        "n_y": pa.array([len(cy)], pa.int64()),
        "mi_nanonats": pa.array([mi], pa.int64()),
    }))


def skew_report(ds, *, key: str = "user_id", num_buckets: int = 32):
    """Key-skew diagnostics for shuffle planning: per-key row counts
    reduced to (n_keys, n_rows, max_count, gini_e6) where gini_e6 is the
    exact-integer Gini coefficient of the per-key count distribution,

        gini_e6 = floor(1e6 * (2*S1 - (n+1)*T) / (n*T)),
        S1 = sum_i i * c_(i)  (counts sorted ascending, 1-based ranks).

    0 = perfectly balanced keys, ->1e6 = one hot key owns everything: the
    number that says whether a groupby on this key needs salting.

    Scale shape: per-key counts are one two-phase pass; they collapse to a
    COUNT-VALUE HISTOGRAM (distinct count value -> #keys, bounded by the
    hottest key's count) via a second tiny two-phase; the driver folds the
    histogram with exact Python ints (rank-run algebra: a run of m keys at
    count c contributes c * (base*m + m*(m+1)/2)), so no global sort and
    no unbounded driver state."""
    counts = two_phase_aggregate(ds, [key], [(key, "count", "c")],
                                 num_buckets=num_buckets)
    hist = two_phase_aggregate(counts, ["c"], [("c", "count", "m")],
                               num_buckets=4).take_all()
    hist.sort(key=lambda r: r["c"])
    n = t_rows = s1 = mx = 0
    base = 0  # keys ranked before the current run
    for r in hist:
        c, m = int(r["c"]), int(r["m"])
        s1 += c * (base * m + m * (m + 1) // 2)
        t_rows += c * m
        n += m
        base += m
        mx = c
    gini_e6 = (1_000_000 * (2 * s1 - (n + 1) * t_rows)) // (n * t_rows) if n else 0
    return pa.table({"n_keys": pa.array([n], pa.int64()),
                     "n_rows": pa.array([t_rows], pa.int64()),
                     "max_count": pa.array([mx], pa.int64()),
                     "gini_e6": pa.array([gini_e6], pa.int64())})


def k_anonymity(ds, qi_cols: list[str], *, k: int = 5,
                num_buckets: int = 16):
    """k-anonymity audit over a quasi-identifier combination: the
    group-size histogram of the QI equivalence classes, flagging sizes
    below ``k`` (the re-identification-risk classes a release would have
    to suppress or generalize). Output
    (group_size, n_groups, n_rows, at_risk).

    Scale shape: two chained two-phase reduces — per-batch pre-combined
    QI counts (shuffle = distinct QI combos per batch), then a ≤
    max-group-size histogram reduce; no row ever carries more than the
    QI columns."""
    def ones(t: pa.Table) -> pa.Table:
        t = t.select(qi_cols)
        return t.append_column(
            "one", pa.nulls(t.num_rows, pa.int64()).fill_null(1))

    sizes = two_phase_aggregate(
        ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        qi_cols, [("one", "sum", "group_size")], num_buckets=num_buckets)

    def drop_keys(t: pa.Table) -> pa.Table:
        return pa.table({
            "group_size": t.column("group_size"),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    hist = two_phase_aggregate(
        sizes.map_batches(drop_keys, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["group_size"], [("one", "sum", "n_groups")], num_buckets=4)

    def flag(t: pa.Table) -> pa.Table:
        gs = t.column("group_size").to_numpy(zero_copy_only=False)
        ng = t.column("n_groups").to_numpy(zero_copy_only=False)
        return pa.table({"group_size": t.column("group_size"),
                         "n_groups": t.column("n_groups"),
                         "n_rows": pa.array(gs * ng),
                         "at_risk": pa.array((gs < k).astype(np.int64))})

    return hist.map_batches(flag, batch_format="pyarrow",
                            zero_copy_batch=True)


def join_cardinality(left, right, *, left_on: str, right_on: str,
                     num_buckets: int = 32):
    """Exact equi-join cardinality estimate WITHOUT materializing the
    join — the optimizer-style diagnostic that tells you whether a
    planned fact⋈fact join explodes: per-key counts on each side
    (pre-combined per batch), a bucketed join of the two COUNT tables
    (narrow: key + one int each), then Σ cl·cr. Output one row
    (n_join_rows, n_matched_keys, max_key_fanout)."""
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    def ones(col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "k": t.column(col),
                "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})
        return f

    cl = two_phase_aggregate(
        left.map_batches(ones(left_on), batch_format="pyarrow",
                         zero_copy_batch=True),
        ["k"], [("one", "sum", "cl")], num_buckets=num_buckets)
    cr = two_phase_aggregate(
        right.map_batches(ones(right_on), batch_format="pyarrow",
                          zero_copy_batch=True),
        ["k"], [("one", "sum", "cr")], num_buckets=num_buckets)
    j = bucket_hash_join(cl, cr, on="k", num_buckets=num_buckets)

    def product(t: pa.Table) -> pa.Table:
        p = (t.column("cl").to_numpy(zero_copy_only=False)
             * t.column("cr").to_numpy(zero_copy_only=False))
        return pa.table({"g": pa.nulls(len(p), pa.int64()).fill_null(0),
                         "p": pa.array(p),
                         "one": pa.nulls(len(p), pa.int64()).fill_null(1)})

    agg = two_phase_aggregate(
        j.map_batches(product, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["g"], [("p", "sum", "n_join_rows"), ("one", "sum",
                                              "n_matched_keys"),
                ("p", "max", "max_key_fanout")], num_buckets=1)
    return agg.map_batches(
        lambda t: t.select(["n_join_rows", "n_matched_keys",
                            "max_key_fanout"]),
        batch_format="pyarrow", zero_copy_batch=True)


def type_correlation(ds, *, type_col: str = "event_type", ts_col: str = "ts",
                     num_buckets: int = 32):
    """Pairwise Pearson terms between the hourly count series of every
    type pair, over the zero-filled global hour grid — emitted as exact
    integer moments (n_hours, sxy, sx, sy, sxx, syy) so the consumer
    computes r without any float leaving the engine. Zero hours never
    materialize: sxy only needs hours where both series are nonzero
    (per-hour pair products), the marginals come from per-type sums, and
    the grid size from the global hour min/max.

    Scale shape: one two-phase count to (type, hour), a pair explosion
    inside hour-keyed buckets (≤ C(T,2) rows per hour), and three tiny
    unioned partials finishing in a single-row task."""
    import pandas as pd

    from .aggregate import grouped_apply, two_phase_aggregate

    def hours(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                    pa.int64())
        return pa.table({
            "t": t.column(type_col),
            "h": pc.divide(h, 3_600_000_000),
            "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})

    counts = two_phase_aggregate(
        ds.map_batches(hours, batch_format="pyarrow", zero_copy_batch=True),
        ["t", "h"], [("one", "sum", "n")], num_buckets=num_buckets)

    def pair_products(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"kind": pd.Series([], dtype=str),
                              "a": pd.Series([], dtype=str),
                              "b": pd.Series([], dtype=str),
                              "v1": pd.Series([], dtype=np.int64),
                              "v2": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        g = g.sort_values(["h", "t"], kind="mergesort")
        hv = g["h"].to_numpy()
        tv = g["t"].to_numpy()
        nv = g["n"].to_numpy().astype(np.int64)
        seg_first = np.flatnonzero(np.r_[True, hv[1:] != hv[:-1]])
        sizes = np.diff(np.r_[seg_first, len(hv)])
        row_seg_start = np.repeat(seg_first, sizes)
        li = np.arange(len(hv)) - row_seg_start
        right = np.repeat(np.arange(len(hv)), li)
        grp_start = np.repeat(np.cumsum(li) - li, li)
        left = np.repeat(row_seg_start, li) + (
            np.arange(int(li.sum())) - grp_start)
        out = (pd.DataFrame({"a": tv[left], "b": tv[right],
                             "v1": nv[left] * nv[right]})
               .groupby(["a", "b"], sort=False)["v1"].sum().reset_index())
        out["kind"] = "sxy"
        out["v2"] = np.int64(0)
        return out[["kind", "a", "b", "v1", "v2"]].astype(
            {"v1": np.int64, "v2": np.int64})

    sxy = two_phase_aggregate(
        grouped_apply(counts, ["h"], pair_products,
                      num_buckets=num_buckets),
        ["kind", "a", "b"], [("v1", "sum", "v1"), ("v2", "max", "v2")],
        num_buckets=4)

    def sq(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({"t": t.column("t"), "n": t.column("n"),
                         "nn": pa.array(n * n)})

    sums = two_phase_aggregate(
        counts.map_batches(sq, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["t"], [("n", "sum", "sx"), ("nn", "sum", "sxx")], num_buckets=4)
    sums = sums.map_batches(
        lambda t: pa.table({
            "kind": pa.array(["sums"] * t.num_rows),
            "a": t.column("t"), "b": pa.array([""] * t.num_rows),
            "v1": t.column("sx"), "v2": t.column("sxx")}),
        batch_format="pyarrow", zero_copy_batch=True)

    grid = two_phase_aggregate(
        counts.map_batches(
            lambda t: pa.table({"g": pa.nulls(t.num_rows,
                                              pa.int64()).fill_null(0),
                                "h": t.column("h")}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["g"], [("h", "min", "hmin"), ("h", "max", "hmax")], num_buckets=1)
    grid = grid.map_batches(
        lambda t: pa.table({
            "kind": pa.array(["grid"] * t.num_rows),
            "a": pa.array([""] * t.num_rows),
            "b": pa.array([""] * t.num_rows),
            "v1": t.column("hmin"), "v2": t.column("hmax")}),
        batch_format="pyarrow", zero_copy_batch=True)

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        s = df[df["kind"] == "sums"].set_index("a")
        types = sorted(s.index)
        gr = df[df["kind"] == "grid"]
        nh = int(gr["v2"].iloc[0] - gr["v1"].iloc[0] + 1) if len(gr) else 0
        px = {(r.a, r.b): int(r.v1)
              for r in df[df["kind"] == "sxy"].itertuples()}
        rows = [(a, b, nh, px.get((a, b), 0),
                 int(s.loc[a, "v1"]), int(s.loc[b, "v1"]),
                 int(s.loc[a, "v2"]), int(s.loc[b, "v2"]))
                for i, a in enumerate(types) for b in types[i + 1:]]
        cols = list(zip(*rows)) if rows else [[]] * 8
        return pa.table({
            "type_a": pa.array(list(cols[0]), pa.string()),
            "type_b": pa.array(list(cols[1]), pa.string()),
            "n_hours": pa.array(list(cols[2]), pa.int64()),
            "sxy": pa.array(list(cols[3]), pa.int64()),
            "sx_a": pa.array(list(cols[4]), pa.int64()),
            "sx_b": pa.array(list(cols[5]), pa.int64()),
            "sxx_a": pa.array(list(cols[6]), pa.int64()),
            "sxx_b": pa.array(list(cols[7]), pa.int64())})

    return (sxy.union(sums).union(grid).repartition(1)
            .map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True))


def market_concentration(spend, members, *, key: str = "k",
                         group_col: str = "c_nationkey",
                         num_buckets: int = 16):
    """Herfindahl–Hirschman market concentration per group: with
    per-member spend c_i (cents) inside each group,
    hhi_e12 = (Σ c_i²)·1e12 // (Σ c_i)² — 1e12 means one member owns the
    market. The big squares run in Python arbitrary precision inside the
    per-group finisher (the label_scatter rule). ``spend`` is the
    (key, cents) per-member table, ``members`` maps key → group. Output
    (group, n_members, total_cents, hhi_e12)."""
    import pandas as pd

    from .join import bucket_hash_join

    j = bucket_hash_join(spend, members, on=key, num_buckets=num_buckets)

    from .aggregate import grouped_apply

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({group_col: pd.Series([], dtype=np.int64),
                                 "n_members": pd.Series([], dtype=np.int64),
                                 "total_cents": pd.Series([], dtype=np.int64),
                                 "hhi_e12": pd.Series([], dtype=np.int64)})
        rows = []
        for grp, sub in g.groupby(group_col, sort=False):
            c = [int(x) for x in sub["cents"]]
            tot = sum(c)
            hhi = (sum(x * x for x in c) * 10**12 // (tot * tot)
                   if tot else 0)
            rows.append((int(grp), len(c), tot, hhi))
        out = pd.DataFrame(rows, columns=[group_col, "n_members",
                                          "total_cents", "hhi_e12"])
        return out.astype(np.int64)

    return grouped_apply(j, [group_col], per_group, num_buckets=4)
