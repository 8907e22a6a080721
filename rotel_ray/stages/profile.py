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
