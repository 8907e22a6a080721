"""Join operators.

The reference has no relational joins (SURVEY.md §2.7) — all its enrichment
is small-map lookup. Here both patterns are first-class:

- ``broadcast_join`` — the reference's pattern generalized: the small side is
  ``ray.put`` ONCE as (key array, payload columns); each actor fetches it
  once in ``__init__`` and per batch does a dictionary join via
  ``pc.index_in`` + ``pc.take``. No shuffle, O(batch) per batch. Use whenever
  one side fits in a worker heap (dimension tables, lookup maps).
- ``hash_join`` — big-big equi-join via Ray Data's hash-shuffle
  ``Dataset.join`` (both sides hash-partitioned on the key;
  ``num_partitions`` is the explicit shuffle-parallelism knob — size it to
  the cluster, not the data).

Design rule at 100 TB: broadcast every side that fits (dimension tables are
GBs at most); reserve the shuffle join for fact⋈fact.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray


# per-worker cache of fetched broadcast tables (keyed by object ref) so the
# join runs as fused tasks: ray.put once on the driver, ray.get once per
# worker process, dictionary join per batch — and the stage fuses with its
# neighbors instead of forcing an object-store hop (see enrich.py; fixed
# actor pools also deadlock small CPU sessions when stacked)
_BROADCAST_CACHE: dict = {}


def _fetch_broadcast(ref):
    key = ref.hex()
    v = _BROADCAST_CACHE.get(key)
    if v is None:
        v = _BROADCAST_CACHE[key] = ray.get(ref)
    return v


def broadcast_join(ds, right: pa.Table, *, left_on: str, right_on: str,
                   take_cols: list[str], how: str = "inner", concurrency=2,
                   suffix: str = ""):
    """Join `ds` against a small in-memory `right` table.

    ``take_cols`` are the right-side columns appended to each batch (renamed
    with ``suffix`` on collision). ``how``: 'inner' drops unmatched left rows,
    'left' keeps them with nulls. ``concurrency`` is unused in the default
    fused tasks mode (kept for call-site compatibility)."""
    keys = right.column(right_on).combine_chunks()
    payload = {c: right.column(c).combine_chunks() for c in take_cols}
    ref = ray.put((keys, payload))

    def join_fn(t: pa.Table) -> pa.Table:
        keys_, payload_ = _fetch_broadcast(ref)
        idx = pc.index_in(t.column(left_on).combine_chunks(), keys_)
        if how == "inner":
            valid = pc.is_valid(idx)
            t = t.filter(valid)
            idx = idx.filter(valid)
        for c, arr in payload_.items():
            name = c + suffix if c in t.column_names else c
            t = t.append_column(name, pc.take(arr, idx))
        return t

    return ds.map_batches(join_fn, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(left, right, *, on: str, right_on: str | None = None,
              join_type: str = "inner", num_partitions: int = 32):
    """Big-big equi-join: hash-shuffle both sides on the key.

    Thin wrapper over ``Dataset.join`` so call sites carry the partitioning
    decision explicitly (the all-to-all exchange is the cost center — pick
    ``num_partitions`` ≈ cluster cores, reuse the same key downstream)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )


def bucket_hash_join(left, right, *, on: str, right_on: str | None = None,
                     num_buckets: int = 64, how: str = "inner",
                     fill: dict | None = None):
    """Big-big equi-join via explicit bucket co-partitioning: both
    sides are tagged and unioned, hash-bucketed on the join key (one int
    column drives the shuffle), and each bucket joins its two sides with a
    vectorized pandas merge. Task count = num_buckets (power of 2); key skew
    is diluted by hashing; no side is ever collected whole.

    ``how``: 'inner' or 'left' (unmatched left rows keep the right columns
    null; pass ``fill`` = {col: value} to coalesce them — required for the
    int-type restore when a right int column can be unmatched).

    Same exchange shape as ``Dataset.join`` but with our bucketed groupby
    (measured faster for skinny fact⋈fact joins; see BASELINE.md)."""
    import pandas as pd

    from .aggregate import grouped_apply

    if how not in ("inner", "left"):
        raise ValueError(f"bucket_hash_join: how={how!r} not in ('inner', 'left')")
    right_on = right_on or on
    l_schema = dict(zip(left.schema().names, left.schema().types))
    r_schema = dict(zip(right.schema().names, right.schema().types))
    l_cols = [c for c in l_schema if c != on]
    r_cols = [c for c in r_schema if c != right_on]
    all_cols = [on] + l_cols + [c for c in r_cols if c not in l_cols]
    col_type = {on: l_schema[on], **{c: r_schema[c] for c in r_cols}, **{c: l_schema[c] for c in l_cols}}

    def tag(side: int, keep: list[str], key_col: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays = []
            for c in all_cols:
                if c == on:
                    arrays.append(pc.cast(t.column(key_col), col_type[on]))
                elif c in keep:
                    arrays.append(t.column(c))
                else:
                    arrays.append(pa.nulls(n, col_type[c]))
            out = pa.table(dict(zip(all_cols, arrays)))
            return out.append_column(
                "__side", pa.nulls(n, pa.int8()).fill_null(side)
            )

        return f

    lt = left.map_batches(tag(0, l_cols, on), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag(1, r_cols, right_on), batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    # pandas widens int columns to float when the union frame carries the
    # other side's nulls; cast back after the merge (inner leaves no nulls;
    # a left join leaves them on unmatched right int columns, so those must
    # be coalesced by `fill` before the cast can succeed — fail fast here
    # rather than with an IntCastingNaNError deep inside a reduce task)
    int_casts = {c: "int64" for c in l_cols + r_cols if pa.types.is_integer(col_type[c])}
    if how == "left":
        uncovered = [c for c in r_cols
                     if pa.types.is_integer(col_type[c]) and c not in (fill or {})]
        if uncovered:
            raise ValueError(
                "bucket_hash_join(how='left'): right int columns "
                f"{uncovered} need a fill value (unmatched rows hold nulls)")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0][[on] + l_cols]
        r = g[g["__side"] == 1][[on] + r_cols]
        merged = l.merge(r, on=on, how=how)
        if fill:
            merged = merged.fillna(fill)
        return merged.astype(int_casts) if int_casts else merged

    return grouped_apply(both, [on], per_bucket, num_buckets=num_buckets)


def bucket_anti_join(left, right, *, on: str, right_on: str | None = None,
                     num_buckets: int = 64):
    """Big-big ANTI-join: keep every left row whose key has NO match on the
    right — the relational NOT IN / NOT EXISTS shape (decontamination,
    "never-purchased" audits, tombstone subtraction). Same explicit bucket
    co-partitioning as :func:`bucket_hash_join`: the right side collapses
    to its DISTINCT keys per batch before the shuffle (an anti-join never
    needs right payloads), both sides union tagged, and each bucket drops
    left rows via one vectorized ``isin``. No side is ever collected whole;
    a hot right key costs one distinct row per batch, not a broadcast."""
    import pandas as pd

    from .aggregate import grouped_apply

    right_on = right_on or on
    l_schema = dict(zip(left.schema().names, left.schema().types))
    l_cols = [c for c in l_schema if c != on]
    key_t = l_schema[on]

    def tag_left(t: pa.Table) -> pa.Table:
        return t.select([on] + l_cols).append_column(
            "__side", pa.nulls(t.num_rows, pa.int8()).fill_null(0))

    def tag_right(t: pa.Table) -> pa.Table:
        keys = pc.unique(pc.cast(t.column(right_on).combine_chunks(), key_t))
        out = pa.table({on: keys})
        for c in l_cols:
            out = out.append_column(c, pa.nulls(len(keys), l_schema[c]))
        return out.select([on] + l_cols).append_column(
            "__side", pa.nulls(len(keys), pa.int8()).fill_null(1))

    lt = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)

    int_casts = {c: "int64" for c in l_cols
                 if pa.types.is_integer(l_schema[c])}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0]
        r_keys = g.loc[g["__side"] == 1, on]
        out = l.loc[~l[on].isin(r_keys), [on] + l_cols]
        return out.astype(int_casts) if int_casts else out

    return grouped_apply(lt.union(rt), [on], per_bucket,
                         num_buckets=num_buckets)
