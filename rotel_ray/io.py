"""Parquet input helpers.

``read_parquet`` wraps ``ray.data.read_parquet`` with an explicit,
metadata-free schema. Parquet files written via pandas/pyarrow carry a
``b'pandas'`` schema-metadata blob; ``pyarrow.Schema`` with that metadata is
unhashable, which makes every downstream shuffle's schema-dedup log
"Failed to hash the schemas (for deduplication): unhashable type: 'dict'"
(ray/data/_internal/arrow_ops/transform_pyarrow.py:181). Supplying the pruned
schema keeps reader output blocks metadata-free, silences the spam, and makes
the column projection explicit at the read.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _first_parquet(path) -> str:
    if isinstance(path, (list, tuple)):
        path = path[0]
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                return os.path.join(path, name)
    return path


def clean_schema(path: str, columns: list[str] | None = None) -> pa.Schema:
    """The file's schema (optionally projected) with all metadata stripped."""
    full = pq.read_schema(_first_parquet(path))
    names = columns if columns is not None else full.names
    return pa.schema([pa.field(c, full.field(c).type, full.field(c).nullable) for c in names])


_SMALL_BLOCK_BYTES = 1 << 20  # ~1 MiB compressed parquet per block


def _total_bytes(path) -> int | None:
    paths = path if isinstance(path, (list, tuple)) else [path]
    tot = 0
    for p in paths:
        if os.path.isdir(p):
            tot += sum(
                os.path.getsize(os.path.join(p, n))
                for n in os.listdir(p)
                if n.endswith(".parquet")
            )
        elif os.path.isfile(p):
            tot += os.path.getsize(p)
        else:
            return None
    return tot


def read_parquet(path, *, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with a metadata-free (and column-pruned)
    schema — see module docstring.

    Small inputs additionally get a size-derived ``override_num_blocks``
    (~1 MiB compressed per block): Ray's default read parallelism is
    ``cpus*2`` blocks regardless of size, and every downstream sort-shuffle
    pays per-input-block overhead — 64 blocks for a 0.6 MB table measured
    2-4x the exchange wall of 8 blocks. A floor of 8 blocks keeps
    compute-dense stages (minhash signatures over a sub-MiB documents
    table) parallel: floor-less 1-block reads serialized dedup_minhash
    (2.6 s with the floor vs 5-8 s without at sf0.1/32 cpus). Inputs big
    enough to want >= 64 blocks are left to Ray's own sizing (bytes /
    target block size), so the override only ever fires where the default
    over-splits.
    """
    if "override_num_blocks" not in kwargs:
        tot = _total_bytes(path)
        if tot is not None:
            est = max(8, tot // _SMALL_BLOCK_BYTES + 1)
            if est < 64:
                kwargs["override_num_blocks"] = est
    return rd.read_parquet(path, columns=columns, schema=clean_schema(path, columns), **kwargs)
