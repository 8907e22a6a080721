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


def _first_parquet(path: str) -> str:
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


def read_parquet(path, *, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with a metadata-free (and column-pruned)
    schema — see module docstring."""
    return rd.read_parquet(path, columns=columns, schema=clean_schema(path, columns), **kwargs)
