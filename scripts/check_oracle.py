"""Local mirror of the driver's correctness gate: run each Ray query and its
DuckDB oracle side-by-side and diff (row count, column names/types,
order-insensitive values).

Usage: python scripts/check_oracle.py [--sf-dir DIR] [names...]
Default scale is sf0.01 (the driver's); --sf-dir /root/testdata/sf0.1 runs
the same sweep at 10x — the round-5 guard against scale-dependent oracle
divergence (result recorded in BASELINE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import ray

SF_DIR = "/root/testdata/sf0.01"
if "--sf-dir" in sys.argv:
    i = sys.argv.index("--sf-dir")
    SF_DIR = sys.argv[i + 1]
    del sys.argv[i:i + 2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"row count {len(ray_df)} vs {len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            else:
                ok = (pd.Series(av).fillna("<null>") == pd.Series(bv).fillna("<null>")).all()
            if not ok:
                bad = np.flatnonzero(~(pd.Series(av).fillna("<n>").astype(str) == pd.Series(bv).fillna("<n>").astype(str)))[:5]
                problems.append(f"col {c}: {len(bad)}+ diffs, e.g. idx {bad[:3]} ray={av[bad[:3]]} sql={bv[bad[:3]]}")
            # dtype note (driver checks schema)
            if str(ray_df[c].dtype) != str(sql_df[c].dtype):
                problems.append(f"dtype {c}: ray={ray_df[c].dtype} sql={sql_df[c].dtype}")
    return problems


def main():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from rotel_ray.queries import QUERIES, oracle_sql

    con = duckdb.connect()
    # cap DuckDB parallelism when several sweeps share the box (the heavy
    # brute-force dedup oracles run as parallel single-query processes)
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        con.execute(f"PRAGMA threads={int(thr)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    sqls = oracle_sql(SF_DIR)
    names = sys.argv[1:] or list(QUERIES)
    failed = []
    for name in names:
        try:
            ray_df = to_pandas(QUERIES[name](SF_DIR))
            if name not in sqls:
                print(f"  {name}: rows={len(ray_df)} (no oracle — rows-only)")
                continue
            sql_df = con.execute(sqls[name]).fetchdf()
            problems = compare(name, ray_df, sql_df)
            if problems:
                failed.append(name)
                print(f"✗ {name}: " + "; ".join(problems))
            else:
                print(f"✓ {name}: {len(ray_df)} rows match")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"✗ {name}: EXCEPTION {type(e).__name__}: {e}")
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
