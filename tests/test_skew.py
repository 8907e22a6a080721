"""Skew robustness: hot keys through every bucketed shuffle operator.

The north rule requires explicit skew handling: a Zipf-head key (here 60% of
all rows on ONE key) must neither break correctness nor concentrate raw rows
on a single reducer. two_phase_aggregate's per-batch combiner reduces the hot
key to one partial row per batch before any shuffle; grouped_apply dilutes
hot buckets across vectorized per-bucket work.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.aggregate import grouped_apply, two_phase_aggregate
from rotel_ray.stages.join import bucket_hash_join


def _skewed(n=100_000, seed=9):
    rng = np.random.default_rng(seed)
    keys = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 1000, n)).astype(np.int64)
    return pd.DataFrame({"k": keys, "v": rng.integers(0, 100, n).astype(np.int64)})


def test_two_phase_aggregate_hot_key():
    df = _skewed()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(16)
    out = (
        two_phase_aggregate(ds, ["k"], [("v", "sum", "v_sum"), ("v", "count", "n")],
                            batch_size=4096)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    ref = df.groupby("k").agg(v_sum=("v", "sum"), n=("v", "size"))
    assert out["v_sum"].to_dict() == ref["v_sum"].to_dict()
    assert out["n"].to_dict() == ref["n"].to_dict()
    assert out.loc[7, "n"] > 50_000  # the hot key really was hot


def test_grouped_apply_hot_key():
    df = _skewed(20_000)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(v_max=("v", "max"))

    out = grouped_apply(ds, ["k"], per_bucket).to_pandas().set_index("k").sort_index()
    ref = df.groupby("k").agg(v_max=("v", "max"))
    assert out["v_max"].to_dict() == ref["v_max"].to_dict()


def test_bucket_hash_join_hot_key():
    df = _skewed(20_000)
    right = pd.DataFrame({"rk": np.arange(1000, dtype=np.int64),
                          "name": [f"d{i}" for i in range(1000)]})
    l = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    r = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    out = bucket_hash_join(l, r, on="k", right_on="rk").to_pandas()
    ref = df.merge(right, left_on="k", right_on="rk")
    assert len(out) == len(ref)
    assert out[out.k == 7].shape[0] == ref[ref.k == 7].shape[0]
