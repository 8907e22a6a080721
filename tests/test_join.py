"""Join-operator tests: broadcast join vs pandas merge; hash-shuffle join."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.join import broadcast_join, hash_join


def _facts(n=1000, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"k": rng.integers(0, 50, n), "x": rng.random(n).round(4)})


def _dims():
    return pa.table({"k": pa.array(range(0, 40), pa.int64()),
                     "name": pa.array([f"dim{i}" for i in range(40)])})


def test_broadcast_join_inner():
    fdf = _facts()
    ds = rd.from_arrow(pa.Table.from_pandas(fdf, preserve_index=False))
    out = broadcast_join(ds, _dims(), left_on="k", right_on="k", take_cols=["name"]).to_pandas()
    ref = fdf.merge(_dims().to_pandas(), on="k", how="inner")
    assert len(out) == len(ref)
    assert sorted(out.name) == sorted(ref.name)


def test_broadcast_join_left_keeps_unmatched():
    fdf = _facts()
    ds = rd.from_arrow(pa.Table.from_pandas(fdf, preserve_index=False))
    out = broadcast_join(ds, _dims(), left_on="k", right_on="k", take_cols=["name"],
                         how="left").to_pandas()
    assert len(out) == len(fdf)
    assert out[out.k >= 40].name.isna().all()


def test_hash_join_matches_pandas():
    fdf = _facts()
    right = pd.DataFrame({"rk": range(0, 40), "name": [f"dim{i}" for i in range(40)]})
    l = rd.from_arrow(pa.Table.from_pandas(fdf, preserve_index=False))
    r = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    out = hash_join(l, r, on="k", right_on="rk", num_partitions=4).to_pandas()
    ref = fdf.merge(right, left_on="k", right_on="rk", how="inner")
    assert len(out) == len(ref)
    assert out.groupby("k").size().to_dict() == ref.groupby("k").size().to_dict()


def test_bucket_left_join_requires_fill_for_int_cols(ray_session):
    import pytest as _pt
    import ray.data as rd

    import pyarrow as pa

    from rotel_ray.stages.join import bucket_hash_join

    left = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([2], pa.int64()),
                                    "m": pa.array([5], pa.int64())}))
    with _pt.raises(ValueError, match="need a fill value"):
        bucket_hash_join(left, right, on="k", how="left")
    with _pt.raises(ValueError, match="not in"):
        bucket_hash_join(left, right, on="k", how="outer")


def test_bucket_anti_join_drops_matched_keys():
    from rotel_ray.stages.join import bucket_anti_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"]),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 4, 9], pa.int64()),
    }))
    got = (bucket_anti_join(left, right, on="k", right_on="rk",
                            num_buckets=4).to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert got.k.tolist() == [1, 3]
    assert got.v.tolist() == ["a", "c"]
    assert str(got.k.dtype) == "int64"
