"""table_profile vs a pandas reference, incl. nulls and non-int columns."""
import numpy as np
import pyarrow as pa


def test_table_profile_counts_nulls_distincts(ray_session):
    import ray

    from rotel_ray.stages.profile import table_profile

    t = pa.table({
        "a": pa.array([1, 2, 2, None, 5], pa.int64()),
        "s": pa.array(["x", None, "x", "y", None]),
    })
    out = (table_profile(ray.data.from_arrow(t), ["a", "s"], num_buckets=2)
           .to_pandas().set_index("col_name"))
    assert out.loc["a", "n"] == 5 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 3
    assert out.loc["a", "min_i"] == 1 and out.loc["a", "max_i"] == 5
    assert out.loc["s", "n_distinct"] == 2
    assert np.isnan(out.loc["s", "min_i"]) or out.loc["s", "min_i"] is None


def test_table_profile_empty_input(ray_session):
    import pyarrow as pa
    import ray

    from rotel_ray.stages.profile import table_profile

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "s": pa.array([], pa.string())}))
    out = table_profile(ds, ["a", "s"], num_buckets=2).to_pandas()
    assert list(out.n) == [0, 0] and list(out.n_distinct) == [0, 0]
