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


def test_skew_report_extremes_and_mirror():
    """Gini: balanced keys -> 0; one dominant key -> high; value equals a
    direct sorted-rank replay."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.profile import skew_report

    def run(keys):
        t = pa.table({"user_id": pa.array(keys, pa.int64())})
        return (skew_report(rd.from_arrow(t).repartition(3), key="user_id")
                .to_pandas().iloc[0])

    def mirror(keys):
        from collections import Counter
        c = np.sort(np.array(list(Counter(keys).values()), np.int64))
        n, tot = len(c), int(c.sum())
        s1 = int((np.arange(1, n + 1) * c).sum())
        return (1_000_000 * (2 * s1 - (n + 1) * tot)) // (n * tot)

    balanced = [i % 10 for i in range(100)]
    r = run(balanced)
    assert r.n_keys == 10 and r.n_rows == 100 and r.max_count == 10
    assert r.gini_e6 == 0 == mirror(balanced)

    skewed = [0] * 91 + list(range(1, 10))
    r = run(skewed)
    assert r.max_count == 91
    assert r.gini_e6 == mirror(skewed) > 700_000


def test_k_anonymity_histogram(ray_session):
    """(a,x) appears 3x, (a,y) 1x, (b,x) 1x -> sizes {3:1 group, 1:2
    groups}; k=2 flags the singletons."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.profile import k_anonymity

    t = pa.table({"u": pa.array(["a", "a", "a", "a", "b"]),
                  "e": pa.array(["x", "x", "x", "y", "x"])})
    out = (k_anonymity(rd.from_arrow(t), ["u", "e"], k=2, num_buckets=2)
           .to_pandas().set_index("group_size").sort_index())
    assert out.loc[1, "n_groups"] == 2 and out.loc[1, "at_risk"] == 1
    assert out.loc[1, "n_rows"] == 2
    assert out.loc[3, "n_groups"] == 1 and out.loc[3, "at_risk"] == 0


def test_join_cardinality_exact(ray_session):
    """Keys 1 (2x3 rows), 2 (1x1); key 3 unmatched -> 7 join rows, 2
    matched keys, max fanout 6."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.profile import join_cardinality

    l = rd.from_arrow(pa.table({"a": pa.array([1, 1, 2, 3], pa.int64())}))
    r = rd.from_arrow(pa.table({"b": pa.array([1, 1, 1, 2], pa.int64())}))
    out = join_cardinality(l, r, left_on="a", right_on="b",
                           num_buckets=2).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "n_join_rows"] == 7
    assert out.loc[0, "n_matched_keys"] == 2
    assert out.loc[0, "max_key_fanout"] == 6


def test_type_correlation_moments(ray_session):
    """Two types over a 3-hour grid: a=(2,1,0 at h0,h1), b=(3 at h1,
    1 at h2) -> sxy = 1*3 (only h1 overlaps), marginals and grid exact;
    a pair with no common hour emits sxy=0."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.profile import type_correlation

    T = datetime.datetime(2024, 1, 1)
    def ts(h):
        return T + datetime.timedelta(hours=h)
    rows = ([("a", ts(0))] * 2 + [("a", ts(1))]
            + [("b", ts(1))] * 3 + [("b", ts(2))]
            + [("c", ts(2))])                 # c never shares an hour w/ a
    t = pa.table({"event_type": pa.array([r[0] for r in rows]),
                  "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))})
    out = (type_correlation(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index(["type_a", "type_b"]).sort_index())
    ab = out.loc[("a", "b")]
    assert ab["n_hours"] == 3 and ab["sxy"] == 3
    assert ab["sx_a"] == 3 and ab["sxx_a"] == 5
    assert ab["sx_b"] == 4 and ab["sxx_b"] == 10
    assert out.loc[("a", "c"), "sxy"] == 0
    assert out.loc[("b", "c"), "sxy"] == 1 * 1
    assert len(out) == 3
