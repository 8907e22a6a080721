"""Aggregation tests: two-phase parity with pandas, delta-calculator
semantics (awsemf/transformer.rs:797-844), skew survival."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.aggregate import delta_within_group, two_phase_aggregate


def test_two_phase_matches_pandas():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 5000),
            "v": rng.integers(0, 100, 5000),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    out = (
        two_phase_aggregate(
            ds, ["k"], [("v", "sum", "sum_v"), ("v", "count", "n"), ("v", "min", "min_v"), ("v", "max", "max_v")],
            batch_size=500,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k")["v"].agg(sum_v="sum", n="count", min_v="min", max_v="max").reset_index()
    )
    pd.testing.assert_frame_equal(out[["k", "sum_v", "n", "min_v", "max_v"]], exp, check_dtype=False)


def test_two_phase_skewed_key():
    # one key holds 90% of rows — partial aggregation keeps reducers small
    df = pd.DataFrame({"k": ["hot"] * 9000 + [f"k{i}" for i in range(1000)], "v": 1})
    ds = rd.from_pandas(df).repartition(16)
    out = two_phase_aggregate(ds, ["k"], [("v", "sum", "s")], batch_size=256).to_pandas()
    assert out.set_index("k")["s"]["hot"] == 9000
    assert len(out) == 1001


def test_delta_drops_first_and_clamps():
    df = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4 + ["c2"] * 2,
            "turn_idx": [0, 1, 2, 3, 0, 1],
            "km_seq": [10, 15, 12, 20, 100, 100],
        }
    )
    ds = rd.from_pandas(df)
    out = (
        delta_within_group(ds, value="km_seq")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # first sighting dropped (no retain_initial_value); negative delta -> 0
    assert out[out.conv_id == "c1"]["delta"].tolist() == [5.0, 0.0, 8.0]
    assert out[out.conv_id == "c2"]["delta"].tolist() == [0.0]


def test_delta_retain_initial_value():
    df = pd.DataFrame({"conv_id": ["c"] * 2, "turn_idx": [0, 1], "km_seq": [7, 9]})
    out = (
        delta_within_group(rd.from_pandas(df), value="km_seq", retain_initial_value=True)
        .to_pandas()
        .sort_values("turn_idx")
    )
    assert out["delta"].tolist() == [7.0, 2.0]


def test_delta_unordered_input():
    # rows arrive out of turn order; sort-within-group must fix it
    df = pd.DataFrame({"conv_id": ["c"] * 3, "turn_idx": [2, 0, 1], "km_seq": [30, 10, 20]})
    out = delta_within_group(rd.from_pandas(df), value="km_seq").to_pandas().sort_values("turn_idx")
    assert out["delta"].tolist() == [10.0, 10.0]


def test_fused_aggregate_equals_unfused(transcripts_dir):
    """fused_metrics_conv_aggregate output (split by __agg tag) is value-
    identical to metrics_aggregate + conv_aggregate on the same input."""
    import pyarrow.compute as pc

    import ray.data as rd

    from rotel_ray.stages.aggregate import (
        _CONV_COLS,
        _METRIC_COLS,
        conv_aggregate,
        fused_metrics_conv_aggregate,
        metrics_aggregate,
    )
    from rotel_ray.stages.parse import parse_stage

    parsed = parse_stage(rd.read_parquet(transcripts_dir))
    fused = fused_metrics_conv_aggregate(parsed).to_pandas()
    m_f = (fused[fused["__agg"] == "metrics"][_METRIC_COLS]
           .sort_values(_METRIC_COLS[:4]).reset_index(drop=True))
    c_f = (fused[fused["__agg"] == "conv_agg"][_CONV_COLS]
           .sort_values("conv_id").reset_index(drop=True))

    parsed2 = parse_stage(rd.read_parquet(transcripts_dir))
    m_u = (metrics_aggregate(parsed2).to_pandas()[_METRIC_COLS]
           .sort_values(_METRIC_COLS[:4]).reset_index(drop=True))
    parsed3 = parse_stage(rd.read_parquet(transcripts_dir))
    c_u = (conv_aggregate(parsed3).to_pandas()[_CONV_COLS]
           .sort_values("conv_id").reset_index(drop=True))

    # normalize the pandas view: fused pads timestamps to us, and the tag
    # filter leaves int columns null-widened to float64 (arrow side is int64)
    for df in (m_f, m_u):
        df["ts_minute"] = df["ts_minute"].astype("datetime64[us]")
        df["value_count"] = df["value_count"].astype("int64")
    for df in (c_f, c_u):
        for c in ("first_ts", "last_ts"):
            df[c] = df[c].astype("datetime64[us]")
        df["max_severity"] = df["max_severity"].astype("int32")
        for c in ("n_turns", "n_tool_calls", "n_errors", "total_duration_ms"):
            df[c] = df[c].astype("int64")
    assert m_f.equals(m_u), "metrics side diverged"
    assert c_f.equals(c_u), "conv side diverged"


def test_slo_burn_window_invariants(ray_session):
    from rotel_ray.queries import QUERIES

    df = QUERIES["slo_burn"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    # hour columns are consistent: err60/tot60 equal the sum of the hour's
    # 5-minute partials, constant within the (tool, hour) group
    df["w60"] = df["w5"].dt.floor("h")
    for (_, _), g in df.groupby(["tool_name", "w60"]):
        assert (g["err60"] == g["err5"].sum()).all()
        assert (g["tot60"] == g["tot5"].sum()).all()
    # the burn flag is exactly the integer cross-multiplication rule
    want = df["err5"] * df["tot60"] > 2 * df["err60"] * df["tot5"]
    assert (df["burn"] == want).all()


def test_input_rows_hint_coalesce_matches_bucketed(ray_session):
    """The small-exchange coalesce produces identical results to the
    bucketed plan, for both grouped_apply and two_phase_aggregate."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.aggregate import (grouped_apply, input_rows_hint,
                                            two_phase_aggregate)

    rng = np.random.default_rng(2)
    t = pa.table({"k": rng.integers(0, 100, 20_000),
                  "v": rng.integers(0, 1000, 20_000)})

    def per_key_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", sort=False)["v"].sum().reset_index(name="s")

    def run(hint):
        ds = rd.from_arrow(t).repartition(8)
        with input_rows_hint(hint):
            a = grouped_apply(ds, ["k"], per_key_sum).to_pandas()
            b = two_phase_aggregate(ds, ["k"], [("v", "sum", "s")]).to_pandas()
        return (a.sort_values("k").reset_index(drop=True),
                b.sort_values("k").reset_index(drop=True))

    a_small, b_small = run(20_000)          # coalesced plans
    a_big, b_big = run(10**9)               # bucketed plans (hint too large)
    pd.testing.assert_frame_equal(a_small, a_big)
    pd.testing.assert_frame_equal(b_small, b_big)


def test_bounded_take_all_raises_loudly(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from rotel_ray.stages.aggregate import bounded_take_all

    ds = rd.from_arrow(pa.table({"x": list(range(100))}))
    assert len(bounded_take_all(ds, 100)) == 100
    with pytest.raises(ValueError, match="broadcast bound"):
        bounded_take_all(ds, 99, "test table")


def test_turn_latency_role_pairs():
    import pyarrow as pa

    import ray.data as rd

    from rotel_ray.stages.window import turn_latency

    us = [0, 5, 12, 0, 7]  # conv a: gaps 5,7 ; conv b: gap 7
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array(["a", "a", "a", "b", "b"]),
        "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int32()),
        "role": pa.array(["user", "assistant", "user", "user", "assistant"]),
        "ts": pa.array(us, pa.timestamp("us")),
    }))
    got = (turn_latency(ds, num_buckets=4).to_pandas()
           .sort_values(["role_from", "role_to"]).reset_index(drop=True))
    rows = {(r.role_from, r.role_to): (r.n, r.sum_us, r.mean_us)
            for r in got.itertuples()}
    assert rows == {("user", "assistant"): (2, 12, 6),
                    ("assistant", "user"): (1, 7, 7)}


def test_late_events_watermark_semantics():
    import pyarrow as pa

    import ray.data as rd

    from rotel_ray.stages.window import late_events

    # arrival order: ts 100, 500, 120(late if delay<380-?), 490, 50
    # watermark before each arrival = max of earlier ts - delay(=100):
    #   a0 ts=100 -> no prior -> on time
    #   a1 ts=500 -> wm=100-100=0 -> on time
    #   a2 ts=120 -> wm=500-100=400 -> LATE
    #   a3 ts=490 -> wm=400 -> on time
    #   a4 ts=50  -> wm=400 -> LATE
    us = [100, 500, 120, 490, 50]
    ds = rd.from_arrow(pa.table({
        "arrival_seq": pa.array(range(5), pa.int64()),
        "ts": pa.array(us, pa.timestamp("us")),
        "event_type": pa.array(["c", "c", "c", "v", "v"]),
    }))
    got = (late_events(ds, delay_us=100, chunk=2, num_buckets=4).to_pandas()
           .sort_values(["event_type", "late"]).reset_index(drop=True))
    rows = {(r.event_type, bool(r.late)): r.n_events for r in got.itertuples()}
    assert rows == {("c", False): 2, ("c", True): 1,
                    ("v", False): 1, ("v", True): 1}


def test_session_conversion_funnel():
    import pyarrow as pa

    import ray.data as rd

    from rotel_ray.stages.window import session_conversion

    m = 60_000_000  # one minute in us
    rows = [
        # user 1, session A: click @0, purchase @5m -> converted
        (1, 0, "click"), (1, 5 * m, "purchase"),
        # user 1, session B (after 40-min gap): purchase BEFORE click -> not
        (1, 45 * m, "purchase"), (1, 50 * m, "click"),
        # user 2, one session: view only -> no click
        (2, 0, "view"),
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "event_id": pa.array(range(len(rows)), pa.int64()),
    }))
    got = session_conversion(ds, num_buckets=4).to_pandas()
    assert got.to_dict("records") == [
        {"n_sessions": 3, "n_with_click": 2, "n_converted": 1}]


def test_pair_cooccurrence_vectorized_explosion():
    """The repeat/arange pair-index algebra enumerates exactly the k(k-1)/2
    ordered-by-name pairs per group, with duplicates collapsed first."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.aggregate import pair_cooccurrence

    rows = [
        ("c1", "bash"), ("c1", "search"), ("c1", "bash"), ("c1", "python"),
        ("c2", "search"), ("c2", "bash"),
        ("c3", "python"), ("c3", ""), ("c3", None),   # empties filtered
        ("c4", "bash"),                                # singleton: no pairs
    ]
    t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                  "tool": pa.array([r[1] for r in rows])})
    out = (pair_cooccurrence(rd.from_arrow(t), num_buckets=4)
           .to_pandas().set_index(["tool_a", "tool_b"])["n_groups"])
    assert out.to_dict() == {("bash", "search"): 2,
                             ("bash", "python"): 1,
                             ("python", "search"): 1}
