"""Windowed-operator tests: sessionize / top-k per group / as-of join vs
pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rotel_ray.stages.window import asof_join_backward, sessionize, topk_per_group


def _events():
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for uid in (1, 2):
        offs = [0, 5, 10, 50, 55, 120]  # minutes; gaps at 40 and 65
        for o in offs:
            rows.append((eid, uid, base + pd.Timedelta(minutes=o), float(eid % 7) + 0.5))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)), df


def test_sessionize_gap_semantics():
    ds, df = _events()
    out = sessionize(ds, gap_minutes=30.0).to_pandas().sort_values(["user_id", "session_idx"])
    for uid in (1, 2):
        u = out[out.user_id == uid].reset_index(drop=True)
        assert list(u.session_idx) == [0, 1, 2]
        assert list(u.n_events) == [3, 2, 1]
    # value sums in cents
    u1 = out[(out.user_id == 1) & (out.session_idx == 0)].iloc[0]
    expected = int(sum(np.floor((df[df.user_id == 1].value.iloc[:3]) * 100 + 0.5)))
    assert u1.value_sum_cents == expected


def test_topk_per_group_matches_pandas():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "event_id": range(500),
            "user_id": rng.integers(0, 10, 500),
            "value": rng.random(500).round(3),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = topk_per_group(ds, key="user_id", order_col="value", id_col="event_id", k=3,
                         cols=["user_id", "value", "event_id"]).to_pandas()
    ref = (
        df.sort_values(["user_id", "value", "event_id"], ascending=[True, False, True])
        .groupby("user_id")
        .head(3)
    )
    got = set(map(tuple, out[["user_id", "event_id"]].values))
    want = set(map(tuple, ref[["user_id", "event_id"]].values))
    assert got == want


def test_asof_join_backward_matches_merge_asof():
    ds, df = _events()
    left = ds.filter(expr="value > 2.0")
    right = ds.filter(expr="value <= 2.0")
    out = asof_join_backward(
        left, right, key="user_id", ts_col="ts",
        left_cols=["event_id", "value"], right_cols=["event_id", "value"],
    ).to_pandas()

    ldf = df[df.value > 2.0].sort_values("ts")
    rdf = df[df.value <= 2.0].sort_values("ts")
    ref = pd.merge_asof(
        ldf, rdf.rename(columns={"ts": "ts_right", "event_id": "event_id_right",
                                 "value": "value_right"}),
        left_on="ts", right_on="ts_right", by="user_id", direction="backward",
    ).dropna(subset=["ts_right"])
    got = sorted(map(tuple, out[["user_id", "event_id", "event_id_right"]].astype(int).values.tolist()))
    want = sorted(map(tuple, ref[["user_id", "event_id", "event_id_right"]].astype(int).values.tolist()))
    assert got == want


def test_hopping_window_fanout():
    from rotel_ray.stages.window import hopping_window_aggregate

    base = pd.Timestamp("2024-01-01 00:07:30")
    df = pd.DataFrame({"event_type": ["a"], "ts": [base], "value": [2.0]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = hopping_window_aggregate(ds, window_minutes=5, hop_minutes=1).to_pandas()
    # one event -> exactly window/hop = 5 windows, each containing it
    assert len(out) == 5
    assert (out.n == 1).all() and (out.sum_value_cents == 200).all()
    starts = sorted(out.window_start)
    assert starts[0] == pd.Timestamp("2024-01-01 00:03:00")
    assert starts[-1] == pd.Timestamp("2024-01-01 00:07:00")


def test_range_join_matches_bruteforce():
    from rotel_ray.stages.window import range_join_time

    rng = np.random.default_rng(4)
    n = 400
    base = pd.Timestamp("2024-01-01").value // 1000
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": rng.integers(0, 5, n),
            "ts": pd.to_datetime(base + rng.integers(0, 3_600_000_000, n), unit="us"),
        }
    )
    left = df.iloc[: n // 2]
    right = df.iloc[n // 2 :]
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    out = range_join_time(lds, rds, key="user_id", before_minutes=3, after_minutes=3)
    got = set(zip(*[out.to_pandas()[c] for c in ("left_id", "right_id")]))
    # brute force
    want = set()
    tol = pd.Timedelta(minutes=3)
    for _, l in left.iterrows():
        for _, r in right.iterrows():
            if l.user_id == r.user_id and abs(l.ts - r.ts) <= tol:
                want.add((l.event_id, r.event_id))
    assert got == want and len(want) > 0


def test_global_topfrac_exact_ranks_ties_and_degenerate(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.window import global_topfrac

    rng = np.random.default_rng(11)
    vals = rng.integers(-50, 50, 333)  # heavy ties
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(333), pa.int64()),
        "v": pa.array(vals.astype(np.int64))}))
    out = global_topfrac(ds, value_col="v", id_col="id", num=1, den=3,
                         bins=16, num_buckets=4).to_pandas()
    order = sorted(zip(-vals, np.arange(333)))
    k = -(-333 // 3)
    expect = {(int(i), int(-nv), r + 1) for r, (nv, i) in enumerate(order[:k])}
    got = {(int(r.id), int(r.v), int(r.rnk)) for r in out.itertuples()}
    assert got == expect and len(out) == k

    # all-equal values: single-bin path, ranks = id order
    ds2 = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(10), pa.int64()),
        "v": pa.array(np.full(10, 7, np.int64))}))
    out2 = global_topfrac(ds2, value_col="v", id_col="id", num=1, den=4,
                          bins=8, num_buckets=2).to_pandas().sort_values("rnk")
    assert list(out2.id) == [0, 1, 2] and list(out2.rnk) == [1, 2, 3]


def test_global_quantiles_exact_vs_sorted(ray_session):
    import math
    from fractions import Fraction

    import numpy as np
    import pyarrow as pa
    import ray

    from rotel_ray.stages.window import global_quantiles

    rng = np.random.default_rng(0)
    cases = [
        rng.integers(-10**12, 10**12, 3000),  # huge range -> multi-pass bisection
        rng.integers(0, 5, 3000),             # heavy ties
        np.full(50, 42),                      # constant
        rng.zipf(1.5, 3000).astype(np.int64), # skew
        np.array([7]),                        # single row
    ]
    for vals in cases:
        ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
        out = global_quantiles(ds, value_col="v", qs=(0.5, 0.95, 0.99),
                               bins=64, num_buckets=2).to_pandas()
        s = np.sort(vals)
        for q, got in zip(out.q, out.value):
            r = Fraction(float(q)).limit_denominator(10**6) * len(s)
            rank = max(1, math.ceil(r))
            assert s[rank - 1] == got, (q, got, s[rank - 1])


def test_transition_counts_matches_pandas(ray_session):
    from collections import Counter

    from rotel_ray.stages.window import transition_counts

    rng = np.random.default_rng(3)
    n = 2000
    conv = rng.integers(0, 60, n)
    # shuffled row order: the operator must sort within conv by turn_idx
    turn = np.zeros(n, np.int64)
    for c in np.unique(conv):
        idx = np.flatnonzero(conv == c)
        turn[idx] = rng.permutation(len(idx))
    role = rng.choice(["user", "assistant", "tool", "system"], n)
    t = pa.table({"conv_id": pa.array([f"c{c}" for c in conv]),
                  "turn_idx": pa.array(turn, pa.int32()),
                  "role": pa.array(role)})
    out = transition_counts(rd.from_arrow(t).repartition(5),
                            num_buckets=8).to_pandas()
    ref = Counter()
    df = pd.DataFrame({"conv_id": t.column("conv_id").to_pylist(),
                       "turn_idx": turn, "role": role})
    for _, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        r = g["role"].to_numpy()
        for a, b in zip(r[:-1], r[1:]):
            ref[(a, b)] += 1
    got = {(r.from_state, r.to_state): r.n for r in out.itertuples()}
    assert got == dict(ref)


def test_rolling_sum_matches_pandas(ray_session):
    from rotel_ray.stages.window import rolling_sum

    rng = np.random.default_rng(6)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n),
        "ts": pd.to_datetime(rng.integers(0, 10**5, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.uniform(0, 100, n),
    })
    out = (rolling_sum(rd.from_pandas(df).repartition(5), key="user_id",
                       order_cols=["ts", "event_id"], value_col="value",
                       window=5, num_buckets=8)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    s = df.sort_values(["user_id", "ts", "event_id"]).copy()
    s["cents"] = np.floor(s["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    s["roll_cents"] = (s.groupby("user_id")["cents"]
                       .rolling(5, min_periods=1).sum()
                       .reset_index(level=0, drop=True).astype(np.int64))
    ref = s.sort_values("event_id").reset_index(drop=True)
    assert (out["roll_cents"].to_numpy() == ref["roll_cents"].to_numpy()).all()


def test_bucket_left_join_fill(ray_session):
    import ray.data as rd2

    from rotel_ray.stages.join import bucket_hash_join

    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "a": pa.array(["w", "x", "y", "z"])})
    right = pa.table({"k": pa.array([2, 4], pa.int64()),
                      "m": pa.array([20, 40], pa.int64())})
    out = (bucket_hash_join(rd2.from_arrow(left), rd2.from_arrow(right),
                            on="k", how="left", fill={"m": 0}, num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == [1, 2, 3, 4]
    assert list(out["m"]) == [0, 20, 0, 40]
    assert str(out["m"].dtype) == "int64"


def test_latest_with_tombstones(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import latest_with_tombstones

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 300, n),
        "ts": rng.integers(0, 10_000, n),
        "event_id": np.arange(n),
        "event_type": rng.choice(["view", "click", "error"], n),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    out = latest_with_tombstones(ds, key="user_id",
                                 order_cols=["ts", "event_id"]).to_pandas()
    ref = (df.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False])
           .drop_duplicates("user_id"))
    ref = ref[ref.event_type != "error"]
    got = out.sort_values("user_id").reset_index(drop=True)
    ref = ref.sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == ref["user_id"].tolist()
    assert got["event_id"].tolist() == ref["event_id"].tolist()
    # some keys really did vanish via tombstone
    assert len(got) < df.user_id.nunique()


def test_peak_concurrency_sweep_line():
    """Hand-built intervals with known per-hour peaks: overlapping sessions,
    a session spanning hours (carry-in), and an hour whose only boundary is
    an END (peak there is the carried level minus the drop, but the max
    must include the pre-drop post-boundary value of that hour's events
    only)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import peak_concurrency

    H = 3_600_000_000  # us
    # Build events so 30-min-gap sessionization yields these sessions:
    #   u1: [0.1h, 0.2h]          u2: [0.15h, 0.25h]   -> hour 0 peak 2
    #   u3: [0.9h, 2.1h] (events every 20 min, spans hours 0-2)
    #   u4: [2.05h, 2.05h] single event
    rows = []

    def ev(uid, *hours_f):
        for hf in hours_f:
            rows.append((uid, int(hf * H)))

    ev(1, 0.1, 0.2)
    ev(2, 0.15, 0.25)
    ev(3, *[0.9 + i * (1 / 3) for i in range(4)])  # 0.9,1.233,1.566,1.9 then 2.1
    ev(3, 2.1)
    ev(4, 2.05)
    df = pd.DataFrame(rows, columns=["user_id", "us"])
    t = pa.table({
        "user_id": pa.array(df.user_id, pa.int64()),
        "ts": pa.array(df.us, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(np.zeros(len(df))),
        "event_id": pa.array(range(len(df)), pa.int64()),
    })
    out = (peak_concurrency(rd.from_arrow(t), gap_minutes=30.0, num_buckets=4)
           .to_pandas().set_index("hour_id").sort_index())
    # hour 0 boundaries: +u1,+u2,-u1,-u2,+u3 -> peak 2; 5 boundaries
    assert out.loc[0, "peak_concurrency"] == 2 and out.loc[0, "n_boundaries"] == 5
    # hour 1: no boundaries (u3 active throughout) -> no row
    assert 1 not in out.index
    # hour 2: carry-in 1 (u3); +u4 (2.05) -> 2, -u4 -> 1, -u3 (2.1) -> 0
    assert out.loc[2, "peak_concurrency"] == 2 and out.loc[2, "n_boundaries"] == 3


def test_cusum_hourly_reset_identity():
    """Hand-built hourly series with a planted level shift: the vectorized
    prefix-sum/prefix-min identity must equal the sequential
    s = max(0, s + x - k) recurrence, and the alert fires only after the
    shift persists."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import cusum_hourly

    H = 3_600_000_000
    # hours 0-9 quiet (1 event), hours 10-14 shifted (6 events)
    counts = [1] * 10 + [6] * 5
    us = []
    for h, c in enumerate(counts):
        us.extend(h * H + np.arange(c) * 1000)
    t = pa.table({"ts": pa.array(us, pa.int64()).cast(pa.timestamp("us"))})
    out = (cusum_hourly(rd.from_arrow(t), num_buckets=2)
           .to_pandas().sort_values("hour_id").reset_index(drop=True))
    total, span = sum(counts), len(counts)
    k = -(-total // span)
    s, seq = 0, []
    for x in counts:
        s = max(0, s + x - k)
        seq.append(s)
    assert out["x"].tolist() == counts
    assert out["s_pos"].tolist() == seq
    assert out["alert"].tolist() == [int(v >= 4 * k) for v in seq]
    # the shift is detected, the quiet head never alerts
    assert out["alert"][:10].sum() == 0 and out["alert"].sum() > 0


def test_cohort_retention_triangle():
    """Two cohorts with known return days, including a user active twice
    the same day (distinct-user semantics, not event counts)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import cohort_retention

    D = 86_400_000_000
    rows = [  # (user, day)
        (1, 0), (1, 0), (1, 1), (1, 3),   # cohort 0: offsets 0,1,3 (day0 twice)
        (2, 0), (2, 3),                   # cohort 0: offsets 0,3
        (3, 1), (3, 2),                   # cohort 1: offsets 0,1
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * D + r[0] for r in rows],
                       pa.int64()).cast(pa.timestamp("us")),
    })
    out = (cohort_retention(rd.from_arrow(t), num_buckets=4).to_pandas()
           .set_index(["cohort_day", "day_offset"])["n_users"].sort_index())
    assert out.to_dict() == {(0, 0): 2, (0, 1): 1, (0, 3): 2,
                             (1, 0): 1, (1, 1): 1}


def test_scd2_intervals_runs():
    """Consecutive same-state events collapse into one interval; the last
    run per key is open-ended and flagged current; same-ts ties break by
    event_id."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import scd2_intervals

    M = 60_000_000
    rows = [  # (user, minute, type, event_id)
        (1, 0, "a", 0), (1, 1, "a", 1), (1, 2, "b", 2), (1, 3, "a", 3),
        (2, 0, "x", 4), (2, 0, "y", 5),  # same ts: id order decides runs
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * M for r in rows], pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "event_id": pa.array([r[3] for r in rows], pa.int64()),
    })
    out = (scd2_intervals(rd.from_arrow(t), num_buckets=4).to_pandas()
           .sort_values(["user_id", "valid_from_us"]).reset_index(drop=True))
    u1 = out[out.user_id == 1]
    assert u1["event_type"].tolist() == ["a", "b", "a"]
    assert u1["valid_from_us"].tolist() == [0, 2 * M, 3 * M]
    assert u1["valid_to_us"].tolist()[:2] == [2 * M, 3 * M]
    assert pd.isna(u1["valid_to_us"].iloc[2]) and u1["is_current"].tolist() == [0, 0, 1]
    u2 = out[out.user_id == 2]
    assert u2["event_type"].tolist() == ["x", "y"]
    assert u2["valid_to_us"].tolist()[0] == 0  # y starts at the same ts
    assert u2["is_current"].tolist() == [0, 1]


def test_autocorr_hourly_periodic_signal():
    """A period-2 alternating hourly series: lag-2 autocorrelation is
    strongly positive, lag-1 strongly negative; values match a direct
    big-int replay of the scaled formula."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import autocorr_hourly

    H = 3_600_000_000
    counts = [1, 5] * 10
    us = []
    for h, c in enumerate(counts):
        us.extend(h * H + np.arange(c) * 1000)
    t = pa.table({"ts": pa.array(us, pa.int64()).cast(pa.timestamp("us"))})
    out = (autocorr_hourly(rd.from_arrow(t), max_lag=3, num_buckets=2)
           .to_pandas().set_index("lag"))
    n, S = len(counts), sum(counts)
    res = [n * v - S for v in counts]
    den = sum(v * v for v in res)
    for k in (1, 2, 3):
        v = 1_000_000 * sum(res[i] * res[i + k] for i in range(n - k))
        q = -((-v) // den) if v < 0 else v // den
        assert out.loc[k, "r_e6"] == q
        assert out.loc[k, "n_terms"] == n - k
    assert out.loc[1, "r_e6"] < -500_000 and out.loc[2, "r_e6"] > 500_000


def test_user_burstiness_ratio_terms():
    """A steady user (1 event/hour) has fano_num 0; a bursty user (all
    events in one hour plus singletons) has a large positive ratio."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import user_burstiness

    H = 3_600_000_000
    rows = []
    for h in range(4):                      # user 1: steady, c = [1,1,1,1]
        rows.append((1, h * H))
    rows += [(2, 0)] * 9 + [(2, H)]         # user 2: c = [9, 1]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us"))})
    out = (user_burstiness(rd.from_arrow(t), num_buckets=4).to_pandas()
           .set_index("user_id").sort_index())
    # u1: m=4, S=4, Q=4  -> num = 16-16 = 0, den = 16
    assert out.loc[1, "n_active_hours"] == 4
    assert out.loc[1, "fano_num"] == 0 and out.loc[1, "fano_den"] == 16
    # u2: m=2, S=10, Q=82 -> num = 164-100 = 64, den = 20 (fano 3.2)
    assert out.loc[2, "fano_num"] == 64 and out.loc[2, "fano_den"] == 20


def test_hourly_profile_dow_formula():
    """1970-01-01 (epoch day 0) is a Thursday -> dow 3 with 0=Monday;
    distinct-user counting collapses repeat events."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import hourly_profile

    H = 3_600_000_000
    D = 24 * H
    rows = [(1, 5 * H), (1, 5 * H + 1), (2, 5 * H),   # day 0 (Thu) hod 5
            (1, D + 6 * H)]                           # day 1 (Fri) hod 6
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us"))})
    out = (hourly_profile(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index(["dow", "hod"]).sort_index())
    assert out.loc[(3, 5), "n_events"] == 3 and out.loc[(3, 5), "n_users"] == 2
    assert out.loc[(4, 6), "n_events"] == 1 and out.loc[(4, 6), "n_users"] == 1


def test_context_overflow_first_turn():
    """Budget 10: a conv crossing at turn 2, one never crossing (NULL),
    and a cross exactly AT the boundary (> budget, not >=)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import context_overflow

    rows = [("a", 0, "12345"), ("a", 1, "1234"), ("a", 2, "123"),  # cum 5,9,12
            ("b", 0, "12"),                                        # cum 2
            ("c", 0, "1234567890")]                                # cum 10 == budget
    t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                  "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                  "text": pa.array([r[2] for r in rows])})
    out = (context_overflow(rd.from_arrow(t), budget=10, num_buckets=2)
           .to_pandas().set_index("conv_id").sort_index())
    assert out.loc["a", "overflow_turn"] == 2 and out.loc["a", "total_chars"] == 12
    assert pd.isna(out.loc["b", "overflow_turn"])
    assert pd.isna(out.loc["c", "overflow_turn"])  # exactly at budget: no overflow


def test_coverage_gaps_runs():
    """Type A present hours {0,1,5}, type B all of {0..5}: A has 3 empty
    hours with max run 3 (hours 2-4), B has none."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import coverage_gaps

    H = 3_600_000_000
    rows = [("A", 0), ("A", 1), ("A", 5)] + [("B", h) for h in range(6)]
    t = pa.table({"event_type": pa.array([r[0] for r in rows]),
                  "ts": pa.array([r[1] * H for r in rows],
                                 pa.int64()).cast(pa.timestamp("us"))})
    out = (coverage_gaps(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("event_type").sort_index())
    assert out.loc["A", "n_empty_hours"] == 3 and out.loc["A", "max_gap_hours"] == 3
    assert out.loc["B", "n_empty_hours"] == 0 and out.loc["B", "max_gap_hours"] == 0


def test_rate_limit_audit_window_semantics():
    """Closed-interval [t-W, t] counting with equal-timestamp peers: the
    burst of 3 within 10 min dominates; an event exactly W after another
    still counts it (boundary inclusive)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import rate_limit_audit

    M = 60_000_000
    rows = [(1, 0), (1, 5 * M), (1, 9 * M),      # 3 inside 10 min
            (1, 60 * M),
            (2, 0), (2, 10 * M),                 # exactly W apart: both count
            (3, 7 * M), (3, 7 * M)]              # equal-ts peers
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us"))})
    out = (rate_limit_audit(rd.from_arrow(t), num_buckets=4).to_pandas()
           .set_index("user_id")["max_in_window"].sort_index())
    assert out.to_dict() == {1: 3, 2: 2, 3: 2}


def test_latency_trend_exact_slope():
    """y = 100 + 7x plus one outlier: slope matches the big-int closed
    form; a single-day tool yields NULL slope."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import latency_trend

    D = 86_400_000_000
    xs = [0, 1, 2, 3, 4, 4]
    ys = [100, 107, 114, 121, 128, 200]
    rows = [("grep", x, y) for x, y in zip(xs, ys)] + [("ls", 2, 50), ("ls", 2, 60)]
    t = pa.table({"tool_name": pa.array([r[0] for r in rows]),
                  "ts": pa.array([r[1] * D for r in rows],
                                 pa.int64()).cast(pa.timestamp("us")),
                  "duration_ms": pa.array([r[2] for r in rows], pa.int64())})
    out = (latency_trend(rd.from_arrow(t), 0, num_buckets=2).to_pandas()
           .set_index("tool_name"))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    v = 1_000_000 * (n * sxy - sx * sy)
    den = n * sxx - sx * sx
    want = -((-v) // den) if v < 0 else v // den
    assert out.loc["grep", "slope_e6"] == want and want > 7_000_000
    assert pd.isna(out.loc["ls", "slope_e6"]) and out.loc["ls", "n_calls"] == 2


def test_event_transitions_session_break():
    """Pairs crossing the 30-min gap are dropped; probabilities are exact
    integer ratios of the from-type total."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import event_transitions

    M = 60_000_000
    rows = [(1, 0, "a", 0), (1, 5 * M, "b", 1), (1, 10 * M, "a", 2),
            (1, 60 * M, "c", 3),                 # 50-min gap: a->c dropped
            (2, 0, "a", 4), (2, 5 * M, "b", 5)]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us")),
                  "event_type": pa.array([r[2] for r in rows]),
                  "event_id": pa.array([r[3] for r in rows], pa.int64())})
    out = (event_transitions(rd.from_arrow(t), num_buckets=4).to_pandas()
           .set_index(["from_type", "to_type"]).sort_index())
    # from 'a': a->b twice, a->c dropped by the gap -> p exactly 1
    assert out.loc[("a", "b"), "n"] == 2 and out.loc[("a", "b"), "p_e6"] == 1_000_000
    # from 'b': the single b->a transition
    assert out.loc[("b", "a"), "n"] == 1 and out.loc[("b", "a"), "p_e6"] == 1_000_000
    assert ("a", "c") not in out.index


def test_stickiness_daily_window():
    """Two users: u1 active days 0 and 3, u2 active day 0 only. WAU(d) =
    users active in [d-6, d]; stickiness = dau/wau exactly."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import stickiness_daily

    D = 86_400_000_000
    rows = [(1, 0), (1, 3), (2, 0)]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] * D for r in rows],
                                 pa.int64()).cast(pa.timestamp("us"))})
    out = (stickiness_daily(rd.from_arrow(t), 0, 3, num_buckets=2)
           .to_pandas().set_index("day").sort_index())
    # day 0: dau 2, wau 2; day 1-2: dau 0, wau 2; day 3: dau 1, wau 2
    assert out.loc[0, "dau"] == 2 and out.loc[0, "wau"] == 2
    assert out.loc[0, "stickiness_e6"] == 1_000_000
    assert out.loc[1, "dau"] == 0 and out.loc[1, "wau"] == 2
    assert out.loc[3, "dau"] == 1 and out.loc[3, "wau"] == 2
    assert out.loc[3, "stickiness_e6"] == 500_000
    assert 4 not in out.index  # clipped at day_hi


def test_attribution_first_touch_sessions():
    """Purchase in a click-entered session credits 'click'; a purchase
    opening its own session credits 'purchase'."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import attribution_first_touch

    M = 60_000_000
    rows = [(1, 0, "click", 0), (1, 5 * M, "view", 1), (1, 9 * M, "purchase", 2),
            (1, 120 * M, "purchase", 3),        # new session, self-entered
            (2, 0, "view", 4), (2, 3 * M, "purchase", 5),
            (2, 6 * M, "purchase", 6)]          # two purchases, one session
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us")),
                  "event_type": pa.array([r[2] for r in rows]),
                  "event_id": pa.array([r[3] for r in rows], pa.int64())})
    out = (attribution_first_touch(rd.from_arrow(t), num_buckets=4)
           .to_pandas().set_index("first_type")["n_targets"].sort_index())
    assert out.to_dict() == {"click": 1, "purchase": 1, "view": 2}


def test_gap_histogram_bins():
    """Gaps of 0ms, 1ms, 5ms, and a cross-user boundary that must NOT
    produce a gap; bin = bit_length(ms)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import gap_histogram

    rows = [(1, 0, 0), (1, 0, 1), (1, 1000, 2), (1, 6000, 3),  # gaps 0,1,5 ms
            (2, 9_999_000, 4)]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us")),
                  "event_id": pa.array([r[2] for r in rows], pa.int64())})
    out = (gap_histogram(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("gap_bucket").sort_index())
    assert out.loc[0, "n"] == 1 and out.loc[0, "sum_gap_ms"] == 0
    assert out.loc[1, "n"] == 1 and out.loc[1, "sum_gap_ms"] == 1
    assert out.loc[3, "n"] == 1 and out.loc[3, "sum_gap_ms"] == 5
    assert out["n"].sum() == 3


def test_retention_audit_cutoff():
    """Strict cutoff: rows older than now - 7d expire, the boundary row
    (exactly 7d old) is kept."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import retention_audit

    D = 86_400_000_000
    now = 30 * D
    rows = [("a", now - 8 * D), ("a", now - 7 * D), ("a", now),
            ("b", now - 30 * D)]
    t = pa.table({"event_type": pa.array([r[0] for r in rows]),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us"))})
    out = (retention_audit(rd.from_arrow(t), now, num_buckets=2)
           .to_pandas().set_index("event_type").sort_index())
    assert out.loc["a", "n_expired"] == 1 and out.loc["a", "n_kept"] == 2
    assert out.loc["a", "oldest_day"] == 22 and out.loc["a", "newest_day"] == 30
    assert out.loc["b", "n_expired"] == 1 and out.loc["b", "n_kept"] == 0


def test_user_event_entropy_exact_terms():
    """User 10: 2 clicks + 1 view + 1 error (n=4) -> entropy terms
    2*floor(ln(2)*1e6) + 2*floor(ln(4)*1e6); user 20: single type -> 0."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import user_event_entropy

    rows = [(10, "click"), (10, "click"), (10, "view"), (10, "error"),
            (20, "view"), (20, "view")]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "event_type": pa.array([r[1] for r in rows])})
    out = (user_event_entropy(rd.from_arrow(t).repartition(2), num_buckets=2)
           .to_pandas().set_index("user_id").sort_index())
    want10 = (2 * math.floor(math.log(4 / 2) * 1e6)
              + 2 * math.floor(math.log(4 / 1) * 1e6))
    assert out.loc[10, "n_events"] == 4 and out.loc[10, "n_types"] == 3
    assert out.loc[10, "ent_unat"] == want10
    assert out.loc[20, "n_events"] == 2 and out.loc[20, "n_types"] == 1
    assert out.loc[20, "ent_unat"] == 0


def test_volume_trend_exact_slope():
    """Type 'a' counts 1,2,3 over hours 0,1,2 -> slope exactly 1e6;
    type 'b' lives in a single hour -> NULL slope (den=0)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import volume_trend

    H = 3_600_000_000
    ts = [0] + [H] * 2 + [2 * H] * 3 + [5 * H] * 4
    ty = ["a"] * 6 + ["b"] * 4
    t = pa.table({"event_type": pa.array(ty),
                  "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    out = (volume_trend(rd.from_arrow(t), 0, num_buckets=2).to_pandas()
           .set_index("event_type").sort_index())
    assert out.loc["a", "n_hours"] == 3 and out.loc["a", "n_events"] == 6
    assert out.loc["a", "slope_e6"] == 1_000_000
    import pandas as pd
    assert out.loc["b", "n_hours"] == 1
    assert pd.isna(out.loc["b", "slope_e6"])


def test_anomaly_hours_spike():
    """9 quiet hours at 1 event + one 20-event spike: only the spike
    crosses z^2 > 4; zsq_e6 is the exact floor of the identity."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import anomaly_hours

    H = 3_600_000_000
    ts = [i * H for i in range(9)] + [9 * H] * 20
    t = pa.table({"event_type": pa.array(["e"] * len(ts)),
                  "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    out = (anomaly_hours(rd.from_arrow(t), 0, num_buckets=2)
           .to_pandas())
    assert len(out) == 1
    assert out.loc[0, "hour_idx"] == 9 and out.loc[0, "n"] == 20
    hh, s, ss = 10, 29, 9 + 400
    num = (hh * 20 - s) ** 2 * 1_000_000
    den = hh * ss - s * s
    assert out.loc[0, "zsq_e6"] == num // den


def test_props_stats_extraction():
    """props.k extracted via the shared RE2 pattern; malformed rows drop."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import props_stats

    t = pa.table({"event_type": pa.array(["a", "a", "a", "b"]),
                  "props": pa.array(['{"k": 3}', '{"k": 7}', '{}',
                                     '{"k": 10}'])})
    out = (props_stats(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("event_type").sort_index())
    assert out.loc["a", "n_with_k"] == 2 and out.loc["a", "sum_k"] == 10
    assert out.loc["a", "min_k"] == 3 and out.loc["a", "max_k"] == 7
    assert out.loc["b", "n_with_k"] == 1 and out.loc["b", "sum_k"] == 10


def test_audience_overlap_jaccard():
    """Users 1,2 fire both a and b; user 3 only a: common=2, n_a=3,
    n_b=2 -> jac = 2/3."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import audience_overlap

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (1, "a")]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "event_type": pa.array([r[1] for r in rows])})
    out = (audience_overlap(rd.from_arrow(t).repartition(2), num_buckets=4)
           .to_pandas())
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert r["n_common"] == 2 and r["n_a"] == 3 and r["n_b"] == 2
    assert r["jac_e6"] == 666_666


def test_ship_delay_negative_floor():
    """Negative delays floor (not truncate): -1.5 days -> -2, matching
    the offset-division identity used in both engines."""
    import numpy as np

    DAY = 86_400_000_000
    OFF = 10_000
    diffs = np.array([-DAY * 3 // 2, DAY // 2, DAY * 2], np.int64)
    d = (diffs + OFF * DAY) // DAY - OFF
    assert d.tolist() == [-2, 0, 2]


def test_event_dedup_lag_window():
    """Same (user, type): events 0s, 30s, 120s -> middle suppressed
    (30s gap), third kept (90s gap from PREVIOUS, lag semantics)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import event_dedup

    S = 1_000_000
    rows = [(1, "a", 0, 1), (1, "a", 30 * S, 2), (1, "a", 120 * S, 3),
            (2, "a", 0, 4), (1, "b", 5 * S, 5)]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "event_type": pa.array([r[1] for r in rows]),
                  "ts": pa.array([r[2] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us")),
                  "event_id": pa.array([r[3] for r in rows], pa.int64())})
    out = (event_dedup(rd.from_arrow(t).repartition(2), num_buckets=4)
           .to_pandas().set_index("event_type").sort_index())
    assert out.loc["a", "n_kept"] == 3 and out.loc["a", "n_dropped"] == 1
    assert out.loc["b", "n_kept"] == 1 and out.loc["b", "n_dropped"] == 0


def test_value_psi_identical_halves_zero():
    """Identical value distributions in both halves -> every bin common,
    psi_e6 == 0; a shifted type scores > 0."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import value_psi

    H = 3_600_000_000
    rows = []
    for half, base in ((0, 0), (1, 0)):          # type s: same dist
        rows += [("s", half * 10 * H, 1.0)] * 3 + [("s", half * 10 * H, 2.0)] * 3
    for half, vals in ((0, [1.0] * 6), (1, [5.0] * 6)):  # type d: disjoint
        rows += [("d", half * 10 * H, v) for v in vals]
    t = pa.table({"event_type": pa.array([r[0] for r in rows]),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.int64()).cast(pa.timestamp("us")),
                  "value": pa.array([r[2] for r in rows])})
    mid = 5 * H
    out = (value_psi(rd.from_arrow(t), mid, num_buckets=2).to_pandas()
           .set_index("event_type").sort_index())
    assert out.loc["s", "psi_e6"] == 0 and out.loc["s", "n_bins_common"] == 2
    assert out.loc["d", "n_bins_common"] == 0
    assert out.loc["d", "n_only_first"] == 1
    assert out.loc["d", "n_only_second"] == 1
    assert out.loc["d", "psi_e6"] == 0  # no common bins -> sum empty


def test_user_lifetimes_days():
    """User 1: events on days 0, 0, 5 -> 3 events, 2 active days,
    lifetime 6."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import user_lifetimes

    D = 86_400_000_000
    t = pa.table({"user_id": pa.array([1, 1, 1, 2], pa.int64()),
                  "ts": pa.array([0, 3600_000_000, 5 * D, 2 * D],
                                 pa.int64()).cast(pa.timestamp("us"))})
    out = (user_lifetimes(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("user_id").sort_index())
    assert out.loc[1, "n_events"] == 3
    assert out.loc[1, "first_day"] == 0 and out.loc[1, "last_day"] == 5
    assert out.loc[1, "active_days"] == 2
    assert out.loc[1, "lifetime_days"] == 6
    assert out.loc[2, "lifetime_days"] == 1


def test_group_mad_exact():
    """Values 1,2,3,100 (rank convention 50*(n-1)//100 = 1 -> median 2);
    deviations 1,0,1,98 sorted 0,1,1,98 -> MAD at rank 1 = 1."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import group_mad

    t = pa.table({"tool_name": pa.array(["t"] * 4),
                  "duration_ms": pa.array([1, 2, 3, 100], pa.int64())})
    out = (group_mad(rd.from_arrow(t).repartition(2), num_buckets=2)
           .to_pandas().set_index("tool_name"))
    assert out.loc["t", "n_rows"] == 4
    assert out.loc["t", "median"] == 2
    assert out.loc["t", "mad"] == 1


def test_forecast_error_seasonal_beats_naive():
    """Perfect 24h-periodic series: seasonal SAE = 0 (mase 0); naive SAE
    counts every step change over the zero-filled grid."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import forecast_error

    H = 3_600_000_000
    ts = []
    for day in range(3):
        for h, c in ((0, 2), (1, 5)):
            ts += [(day * 24 + h) * H] * c
    t = pa.table({"event_type": pa.array(["e"] * len(ts)),
                  "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    out = forecast_error(rd.from_arrow(t), num_buckets=2).to_pandas().iloc[0]
    # grid covers hours 0..49 (n=50); pattern 2,5,0,0,...
    assert out["n_hours"] == 50
    assert out["sae_seasonal"] == 0 and out["mase_e6"] == 0
    # diffs: (3+5) day0 tail, (2+3+5) at each of 2 day boundaries, but the
    # grid stops at hour 49 so day2 contributes only 2+3 -> 8+10+5 = 23
    assert out["sae_naive"] == 23


def test_conv_idle_share_gaps():
    """Turns at 0s, 60s, 1060s: one 1000s idle gap (>300s) of a 1060s
    span; idle_e6 = floor(1000/1060 * 1e6)."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import conv_idle_share

    S = 1_000_000
    t = pa.table({"conv_id": pa.array(["c"] * 3),
                  "turn_idx": pa.array([0, 1, 2], pa.int64()),
                  "ts": pa.array([0, 60 * S, 1060 * S],
                                 pa.int64()).cast(pa.timestamp("us"))})
    out = (conv_idle_share(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("conv_id"))
    assert out.loc["c", "n_turns"] == 3
    assert out.loc["c", "span_us"] == 1060 * S
    assert out.loc["c", "idle_us_total"] == 1000 * S
    assert out.loc["c", "idle_e6"] == 1000 * S * 1_000_000 // (1060 * S)


def test_ordered_funnel_strict_order(ray_session):
    """User 1 completes a->b->c in order; user 2 has b BEFORE a (b never
    re-fires) so stops at step a; user 3 never signs up."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import ordered_funnel

    T = datetime.datetime(2024, 1, 1)
    def ts(m):
        return T + datetime.timedelta(minutes=m)
    rows = [(1, "a", ts(0)), (1, "b", ts(1)), (1, "c", ts(2)),
            (2, "b", ts(0)), (2, "a", ts(1)), (2, "c", ts(2)),
            (3, "b", ts(0)), (3, "c", ts(1))]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "event_type": pa.array([r[1] for r in rows]),
                  "ts": pa.array([r[2] for r in rows],
                                 pa.timestamp("us"))})
    out = (ordered_funnel(rd.from_arrow(t), ["a", "b", "c"],
                          num_buckets=2).to_pandas()
           .set_index("step_idx").sort_index())
    assert list(out["n_users"]) == [2, 1, 1]
    assert list(out["step"]) == ["a", "b", "c"]
    assert out.loc[0, "conv_e6"] == 1_000_000
    assert out.loc[2, "conv_e6"] == 500_000


def test_value_twap_step_integral(ray_session):
    """User 1: value 2.00 held 1000ms then 4.00 held 3000ms ->
    twap = (200*1000 + 400*3000)/4000 = 350 cents; last event open-ended
    (dropped); single-event user contributes nothing."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import value_twap

    T = datetime.datetime(2024, 1, 1)
    def ts(ms):
        return T + datetime.timedelta(milliseconds=ms)
    rows = [(0, 1, "g", 2.0, ts(0)), (1, 1, "g", 4.0, ts(1000)),
            (2, 1, "g", 9.0, ts(4000)),      # open-ended tail
            (3, 2, "g", 7.0, ts(0))]          # single event: no interval
    t = pa.table({"event_id": pa.array([r[0] for r in rows], pa.int64()),
                  "user_id": pa.array([r[1] for r in rows], pa.int64()),
                  "event_type": pa.array([r[2] for r in rows]),
                  "value": pa.array([r[3] for r in rows], pa.float64()),
                  "ts": pa.array([r[4] for r in rows], pa.timestamp("us"))})
    out = value_twap(rd.from_arrow(t), num_buckets=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_intervals"] == 2
    assert r["sum_vdt_cms"] == 200 * 1000 + 400 * 3000
    assert r["sum_dt_ms"] == 4000
    assert r["twap_cents"] == 350


def test_path_ngrams_session_breaks(ray_session):
    """Trigrams never cross a gap break or a user boundary."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import path_ngrams

    T = datetime.datetime(2024, 1, 1)
    def ts(m):
        return T + datetime.timedelta(minutes=m)
    rows = [(1, "a", ts(0)), (1, "b", ts(1)), (1, "c", ts(2)),
            (1, "d", ts(90)),                  # gap break before d
            (2, "a", ts(0)), (2, "b", ts(1))]  # too short for a trigram
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "event_type": pa.array([r[1] for r in rows]),
                  "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                  "event_id": pa.array(range(len(rows)), pa.int64())})
    out = path_ngrams(rd.from_arrow(t), n=3, gap_minutes=30.0,
                      num_buckets=2).to_pandas()
    assert dict(zip(out["path"], out["n_occurrences"])) == {"a>b>c": 1}


def test_first_response_turn_order(ray_session):
    """Assistant turn BEFORE the first user turn doesn't count; the
    latency is wall-clock between the two chosen turns."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import first_response

    T = datetime.datetime(2024, 1, 1)
    def ts(s):
        return T + datetime.timedelta(seconds=s)
    rows = [("c1", 0, "assistant", ts(0)),   # pre-user: ignored
            ("c1", 1, "user", ts(10)),
            ("c1", 2, "tool", ts(15)),
            ("c1", 3, "assistant", ts(22)),
            ("c2", 0, "user", ts(0)),        # no assistant: drops
            ("c3", 0, "assistant", ts(0))]   # no user: drops
    t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                  "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
                  "role": pa.array([r[2] for r in rows]),
                  "ts": pa.array([r[3] for r in rows], pa.timestamp("us"))})
    out = first_response(rd.from_arrow(t), num_buckets=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["conv_id"], r["user_turn"], r["assist_turn"]) == ("c1", 1, 3)
    assert r["response_us"] == 12_000_000


def test_session_durations_histogram(ray_session):
    """User 1: one 2-event session (90 s) + a singleton (0 s); user 2: a
    3-event session (120 s) -> p50 over {0, 90, 120} = 90."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import session_durations

    T = datetime.datetime(2024, 1, 1)
    def ts(s):
        return T + datetime.timedelta(seconds=s)
    rows = [(1, ts(0)), (1, ts(90)),          # session A: 90 s
            (1, ts(10_000)),                  # session B: singleton, 0 s
            (2, ts(0)), (2, ts(60)), (2, ts(120))]  # session C: 120 s
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                  "event_id": pa.array(range(len(rows)), pa.int64())})
    out = session_durations(rd.from_arrow(t), gap_minutes=30.0,
                            num_buckets=2).to_pandas()
    r = out.iloc[0]
    assert r["n_sessions"] == 3
    # nearest-rank: r_p = p*(n-1)//100 + 1 -> p95 over 3 values is rank
    # 2 (the same rule group_quantiles/ship_delay use), i.e. 90
    assert r["p50_s"] == 90 and r["p95_s"] == 90 and r["max_s"] == 120


def test_cumulative_users_growth(ray_session):
    """First-activity day decides newness; n_cum is the running total."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import cumulative_users

    T = datetime.datetime(2024, 1, 1)
    def ts(d):
        return T + datetime.timedelta(days=d)
    rows = [(1, ts(0)), (2, ts(0)), (1, ts(1)),   # day1: user 1 returns
            (3, ts(1)), (3, ts(2))]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))})
    out = (cumulative_users(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("day"))
    d0 = out.index.min()
    assert out.loc[d0, "n_new"] == 2 and out.loc[d0, "n_cum"] == 2
    assert out.loc[d0 + 1, "n_new"] == 1 and out.loc[d0 + 1, "n_cum"] == 3
    assert len(out) == 2


def test_conv_roundtrips_adjacent_only(ray_session):
    """Only ADJACENT user→assistant pairs count; tool turns in between
    break the pair; cross-conv adjacency never counts."""
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import conv_roundtrips

    rows = [("c1", 0, "user"), ("c1", 1, "assistant"),    # rt 1
            ("c1", 2, "user"), ("c1", 3, "tool"),         # broken
            ("c1", 4, "assistant"),
            ("c2", 0, "user"),                            # conv ends: 0 rt
            ("c3", 0, "assistant"), ("c3", 1, "user"),
            ("c3", 2, "assistant")]                       # rt 1
    t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                  "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
                  "role": pa.array([r[2] for r in rows])})
    out = (conv_roundtrips(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("n_roundtrips").sort_index())
    assert out.loc[0, "n_convs"] == 1          # c2
    assert out.loc[1, "n_convs"] == 2          # c1, c3


def test_tenure_mix_buckets(ray_session):
    """Tenure is measured from each user's own first day; buckets split
    at 0 / 7 / 30 days."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.queries import QUERIES  # noqa: F401  (import path check)
    from rotel_ray.stages.aggregate import two_phase_aggregate  # noqa

    import rotel_ray.queries as q

    T = datetime.datetime(2024, 1, 1)
    def ts(d):
        return T + datetime.timedelta(days=d)
    rows = [(1, "a", ts(10)), (1, "b", ts(10)),   # user 1 starts day 10
            (1, "a", ts(15)), (1, "a", ts(45)),   # +5 -> 1-7, +35 -> 30+
            (2, "b", ts(0)), (2, "b", ts(8))]     # +8 -> 8-30
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "event_type": pa.array([r[1] for r in rows]),
                  "ts": pa.array([r[2] for r in rows], pa.timestamp("us"))})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (q.QUERIES["tenure_mix"](d).to_pandas()
               .set_index(["tenure_bucket", "event_type"]).sort_index())
    assert out.loc[(0, "a"), "n_events"] == 1
    assert out.loc[(0, "b"), "n_events"] == 2   # user1 day0 b + user2 day0 b
    assert out.loc[(1, "a"), "n_events"] == 1
    assert out.loc[(2, "b"), "n_events"] == 1
    assert out.loc[(3, "a"), "n_events"] == 1


def test_user_mix_kl_typical_vs_skewed(ray_session):
    """A user matching the global mix scores ~0; a single-type user
    scores the positive ln ratio exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.window import user_mix_kl

    # global: a 6x, b 2x -> user 1 is 3a+1b (same mix), user 2 is 3a+1b,
    # user 3... build: users 1,2 mirror global; user 3 all-a
    rows = (["a"] * 3 + ["b"]) * 2 + ["a"] * 4
    users = [1] * 4 + [2] * 4 + [3] * 4
    t = pa.table({"user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(rows)})
    out = (user_mix_kl(rd.from_arrow(t), num_buckets=2).to_pandas()
           .set_index("user_id").sort_index())
    # global: a=10, b=2, N=12. user1: a 3/4 vs 10/12, b 1/4 vs 2/12
    t1 = 3 * int(np.floor(np.log((3.0 * 12) / (4.0 * 10)) * 1e6)) \
        + 1 * int(np.floor(np.log((1.0 * 12) / (4.0 * 2)) * 1e6))
    assert out.loc[1, "kl_unat"] == t1 and out.loc[2, "kl_unat"] == t1
    t3 = 4 * int(np.floor(np.log((4.0 * 12) / (4.0 * 10)) * 1e6))
    assert out.loc[3, "kl_unat"] == t3
    assert out.loc[3, "kl_unat"] > out.loc[1, "kl_unat"]
