"""ClickHouse metric row-shape kernels: bucket boundaries, exact power-of-2
exponent indexing, zero handling, single-element quantiles."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _parsed_like(rows):
    n = len(rows)
    cols = {
        "conv_id": pa.array([r.get("conv_id", "c0") for r in rows]),
        "role": pa.array([r.get("role", "user") for r in rows]),
        "event_type": pa.array([r["event_type"] for r in rows]),
        "ts": pa.array([np.datetime64("2026-01-01T00:00:00", "us")] * n,
                       pa.timestamp("us")),
        "remote_addr": pa.array([r.get("remote_addr") for r in rows], pa.string()),
        "tool_name": pa.array([r.get("tool_name") for r in rows], pa.string()),
        "duration_ms": pa.array([r.get("duration_ms") for r in rows], pa.int64()),
        "body_bytes_sent": pa.array([r.get("bytes") for r in rows], pa.int64()),
        "status": pa.array([r.get("status") for r in rows], pa.int32()),
    }
    return rd.from_arrow(pa.table(cols))


def test_histogram_bucket_boundaries_inclusive():
    from rotel_ray.stages.ch_metrics import histogram_rows

    # bounds [10,100,1000] upper-inclusive: 10 -> b0, 11 -> b1, 1000 -> b2,
    # 1001 -> overflow
    ds = _parsed_like([
        {"event_type": "tool_call", "duration_ms": d}
        for d in [1, 10, 11, 100, 101, 1000, 1001]
    ])
    out = histogram_rows(ds).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.bucket_counts == "[2,2,2,1]"
    assert r.explicit_bounds == "[10,100,1000]"
    assert r["count"] == 7 and r["min"] == 1.0 and r["max"] == 1001.0


def test_exp_histogram_power_of_two_and_zero():
    from rotel_ray.stages.ch_metrics import exp_histogram_rows

    # idx = floor(log2(v)): 1->0, 2->1, 3->1, 8->3; zeros -> zero_count;
    # gap buckets between offset and max stay zero
    ds = _parsed_like([
        {"event_type": "nginx_access", "bytes": b} for b in [0, 1, 2, 3, 8]
    ])
    out = exp_histogram_rows(ds).to_pandas()
    r = out.iloc[0]
    assert r.zero_count == 1
    assert r.positive_offset == 0
    assert r.positive_bucket_counts == "[1,2,0,1]"
    assert r.negative_bucket_counts == "[]"


def test_exp_histogram_all_zero_conv():
    from rotel_ray.stages.ch_metrics import exp_histogram_rows

    ds = _parsed_like([{"event_type": "nginx_access", "bytes": 0}])
    r = exp_histogram_rows(ds).to_pandas().iloc[0]
    assert r.zero_count == 1 and r.positive_offset == 0
    assert r.positive_bucket_counts == "[]"


def test_summary_quantiles_inverted_cdf():
    from rotel_ray.stages.ch_metrics import summary_rows

    # two convs: 4 values and a singleton; quantile_disc = sorted[ceil(qn)-1]
    ds = _parsed_like(
        [{"event_type": "nginx_access", "conv_id": "a", "status": s}
         for s in [500, 200, 301, 404]]
        + [{"event_type": "nginx_access", "conv_id": "b", "status": 418}]
    )
    out = summary_rows(ds).to_pandas()
    a = out[out.attributes == '{"conv_id":"a"}'].iloc[0]
    b = out[out.attributes == '{"conv_id":"b"}'].iloc[0]
    # a sorted: 200,301,404,500 -> q0.5 idx ceil(2)-1=1 -> 301; q0.95 idx
    # ceil(3.8)-1=3 -> 500
    assert a.value_at_quantiles_value == "[301,500]"
    assert b.value_at_quantiles_value == "[418,418]"
    assert a["sum"] == 1405.0 and a["count"] == 4


def test_gauge_sum_rowwise_projection():
    from rotel_ray.stages.ch_metrics import gauge_rows, sum_rows

    ds = _parsed_like([
        {"event_type": "nginx_access", "remote_addr": "1.2.3.4", "bytes": 7},
        {"event_type": "tool_call", "tool_name": "bash", "duration_ms": 42},
        {"event_type": "chat"},
    ])
    g = gauge_rows(ds).to_pandas()
    s = sum_rows(ds).to_pandas()
    assert len(g) == 1 and g.iloc[0].value == 7.0
    assert g.iloc[0].attributes == '{"remote_addr":"1.2.3.4"}'
    assert len(s) == 1 and s.iloc[0].value == 42.0
    assert bool(s.iloc[0].is_monotonic) and s.iloc[0].aggregation_temporality == 2
