"""Scalar-function kernel tests (no Ray needed — pure Arrow/numpy)."""

import hashlib

import pytest

import pyarrow as pa
import pyarrow.compute as pc

from rotel_ray.functions.scalar import (
    duration_ns,
    hex_decode,
    hex_encode,
    ns_to_seconds,
    severity_of,
    severity_text_of,
    span_id_from,
    trace_id_from,
    translate_unit,
    truthy_cast,
    wildcard_match,
    xray_trace_id,
)


def test_hex_roundtrip():
    raw = [bytes(range(i, i + 8)) for i in range(20)]
    arr = pa.array(raw, pa.binary(8))
    h = hex_encode(arr)
    assert h.to_pylist() == [b.hex() for b in raw]
    back = hex_decode(h, 8)
    assert back.to_pylist() == raw


def test_trace_span_ids_match_hashlib():
    keys = pa.array(["conv-1", "conv-2", "conv-1"])
    tids = hex_encode(trace_id_from(keys)).to_pylist()
    sids = hex_encode(span_id_from(keys)).to_pylist()
    for k, t, s in zip(keys.to_pylist(), tids, sids):
        assert t == hashlib.md5(k.encode()).hexdigest()
        assert s == hashlib.md5(k.encode()).hexdigest()[:16]
    assert tids[0] == tids[2]


def test_duration_and_seconds():
    start = pa.array([100, 200, 300], pa.int64())
    end = pa.array([1100, 150, 300], pa.int64())
    assert duration_ns(start, end).to_pylist() == [1000, 0, 0]  # clamped at 0
    assert ns_to_seconds(pa.array([2_500_000_000]))[0].as_py() == 2.5


def test_translate_unit_passthrough():
    arr = pa.array(["ms", "By", "weird_unit", "1"])
    assert translate_unit(arr).to_pylist() == ["Milliseconds", "Bytes", "weird_unit", "None"]


def test_wildcard_filter_exclude_wins():
    arr = pa.array(["RequestCount", "request_latency", "ErrorRate", "error_count", None])
    mask = wildcard_match(arr, include=["request*", "error*"], exclude=["*latency"])
    assert mask.to_pylist() == [True, False, True, True, False]


def test_severity_maps():
    assert severity_of(pa.array([0, 3, 4, 7])).to_pylist() == [21, 17, 13, 5]
    assert severity_text_of(pa.array([17, 9])).to_pylist() == ["ERROR", "INFO"]


def test_truthy_cast():
    arr = pa.array(["TRUE", "yes", "0", "nope", "1"])
    assert truthy_cast(arr).to_pylist() == [True, True, False, False, True]


def test_xray_trace_id_format():
    hexids = hex_encode(trace_id_from(pa.array(["a", "b"])))
    out = xray_trace_id(hexids, [1700000000, 1700000001]).to_pylist()
    for v in out:
        parts = v.split("-")
        assert parts[0] == "1" and len(parts[1]) == 8 and len(parts[2]) == 24
        assert int(parts[1], 16) >= 1700000000


def test_murmur2_golden_vectors():
    """Golden regression vectors for the murmur2 kernel (pinned from this
    implementation, which structurally mirrors Kafka Utils.murmur2: seed ^
    len init, little-endian 4-byte blocks, 3/2/1 tail fall-through, 13/15
    finalizer shifts)."""
    from rotel_ray.functions.scalar import _murmur2

    assert _murmur2(b"21") == 3321034988
    assert _murmur2(b"foobar") == 3504634814
    assert _murmur2(b"a-little-bit-long-string") == 3308985760
    assert _murmur2(b"") == 275646681


def test_partition_for_strategies():
    from rotel_ray.functions.scalar import partition_for

    arr = pa.array([f"key-{i}" for i in range(100)] + ["key-0", None])
    for strategy in ("murmur2", "fnv1a", "consistent"):
        parts = partition_for(arr, 12, strategy=strategy).to_pylist()
        assert all(0 <= p < 12 for p in parts)
        assert parts[0] == parts[100]  # same key -> same partition
        assert len(set(parts)) > 4  # keys actually spread
    with pytest.raises(ValueError, match="unknown partitioner"):
        partition_for(arr, 4, strategy="nope")
