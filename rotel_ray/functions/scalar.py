"""Scalar function library — the reference's §2.10 kernel set, vectorized.

Every function operates on whole Arrow arrays (numpy / pyarrow.compute); no
per-row Python in any hot path.

| function | reference |
|---|---|
| hex_encode / hex_decode        | clickhouse/transformer.rs:218-235, file/parquet/log.rs:185-186 |
| span_id_from / trace_id_from   | id derivation for the traces sink (hex ids at every sink) |
| ns_to_seconds / duration_ns    | xray/transformer.rs:191-193, clickhouse/transform_traces.rs:96-100 |
| translate_unit                 | awsemf/transformer.rs:732-744 |
| wildcard_match / compile_...   | awsemf/dim_filter.rs:28-60 (case-insensitive, `*` = 0+ chars) |
| severity_text_of / severity_of | kmsg/parser.rs:94-166 |
| truthy_cast                    | attributes_processor.py:240-272 |
| xray_trace_id                  | xray/transformer.rs:177-190 (`1-{8hex epoch}-{24hex}`) |
"""

from __future__ import annotations

import fnmatch
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# hex
# ---------------------------------------------------------------------------

_HEX_CHARS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def hex_encode(arr: pa.Array) -> pa.Array:
    """Fixed-size binary -> lowercase hex string, fully vectorized: the byte
    matrix is split into nibbles and mapped through a 16-char LUT."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_fixed_size_binary(arr.type):
        raise TypeError("hex_encode expects fixed_size_binary")
    w = arr.type.byte_width
    buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    off = arr.offset * w
    m = buf[off : off + len(arr) * w].reshape(len(arr), w)
    out = np.empty((len(arr), w, 2), dtype=np.uint8)
    out[:, :, 0] = _HEX_CHARS[m >> 4]
    out[:, :, 1] = _HEX_CHARS[m & 0xF]
    flat = out.reshape(len(arr), 2 * w).view(f"S{2 * w}").ravel()
    return pa.array(flat.astype(str))


def hex_decode(arr: pa.Array, byte_width: int) -> pa.Array:
    """Hex string -> fixed-size binary (inverse of hex_encode). Case-tolerant
    like the reference's hex handling; raises on non-hex input instead of
    silently decoding garbage."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = arr.to_numpy(zero_copy_only=False).astype(f"S{2 * byte_width}")
    chars = s.view(np.uint8).reshape(len(arr), 2 * byte_width)
    nib = np.where(
        chars >= ord("a"), chars - ord("a") + 10,
        np.where(chars >= ord("A"), chars - ord("A") + 10, chars - ord("0")),
    ).astype(np.uint8)
    valid = (((chars >= 48) & (chars <= 57)) | ((chars >= 65) & (chars <= 70))
             | ((chars >= 97) & (chars <= 102)))
    if len(arr) and not valid.all():
        raise ValueError("hex_decode: input contains non-hex characters "
                         "(or strings shorter than 2*byte_width)")
    raw = ((nib[:, 0::2] << 4) | nib[:, 1::2]).astype(np.uint8)
    # build from the raw buffer — a numpy "S" view would strip trailing NULs
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(byte_width), len(arr), [None, pa.py_buffer(raw.tobytes())]
    )


def _md5_bytes(arr: pa.Array, width: int) -> pa.Array:
    """First `width` bytes of md5 per distinct value (dictionary-encoded)."""
    import hashlib

    d = pc.dictionary_encode(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
    uniq = [
        None if v is None else hashlib.md5(str(v).encode()).digest()[:width]
        for v in d.dictionary.to_pylist()
    ]
    out = pa.DictionaryArray.from_arrays(d.indices, pa.array(uniq, pa.binary(width)))
    return pc.cast(out, pa.binary(width))


def trace_id_from(arr: pa.Array) -> pa.Array:
    """Deterministic 16-byte trace id from a key column (md5 prefix)."""
    return _md5_bytes(arr, 16)


def span_id_from(arr: pa.Array) -> pa.Array:
    """Deterministic 8-byte span id from a key column (md5 prefix)."""
    return _md5_bytes(arr, 8)


# ---------------------------------------------------------------------------
# time / duration
# ---------------------------------------------------------------------------


def be_u64(arr: pa.Array, offset: int = 0) -> pa.Array:
    """Big-endian uint64 read at ``offset`` of each fixed-size-binary value —
    the Datadog id truncation (datadog/transform/transformer.rs:455-469:
    convert_trace_id takes the LAST 8 bytes of a 16-byte id, convert_span_id
    the full 8). Vectorized view over the value buffer."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_fixed_size_binary(arr.type):
        raise TypeError("be_u64 expects fixed_size_binary")
    w = arr.type.byte_width
    buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    off = arr.offset * w
    m = buf[off : off + len(arr) * w].reshape(len(arr), w)
    vals = np.ascontiguousarray(m[:, offset : offset + 8]).view(">u8").ravel()
    return pa.array(vals.astype(np.uint64), pa.uint64())


def ns_to_seconds(arr) -> pa.Array:
    """u64 ns -> float seconds (xray/transformer.rs:191-193)."""
    return pc.divide(pc.cast(arr, pa.float64()), 1e9)


def duration_ns(start, end) -> pa.Array:
    """max(end - start, 0) (clickhouse/transform_traces.rs:96-100)."""
    return pc.max_element_wise(pc.subtract(pc.cast(end, pa.int64()), pc.cast(start, pa.int64())), 0)


def xray_trace_id(trace_id_hex: pa.Array, epoch_s) -> pa.Array:
    """`1-{8-hex epoch}-{24 hex}` (xray/transformer.rs:177-190)."""
    n = len(trace_id_hex)
    epoch_hex = pa.array([format(int(e), "08x") for e in
                          (epoch_s.to_pylist() if hasattr(epoch_s, "to_pylist") else epoch_s)])
    tail = pc.utf8_slice_codeunits(trace_id_hex, 0, 24)
    one = pa.nulls(n, pa.string()).fill_null("1")
    return pc.binary_join_element_wise(one, epoch_hex, tail, "-")


# ---------------------------------------------------------------------------
# unit translation (awsemf/transformer.rs:732-744)
# ---------------------------------------------------------------------------

_UNIT_MAP = {
    "ms": "Milliseconds", "s": "Seconds", "us": "Microseconds", "ns": "Nanoseconds",
    "By": "Bytes", "bit": "Bits", "Count": "Count", "count": "Count",
    "1": "None", "": "None", "percent": "Percent", "%": "Percent",
}
_UNIT_KEYS = pa.array(list(_UNIT_MAP.keys()))
_UNIT_VALS = pa.array(list(_UNIT_MAP.values()))


def translate_unit(arr: pa.Array) -> pa.Array:
    """OTel unit -> CloudWatch unit; unknown units pass through unchanged."""
    mapped = pc.take(_UNIT_VALS, pc.index_in(arr, _UNIT_KEYS))
    return pc.coalesce(mapped, arr)


# ---------------------------------------------------------------------------
# wildcard dimension filter (awsemf/dim_filter.rs:4-60)
# ---------------------------------------------------------------------------


def compile_wildcards(patterns: list[str]) -> re.Pattern:
    """Case-insensitive fnmatch set -> one alternation regex."""
    if not patterns:
        return re.compile(r"(?!)")  # matches nothing
    return re.compile("|".join(fnmatch.translate(p.lower()) for p in patterns))


def wildcard_match(arr: pa.Array, include: list[str] | None = None,
                   exclude: list[str] | None = None) -> pa.Array:
    """Boolean mask: include (default `*`) minus exclude (exclude wins),
    case-insensitive — the dimension-filter contract. Vectorized via
    dictionary encoding (one regex test per distinct value)."""
    inc = compile_wildcards(include if include is not None else ["*"])
    exc = compile_wildcards(exclude or [])
    d = pc.dictionary_encode(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
    uniq = d.dictionary.to_pylist()
    keep = pa.array(
        [False if v is None else bool(inc.fullmatch(v.lower())) and not exc.fullmatch(v.lower())
         for v in uniq],
        pa.bool_(),
    )
    return pc.fill_null(pc.cast(pa.DictionaryArray.from_arrays(d.indices, keep), pa.bool_()), False)


# ---------------------------------------------------------------------------
# Kafka partitioner hash variants (kafka/config.rs:119-130, exporter.rs:120-470)
# ---------------------------------------------------------------------------


def murmur2_hash(arr: pa.Array) -> np.ndarray:
    """Kafka's murmur2 (seed 0x9747b28c) over string keys — the `murmur2`
    partitioner variant. Computed once per distinct value via dictionary
    encoding; returns uint32 per row."""
    d = pc.dictionary_encode(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
    uniq = np.fromiter(
        (0 if v is None else _murmur2(v.encode()) for v in d.dictionary.to_pylist()),
        dtype=np.uint32, count=len(d.dictionary),
    )
    if len(d) == 0 or len(uniq) == 0:
        return np.zeros(len(d), np.uint32)
    idx = d.indices.fill_null(0).to_numpy(zero_copy_only=False)
    return uniq[idx]


def _murmur2(data: bytes) -> int:
    # Kafka DefaultPartitioner's murmur2 (org.apache.kafka.common.utils.Utils)
    m = 0x5BD1E995
    seed = 0x9747B28C
    h = (seed ^ len(data)) & 0xFFFFFFFF
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = ((h * m) & 0xFFFFFFFF) ^ k
    rem = len(data) & 3
    if rem:
        tail = data[n:]
        if rem >= 3:
            h ^= tail[2] << 16
        if rem >= 2:
            h ^= tail[1] << 8
        h ^= tail[0]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def fnv1a_hash(arr: pa.Array) -> np.ndarray:
    """32-bit FNV-1a over string keys — the `fnv1a` partitioner variant."""
    d = pc.dictionary_encode(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)

    def f(data: bytes) -> int:
        h = 0x811C9DC5
        for b in data:
            h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
        return h

    uniq = np.fromiter(
        (0 if v is None else f(v.encode()) for v in d.dictionary.to_pylist()),
        dtype=np.uint32, count=len(d.dictionary),
    )
    if len(d) == 0 or len(uniq) == 0:
        return np.zeros(len(d), np.uint32)
    idx = d.indices.fill_null(0).to_numpy(zero_copy_only=False)
    return uniq[idx]


def partition_for(arr: pa.Array, num_partitions: int, *, strategy: str = "murmur2") -> pa.Array:
    """key -> partition id, mirroring the reference's partitioner strategies
    (`consistent` = crc32-style stable hash, `murmur2`, `fnv1a`;
    kafka/config.rs:119-130). The `*-random` variants fall back to a hash of
    the row position — deterministic here (batch jobs need reproducibility),
    which the reference only approximates with thread-local RNG."""
    if strategy in ("murmur2", "consistent-murmur2"):
        h = murmur2_hash(arr) & 0x7FFFFFFF
    elif strategy in ("fnv1a", "consistent-fnv1a"):
        h = fnv1a_hash(arr) & 0x7FFFFFFF
    elif strategy == "consistent":
        import zlib

        d = pc.dictionary_encode(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
        uniq = np.fromiter(
            (0 if v is None else zlib.crc32(v.encode()) for v in d.dictionary.to_pylist()),
            dtype=np.uint32, count=len(d.dictionary),
        )
        if len(d) == 0 or len(uniq) == 0:
            h = np.zeros(len(d), np.uint32)
        else:
            h = uniq[d.indices.fill_null(0).to_numpy(zero_copy_only=False)]
        h = h & 0x7FFFFFFF
    else:
        raise ValueError(f"unknown partitioner strategy {strategy!r}")
    return pa.array((h % num_partitions).astype(np.int32))


# ---------------------------------------------------------------------------
# severity maps (kmsg/parser.rs:94-166)
# ---------------------------------------------------------------------------

_SEV_NUMS = pa.array([5, 9, 10, 13, 17, 21], type=pa.int32())
_SEV_TEXTS = pa.array(["DEBUG", "INFO", "INFO2", "WARN", "ERROR", "FATAL"])
_PRIO_TO_SEV = pa.array([21, 21, 21, 17, 13, 10, 9, 5], type=pa.int32())


def severity_of(priority: pa.Array) -> pa.Array:
    """syslog priority (0-7) -> OTLP severity number."""
    return pc.take(_PRIO_TO_SEV, pc.cast(priority, pa.int32()))


def severity_text_of(severity_number: pa.Array) -> pa.Array:
    return pc.take(_SEV_TEXTS, pc.index_in(pc.cast(severity_number, pa.int32()), _SEV_NUMS))


# ---------------------------------------------------------------------------
# truthy cast (attributes_processor.py:240-272)
# ---------------------------------------------------------------------------

_TRUTHY = pa.array(sorted({"true", "1", "t", "y", "yes"}))


def truthy_cast(arr: pa.Array) -> pa.Array:
    """String -> bool with truthy-string semantics."""
    return pc.is_in(pc.utf8_lower(arr), value_set=_TRUTHY)
