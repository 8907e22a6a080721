"""Fluentd forward-protocol source — the fluent receiver analogue.

The reference's fluent receiver decodes msgpack messages from unix/TCP
sockets into LogRecords with a ``fluent.tag`` attribute
(src/receivers/fluent/receiver.rs:121-152). The accepted message shapes
(message.rs:8-18) are::

    Message(tag, ts, record)                  # single event
    MessageWithOptions(tag, ts, record, opts)
    Forward(tag, [[ts, record], ...])         # batched events
    ForwardWithOption(tag, entries, opts)

with ``ts`` either unix seconds or the EventTime msgpack ext (type 0,
8 bytes: big-endian u32 seconds + u32 nanos — message.rs:63-103).

Batch restatement: forward streams land as files; ``read_forward_msgpack``
reads them as binary blobs and unpacks the real wire format with
``msgpack.Unpacker`` inside ``map_batches`` (per-event decode is inherent to
the codec, exactly like the reference's per-message rmpv deserialize).
``read_forward_files`` keeps the JSON encoding of the same structure
(fluentd's out_file format) for text-file pipelines. Both decoders emit the
identical (tag, ts, record) row contract.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray.data as rd

import msgpack

HAVE_MSGPACK = True  # baked into this environment; kept for API compat


# ---------------------------------------------------------------------------
# shared row emit
# ---------------------------------------------------------------------------


def _rows_table(tags, ts_ns, recs) -> pa.Table:
    return pa.table(
        {
            "tag": pa.array(tags, pa.string()),
            "ts": pa.array(pa.array(ts_ns, pa.int64()).cast(pa.timestamp("ns"))),
            "record": pa.array(recs, pa.string()),
        }
    )


def _ts_to_ns(ts) -> int | None:
    """Unix seconds (int/float) or EventTime ext(0, 8B be sec+nanos) -> ns."""
    if isinstance(ts, msgpack.ExtType):
        if ts.code != 0 or len(ts.data) != 8:
            return None  # wrong ext type/length is a protocol error; drop
        sec = int.from_bytes(ts.data[:4], "big")
        nanos = int.from_bytes(ts.data[4:], "big")
        return sec * 1_000_000_000 + nanos
    if isinstance(ts, bool) or not isinstance(ts, (int, float)):
        return None
    return int(ts * 1_000_000_000) if isinstance(ts, float) else int(ts) * 1_000_000_000


def _emit_message(msg, tags, tss, recs) -> None:
    """One decoded msgpack value -> entry rows (message.rs Message/Forward
    variants; unknown shapes contribute 0 rows, like Message::Unknown)."""
    if not isinstance(msg, (list, tuple)) or not (2 <= len(msg) <= 4):
        return
    tag = msg[0]
    if isinstance(tag, bytes):
        tag = tag.decode("utf-8", "replace")
    if not isinstance(tag, str):
        return
    second = msg[1]
    # NB: msgpack.ExtType is a NamedTuple (i.e. a tuple) — test it FIRST or
    # an EventTime-stamped Message would be misparsed as a Forward batch
    if isinstance(second, (list, tuple)) and not isinstance(second, msgpack.ExtType):
        entries = second  # Forward / ForwardWithOption
    elif len(msg) >= 3:  # Message / MessageWithOptions
        entries = [(second, msg[2])]
    else:
        return
    for ent in entries:
        if not isinstance(ent, (list, tuple)) or len(ent) != 2:
            continue
        ns = _ts_to_ns(ent[0])
        record = ent[1]
        if ns is None or not isinstance(record, dict):
            continue
        record = {
            (k.decode("utf-8", "replace") if isinstance(k, bytes) else str(k)):
            (v.decode("utf-8", "replace") if isinstance(v, bytes) else v)
            for k, v in record.items()
        }
        tags.append(tag)
        tss.append(ns)
        recs.append(json.dumps(record, sort_keys=True))


# ---------------------------------------------------------------------------
# msgpack wire variant (the real forward protocol)
# ---------------------------------------------------------------------------


def decode_forward_msgpack(t: pa.Table, bytes_col: str = "bytes") -> pa.Table:
    """Concatenated msgpack messages -> one row per entry."""
    tags, tss, recs = [], [], []
    for blob in t.column(bytes_col).to_pylist():
        if not blob:
            continue
        unpacker = msgpack.Unpacker(raw=True, strict_map_key=False)
        unpacker.feed(blob)
        for msg in unpacker:
            _emit_message(msg, tags, tss, recs)
    return _rows_table(tags, tss, recs)


def read_forward_msgpack(paths) -> "rd.Dataset":
    """Binary forward-stream files -> per-entry rows (real wire format)."""
    ds = rd.read_binary_files(paths)
    return ds.map_batches(decode_forward_msgpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# JSON encoding of the same structure (fluentd out_file format)
# ---------------------------------------------------------------------------


def decode_forward_lines(t: pa.Table) -> pa.Table:
    """JSON forward events -> one row per entry: (tag, ts, record_json)."""
    tags, tss, recs = [], [], []
    for line in t.column("text").to_pylist():
        if not line:
            continue
        try:
            evt = json.loads(line)
        except json.JSONDecodeError:
            continue  # lenient: skip undecodable events (receiver drops them)
        if not isinstance(evt, list) or len(evt) != 2:
            continue
        tag, entries = evt
        for ent in entries:
            if not isinstance(ent, list) or len(ent) != 2:
                continue
            ts, record = ent
            tags.append(str(tag))
            tss.append(int(ts) * 1_000_000_000)
            recs.append(json.dumps(record, sort_keys=True))
    return _rows_table(tags, tss, recs)


def read_forward_files(paths) -> "rd.Dataset":
    """read_text -> per-entry rows. ``fluent.tag`` travels as the `tag`
    column (the reference appends it as a log attribute)."""
    ds = rd.read_text(paths)
    return ds.map_batches(decode_forward_lines, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def write_forward_fixture(path: str, events: list[tuple[str, list[tuple[int, dict]]]]) -> str:
    """Deterministic JSON forward-format fixture writer (tests)."""
    with open(path, "w") as f:
        for tag, entries in events:
            f.write(json.dumps([tag, [[ts, rec] for ts, rec in entries]]) + "\n")
    return path


def write_forward_fixture_msgpack(path: str, messages: list) -> str:
    """Deterministic msgpack fixture: `messages` are already-shaped wire
    values (Message or Forward form; use msgpack.ExtType(0, ...) for
    EventTime timestamps)."""
    with open(path, "wb") as f:
        for m in messages:
            f.write(msgpack.packb(m, use_bin_type=True, datetime=False))
    return path


def ensure_fluent_fixture(transcripts_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Msgpack forward-stream fixture derived from the transcript corpus:
    one Forward message per conversation per shard, entries =
    (unix-seconds ts, {"text": ..., "turn": ...}). Deterministic, so the
    decode pipeline is DuckDB-oracle-checkable against the same parquet."""
    import pyarrow.parquet as pq

    tag_dir = os.path.basename(os.path.normpath(transcripts_dir))
    out = os.path.join(root, f"fluent_{tag_dir}")
    if os.path.isdir(out) and os.listdir(out):
        return out
    import shutil

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    for f in sorted(os.listdir(transcripts_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(transcripts_dir, f),
                          columns=["conv_id", "turn_idx", "ts", "text"])
        conv = t.column("conv_id").to_pylist()
        turn = t.column("turn_idx").to_pylist()
        ts_s = t.column("ts").cast(pa.timestamp("s")).cast(pa.int64()).to_pylist()
        text = t.column("text").to_pylist()
        by_conv: dict[str, list] = {}
        for c, ti, s, x in zip(conv, turn, ts_s, text):
            by_conv.setdefault(c, []).append([s, {"text": x, "turn": ti}])
        msgs = [[c, entries] for c, entries in sorted(by_conv.items())]
        write_forward_fixture_msgpack(os.path.join(tmp, f.replace(".parquet", ".msgpack")), msgs)
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
