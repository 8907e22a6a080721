"""Text-log file source tests: fixture determinism, truncation, round-trip
parity with the parquet path."""

import os

import pyarrow.compute as pc
import pytest

import ray.data as rd

from rotel_ray.sources.text_logs import ensure_log_files, parse_log_files, read_log_lines
from rotel_ray.stages.parse import parse_stage


@pytest.fixture(scope="module")
def log_dir(transcripts_dir):
    return ensure_log_files(transcripts_dir)


def test_log_fixture_deterministic(log_dir, transcripts_dir, tmp_path):
    alt = ensure_log_files(transcripts_dir, root=str(tmp_path))
    for f in sorted(os.listdir(log_dir)):
        with open(os.path.join(log_dir, f)) as a, open(os.path.join(alt, f)) as b:
            assert a.read() == b.read()


def test_text_path_matches_parquet_path(log_dir, transcripts_dir):
    """The same rows must be reachable via raw .log text and via parquet."""
    text_hist = (
        parse_log_files(log_dir)
        .to_pandas()
        .groupby(["event_type", "severity_number"])
        .size()
        .to_dict()
    )
    import pyarrow as pa

    grammars = pa.array(["nginx_access", "nginx_error", "kmsg"])
    parquet = parse_stage(rd.read_parquet(transcripts_dir)).map_batches(
        lambda t: t.filter(pc.is_in(t.column("event_type"), value_set=grammars)).select(
            ["event_type", "severity_number"]
        ),
        batch_format="pyarrow",
    )
    pq_hist = parquet.to_pandas().groupby(["event_type", "severity_number"]).size().to_dict()
    assert text_hist == pq_hist
    assert sum(text_hist.values()) > 0


def test_max_log_size_truncates_not_drops(tmp_path):
    p = tmp_path / "big.log"
    long_line = "1,42,1000;" + "x" * 500
    p.write_text(long_line + "\nshort line\n")
    out = read_log_lines([str(p)], max_log_size=50).to_pandas()
    assert len(out) == 2  # truncated, never dropped (reader.rs:157-165)
    lens = sorted(out.text.str.len())
    assert lens == [10, 50]
    assert out.source_file.str.endswith("big.log").all()


def test_fluent_forward_roundtrip(tmp_path):
    from rotel_ray.sources.fluent import read_forward_files, write_forward_fixture

    p = write_forward_fixture(
        str(tmp_path / "fwd.jsonl"),
        [
            ("app.web", [(1700000000, {"msg": "hello", "level": "info"}),
                         (1700000001, {"msg": "bye"})]),
            ("app.db", [(1700000002, {"query": "select 1"})]),
            ("bad", []),
        ],
    )
    with open(p, "a") as f:
        f.write("not json\n")         # lenient skip
        f.write('{"also": "bad"}\n')  # wrong shape skip
    out = read_forward_files([p]).to_pandas().sort_values("ts").reset_index(drop=True)
    assert len(out) == 3
    assert list(out.tag) == ["app.web", "app.web", "app.db"]
    assert "hello" in out.record[0]
    assert str(out.ts[0]) == "2023-11-14 22:13:20"


def test_fluent_msgpack_wire_variants(tmp_path):
    """Real msgpack forward protocol: all four message shapes
    (message.rs:8-18) + EventTime ext timestamps (message.rs:63-103)."""
    import msgpack

    from rotel_ray.sources.fluent import (
        read_forward_msgpack,
        write_forward_fixture_msgpack,
    )

    ext = msgpack.ExtType(0, (1_700_000_005).to_bytes(4, "big") + (500).to_bytes(4, "big"))
    p = write_forward_fixture_msgpack(
        str(tmp_path / "fwd.msgpack"),
        [
            ["tag.msg", 1_700_000_000, {"a": 1}],                       # Message
            ["tag.msgopt", 1_700_000_001, {"b": "x"}, {"chunk": "c1"}],  # +options
            ["tag.fwd", [[1_700_000_002, {"c": 2}], [1_700_000_003, {"d": 3}]]],
            ["tag.fwdopt", [[1_700_000_004, {"e": 4}]], {"chunk": "c2"}],
            ["tag.ext", ext, {"f": 5}],                                  # EventTime ext
            ["junk"],                                                    # unknown -> 0 rows
            [b"tag.bytes", 1_700_000_006, {b"k": b"v"}],                 # raw=True bytes
        ],
    )
    out = read_forward_msgpack([p]).to_pandas().sort_values("ts").reset_index(drop=True)
    assert list(out.tag) == ["tag.msg", "tag.msgopt", "tag.fwd", "tag.fwd",
                             "tag.fwdopt", "tag.ext", "tag.bytes"]
    assert out.ts[5].value == 1_700_000_005 * 1_000_000_000 + 500  # ext nanos kept
    assert out.record[6] == '{"k": "v"}'
    # wrong ext code is a protocol error -> entry dropped
    bad = msgpack.ExtType(3, b"\x00" * 8)
    p2 = write_forward_fixture_msgpack(str(tmp_path / "bad.msgpack"),
                                       [["t", bad, {"x": 1}], ["ok", 1, {"y": 2}]])
    out2 = read_forward_msgpack([p2]).to_pandas()
    assert list(out2.tag) == ["ok"]


def test_fluent_msgpack_equals_json_contract(tmp_path):
    """The msgpack and JSON decoders emit the identical row contract for the
    same logical events."""
    from rotel_ray.sources.fluent import (
        read_forward_files,
        read_forward_msgpack,
        write_forward_fixture,
        write_forward_fixture_msgpack,
    )

    events = [("app", [(1_700_000_000, {"m": "x", "n": 2})]),
              ("db", [(1_700_000_001, {"q": "s"}), (1_700_000_002, {"q": "t"})])]
    pj = write_forward_fixture(str(tmp_path / "f.jsonl"), events)
    pm = write_forward_fixture_msgpack(
        str(tmp_path / "f.msgpack"),
        [[tag, [[ts, rec] for ts, rec in entries]] for tag, entries in events],
    )
    a = read_forward_files([pj]).to_pandas().sort_values(["ts", "tag"]).reset_index(drop=True)
    b = read_forward_msgpack([pm]).to_pandas().sort_values(["ts", "tag"]).reset_index(drop=True)
    assert a.equals(b)


def test_stitch_multiline_chunk_spanning_records():
    """Records that span chunk boundaries stitch correctly (the global
    record ordinal is consistent across chunks), including multi-line
    ordering and n_lines."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.sources.text_logs import stitch_multiline

    rng = np.random.default_rng(7)
    lines, expected = [], {}
    rec = 0
    while len(lines) < 100:
        rec += 1
        parent = f"ERROR boom {rec}"
        conts = [f"    at f{j} r{rec}" for j in range(int(rng.integers(0, 5)))]
        expected[rec] = (len(lines), 1 + len(conts),
                         "\n".join([parent] + conts))
        lines.append(parent)
        lines.extend(conts)
    t = pa.table({"line_no": pa.array(range(len(lines)), pa.int64()),
                  "text": pa.array(lines)})
    ds = rd.from_arrow(t).repartition(6)  # scramble block boundaries
    out = stitch_multiline(ds, chunk=4, num_buckets=4).to_pandas()
    out = out.set_index("record_id").sort_index()
    assert len(out) == rec
    for r, (ln, n, txt) in expected.items():
        assert out.loc[r, "line_no"] == ln
        assert out.loc[r, "n_lines"] == n
        assert out.loc[r, "record_text"] == txt


def test_multiline_fixture_shape():
    """Fixture invariants: records == transcript turns, parent lines never
    start with a space, continuation lines always do."""
    import pyarrow.parquet as pq

    from rotel_ray.generator import ensure_transcripts
    from rotel_ray.sources.text_logs import ensure_multiline_logs

    sf_dir = "/root/testdata/sf0.001"
    d = ensure_multiline_logs(sf_dir)
    t = pq.read_table(f"{d}/part-0000.parquet")
    texts = t.column("text").to_pylist()
    n_parents = sum(1 for x in texts if not x.startswith(" "))
    import glob as g
    tdir = ensure_transcripts(sf_dir)
    n_turns = sum(pq.ParquetFile(f).metadata.num_rows
                  for f in sorted(g.glob(f"{tdir}/*.parquet")))
    assert n_parents == n_turns
    assert texts[0] and not texts[0].startswith(" ")
    assert any(x.startswith("    at frame") for x in texts)
