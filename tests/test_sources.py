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
