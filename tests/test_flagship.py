"""End-to-end pipeline tests: routed-row counter parity, per-turn text
equality under stable ordering, checkpoint resume correctness."""

import glob
import json
import os
import shutil

import duckdb
import pyarrow.parquet as pq
import pytest

from rotel_ray.pipelines.flagship import run_flagship


@pytest.fixture(scope="module")
def flagship_out(transcripts_dir):
    out = "/tmp/rotel_test_flagship"
    shutil.rmtree(out, ignore_errors=True)
    totals = run_flagship(transcripts_dir, out, waves=3, enrich_concurrency=2, resume=False)
    return out, totals, transcripts_dir


def _sink_rows(out, sink):
    files = glob.glob(os.path.join(out, sink, "wave=*", "*.parquet"))
    return sum(pq.read_metadata(f).num_rows for f in files)


def test_counter_parity(flagship_out):
    """Per-sink aggregate counts match exporter-counter semantics exactly:
    manifest counters == rows actually in the sink files == routed totals."""
    out, totals, tdir = flagship_out
    rows_in = sum(pq.read_metadata(f).num_rows for f in glob.glob(tdir + "/*.parquet"))
    assert totals["rows_in"] == rows_in
    for sink in ("traces", "logs", "metrics", "conv_agg"):
        assert totals["sink_counts"][sink] == _sink_rows(out, sink), sink
    # every input row routed to exactly one of traces/logs
    assert totals["sink_counts"]["traces"] + totals["sink_counts"]["logs"] == rows_in


def test_per_turn_text_equality(flagship_out):
    """Every routed row preserves `text` verbatim under stable
    (conv_id, turn_idx) ordering — the BASELINE.json correctness gate."""
    out, _, tdir = flagship_out
    con = duckdb.connect()
    q = f"""
      WITH src AS (SELECT conv_id, turn_idx, text FROM read_parquet('{tdir}/*.parquet')),
      routed AS (
        SELECT conv_id, turn_idx, text FROM read_parquet('{out}/traces/wave=*/*.parquet')
        UNION ALL
        SELECT conv_id, turn_idx, text FROM read_parquet('{out}/logs/wave=*/*.parquet')
      )
      SELECT count(*) FROM src FULL JOIN routed USING (conv_id, turn_idx)
      WHERE src.text IS DISTINCT FROM routed.text
    """
    assert con.execute(q).fetchone()[0] == 0


def test_sorted_output_deterministic(flagship_out):
    out, _, _ = flagship_out
    con = duckdb.connect()
    a = con.execute(
        f"SELECT * FROM read_parquet('{out}/logs/wave=*/*.parquet') ORDER BY conv_id, turn_idx"
    ).fetchdf()
    assert a[["conv_id", "turn_idx"]].duplicated().sum() == 0


def test_resume_skips_done_and_matches(flagship_out):
    """Kill-and-resume: drop one wave's commit + files; rerun with
    resume=True; only that wave re-executes and totals are identical."""
    out, totals, tdir = flagship_out
    manifest_path = os.path.join(out, "manifest.jsonl")
    recs = [json.loads(x) for x in open(manifest_path) if x.strip()]
    victim = recs[-1]["partition_id"]
    keep = [r for r in recs if r["partition_id"] != victim]
    with open(manifest_path, "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    for sink in ("traces", "logs", "metrics", "conv_agg"):
        shutil.rmtree(os.path.join(out, sink, f"wave={victim}"), ignore_errors=True)

    totals2 = run_flagship(tdir, out, waves=3, enrich_concurrency=2, resume=True)
    assert totals2 == {**totals2, **{k: totals[k] for k in ("rows_in", "rows_parsed", "rows_failed")}}
    assert totals2["sink_counts"] == totals["sink_counts"]
    # the untouched waves were not rewritten (resume actually skipped them)
    recs2 = [json.loads(x) for x in open(manifest_path) if x.strip()]
    assert len(recs2) == len(recs)
    redone = [r for r in recs2 if r["partition_id"] == victim]
    assert len(redone) == 1


def test_resume_recomputes_wave_with_changed_input(transcripts_dir, tmp_path):
    """Input-fingerprint resume safety: replacing an input fragment between
    runs must re-run exactly the wave that reads it (the reference
    re-identifies files by device+inode, receiver.rs:129-157; the batch
    analogue records (path, size, mtime_ns) per fragment at commit)."""
    tdir = str(tmp_path / "in")
    shutil.copytree(transcripts_dir, tdir)
    out = str(tmp_path / "out")
    totals = run_flagship(tdir, out, waves=3, enrich_concurrency=2, resume=False)

    manifest_path = os.path.join(out, "manifest.jsonl")
    recs = {r["partition_id"]: r for r in
            (json.loads(x) for x in open(manifest_path) if x.strip())}
    assert all("input_fingerprints" in r for r in recs.values())

    files = sorted(glob.glob(os.path.join(tdir, "*.parquet")))
    victim_wave = 1 if len(files) > 1 else 0
    victim_file = files[victim_wave]  # wave w reads files[w::waves]
    st = os.stat(victim_file)
    os.utime(victim_file, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))

    totals2 = run_flagship(tdir, out, waves=3, enrich_concurrency=2, resume=True)
    assert totals2["sink_counts"] == totals["sink_counts"]  # same data -> same rows
    recs2_all = [json.loads(x) for x in open(manifest_path) if x.strip()]
    # exactly one new record appended, for the victim wave, superseding it
    assert len(recs2_all) == len(recs) + 1
    assert recs2_all[-1]["partition_id"] == victim_wave
    for r in recs2_all[:-1]:  # the original commits are untouched
        assert r == recs[r["partition_id"]]

    # unchanged inputs -> a further resume run recomputes nothing
    run_flagship(tdir, out, waves=3, enrich_concurrency=2, resume=True)
    assert len([x for x in open(manifest_path) if x.strip()]) == len(recs2_all)


def test_rerun_is_idempotent(flagship_out):
    out, totals, tdir = flagship_out
    totals3 = run_flagship(tdir, out, waves=3, enrich_concurrency=2, resume=True)
    assert totals3["sink_counts"] == totals["sink_counts"]


def test_json_sink_format(transcripts_dir):
    """The file exporter's JSON format variant (ndjson, atomic, counted)."""
    import ray.data as rd

    from rotel_ray.sinks import write_sink_atomic

    ds = rd.read_parquet(transcripts_dir).limit(500)
    out = "/tmp/rotel_json_sink"
    shutil.rmtree(out, ignore_errors=True)
    n = write_sink_atomic(ds, out, fmt="json")
    assert n == 500
    files = glob.glob(out + "/*.json")
    assert files
    rec = json.loads(open(files[0]).readline())
    assert {"conv_id", "turn_idx", "role", "text"} <= set(rec)


def test_crash_between_routed_write_and_aggregate_resumes(transcripts_dir, monkeypatch):
    """Crash INSIDE a wave, after the routed sinks land but before the fused
    aggregate write commits: the wave has no manifest record, so resume
    re-executes it idempotently (atomic dir replace) — no duplicate rows,
    identical totals to an uninterrupted run."""
    import rotel_ray.pipelines.flagship as fl

    out = "/tmp/rotel_crash_window_test"
    shutil.rmtree(out, ignore_errors=True)

    real = fl.rd.read_parquet
    calls = {"n": 0}

    def bomb(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:  # the wave's partials read, after the routed write
            raise RuntimeError("injected crash between routed write and aggregate")
        return real(*a, **kw)

    monkeypatch.setattr(fl.rd, "read_parquet", bomb)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_flagship(transcripts_dir, out, waves=2, enrich_concurrency=2, resume=True)
    # routed sink dirs for wave 0 exist, but nothing is committed
    recs = [json.loads(x) for x in open(os.path.join(out, "manifest.jsonl"))
            if x.strip()] if os.path.exists(os.path.join(out, "manifest.jsonl")) else []
    assert recs == []

    totals = run_flagship(transcripts_dir, out, waves=2, enrich_concurrency=2, resume=True)
    shutil.rmtree("/tmp/rotel_crash_window_ref", ignore_errors=True)
    ref = run_flagship(transcripts_dir, "/tmp/rotel_crash_window_ref", waves=2,
                       enrich_concurrency=2, resume=False)
    assert totals["sink_counts"] == ref["sink_counts"]
    assert totals["rows_in"] == ref["rows_in"]
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree("/tmp/rotel_crash_window_ref", ignore_errors=True)
