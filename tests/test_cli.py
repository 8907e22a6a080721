"""CLI entry tests: flag parsing, resource-attr propagation, end-to-end run."""

import json
import shutil

import pyarrow.parquet as pq
import pytest

from rotel_ray.cli import build_parser, main, parse_resource_attrs


def test_parse_resource_attrs():
    assert parse_resource_attrs("env=prod, region=us-east-1") == {
        "env": "prod", "region": "us-east-1"
    }
    assert parse_resource_attrs(None) is None
    with pytest.raises(ValueError, match="bad resource attr"):
        parse_resource_attrs("oops")


def test_parser_defaults():
    a = build_parser().parse_args(["--input", "/i", "--out", "/o"])
    assert a.waves == 4 and a.enrich_compute == "tasks" and not a.resume


def test_cli_end_to_end(transcripts_dir, capsys):
    """Full job through the CLI surface (ray already initialised by the
    session fixture; cli's guarded init is a no-op)."""
    out = "/tmp/rotel_cli_test"
    shutil.rmtree(out, ignore_errors=True)
    rc = main(["--input", transcripts_dir, "--out", out, "--waves", "2",
               "--resource-attrs", "env=prod,team=core"])
    assert rc == 0
    totals = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert totals["sink_counts"]["traces"] + totals["sink_counts"]["logs"] == totals["rows_in"]
    # resource attrs propagate into every sink file (generic_pipeline.rs:70-108)
    import glob

    f = glob.glob(f"{out}/logs/wave=*/*.parquet")[0]
    t = pq.read_table(f, columns=["env", "team"])
    assert t.column("env").to_pylist()[0] == "prod"
    assert t.column("team").to_pylist()[0] == "core"


def test_cli_query_mode(capsys, tmp_path):
    rc = main(["--query", "severity_hist", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    head = capsys.readouterr().out
    assert json.loads(head.strip().splitlines()[0])["rows"] > 0
    # parquet output path
    out = str(tmp_path / "q")
    rc = main(["--query", "severity_hist", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out])
    assert rc == 0
    import glob

    assert glob.glob(out + "/*.parquet")


def test_cli_query_errors(capsys):
    assert main(["--query", "nope"]) == 2
    assert main([]) == 2
    rc = main(["--list-queries"])
    assert rc == 0
    assert "severity_hist" in capsys.readouterr().out


def test_cli_compact(tmp_path):
    """--compact-target-bytes merges a shard directory into fewer files
    via the compaction planner, preserving rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rotel_ray.cli import main

    d = tmp_path / "in"
    d.mkdir()
    rng = np.random.default_rng(2)
    for i in range(6):
        pq.write_table(pa.table({"x": pa.array(rng.integers(0, 99, 400))}),
                       d / f"part-{i}.parquet")
    out = tmp_path / "out"
    rc = main(["--input", str(d), "--out", str(out),
               "--compact-target-bytes", "4000"])
    assert rc == 0
    files = sorted(out.glob("*.parquet"))
    assert 0 < len(files) < 6
    assert sum(pq.read_metadata(f).num_rows for f in files) == 2400
