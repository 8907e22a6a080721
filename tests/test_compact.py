"""Compaction planner/executor tests: deterministic grouping + row
preservation + parallel single-file-per-group merge."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from rotel_ray.stages.compact import (
    _file_compressed_bytes,
    compact_files,
    compaction_plan,
)


def _write_shards(d, sizes):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(1)
    for i, n in enumerate(sizes):
        t = pa.table({"x": pa.array(rng.integers(0, 1 << 40, n), pa.int64()),
                      "s": pa.array([f"row-{i}-{j}" for j in range(n)])})
        pq.write_table(t, os.path.join(d, f"part-{i:04d}.parquet"))


def test_plan_groups_by_cumulative_bytes(tmp_path):
    d = str(tmp_path / "in")
    _write_shards(d, [500, 500, 500, 500, 500])
    files = sorted(os.listdir(d))
    sizes = [_file_compressed_bytes(os.path.join(d, f)) for f in files]
    target = sizes[0] + sizes[1] + 1  # two files per group-ish
    plan = compaction_plan(d, target_bytes=target).take_all()
    assert [r["file"] for r in plan] == files
    prev = np.r_[0, np.cumsum(sizes)[:-1]]
    assert [r["group_id"] for r in plan] == list(prev // target)
    assert [r["n_bytes"] for r in plan] == sizes
    # more than one group and nondecreasing ids
    gids = [r["group_id"] for r in plan]
    assert gids == sorted(gids) and gids[-1] >= 1


def test_compact_preserves_rows_and_merges(tmp_path):
    d = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_shards(d, [300, 300, 300, 300])
    sizes = [_file_compressed_bytes(os.path.join(d, f))
             for f in sorted(os.listdir(d))]
    res = compact_files(d, out, target_bytes=sum(sizes[:2]) + 1)
    outs = sorted(os.listdir(out))
    assert res["rows"] == 1200
    assert res["groups"] == len(outs) and len(outs) < 4
    # content equality: same multiset of rows
    a = rd.read_parquet(d).to_pandas().sort_values(["s"]).reset_index(drop=True)
    b = rd.read_parquet(out).to_pandas().sort_values(["s"]).reset_index(drop=True)
    assert a.equals(b)


def test_compact_refuses_unsafe_out_dir(tmp_path):
    """out_dir == input_dir and existing non-empty out_dir are refused
    (the final rename replaces out_dir wholesale); overwrite=True opts in."""
    import pytest

    d = str(tmp_path / "in")
    _write_shards(d, [100, 100])
    with pytest.raises(ValueError, match="differ from input_dir"):
        compact_files(d, d, target_bytes=10_000)
    out = tmp_path / "precious"
    out.mkdir()
    (out / "keep.txt").write_text("unrelated data")
    with pytest.raises(FileExistsError, match="non-empty"):
        compact_files(d, str(out), target_bytes=10_000)
    assert (out / "keep.txt").exists()  # refused BEFORE touching anything
    res = compact_files(d, str(out), target_bytes=10_000, overwrite=True)
    assert res["rows"] == 200 and not (out / "keep.txt").exists()


def test_oversize_file_closes_its_group(tmp_path):
    """A file bigger than the target joins the group its prefix opened
    (bytes BEFORE the file decide its group) and forces the NEXT file
    into a fresh group — the documented prefix-cut semantics."""
    d = str(tmp_path / "in")
    _write_shards(d, [50, 5000, 50])
    sizes = [_file_compressed_bytes(os.path.join(d, f))
             for f in sorted(os.listdir(d))]
    target = sizes[0] + 10  # smaller than the big file
    plan = compaction_plan(d, target_bytes=target).take_all()
    gids = [r["group_id"] for r in plan]
    assert gids[0] == gids[1]          # big file rides with its prefix
    assert gids[2] > gids[1]           # tail starts a fresh group
    assert len(set(gids)) == 2


def test_scan_prune_plan_skips_early_row_groups(tmp_path):
    import pyarrow.parquet as pq

    from rotel_ray.stages.compact import scan_prune_plan

    pq.write_table(pa.table({"k": pa.array(range(100), pa.int64())}),
                   str(tmp_path / "a.parquet"), row_group_size=25)
    got = (scan_prune_plan(str(tmp_path), column="k", threshold=60)
           .to_pandas().sort_values("row_group_id").reset_index(drop=True))
    assert got.row_group_id.tolist() == [0, 1, 2, 3]
    assert got.rg_min.tolist() == [0, 25, 50, 75]
    assert got.rg_max.tolist() == [24, 49, 74, 99]
    # k >= 60 can only live in groups whose max >= 60 -> first two skip
    assert got.skip.tolist() == [True, True, False, False]
    assert got.n_rows.sum() == 100


def test_part1by1_spread():
    import numpy as np

    from rotel_ray.stages.compact import _part1by1

    assert _part1by1(np.array([0xFFFF], np.uint64))[0] == 0x55555555
    assert _part1by1(np.array([0b1011], np.uint64))[0] == 0b1000101
    # interleave is a bijection on 16+16 bits: distinct inputs stay distinct
    a = np.arange(1024, dtype=np.uint64)
    z = (_part1by1(a) << np.uint64(1)) | _part1by1(a[::-1])
    assert len(np.unique(z)) == len(z)


def test_zorder_zone_map_rectangles():
    """Z-order files cover every row, and each file's (a, m) rectangle is
    strictly narrower than the global extent on BOTH dimensions — the
    multi-dimensional locality a single-column sort can't give."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rotel_ray.stages.compact import zorder_layout

    rng_a = 4096
    n = 4096
    a = np.arange(n, dtype=np.int64) % rng_a
    m = (np.arange(n, dtype=np.int64) * 37) % 50000
    t = pa.table({"user_id": pa.array(a),
                  "ts": pa.array(m * 60_000_000).cast(pa.timestamp("us"))})
    stats = {"a_min": int(a.min()), "a_max": int(a.max()),
             "m_min": int(m.min()), "m_max": int(m.max())}
    out = zorder_layout(rd.from_arrow(t).repartition(4), stats,
                        num_buckets=4).to_pandas()
    assert out["n_rows"].sum() == n
    a_span = stats["a_max"] - stats["a_min"] + 1
    m_span = stats["m_max"] - stats["m_min"] + 1
    widths_a = out["a_max"] - out["a_min"] + 1
    widths_m = out["m_max"] - out["m_min"] + 1
    assert (widths_a <= a_span // 2).all()
    assert (widths_m <= m_span // 2).all()


def test_footer_min_max_matches_data(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rotel_ray.stages.compact import footer_min_max

    us = np.array([5_000_000, 9_000_000, 1_000_000], np.int64)
    t = pa.table({"user_id": pa.array([7, 3, 11], pa.int64()),
                  "ts": pa.array(us).cast(pa.timestamp("us"))})
    pq.write_table(t, tmp_path / "x.parquet")
    st = footer_min_max(str(tmp_path / "x.parquet"), ["user_id", "ts"])
    assert st == {"user_id_min": 3, "user_id_max": 11,
                  "ts_min": 1_000_000, "ts_max": 9_000_000}
