"""Small-file compaction — the output-hygiene operator of a resumable
100 TB pipeline.

Partitioned, resumable writes (one directory per wave/key range) trade
write safety for many small files; downstream readers want few large
ones. ``compaction_plan`` assigns each parquet file to a merge group by
walking files in name order and cutting a new group at every
``target_bytes`` of cumulative COMPRESSED size (``group_id =
bytes_before_file // target_bytes`` — deterministic, no bin-packing
heuristics, so the plan is exactly reproducible by the DuckDB oracle via
``parquet_metadata``). ``compact_files`` executes a plan group-by-group
with the usual atomic-rename discipline.

Scale shape: footer metadata reads are fanned out as a Ray map over the
file list (parallel metadata fetch — never a data read); only the
(file, bytes) table — one row per FILE, not per row of data — reaches
the driver for the cumulative cut.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _file_compressed_bytes(path: str) -> int:
    """Sum of column-chunk ``total_compressed_size`` over all row groups —
    the same quantity DuckDB's ``parquet_metadata`` exposes per chunk."""
    md = pq.ParquetFile(path).metadata
    return sum(md.row_group(i).column(j).total_compressed_size
               for i in range(md.num_row_groups)
               for j in range(md.num_columns))


def compaction_plan(input_dir: str, *, target_bytes: int,
                    pattern: str = "*.parquet"):
    """Returns a Dataset of (file, n_bytes, group_id), files in name order.

    ``group_id = cumulative-compressed-bytes-before-file // target_bytes``:
    every group except possibly the last holds >= target_bytes once its
    final member is added, and a file larger than the target gets a group
    of its own (plus whatever small files led into it)."""
    import ray
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(input_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} under {input_dir}")

    def meta(batch: dict) -> dict:
        return {
            "file": np.array([os.path.basename(p) for p in batch["item"]],
                             dtype=object),
            "n_bytes": np.array([_file_compressed_bytes(p)
                                 for p in batch["item"]], dtype=np.int64),
        }

    rows = (rd.from_items(files).map_batches(meta)
            .sort("file").take_all())  # one row per FILE — driver-safe
    names = [r["file"] for r in rows]
    sizes = np.array([r["n_bytes"] for r in rows], dtype=np.int64)
    prev = np.r_[0, np.cumsum(sizes)[:-1]]
    return rd.from_arrow(pa.table({
        "file": pa.array(names, pa.string()),
        "n_bytes": pa.array(sizes),
        "group_id": pa.array(prev // target_bytes),
    }))


def _merge_group(paths: list[str], out_path: str) -> int:
    """One group -> one parquet file, streamed row-group-by-row-group
    (never the whole group in memory). Pure function: runs as a Ray task."""
    writer = None
    rows = 0
    for p in paths:
        f = pq.ParquetFile(p)
        for i in range(f.metadata.num_row_groups):
            t = f.read_row_group(i)
            if writer is None:
                writer = pq.ParquetWriter(out_path, t.schema)
            writer.write_table(t)
            rows += t.num_rows
    if writer is not None:
        writer.close()
    return rows


def compact_files(input_dir: str, out_dir: str, *, target_bytes: int,
                  pattern: str = "*.parquet", overwrite: bool = False) -> dict:
    """Execute a compaction plan: each group's files stream into ONE
    output parquet. Groups merge in PARALLEL as raw Ray tasks (the
    single-file-per-group writer is the one shape ``Dataset.write_parquet``
    cannot express); no data ever moves through the driver, and the output
    directory lands by atomic rename. Returns {"groups": n, "rows": total}.

    ``out_dir`` must not be the input directory, and an EXISTING non-empty
    ``out_dir`` is refused unless ``overwrite=True`` — the final rename
    replaces it wholesale, so a mistyped path must not silently destroy
    unrelated data."""
    import shutil

    import ray

    if os.path.realpath(out_dir) == os.path.realpath(input_dir):
        raise ValueError("compact_files: out_dir must differ from input_dir")
    if not overwrite and os.path.isdir(out_dir) and os.listdir(out_dir):
        raise FileExistsError(
            f"compact_files: {out_dir} exists and is non-empty; "
            "pass overwrite=True to replace it")
    plan = compaction_plan(input_dir, target_bytes=target_bytes,
                           pattern=pattern).take_all()
    groups: dict[int, list[str]] = {}
    for r in plan:
        groups.setdefault(int(r["group_id"]), []).append(
            os.path.join(input_dir, r["file"]))
    tmp = out_dir + ".writing"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    merge = ray.remote(_merge_group)
    refs = [merge.remote(groups[gid], os.path.join(tmp, f"group-{gid:05d}.parquet"))
            for gid in sorted(groups)]
    total = sum(ray.get(refs))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return {"groups": len(groups), "rows": total}


# ---------------------------------------------------------------------------
# zone-map scan pruning (row-group min/max statistics)
# ---------------------------------------------------------------------------

ZONEMAP_VERSION = 1


def zonemap_events_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (never builds) — safe to embed in oracle SQL."""
    from .planted import source_tag

    tag = source_tag(f"{sf_dir}/events.parquet")
    return os.path.join(root, f"zonemap_g{ZONEMAP_VERSION}_{tag}")


def ensure_zonemap_events(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """The events table rewritten in its existing (time) order with ~16
    small row groups — the time-bucketed ingest layout whose zone maps a
    100 TB scan actually prunes on. Pure re-chunk of the source (row order
    unchanged), cached with the content-fingerprint key."""
    import shutil

    out = zonemap_events_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    t = pq.read_table(f"{sf_dir}/events.parquet")
    rg = max(1, t.num_rows // 16)
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, os.path.join(tmp, "part-0000.parquet"),
                   row_group_size=rg)
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def scan_prune_plan(input_dir: str, *, column: str, threshold: int,
                    pattern: str = "*.parquet"):
    """Zone-map pruning plan for the predicate ``column >= threshold``: one
    row per (file, row group) with its min/max statistics and ``skip`` =
    (rg_max < threshold) — the row groups a pruned 100 TB scan never reads.

    Scale shape: like :func:`compaction_plan`, footer metadata reads fan
    out as a Ray map over the file list (never a data read); the output is
    one row per ROW GROUP, not per data row."""
    import ray  # noqa: F401  (Dataset machinery)
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(input_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} under {input_dir}")

    def meta(batch: dict) -> dict:
        out = {"file": [], "row_group_id": [], "n_rows": [],
               "rg_min": [], "rg_max": []}
        for p in batch["item"]:
            md = pq.ParquetFile(p).metadata
            names = [md.schema.column(j).name for j in range(md.num_columns)]
            ci = names.index(column)
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(ci).statistics
                out["file"].append(os.path.basename(p))
                out["row_group_id"].append(i)
                out["n_rows"].append(md.row_group(i).num_rows)
                out["rg_min"].append(int(st.min))
                out["rg_max"].append(int(st.max))
        return {
            "file": np.array(out["file"], dtype=object),
            "row_group_id": np.array(out["row_group_id"], np.int64),
            "n_rows": np.array(out["n_rows"], np.int64),
            "rg_min": np.array(out["rg_min"], np.int64),
            "rg_max": np.array(out["rg_max"], np.int64),
            "skip": np.array([m < threshold for m in out["rg_max"]], bool),
        }

    return rd.from_items(files).map_batches(meta)
