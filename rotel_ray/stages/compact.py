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


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each uint32 to even bit positions
    (Morton bit interleave half, the standard magic-mask ladder)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def zorder_layout(ds, stats: dict, *, key_a: str = "user_id",
                  ts_col: str = "ts", n_files: int = 64,
                  num_buckets: int = 8):
    """Z-order (Morton-curve) layout assignment over two clustering
    dimensions — the multi-dimensional-locality complement to
    :func:`scan_prune_plan`: quantize (key_a, event-minute) each to 16
    bits against the global min/max from parquet FOOTER statistics (zero
    data read — ``stats`` carries a_min/a_max/m_min/m_max), interleave the
    bits into a 32-bit Morton key, and assign each row to one of
    ``n_files`` target files by the key's top bits. Returns the per-file
    ZONE MAP (n_rows, min/max of both dimensions) — narrow rectangles in
    (user × time) space, so a predicate on EITHER dimension prunes most
    files, which neither a user-sort nor a time-sort layout gives you.

    Scale shape: one stateless vectorized map computes keys; the zone map
    is a bounded two-phase aggregate (n_files rows). The actual rewrite
    is write_parquet(partition_cols=[zfile]) downstream — assignment and
    audit are the testable core."""
    from .aggregate import two_phase_aggregate

    a_min, a_max = int(stats["a_min"]), int(stats["a_max"])
    m_min, m_max = int(stats["m_min"]), int(stats["m_max"])
    a_span = max(1, a_max - a_min + 1)
    m_span = max(1, m_max - m_min + 1)
    shift = int(np.uint64(32 - n_files.bit_length() + 1))  # top log2(n_files) bits

    def assign(t: pa.Table) -> pa.Table:
        a = t.column(key_a).to_numpy(zero_copy_only=False).astype(np.int64)
        us = (t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        m = us // 60_000_000
        qa = ((a - a_min) * 65536 // a_span).astype(np.uint64)
        qm = ((m - m_min) * 65536 // m_span).astype(np.uint64)
        z = (_part1by1(qa) << np.uint64(1)) | _part1by1(qm)
        zfile = (z >> np.uint64(shift)).astype(np.int64)
        return pa.table({"zfile": pa.array(zfile),
                         "a": pa.array(a), "m": pa.array(m)})

    keyed = ds.map_batches(assign, batch_format="pyarrow",
                           zero_copy_batch=True)
    return two_phase_aggregate(
        keyed, ["zfile"],
        [("a", "count", "n_rows"),
         ("a", "min", "a_min"), ("a", "max", "a_max"),
         ("m", "min", "m_min"), ("m", "max", "m_max")],
        num_buckets=num_buckets)


def footer_min_max(input_dir_or_file: str, columns: list[str],
                   pattern: str = "*.parquet") -> dict:
    """Global min/max per column from parquet footer statistics only —
    the metadata-read that seeds zorder_layout's quantization grid. File
    list handled driver-side (footers are KB-sized; for a million-file
    table lift this into the scan_prune_plan Ray map)."""
    files = ([input_dir_or_file] if os.path.isfile(input_dir_or_file)
             else sorted(glob.glob(os.path.join(input_dir_or_file, pattern))))
    if not files:
        raise FileNotFoundError(f"no {pattern} under {input_dir_or_file}")
    lo: dict = {}
    hi: dict = {}
    for p in files:
        md = pq.ParquetFile(p).metadata
        names = [md.schema.column(j).name for j in range(md.num_columns)]
        for c in columns:
            ci = names.index(c)
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(ci).statistics
                mn, mx = st.min, st.max
                if hasattr(mn, "timestamp"):  # datetime -> us, TZ-free
                    mn = int(np.datetime64(mn, "us").astype(np.int64))
                    mx = int(np.datetime64(mx, "us").astype(np.int64))
                lo[c] = min(lo.get(c, mn), mn)
                hi[c] = max(hi.get(c, mx), mx)
    return {**{f"{c}_min": lo[c] for c in columns},
            **{f"{c}_max": hi[c] for c in columns}}


def column_sizes(input_dir: str, *, pattern: str = "*.parquet"):
    """Column-level storage audit from parquet footers only: per column,
    the compressed and uncompressed byte totals and the e6 compression
    ratio — the view that decides encoding/sort-order work (a column
    whose compressed size ~ uncompressed is the one to dictionary-encode
    or Z-order first). Footer reads fan out as a Ray map; no data pages
    are ever read. Output
    (column, n_values, compressed_bytes, uncompressed_bytes, ratio_e6)."""
    import ray.data as rd

    from .aggregate import two_phase_aggregate

    files = sorted(glob.glob(os.path.join(input_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} under {input_dir}")

    def meta(batch: dict) -> dict:
        cols, nv, cb, ub = [], [], [], []
        for p in batch["item"]:
            md = pq.ParquetFile(p).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(md.num_columns):
                    c = rg.column(j)
                    cols.append(md.schema.column(j).name)
                    nv.append(c.num_values)
                    cb.append(c.total_compressed_size)
                    ub.append(c.total_uncompressed_size)
        return {"column": np.array(cols, dtype=object),
                "n_values": np.array(nv, np.int64),
                "compressed_bytes": np.array(cb, np.int64),
                "uncompressed_bytes": np.array(ub, np.int64)}

    per_chunk = rd.from_items(files).map_batches(meta)
    agg = two_phase_aggregate(
        per_chunk, ["column"],
        [("n_values", "sum", "n_values"),
         ("compressed_bytes", "sum", "compressed_bytes"),
         ("uncompressed_bytes", "sum", "uncompressed_bytes")],
        num_buckets=2)

    def ratio(t):
        import pyarrow as pa

        cbv = t.column("compressed_bytes").to_numpy(zero_copy_only=False)
        ubv = t.column("uncompressed_bytes").to_numpy(zero_copy_only=False)
        return t.append_column(
            "ratio_e6",
            pa.array(cbv * 1_000_000 // np.maximum(ubv, 1)))

    return agg.map_batches(ratio, batch_format="pyarrow",
                           zero_copy_batch=True)
