"""Parquet sink writers — the exporter analogue.

The reference's file exporter buffers rows and flushes periodically to
``{type}-{timestamp}.parquet`` under per-type subdirs
(src/exporters/file/task.rs:12-72, mod.rs:1-264). Batch translation:
``Dataset.write_parquet`` into a per-sink directory, written to a temp dir
and atomically renamed so re-executed work is idempotent (the ack-once /
at-least-once semantics of src/topology/payload.rs:297-453 collapse to
"deterministic partition dir + atomic rename" in batch world).
"""

from __future__ import annotations

import os
import shutil
import time


def write_sink_atomic(ds, final_dir: str, compression: str = "snappy",
                      fmt: str = "parquet") -> int:
    """Write `ds` to `final_dir` atomically (tmp dir + rename). Returns the
    row count actually written (data-plane counter — exporter-counter
    parity source, src/exporters/otlp/exporter.rs:87-205).

    fmt: "parquet" (default) or "json" (ndjson) — the reference file
    exporter's two formats (src/exporters/file/mod.rs:1-264)."""
    tmp = final_dir.rstrip("/") + ".writing"
    for attempt in range(3):
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        try:
            if fmt == "json":
                ds.write_json(tmp)
            else:
                ds.write_parquet(tmp, arrow_parquet_args_fn=lambda: {"compression": compression})
            break
        except ImportError:
            # Ray's path resolution optionally imports fsspec's HTTP
            # filesystem; concurrent first-imports from several writer
            # threads can observe a partially-initialized module and raise a
            # spurious ImportError (Ray only tolerates ModuleNotFoundError).
            # The race is transient — retry after a short pause.
            if attempt == 2:
                raise
            time.sleep(0.1 * (attempt + 1))
    # count rows from the files just written (data plane, not side-state)
    if fmt == "json":
        n = 0
        for f in os.listdir(tmp):
            if f.endswith(".json"):
                with open(os.path.join(tmp, f), "rb") as fh:
                    n += sum(1 for line in fh if line.strip())
    else:
        import pyarrow.parquet as pq

        n = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp) if f.endswith(".parquet")
        )
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp, final_dir)
    return n
