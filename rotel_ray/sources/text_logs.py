"""Raw text-log file source — the file-receiver analogue.

The reference tails log files with a coordinator + ≤4 parse workers, line
reader with ``max_log_size`` truncation, and per-file offset persistence
(src/receivers/file/receiver.rs:469,763,1427; input/file/reader.rs:157-165;
persistence/json_file.rs:25-120). Batch restatement:

- discovery = glob; sharding = Ray block splitting of ``read_text``
  (``include_paths=True`` keeps file lineage per line);
- per-line truncation to ``max_log_size`` is a vectorized
  ``utf8_slice_codeunits`` — same contract as reader.rs:157-165 (truncate,
  don't drop);
- resume = the wave manifest (state/manifest.py) over file groups —
  offsets collapse to "file fully ingested" in batch world.

``ensure_log_files`` materializes deterministic ``.log`` fixtures from the
transcript corpus (the nginx/kmsg-grammar subset), so the same rows are
reachable via the parquet path AND the raw-text path — which is exactly the
oracle: parse(read_text(logs)) must equal parse(read_parquet(transcripts))
filtered to those grammars.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.parse import parse_batch

LOG_GRAMMAR_PREDICATES = ("nginx_access", "nginx_error", "kmsg")


def ensure_log_files(transcripts_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Write the log-grammar subset of the transcript corpus as rotated
    ``.log`` files (one per input shard), deterministically."""
    tag = os.path.basename(os.path.normpath(transcripts_dir))
    out = os.path.join(root, f"logs_{tag}")
    if os.path.isdir(out) and os.listdir(out):
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    for f in sorted(os.listdir(transcripts_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(transcripts_dir, f), columns=["text"])
        text = t.column("text").combine_chunks()
        # the log grammars have distinct prefixes: digit-start (kmsg, nginx
        # error date) or IP-start (access); transcript grammars start with
        # TOOL_CALL/ERROR/{/chat words
        parsed = parse_batch(pa.table({"text": text}))
        mask = pc.is_in(parsed.column("event_type"), value_set=pa.array(LOG_GRAMMAR_PREDICATES))
        lines = parsed.filter(mask).column("text").to_pylist()
        name = f.replace(".parquet", ".log")
        with open(os.path.join(tmp, name), "w") as fh:
            fh.write("\n".join(lines))
            if lines:
                fh.write("\n")
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def ensure_log_files_gz(transcripts_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Gzip-compressed twin of ``ensure_log_files`` — the compressed-input
    receiver path (gzip body decode, src/receivers/otlp/otlp_http.rs:500-530,
    671-677). Deterministic: mtime=0 in the gzip header so output bytes are
    stable across processes."""
    import gzip

    plain = ensure_log_files(transcripts_dir, root)
    out = plain + "_gz"
    if os.path.isdir(out) and os.listdir(out):
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    for f in sorted(os.listdir(plain)):
        if not f.endswith(".log"):
            continue
        with open(os.path.join(plain, f), "rb") as src, \
                open(os.path.join(tmp, f + ".gz"), "wb") as dst:
            with gzip.GzipFile(fileobj=dst, mode="wb", mtime=0) as gz:
                gz.write(src.read())
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def read_log_lines(log_dir_or_paths, *, max_log_size: int | None = 16 * 1024):
    """read_text -> (source_file, text) Dataset with max-size truncation.
    ``.gz`` files decompress in the read tasks (arrow_open_stream_args),
    mirroring the reference's inflate-at-ingest (otlp_http.rs:671-677)."""
    if isinstance(log_dir_or_paths, str) and os.path.isdir(log_dir_or_paths):
        paths = sorted(
            globmod.glob(os.path.join(log_dir_or_paths, "*.log"))
            + globmod.glob(os.path.join(log_dir_or_paths, "*.log.gz"))
        )
    else:
        paths = log_dir_or_paths
    gz = bool(paths) and all(str(p).endswith(".gz") for p in paths)
    open_args = {"compression": "gzip"} if gz else None
    ds = rd.read_text(paths, include_paths=True, arrow_open_stream_args=open_args)

    def prep(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks()
        if max_log_size is not None:
            text = pc.utf8_slice_codeunits(text, 0, max_log_size)
        return pa.table({"source_file": t.column("path"), "text": text})

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def parse_log_files(log_dir_or_paths, *, max_log_size: int | None = 16 * 1024):
    """Full file-source pipeline: read_text -> truncate -> vectorized parse.
    Emits the ParsedLog contract (severity, event_type, per-grammar fields)
    of src/receivers/file/parser/traits.rs:17-26."""
    ds = read_log_lines(log_dir_or_paths, max_log_size=max_log_size)
    return ds.map_batches(parse_batch, batch_format="pyarrow", zero_copy_batch=True)
