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


# ---------------------------------------------------------------------------
# multiline record stitching (continuation-line assembly)
# ---------------------------------------------------------------------------

MULTILINE_VERSION = 1


def multiline_logs_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (never builds) — safe to embed in oracle SQL."""
    from ..generator import sf_from_dir, transcripts_path
    from ..stages.planted import source_tag

    tdir = transcripts_path(sf_from_dir(sf_dir))
    first = sorted(globmod.glob(os.path.join(tdir, "*.parquet")))
    tag = source_tag(first[0]) if first else "empty"
    return os.path.join(root, f"mlines_g{MULTILINE_VERSION}_{tag}")


def ensure_multiline_logs(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """A line stream where records span multiple physical lines: every
    transcript turn becomes a parent line, followed by md5(i) % 4
    deterministic continuation lines (indented stack frames — the classic
    Java/Python traceback shape a file receiver must reassemble). Columns:
    ``line_no`` (global arrival order, the file-offset analogue) and
    ``text``. Pure function of the transcript corpus, cached under a
    content-fingerprint key."""
    import hashlib

    from ..generator import ensure_transcripts

    out = multiline_logs_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    tdir = ensure_transcripts(sf_dir)
    parents = []
    for f in sorted(globmod.glob(os.path.join(tdir, "*.parquet"))):
        parents.extend(pq.read_table(f, columns=["text"]).column("text").to_pylist())
    lines: list[str] = []
    for i, p in enumerate(parents):
        lines.append(p)
        h = hashlib.md5(str(i).encode()).hexdigest()
        for j in range(int(h[:8], 16) % 4):
            hj = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
            lines.append(f"    at frame{j} <{hj[:12]}>")
    t = pa.table({
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "text": pa.array(lines, pa.string()),
    })
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, os.path.join(tmp, "part-0000.parquet"),
                   row_group_size=16384)
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def stitch_multiline(ds, *, chunk: int = 4096, num_buckets: int = 16):
    """Reassemble multi-line records from a (line_no, text) stream: a line
    is a record START unless it begins with a space (the file-receiver
    multiline rule; the reference models the same concept as kmsg's ``c``
    continuation flag — src/receivers/kmsg/parser.rs:184,256-270 — where a
    consumer appends continuation lines to the previous record). Output:
    one row per record with ``record_id`` (ordinal of its start line),
    ``line_no`` (of the start), ``n_lines`` and ``record_text`` (lines
    joined with \\n).

    Scale shape (the late_events chunked-prefix pattern, window.py): the
    record id is the global running count of start lines — phase 1 reduces
    each ``chunk``-line range to one (chunk, n_starts) int row two-phase;
    the driver folds those into per-chunk carry-ins (n/chunk ints — scale
    ``chunk`` with the corpus) and broadcasts them; phase 2 buckets by
    chunk and finishes each chunk with one vectorized cumsum, emitting
    (record_id, line_no, text); phase 3 buckets by record_id and joins
    each record's lines. No global sort — text bytes move through exactly
    two bounded exchanges, and records spanning chunk boundaries are
    correct because phase 3 keys on the globally-consistent record_id."""
    import numpy as np
    import pandas as pd
    import ray

    from ..stages.aggregate import grouped_apply, two_phase_aggregate

    def narrow(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks()
        ln = t.column("line_no").combine_chunks().cast(pa.int64())
        s = pc.invert(pc.starts_with(text, " ")).cast(pa.int64())
        ch = pc.divide(ln, chunk)
        return pa.table({"line_no": ln, "text": text, "s": s, "chunk": ch})

    rows = ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)

    cstarts = two_phase_aggregate(rows, ["chunk"], [("s", "sum", "n_starts")],
                                  num_buckets=num_buckets).take_all()
    cstarts.sort(key=lambda r: r["chunk"])
    n_chunks = cstarts[-1]["chunk"] + 1 if cstarts else 0
    carry = np.zeros(n_chunks, np.int64)
    run = 0
    for r in cstarts:
        carry[r["chunk"]] = run
        run += r["n_starts"]
    ref = ray.put(carry)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"rec": pd.Series([], dtype=np.int64),
                                 "line_no": pd.Series([], dtype=np.int64),
                                 "text": pd.Series([], dtype=str)})
        carry_l = ray.get(ref)
        g = g.sort_values("line_no", kind="mergesort")
        ch = g["chunk"].to_numpy()
        s = g["s"].to_numpy()
        cs = np.cumsum(s)
        seg_id = np.cumsum(np.r_[0, (ch[1:] != ch[:-1]).astype(np.int64)])
        seg_first = np.flatnonzero(np.r_[True, ch[1:] != ch[:-1]])
        before_seg = np.r_[0, cs[seg_first[1:] - 1]]
        rec = cs - before_seg[seg_id] + carry_l[ch]
        return pd.DataFrame({"rec": rec,
                             "line_no": g["line_no"].to_numpy(),
                             "text": g["text"].to_numpy()})

    assigned = grouped_apply(rows, ["chunk"], assign, num_buckets=num_buckets)

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"record_id": pd.Series([], dtype=np.int64),
                                 "line_no": pd.Series([], dtype=np.int64),
                                 "n_lines": pd.Series([], dtype=np.int64),
                                 "record_text": pd.Series([], dtype=str)})
        g = g.sort_values(["rec", "line_no"], kind="mergesort")
        rec = g["rec"].to_numpy()
        seg_first = np.flatnonzero(np.r_[True, rec[1:] != rec[:-1]])
        n_lines = np.diff(np.r_[seg_first, len(rec)])
        # vectorized per-record join: one Arrow binary_join over a
        # record-offset ListArray (the pandas per-group "\n".join was the
        # hot spot — 16 s summed UDF at sf0.1, ~10x this kernel)
        texts = pa.array(g["text"].to_numpy(), pa.string())
        offsets = pa.array(np.r_[seg_first, len(rec)].astype(np.int32))
        joined = pc.binary_join(pa.ListArray.from_arrays(offsets, texts),
                                "\n")
        return pd.DataFrame({"record_id": rec[seg_first],
                             "line_no": g["line_no"].to_numpy()[seg_first],
                             "n_lines": n_lines.astype(np.int64),
                             "record_text": joined.to_pandas().to_numpy()})

    return grouped_apply(assigned, ["rec"], stitch, num_buckets=num_buckets)
