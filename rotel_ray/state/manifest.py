"""Checkpoint manifest: per-partition lineage + stage metrics + resume.

Batch translation of the reference's offset tracking (min-pending-offset
watermark per Kafka partition / file, persisted periodically to JSON:
src/receivers/kafka/offset_tracker.rs:8-20,118,
src/receivers/file/persistence/json_file.rs:25-120). In a batch job the
"offset" is the input partition itself: a partition is marked done only
after its sink files have landed (atomic rename), so resume = skip done
partitions, and Ray task retries + reruns are both covered by the same
idempotent-output mechanism (SURVEY.md §4 checkpoint row).

Manifest is an append-only JSONL file; each record (FIXTURES.md §5):

    {partition_id, input_fragments, input_fingerprints, status, rows_in,
     rows_parsed, rows_failed, sink_counts: {sink: n}, sink_files, wall_ms}

Appends are atomic at the OS level (single O_APPEND write < PIPE_BUF for
records this size); a torn trailing line is ignored on load.

Resume safety (round 4): each commit records a per-fragment fingerprint
(path, size, mtime_ns) — the batch analogue of the reference's
device+inode file re-identification
(src/receivers/file/receiver.rs:129-157). ``is_done(w, fragments)``
treats a committed wave as done only if every input fragment still
matches its recorded fingerprint, so replacing an input file between
runs forces exactly that wave to recompute instead of silently keeping
stale outputs.
"""

from __future__ import annotations

import json
import os
import time


def fragment_fingerprints(paths: list[str]) -> list[dict]:
    """Per-fragment identity (path, byte size, mtime_ns). size+mtime_ns
    catches both in-place rewrites and replacements without reading data
    (a content hash would re-read the whole input every resume)."""
    out = []
    for p in paths:
        st = os.stat(p)
        out.append({"path": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns})
    return out


class Manifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._done: dict[int, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn trailing line from a killed run
                    if rec.get("status") == "done":
                        self._done[rec["partition_id"]] = rec

    def is_done(self, partition_id: int,
                input_fragments: list[str] | None = None) -> bool:
        """Committed AND (when ``input_fragments`` is given) every fragment
        still matches the fingerprint recorded at commit time. A wave whose
        input changed (or whose record predates fingerprinting) is treated
        as not-done and recomputes; its new commit supersedes the old
        record (load keeps the last record per partition)."""
        rec = self._done.get(partition_id)
        if rec is None:
            return False
        if input_fragments is None:
            return True
        recorded = rec.get("input_fingerprints")
        if recorded is None:
            return False  # pre-fingerprint record: can't prove freshness
        try:
            return recorded == fragment_fingerprints(input_fragments)
        except OSError:
            return False  # an input fragment disappeared

    def done_records(self) -> list[dict]:
        return list(self._done.values())

    def commit(
        self,
        partition_id: int,
        input_fragments: list[str],
        rows_in: int,
        rows_parsed: int,
        rows_failed: int,
        sink_counts: dict[str, int],
        sink_files: list[str],
        wall_ms: int,
    ) -> dict:
        rec = {
            "partition_id": partition_id,
            "input_fragments": input_fragments,
            "input_fingerprints": fragment_fingerprints(input_fragments),
            "status": "done",
            "rows_in": rows_in,
            "rows_parsed": rows_parsed,
            "rows_failed": rows_failed,
            "sink_counts": sink_counts,
            "sink_files": sink_files,
            "wall_ms": wall_ms,
            "committed_at": time.time(),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._done[partition_id] = rec
        return rec

    def totals(self) -> dict:
        """Aggregate counters across committed partitions (the
        rotel_exporter_sent_* parity totals)."""
        out: dict = {"rows_in": 0, "rows_parsed": 0, "rows_failed": 0, "sink_counts": {}}
        for rec in self._done.values():
            out["rows_in"] += rec["rows_in"]
            out["rows_parsed"] += rec["rows_parsed"]
            out["rows_failed"] += rec["rows_failed"]
            for s, n in rec["sink_counts"].items():
                out["sink_counts"][s] = out["sink_counts"].get(s, 0) + n
        return out
