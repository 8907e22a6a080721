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

    {partition_id, input_fragments, status, rows_in, rows_parsed,
     rows_failed, sink_counts: {sink: n}, sink_files, wall_ms}

Appends are atomic at the OS level (single O_APPEND write < PIPE_BUF for
records this size); a torn trailing line is ignored on load.
"""

from __future__ import annotations

import json
import os
import time


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

    def is_done(self, partition_id: int) -> bool:
        return partition_id in self._done

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
