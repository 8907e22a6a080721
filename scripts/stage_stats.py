"""Per-stage wall-time audit via Dataset.stats().

Runs the flagship routed pipeline and one wide query at $GRAFT_SF_DIR
(default sf0.1) and prints each operator's wall time — the evidence loop for
"iterate until wall time is dominated by useful compute". Usage:

    python scripts/stage_stats.py [query ...]     # default: flagship dedup_minhash
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def summarize(stats: str) -> str:
    """Condense Dataset.stats() to one line per operator: header wall-clock
    ("... produced in Xs"), summed remote wall, UDF time and row count."""
    out = []
    for block in re.split(r"\n(?=Operator )", stats):
        m = re.match(r"Operator (\d+) (.+?): (\d+) tasks executed, \d+ blocks produced in ([\d.]+)s",
                     block)
        if not m:
            allto = re.match(r"Operator (\d+) (\S+): executed in ([\d.]+)s", block)
            if allto:  # AllToAll operators (Sort / shuffle) have no task header
                out.append(f"  op{allto.group(1)} {allto.group(2)}: clock={allto.group(3)}s"
                           " (all-to-all)")
            continue
        remote = re.search(r"Remote wall time: .*?, ([\d.]+[a-z]+) total", block)
        udf = re.search(r"UDF time: .*?, ([\d.]+[a-z]+) total", block)
        rows = re.search(r"Output num rows per block: .*?, (\d+) total", block)
        out.append(
            f"  op{m.group(1)} {m.group(2)[:68]}: clock={m.group(4)}s tasks={m.group(3)}"
            f" remote_wall={remote.group(1) if remote else '?'}"
            f" udf={udf.group(1) if udf else '?'} rows={rows.group(1) if rows else '?'}")
    return "\n".join(out)


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from rotel_ray.generator import ensure_transcripts
    from rotel_ray.queries import QUERIES

    targets = sys.argv[1:] or ["flagship", "dedup_minhash"]
    for name in targets:
        t0 = time.time()
        if name == "flagship":
            from rotel_ray.pipelines.flagship import build_routed

            tdir = ensure_transcripts(SF_DIR)
            ds = build_routed(tdir)
        else:
            ds = QUERIES[name](SF_DIR)
        # materialize() so stats() reflects the executed plan (count() alone
        # leaves the handle without stats in Ray 2.49); fine for an audit run
        md = ds.materialize()
        print(f"== {name}: {md.count()} rows in {time.time() - t0:.2f}s")
        print(summarize(md.stats()))
    ray.shutdown()


if __name__ == "__main__":
    main()
