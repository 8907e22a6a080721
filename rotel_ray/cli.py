"""CLI entry — the ``rotel start`` analogue, runnable via ``ray job submit``.

The reference boots from clap args (src/bin/rotel/main.rs + src/init/args.rs:
receivers/exporters/batch flags). Batch restatement: one command that builds
the flagship Dataset pipeline from flags and runs it to completion:

    ray job submit -- python -m rotel_ray.cli \
        --input /data/transcripts --out /data/out --waves 16 --resume

Owns the Ray session (guarded init — the driver/pytest own their own).
Exit code 0 only after every wave's manifest record is committed.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rotel-ray",
        description="Ray-Data-native parse -> enrich -> route -> aggregate job",
    )
    p.add_argument("--input", help="directory of input transcript parquet")
    p.add_argument("--out", help="output directory (sinks + manifest / query result parquet)")
    p.add_argument("--query", default=None, metavar="NAME",
                   help="run one registry pipeline (rotel_ray.queries.QUERIES) over "
                        "--sf-dir instead of the flagship job; writes parquet to --out "
                        "if given, else prints row count + head")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="table directory for --query runs")
    p.add_argument("--list-queries", action="store_true",
                   help="print the registry names and exit")
    p.add_argument("--waves", type=int, default=4,
                   help="checkpoint granularity: input files are split into this many waves")
    p.add_argument("--batch-size", type=int, default=16384,
                   help="rows per parse/enrich batch (the --batch-max-size analogue)")
    p.add_argument("--enrich-concurrency", type=int, default=4,
                   help="actor-pool size when --enrich-compute=actors")
    p.add_argument("--enrich-compute", choices=["tasks", "actors"], default="tasks")
    p.add_argument("--resource-attrs", default=None,
                   help="k=v,k=v upserted onto every row (--otel-resource-attributes)")
    p.add_argument("--resume", action="store_true",
                   help="skip waves already committed in the manifest")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus when this process owns the session")
    p.add_argument("--compact-target-bytes", type=int, default=None,
                   metavar="N",
                   help="instead of running a job, compact --input's small "
                        "parquet files into --out (one file per ~N compressed "
                        "bytes; parallel Ray tasks)")
    p.add_argument("--overwrite-out", action="store_true",
                   help="allow --compact-target-bytes to replace an existing "
                        "non-empty --out directory")
    p.add_argument("--ddl", default=None, choices=["traces", "logs", "metrics"],
                   help="print the ClickHouse CREATE TABLE statements for a "
                        "signal and exit (the clickhouse-ddl create analogue)")
    p.add_argument("--ddl-database", default="otel")
    p.add_argument("--ddl-table-prefix", default="otel")
    p.add_argument("--ddl-engine", default="MergeTree",
                   choices=["MergeTree", "ReplicatedMergeTree", "Null"])
    p.add_argument("--ddl-cluster", default=None)
    p.add_argument("--ddl-ttl-secs", type=int, default=0)
    p.add_argument("--ddl-enable-json", action="store_true")
    return p


def parse_resource_attrs(s: str | None) -> dict | None:
    """k=v,k=v parsing (src/init/parse.rs semantics: split on ',', then '=')."""
    if not s:
        return None
    out = {}
    for part in s.split(","):
        if not part.strip():
            continue
        if "=" not in part:
            raise ValueError(f"bad resource attr {part!r} (want k=v)")
        k, v = part.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def _run_query(args) -> int:
    """One registry pipeline over --sf-dir (the per-operator CLI surface)."""
    from .queries import QUERIES

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; use --list-queries", file=sys.stderr)
        return 2
    res = QUERIES[args.query](args.sf_dir)
    if args.out and hasattr(res, "write_parquet"):
        res.write_parquet(args.out)
        print(json.dumps({"query": args.query, "out": args.out}))
        return 0
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    print(json.dumps({"query": args.query, "rows": len(df)}))
    print(df.head(10).to_string())
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.list_queries:
        from .queries import QUERIES

        print("\n".join(sorted(QUERIES)))
        return 0
    if args.ddl:
        from .stages.ch_ddl import get_ddl

        for stmt in get_ddl(args.ddl, cluster=args.ddl_cluster,
                            database=args.ddl_database,
                            table_prefix=args.ddl_table_prefix,
                            engine=args.ddl_engine, ttl_secs=args.ddl_ttl_secs,
                            use_json=args.ddl_enable_json):
            print(stmt)
        return 0
    if args.query is None and not (args.input and args.out):
        print("either --query NAME or both --input and --out are required", file=sys.stderr)
        return 2
    attrs = parse_resource_attrs(args.resource_attrs)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    if args.query is not None:
        rc = _run_query(args)
        if owns_session:
            ray.shutdown()
        return rc

    if args.compact_target_bytes is not None:
        from .stages.compact import compact_files

        res = compact_files(args.input, args.out,
                            target_bytes=args.compact_target_bytes,
                            overwrite=args.overwrite_out)
        print(json.dumps({"compacted": args.input, "out": args.out, **res}))
        if owns_session:
            ray.shutdown()
        return 0

    from .pipelines.flagship import run_flagship

    totals = run_flagship(
        args.input,
        args.out,
        waves=args.waves,
        enrich_concurrency=args.enrich_concurrency,
        batch_size=args.batch_size,
        resume=args.resume,
        resource_attrs=attrs,
        enrich_compute=args.enrich_compute,
    )
    print(json.dumps(totals))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
