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
    p.add_argument("--input", required=True, help="directory of input transcript parquet")
    p.add_argument("--out", required=True, help="output directory (sinks + manifest)")
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


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    attrs = parse_resource_attrs(args.resource_attrs)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

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
