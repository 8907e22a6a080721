"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().

- ``entry()``: flagship parse→enrich→route→aggregate pipeline over the
  deterministic synthetic transcript table at sf0.001 scale (the transcript
  corpus of BASELINE.json's input_hint — synthesized by
  rotel_ray.generator, no external data).
- ``queries()``: one entry per implemented operator/pipeline (SURVEY.md §2).
- ``oracle_sql()``: matching DuckDB SQL per query (column names/types align
  by construction). Every query carries an exact oracle — the approximate
  ANN paths run over planted fixtures that make them exactly checkable
  (rotel_ray/stages/planted.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from rotel_ray.generator import ensure_transcripts
    from rotel_ray.pipelines.flagship import build_routed
    from rotel_ray.stages.aggregate import conv_aggregate

    path = ensure_transcripts("/root/testdata/sf0.001")
    routed = build_routed(path, enrich_concurrency=2)
    return conv_aggregate(routed).sort("conv_id")


def queries() -> dict[str, Callable[[str], Any]]:
    from rotel_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rotel_ray.queries import oracle_sql as _o

    return _o()
