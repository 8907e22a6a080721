"""rotel_ray — a Ray-Data-native log/telemetry processing engine.

A brand-new implementation of the query/data-processing capabilities of
streamfold/rotel (an OpenTelemetry collector), re-expressed as batch
``parse -> enrich -> route -> aggregate`` pipelines over Parquet tables of
multi-turn conversation/agent transcripts, built on ``ray.data.Dataset``.

Architecture (Ray-Data-first, NOT a port):

- Sources are Parquet/text files read with ``ray.data.read_parquet`` /
  ``read_text`` (the batch analogue of rotel's receivers).
- Per-record transforms are vectorized ``map_batches`` stages over zero-copy
  Arrow batches (``pyarrow.compute`` kernels; RE2 regex via
  ``pc.extract_regex``).
- Stateful stages (lookup enrichment, compiled pattern sets) are callable
  classes run as actor pools (``map_batches(Cls, concurrency=N)``).
- Routing fans enriched rows out to per-sink Parquet exporters
  (traces/logs/metrics analogues of rotel's exporters).
- Aggregation is two-phase (per-batch combiner + bucketed merge) with an
  optional salt for global hot keys, so skewed keys never flood a reducer.
- A checkpoint manifest records per-partition lineage + stage metrics so a
  partially-completed job resumes without duplicating output.

Reference semantics are cited per-module as ``file:line`` into
``/root/reference`` (streamfold/rotel @ 2026-04-24).
"""

__version__ = "0.1.0"
