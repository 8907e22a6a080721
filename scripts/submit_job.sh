#!/usr/bin/env bash
# Submit the flagship job to a Ray cluster via `ray job submit` — the
# multi-node execution path of the north rule. On a real cluster set
# RAY_ADDRESS to the head node's dashboard address (http://<head>:8265);
# in this sandbox Ray runs local-only, so the same entrypoint degrades to a
# single-node run (`python -m rotel_ray.cli` owns the session).
#
# Usage:
#   scripts/submit_job.sh INPUT_DIR OUT_DIR [WAVES] [extra cli flags...]
#
# The job is resumable: re-submitting with --resume (default here) skips
# waves whose manifest records are committed, so a preempted job continues
# where it stopped — the cluster-restart story for a 100 TB run.
set -euo pipefail

INPUT=${1:?input dir}
OUT=${2:?output dir}
WAVES=${3:-16}
shift $(( $# < 3 ? $# : 3 ))

if [ -n "${RAY_DASHBOARD_ADDRESS:-}" ]; then
  exec ray job submit --address "$RAY_DASHBOARD_ADDRESS" \
      --working-dir "$(dirname "$(dirname "$(readlink -f "$0")")")" \
      -- python -m rotel_ray.cli --input "$INPUT" --out "$OUT" \
         --waves "$WAVES" --resume "$@"
else
  exec python -m rotel_ray.cli --input "$INPUT" --out "$OUT" \
       --waves "$WAVES" --resume "$@"
fi
