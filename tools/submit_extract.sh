#!/usr/bin/env bash
# Submit the extraction job to a running Ray cluster (the north rule's
# `ray job submit` shape). The CLI attaches via RAY_ADDRESS, which the
# job runner presets on the driver node; the same command line runs
# unchanged in local mode (RAY_ADDRESS=local).
#
# Usage: tools/submit_extract.sh <cluster-address> <input.parquet> <out-dir> [extra CLI flags...]
#   e.g. tools/submit_extract.sh http://head:8265 s3://bucket/transcripts/ /mnt/out --set n_parts=4096
#
# The job is resumable: resubmitting after a failure skips committed
# partitions (per-partition manifests record lineage + metrics).
set -euo pipefail
ADDR="$1"; INPUT="$2"; OUT="$3"; shift 3
exec ray job submit \
  --address "$ADDR" \
  --working-dir "$(cd "$(dirname "$0")/.." && pwd)" \
  -- python -m pdf_toolkit_ray extract --input "$INPUT" --out "$OUT" "$@"
