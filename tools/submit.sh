#!/usr/bin/env bash
# Package the engine and launch via spark-submit --py-files — the
# deployment path the north rule specifies for multi-executor clusters.
#
#   tools/submit.sh <entry.py> [--master spark://... ] [extra spark-submit args]
#
# Example (two cluster sizes for the scaling measurement):
#   tools/submit.sh tools/scaling_bench.py --master yarn --num-executors 8
#   tools/submit.sh tools/scaling_bench.py --master yarn --num-executors 32
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ENTRY="${1:?usage: submit.sh <entry.py> [spark-submit args]}"
shift || true

ZIP="$(mktemp -d)/gdal_spark.zip"
(cd "$REPO" && zip -q -r "$ZIP" gdal_spark -x '*__pycache__*')

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=65536 \
  --conf spark.sql.execution.arrow.maxBytesPerBatch=2147483647 \
  --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=1073741824 \
  --conf spark.executorEnv.MALLOC_TRIM_THRESHOLD_=1073741824 \
  "$ENTRY" "$@"
