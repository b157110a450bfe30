#!/usr/bin/env bash
# North-rule deployment surface: the same pipeline, shipped to a real
# multi-executor cluster via spark-submit --py-files.
#
#   tools/submit.sh <master-url> <web_pages_path> <out_dir> [executors]
#
# Packages graphrag_kb_server_spark into a zip, submits
# tools/submit_index_job.py, and sizes shuffle partitions to the
# cluster (2x total cores; AQE coalesces down at runtime).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
INPUT="${2:-/root/testdata/sf0.001}"
OUT="${3:-/tmp/kgspark_submit_out}"
EXECUTORS="${4:-4}"
CORES_PER_EXEC="${CORES_PER_EXEC:-4}"
ZIP="$(mktemp -d)/graphrag_kb_server_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" graphrag_kb_server_spark)

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --num-executors "$EXECUTORS" \
  --executor-cores "$CORES_PER_EXEC" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="$((EXECUTORS * CORES_PER_EXEC * 2))" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/tools/submit_index_job.py" "$INPUT" "$OUT"
