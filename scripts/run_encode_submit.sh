#!/usr/bin/env bash
# Launch the encode job via spark-submit --py-files at two parallelism
# levels (N and 4N) — the north rule's launch + scaling evidence surface.
#
# Usage: scripts/run_encode_submit.sh INPUT_DIR OUT_BASE [N] [ZSTD_LEVEL]
set -euo pipefail

INPUT=${1:?input dir}
OUT_BASE=${2:?output base dir}
N=${3:-2}
LEVEL=${4:-15}
FOUR_N=$((4 * N))

cd "$(dirname "$0")/.."
ZIP=/tmp/poc_parquet_aggregator_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" poc_parquet_aggregator_spark -x '*__pycache__*'

export MALLOC_MMAP_THRESHOLD_=268435456 MALLOC_TRIM_THRESHOLD_=268435456

run() {
  local cores=$1 out=$2
  rm -rf "$out"
  spark-submit \
    --master "local[$cores]" \
    --py-files "$ZIP" \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    --conf spark.ui.showConsoleProgress=false \
    scripts/submit_encode.py --input "$INPUT" --out "$out" \
      --zstd-level "$LEVEL" --verify 2>/dev/null | tail -1
}

echo "== local[$N] (N) =="
run "$N" "$OUT_BASE/n$N"
echo "== local[$FOUR_N] (4N) =="
run "$FOUR_N" "$OUT_BASE/n$FOUR_N"
