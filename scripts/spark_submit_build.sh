#!/usr/bin/env bash
# Package lucene_spark and run the index build via spark-submit --py-files
# (north rule: multi-executor execution path). In the sandbox the master is
# local[N]; on a cluster set SPARK_MASTER (e.g. yarn / k8s://... / spark://).
#
#   scripts/spark_submit_build.sh INPUT_PARQUET OUT_DIR [build_job.py args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/lucene_spark_pkg.zip"
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" lucene_spark -x '*__pycache__*')
exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO/scripts/build_job.py" "$@"
