#!/usr/bin/env bash
# Cluster deployment (north_rule: spark-submit --py-files at N and 4N
# executors).  Packages the engine as a zip and submits the flagship job.
#
#   ./tools/submit_example.sh spark://master:7077 8     # N executors
#   ./tools/submit_example.sh spark://master:7077 32    # 4N executors
#
# In this sandbox there is no cluster manager; local[8]/local[32] runs in
# bench.py follow the same protocol (BASELINE.md).
set -euo pipefail
MASTER=${1:-"local[8]"}
EXECUTORS=${2:-8}
cd "$(dirname "$0")/.."
rm -f /tmp/xagg_spark.zip
zip -qr /tmp/xagg_spark.zip xagg_spark -x '*__pycache__*'
exec spark-submit \
  --master "$MASTER" \
  --num-executors "$EXECUTORS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files /tmp/xagg_spark.zip \
  tools/flagship_job.py
