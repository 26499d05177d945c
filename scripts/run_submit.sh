#!/usr/bin/env bash
# Package the engine and run the pipeline via spark-submit --py-files
# (north_rule deployment shape). Local fallback master; on a cluster
# pass SPARK_MASTER=spark://... or yarn.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/a_tree_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" a_tree_spark -x '*__pycache__*'

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
    --master "$MASTER" \
    --py-files "$ZIP" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
    --conf spark.driver.memory="${DRIVER_MEM:-16g}" \
    scripts/submit_pipeline.py "$@"
