#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployment (north rule:
# "runs via spark-submit --py-files on multi-executor clusters").
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/deep_reason_spark.zip
zip -qr dist/deep_reason_spark.zip deep_reason_spark -x '*__pycache__*'
echo "built dist/deep_reason_spark.zip"
echo
echo "deploy example:"
echo "  spark-submit \\"
echo "    --py-files dist/deep_reason_spark.zip \\"
echo "    --conf spark.sql.adaptive.enabled=true \\"
echo "    --conf spark.sql.adaptive.skewJoin.enabled=true \\"
echo "    --conf spark.sql.shuffle.partitions=<2-3x total cores> \\"
echo "    --conf spark.sql.files.maxPartitionBytes=134217728 \\"
echo "    jobs/run_pipeline.py --input <iceberg/parquet repo_files> --output <dir>"
