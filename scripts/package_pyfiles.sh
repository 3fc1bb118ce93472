#!/usr/bin/env bash
# Build the --py-files archive for cluster submission:
#   ./scripts/package_pyfiles.sh [out.zip]
#   spark-submit --py-files dist/krt_spark.zip scripts/run_job.py --input ... \
#       --out ... --checkpoint ...
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-dist/krt_spark.zip}"
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
zip -qr "$OUT" key_resource_table_extractor_spark -x '*__pycache__*'
echo "$OUT"
