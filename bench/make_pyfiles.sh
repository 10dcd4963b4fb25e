#!/usr/bin/env bash
# Build the spark-submit artifact (north_rule: ships via --py-files).
#   ./bench/make_pyfiles.sh && spark-submit --py-files dist/fts_spark.zip \
#       -m fulltextsearch_spark.cli index --input ... --root ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/fts_spark.zip
zip -qr dist/fts_spark.zip fulltextsearch_spark -x '*__pycache__*'
echo "dist/fts_spark.zip:"
unzip -l dist/fts_spark.zip | tail -3
