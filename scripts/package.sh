#!/usr/bin/env bash
# Build dist/ocr_spark.zip for spark-submit --py-files.
# The zip contains only the package (no tests/fixtures) — executors import
# ocr_spark.* from it; the driver script is ocr_spark/job.py.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ocr_spark.zip
# -x: no bytecode caches; deterministic content order via find|sort
find ocr_spark -name '*.py' | sort | zip -q -X dist/ocr_spark.zip -@
echo "dist/ocr_spark.zip ($(unzip -l dist/ocr_spark.zip | tail -1 | awk '{print $2}') files)"
