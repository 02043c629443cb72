#!/usr/bin/env bash
# Build dist/kaskada_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kaskada_spark.zip
# zip the package (no tests, no caches) — zipimport-able as-is
find kaskada_spark -name '__pycache__' -prune -o -name '*.py' -print \
  | zip -q dist/kaskada_spark.zip -@
echo "dist/kaskada_spark.zip ($(du -h dist/kaskada_spark.zip | cut -f1))"
