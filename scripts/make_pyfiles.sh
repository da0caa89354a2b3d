#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/rove_spark.zip
zip -qr dist/rove_spark.zip rove_spark -x '*__pycache__*'
echo "dist/rove_spark.zip"
