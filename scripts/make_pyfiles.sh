#!/bin/sh
# Build the --py-files payload: the package plus the driver-contract
# module, importable on every executor without a repo checkout.
set -e
OUT="${1:-/tmp/pyshepseg_spark.zip}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
rm -f "$OUT"
cd "$ROOT"
zip -qr "$OUT" pyshepseg_spark -x '*__pycache__*'
zip -qj "$OUT" __spark_entry__.py
echo "$OUT"
