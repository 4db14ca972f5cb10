#!/usr/bin/env bash
# North-rule submission mode: run the bench via spark-submit --py-files with
# the engine packaged as a zip (exactly how a multi-executor cluster would
# receive it — executors unpack gmx.zip onto their PYTHONPATH).
#
# Usage: tools/submit_bench.sh [cpus] [extra spark-submit args...]
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${1:-${SPARK_GRAFT_CPUS:-8}}"
shift || true

ZIP=/tmp/gmx-pkg.zip
rm -f "$ZIP"
(cd . && zip -qr "$ZIP" gmx -x '*__pycache__*')

SPARK_GRAFT_CPUS="$CPUS" exec spark-submit \
  --master "local[$CPUS]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="$((CPUS * 2))" \
  "$@" \
  bench.py
