#!/bin/bash
# One-command bench hygiene: run the full catalog bench at sf0.1,
# dump the CURRENT oracle SQL catalog, and regenerate BENCH_COMPARE.md
# so every round records the Spark-vs-DuckDB ratio for the catalog as
# it exists now (a stale BENCH_COMPARE.md silently under-reports new
# queries). Usage: scripts/bench_all.sh [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
OUT=/tmp/bench_all_out
mkdir -p "$OUT"
# Bench prints the full per-query line first and a compact tail line
# last (driver tail-capture hygiene); the full line is also persisted
# via SPARK_GRAFT_BENCH_JSON — use that, not a grep over stdout.
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_JSON="$OUT/bench.json" \
  sbt -batch "runMain graft.Bench" | tail -5
sbt -batch "runMain graft.DumpOracle $OUT" > /dev/null
python3 scripts/bench_compare.py "$SF" "$OUT" "$OUT/bench.json"
echo "BENCH_COMPARE.md regenerated from $OUT/bench.json"
