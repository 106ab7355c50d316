#!/usr/bin/env bash
# Differential fuzz gate: generate SPARK_GRAFT_FUZZ_CASES (default 100)
# random cases per template from SPARK_GRAFT_FUZZ_SEED (default 7), dump
# each case's Spark result, then replay every case's oracle SQL in DuckDB
# and hash-compare — the same machinery as the driver's t2 gate, pointed
# at generated queries instead of the fixed inventory.
#
#   tools/fuzz_replay.sh                         # sf0.001, seed 7, 100/template
#   SPARK_GRAFT_FUZZ_SEED=42 tools/fuzz_replay.sh /root/testdata/sf0.01
#
# Exits non-zero on any rows/schema/hash mismatch.
set -euo pipefail
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/graft_fuzz_$(basename "$SF")_seed${SPARK_GRAFT_FUZZ_SEED:-7}}
cd "$(dirname "$0")/.."
rm -rf "$OUT"
sbt -batch "runMain graft.tools.Fuzz $SF $OUT" >/dev/null
python3 tools/selfcheck.py "$SF" "$OUT"
