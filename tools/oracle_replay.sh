#!/usr/bin/env bash
# One-command scale-parity gate: dump every declared query at a given sf
# and replay the driver's DuckDB-oracle compare against the same parquet.
#
#   tools/oracle_replay.sh                        # sf0.01 (the driver's gate)
#   tools/oracle_replay.sh /root/testdata/sf0.1   # 10x scale replay
#
# Exits non-zero on any rows/schema/hash mismatch (selfcheck.py's FAILURES
# count). DuckDB lives on the driver side only, hence the python step —
# the Scala build cannot depend on it (zero-egress environment).
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_verify_$(basename "$SF")}
cd "$(dirname "$0")/.."
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" >/dev/null
python3 tools/selfcheck.py "$SF" "$OUT"
