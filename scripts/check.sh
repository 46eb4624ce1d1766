#!/bin/bash
# Local feedback loop mirroring the driver's gate:
#   sbt Verify @ sf0.01 -> DuckDB compare
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
sbt -batch --error "runMain graft.Verify $SF $OUT"
python3 scripts/compare.py "$SF" "$OUT"
