#!/usr/bin/env bash
# Pre-snapshot gate: never commit a snapshot from a tree that can't compile
# or can't run a single Verify entry end-to-end. (Round 11 lost its entire
# correctness artifact to a 22-line diff committed uncompiled.)
#
# Usage: tools/presnapshot.sh [queryName]   (default smoke: q01_scan_project)
set -euo pipefail
cd "$(dirname "$0")/.."

SMOKE="${1:-q01_scan_project}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}"

sbt -batch Test/compile

out="$(mktemp -d)"
log="$(mktemp)"
sbt -batch "runMain graft.Verify $SF_DIR $out $SMOKE" 2>&1 | tee "$log"

if ! test -f "$out/$SMOKE/_SUCCESS"; then
  echo "PRESNAPSHOT GATE FAIL: $SMOKE produced no parquet output" >&2
  exit 1
fi
if grep -q "\[verify\] .* failed" "$log"; then
  echo "PRESNAPSHOT GATE FAIL: verify reported a query error" >&2
  exit 1
fi
echo "PRESNAPSHOT GATE OK ($SMOKE on $SF_DIR)"
