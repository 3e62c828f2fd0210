#!/usr/bin/env bash
# sf1 scale gate: re-run the FULL bench suite on the 10x GenScale fixture
# and diff against the committed sf1 numbers (bench_sf1.json @ HEAD), so
# every round re-proves the scale story instead of trusting r18's one-off.
#
# Usage: tools/scale_gate.sh [fixtureDir]     (default /tmp/graft-sf1)
#   - builds the fixture with Test/runMain graft.GenScale if missing
#   - runs graft.Bench at local[32] against it -> bench_sf1.json
#   - prints per-entry ratios vs the committed bench_sf1.json and appends
#     a summary section to BENCH_NOTES.md
#   - exits 1 if any entry regressed >2x vs its committed sf1 time
#     (fixed-cost entries under 0.3s are exempt: scheduling noise)
set -euo pipefail
cd "$(dirname "$0")/.."

FIXTURE="${1:-/tmp/graft-sf1}"
SRC_SF="${SPARK_GRAFT_SRC_SF:-/root/testdata/sf0.1}"

if [ ! -d "$FIXTURE" ] || [ -z "$(ls -A "$FIXTURE" 2>/dev/null)" ]; then
  echo "[scale_gate] building 10x fixture at $FIXTURE from $SRC_SF"
  sbt -batch "Test/runMain graft.GenScale $SRC_SF $FIXTURE 10"
fi

# Bench overwrites bench_out.json in place; stash the committed sf0.1
# artifact around the sf1 run.
git show HEAD:bench_out.json > /tmp/bench_out.committed.json 2>/dev/null || true
SPARK_GRAFT_SF_DIR="$FIXTURE" sbt -batch -J-Xmx8g "runMain graft.Bench"
mv bench_out.json bench_sf1.json
[ -s /tmp/bench_out.committed.json ] && cp /tmp/bench_out.committed.json bench_out.json

git show HEAD:bench_sf1.json > /tmp/bench_sf1.committed.json 2>/dev/null || echo "{}" > /tmp/bench_sf1.committed.json

python3 - "$FIXTURE" <<'EOF'
import json, sys, datetime

fixture = sys.argv[1]
cur = json.load(open("bench_sf1.json"))
try:
    prev = json.load(open("/tmp/bench_sf1.committed.json"))
except Exception:
    prev = {}
curq = cur.get("queries", {})
prevq = prev.get("queries", {}) if isinstance(prev, dict) else {}

rows, regressions = [], []
# A baseline entry missing from the current run is a silent coverage
# shrink (a query the harness stopped emitting) — exactly what the gate
# exists to catch.
for name in sorted(set(prevq) - set(curq)):
    regressions.append((name, "MISSING from current run"))
for name in sorted(curq):
    c = curq[name]
    p = prevq.get(name)
    if c is None or c < 0:
        regressions.append((name, "FAILED"))
        continue
    if p and p > 0:
        r = c / p
        rows.append((name, c, p, r))
        # >2x on a non-trivial entry = a real scale regression; sub-0.3s
        # entries are dominated by fixed scheduling cost and jitter.
        if r > 2.0 and c >= 0.3:
            regressions.append((name, f"{p:.2f}s -> {c:.2f}s ({r:.2f}x)"))
    else:
        rows.append((name, c, None, None))

total = cur.get("value", -1)
ptotal = prev.get("value") if isinstance(prev, dict) else None
worst = sorted((r for r in rows if r[3]), key=lambda r: -r[3])[:5]
stamp = datetime.date.today().isoformat()

lines = [
    "",
    f"## {stamp}: sf1 scale gate (tools/scale_gate.sh, fixture {fixture})",
    "",
    f"Total {total:.1f} s over {len(curq)} entries"
    + (f" (committed sf1: {ptotal:.1f} s, {total/ptotal:.2f}x)" if ptotal and ptotal > 0 else " (first committed sf1 baseline)")
    + ".",
]
if worst:
    lines.append("Largest movers vs committed sf1: "
                 + ", ".join(f"{n} {r:.2f}x ({p:.2f}->{c:.2f}s)" for n, c, p, r in worst) + ".")
if regressions:
    lines.append("REGRESSIONS (>2x, >=0.3s): "
                 + "; ".join(f"{n}: {d}" for n, d in regressions) + ".")
else:
    lines.append("No entry regressed >2x vs its committed sf1 time; gate PASS.")
with open("BENCH_NOTES.md", "a") as f:
    f.write("\n".join(lines) + "\n")
print("\n".join(lines))
sys.exit(1 if regressions else 0)
EOF
