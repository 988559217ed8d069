#!/usr/bin/env bash
# Round close-out gate (VERDICT r14 #3): the end-of-round snapshot
# commit must not be made unless this script exits 0. It re-derives
# every round artifact at HEAD so none of them can rot a round behind
# the code again (EXPLAINS/COVERAGE went stale in r9-r12 and again in
# r14, each time one round after being fixed by hand).
#
# Usage: bash tools/closeout.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT=/tmp/verify_closeout

echo "== 1/4 full test suite (must be green) =="
sbt -batch test

echo "== 2/4 full Verify + DuckDB oracle compare at $SF =="
sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/check_correctness.py "$SF" "$OUT" /tmp/correctness_closeout.json \
  | tail -3
python3 - <<'EOF'
import json
r = json.load(open('/tmp/correctness_closeout.json'))
bad = {k: v for k, v in r.items()
       if not (v.get('rows_match') and v.get('schema_match')
               and v.get('hash_match'))}
assert not bad, f"non-green correctness rows: {sorted(bad)}"
print(f"correctness: {len(r)}/{len(r)} green")
EOF

echo "== 3/4 regenerate EXPLAINS.md at HEAD (AQE final plans, sf0.1) =="
sbt -batch "runMain graft.tools.ExplainDump /root/testdata/sf0.1 EXPLAINS.md"
grep -qi "CartesianProduct" EXPLAINS.md && {
  echo "FATAL: cartesian product in a dumped plan"; exit 1; } || true

echo "== 4/4 regenerate COVERAGE.md from the freshest correctness json =="
python3 tools/gen_coverage.py . /tmp/correctness_closeout.json

echo "== 5/5 bench artifact provenance (r16 verdict #1) =="
# bench_full.json must be measured at the driver's parallelism — r16's
# "canonical" quiet sweep silently ran local[4] (a drifted Bench-local
# default) and broke cross-round comparability. Bench now shares
# GraftSession's builder; this asserts the committed artifact agrees.
python3 - <<'EOF'
import json
b = json.load(open('bench_full.json'))
cpus = str(b.get('cpus', ''))
assert cpus == '32', (
    f"bench_full.json measured at cpus={cpus!r}, expected 32 — "
    "re-sweep with the unified GraftSession builder (no SPARK_GRAFT_CPUS "
    "override) before snapshotting")
if 'warning' in b:
    print(f"NOTE: bench_full.json carries a contention warning: "
          f"{b['warning'][:120]}... — prefer a quieter sweep")
print(f"bench provenance: cpus={cpus} OK")
EOF

echo "closeout: ALL GATES GREEN — safe to snapshot-commit"
