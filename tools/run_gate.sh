#!/bin/bash
# Full local correctness gate under a RECORDED wall-clock budget
# (r14 verdict #1c: the driver's r14 artifact came back empty with the
# engine green — wall-clock was the likely mechanism, so the budget is
# now a first-class gate: exceeding it fails this script even when
# every query passes, forcing the slow tail to be trimmed BEFORE the
# driver's sweep silently times out).
#
# Usage: tools/run_gate.sh [sfDir] [outDir]
# Exit: 0 = all queries pass AND both stages inside budget
#       1 = compare failures or budget exceeded
#       2 = dump crashed
set -u
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/vout_gate}
HERE=$(dirname "$0")
DUMP_BUDGET=$(python3 -c "import json;print(json.load(open('$HERE/gate_budget.json'))['dump_wall_s'])")
CMP_BUDGET=$(python3 -c "import json;print(json.load(open('$HERE/gate_budget.json'))['compare_wall_s'])")

# Post-certification drift guard (r16): show what changed in production
# files since the last green gate, so a post-cert code commit can't slip
# silently — anything listed here is being (re)certified by this run.
if [ -f "$HERE/certified_sha" ]; then
  DRIFT=$(git -C "$HERE/.." diff --stat "$(cat "$HERE/certified_sha")" -- \
    src/main tools build.sbt 2>/dev/null | tail -5)
  if [ -n "$DRIFT" ]; then
    echo "production drift since certified SHA $(cat "$HERE/certified_sha"):"
    echo "$DRIFT"
  else
    echo "no production drift since certified SHA $(cat "$HERE/certified_sha")"
  fi
fi

# ALWAYS start clean: stale dumps under a failed compile would "pass"
rm -rf "$OUT"
t0=$(date +%s)
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-4} sbt -batch "runMain graft.Verify $SF $OUT" || exit 2
t1=$(date +%s); DUMP=$((t1 - t0))
python3 "$HERE/compare_oracle.py" "$SF" "$OUT"
CMP_RC=$?
t2=$(date +%s); CMP=$((t2 - t1))

echo "gate wall: dump=${DUMP}s (budget ${DUMP_BUDGET}s), compare=${CMP}s (budget ${CMP_BUDGET}s)"
FAIL=$CMP_RC
if [ "$DUMP" -gt "$DUMP_BUDGET" ]; then
  echo "GATE BUDGET EXCEEDED: dump ${DUMP}s > ${DUMP_BUDGET}s — trim the slow tail ($OUT/timings.json, slowest first)"
  FAIL=1
fi
if [ "$CMP" -gt "$CMP_BUDGET" ]; then
  echo "GATE BUDGET EXCEEDED: compare ${CMP}s > ${CMP_BUDGET}s — see 'slowest oracles' line; MATERIALIZE multi-referenced CTEs"
  FAIL=1
fi

if [ "$FAIL" -eq 0 ]; then
  # Refresh the committed dump-cost snapshot (Verify submits cheapest-first
  # from it, so a wall-clock kill loses only the expensive tail) and record
  # the certified tree.
  cp "$OUT/timings.json" "$HERE/gate_timings.json"
  git -C "$HERE/.." rev-parse HEAD > "$HERE/certified_sha" 2>/dev/null || true
  echo "gate green: refreshed tools/gate_timings.json; certified SHA $(cat "$HERE/certified_sha" 2>/dev/null)"
fi
exit $FAIL
