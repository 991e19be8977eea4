#!/bin/bash
# Chaos test for the bench drift detector (dev tool; not part of the
# shipped library or the driver gate).
#
# The bench trusts no sweep number blindly: each warm time is compared
# against the committed BENCH.json snapshot, and a >2x drift (with a
# 0.5s absolute floor) triggers an isolated re-measure. This script
# proves that machinery end-to-end:
#
#   1. clean bench run  -> becomes the committed snapshot
#      (skipped when REUSE_CLEAN=1 and /tmp/BENCH.json.clean exists)
#   2. chaos bench run  -> SPARK_GRAFT_CHAOS=<n> spawns n busy-loop
#      burner threads during the FIRST sweep only (stopped before the
#      drift pass), inflating sweep timings the way round 6's
#      interference inflated q67 (19.1s vs 3.3s truth)
#   3. assert: at least one query landed in "drift", and every drifted
#      query's FINAL reported warm time is no more than (1+TOL)x the
#      clean snapshot — i.e. the detector caught the lie and the
#      isolated re-measure repaired it. A final BELOW the clean number
#      is a pass: the min-of-attempts re-measure found a truer floor
#      than the clean sweep did (sweep numbers carry noise in both
#      runs; only the isolated re-measure is trustworthy).
#
# Usage: [REUSE_CLEAN=1] scripts/chaos_drift.sh [sf_dir] [burners] [tol]
# Takes 2 bench runs (~10 min each at sf0.1). Restores BENCH.json.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
BURNERS="${2:-64}"   # ~3x CPU oversubscription vs local[32]: most >0.5s queries cross the 2x bar
TOL="${3:-0.5}"      # final <= (1+TOL) * clean per drifted query
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"  # match the driver's bench config

cp BENCH.json /tmp/BENCH.json.pre_chaos

# Scenario 0 (cheap, ~1 min): PRETTY-PRINTED snapshot. Round 11's
# parser split on the literal compact string '"queries":{' — a
# hand-spliced pretty-printed BENCH.json parsed to zero entries and
# silently disabled the whole drift pass for the driver's closing
# sweep. Re-indent the committed snapshot, run one cheap query in
# adjudication mode, and assert the [bench-only] output reports a
# non-empty snapshot (snapshot_entries > 0). Run just this with
# CHAOS_PARSER_ONLY=1.
echo "[chaos] 0/2 pretty-printed snapshot parse ..."
python3 -c "
import json
d = json.load(open('BENCH.json'))
json.dump(d, open('BENCH.json', 'w'), indent=2)  # '\"queries\": {' with spaces + newlines
"
SPARK_GRAFT_BENCH_ONLY=q08_global_count SPARK_GRAFT_SF_DIR="$SF" \
  sbt -batch "runMain graft.Bench" > /tmp/chaos_pretty.log 2>&1 || true
cp /tmp/BENCH.json.pre_chaos BENCH.json   # restore before anything else can fail
python3 - <<'EOF'
import json
# sbt prefixes stdout with "[info] " — locate the marker anywhere in the line
line = next(l for l in open("/tmp/chaos_pretty.log") if "[bench-only] " in l)
d = json.loads(line.split("[bench-only] ", 1)[1])
n = d.get("snapshot_entries", 0)
assert n > 0, (
    f"snapshot_entries={n}: the bench parsed a PRETTY-PRINTED BENCH.json to an empty "
    "snapshot — the drift audit would run blind (the round-11 failure mode)")
print(f"[chaos] 0/2 PASS: pretty-printed snapshot parsed to {n} entries")
EOF
if [[ "${CHAOS_PARSER_ONLY:-0}" == "1" ]]; then
  echo "[chaos] CHAOS_PARSER_ONLY=1 — skipping the two full bench runs"
  exit 0
fi

if [[ "${REUSE_CLEAN:-0}" == "1" && -f /tmp/BENCH.json.clean ]]; then
  echo "[chaos] 1/2 reusing clean snapshot /tmp/BENCH.json.clean"
  cp /tmp/BENCH.json.clean BENCH.json
else
  echo "[chaos] 1/2 clean run (snapshot) at $SF ..."
  SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" > /tmp/chaos_clean.log 2>&1
  cp BENCH.json /tmp/BENCH.json.clean
fi

echo "[chaos] 2/2 chaos run ($BURNERS burners during sweep) ..."
SPARK_GRAFT_CHAOS="$BURNERS" SPARK_GRAFT_SF_DIR="$SF" \
  sbt -batch "runMain graft.Bench" > /tmp/chaos_load.log 2>&1
cp BENCH.json /tmp/BENCH.json.chaos

cp /tmp/BENCH.json.pre_chaos BENCH.json   # restore the committed snapshot

python3 - "$TOL" <<'EOF'
import json, sys
tol = float(sys.argv[1])
clean = json.load(open("/tmp/BENCH.json.clean"))
chaos = json.load(open("/tmp/BENCH.json.chaos"))
drift = chaos.get("drift", [])
print(f"[chaos] drift-flagged: {len(drift)} -> {drift}")
assert drift, (
    "chaos run flagged no drift: either the burners did not slow the "
    "sweep (raise burners) or the detector is broken")
bad = []
for q in drift:
    c, f = clean["queries"][q], chaos["queries"][q]
    ratio = f / c if c else float("inf")
    note = "repaired-below-clean" if ratio < 1 else ""
    print(f"[chaos]   {q}: clean={c:.3f}s final={f:.3f}s ratio={ratio:.2f} {note}")
    if ratio > 1 + tol:
        bad.append((q, round(ratio, 2)))
assert not bad, (
    f"drifted queries still reported >{1+tol:.1f}x their clean snapshot: {bad} — "
    "the isolated re-measure did not repair the chaos-inflated numbers")
print(f"[chaos] PASS: detector caught the load and repaired all "
      f"{len(drift)} flagged queries to <= {1+tol:.1f}x clean")
EOF
