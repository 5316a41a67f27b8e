#!/bin/bash
# Bench regression GATE: re-run graft.Bench at the committed artifact's
# own config (sf dir, cpus, force mode — read from the artifact, so the
# compare is never force- or parallelism-incomparable) and benchdiff the
# fresh run against it. Exit 0 = no regression; nonzero = a query
# regressed beyond threshold (or broke), with benchdiff's report naming
# it. This turns "a regressed query resurfaces as a bench mystery next
# round" into a one-command pre-commit check (VERDICT r14 #7).
#
# Usage: tools/benchgate.sh [committed_artifact] [reps]
#   committed_artifact: default bench_full.json
#   reps: default 1 (gate mode — fast; the committed artifact still
#         carries its own 3-rep spread, this run only needs enough
#         signal for benchdiff's sentinel-normalized 1.5x threshold)
set -eu
cd "$(dirname "$0")/.."
ART=${1:-bench_full.json}
REPS=${2:-1}
CFG=$(python3 - "$ART" << 'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(d.get("sf", "/root/testdata/sf0.1"), d.get("cpus", "32"),
      d.get("force", "noop"))
EOF
)
read -r SF CPUS FORCE <<< "$CFG"
OUT=$(mktemp /tmp/graft_benchgate.XXXXXX.json)
trap 'rm -f "$OUT"' EXIT
echo "[benchgate] re-running Bench at sf=$SF cpus=$CPUS force=$FORCE reps=$REPS"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_FORCE="$FORCE" SPARK_GRAFT_BENCH_REPS="$REPS" \
  SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" > /dev/null 2>&1 \
  || { echo "[benchgate] Bench run FAILED" >&2; exit 1; }
python3 tools/benchdiff.py "$ART" "$OUT"
