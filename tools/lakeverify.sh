#!/bin/bash
# Correctness AT the lake: re-run the DuckDB oracle compare against a
# generated lake's own parquet (GenLake/GenCorpus output), not just the
# driver's gate fixture. Proves 10x+ shuffles / AQE re-plans / active
# degrade branches change nothing (PLANS.md round 13).
#
# Usage: tools/lakeverify.sh <lakeDir> [querySubset]
#   querySubset: comma-separated names; default = the lake-friendly set —
#   the full relational/window/set/panel families (p*/a*/j*/w*/u*/sql_*,
#   INCLUDING letter-suffixed variants like j05b/w01b/w01c) plus the
#   exact/scaled dedup and linear ta_* scans. The heavy recursive-CTE
#   text oracles are excluded only because DuckDB needs hours on 100k
#   docs, not because they'd differ. Names come from the NEWEST
#   CORRECTNESS_r*.json so queries added each round are picked up.
set -eu
cd "$(dirname "$0")/.."
LAKE=${1:?lake dir}
DEFAULT=$(python3 - << 'EOF'
import json, glob, re
# numeric round sort — a lexicographic max would pick r99 over r100
latest = max(glob.glob('CORRECTNESS_r*.json'),
             key=lambda p: int(re.search(r'_r(\d+)', p).group(1)))
d = json.load(open(latest))
names = [k for k in d if re.match(r'^[pajwu]\d', k) or k.startswith('sql_')]
names += ['nem_settlement', 'nem_crunch_pipeline',
          'dd_semantic_scaled', 'dd_embed_neardup_scaled', 'dd_exact_groups',
          'dd_fingerprint', 'dd_incremental', 'ta_tokens', 'ta_quality',
          'ta_langid', 'ta_token_histogram', 'ta_scrub_pii']
print(','.join(sorted(set(n for n in names if n in d or n.endswith('_scaled')))))
EOF
)
SUB=${2:-$DEFAULT}
OUT=$(mktemp -d /tmp/graft_lakeverify.XXXXXX)
LOG="$OUT/verify.log"
trap 'rm -rf "$OUT"' EXIT
if ! SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
    sbt -batch "runMain graft.Verify \"$LAKE\" \"$OUT\" $SUB" > "$LOG" 2>&1; then
  echo "graft.Verify failed — last lines of $LOG:" >&2
  tail -20 "$LOG" >&2
  exit 1
fi
python3 tools/localverify.py "$LAKE" "$OUT" "$SUB"
