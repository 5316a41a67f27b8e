#!/bin/bash
# Correctness AT the lake: re-run the DuckDB oracle compare against a
# generated lake's own parquet (GenLake/GenCorpus output), not just the
# driver's gate fixture. Proves 10x+ shuffles / AQE re-plans / active
# degrade branches change nothing (PLANS.md round 13).
#
# Usage: tools/lakeverify.sh <lakeDir> [querySubset]
#   querySubset: comma-separated names; default = the 63 lake-friendly
#   queries (relational+window+panel families plus the exact/scaled
#   dedup and linear ta_* scans — the heavy recursive-CTE text oracles
#   are excluded only because DuckDB needs hours on 100k docs, not
#   because they'd differ).
set -eu
LAKE=${1:?lake dir}
DEFAULT=$(python3 - << 'EOF'
import json
d = json.load(open('CORRECTNESS_r12.json'))
names = [k for k in d if k.split('_')[0].rstrip('0123456789') in ('p','a','j','w','u') or k.startswith('sql_')]
names += ['nem_settlement', 'nem_crunch_pipeline',
          'dd_semantic_scaled', 'dd_embed_neardup_scaled', 'dd_exact_groups',
          'dd_fingerprint', 'dd_incremental', 'ta_tokens', 'ta_quality',
          'ta_langid', 'ta_token_histogram', 'ta_scrub_pii']
print(','.join(sorted(set(names))))
EOF
)
SUB=${2:-$DEFAULT}
OUT=$(mktemp -d /tmp/graft_lakeverify.XXXXXX)
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} sbt -batch "runMain graft.Verify $LAKE $OUT $SUB" >/dev/null 2>&1
python3 tools/localverify.py "$LAKE" "$OUT" "$SUB"
rm -rf "$OUT"
