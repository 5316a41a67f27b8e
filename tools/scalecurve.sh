#!/bin/bash
# Scale-curve evidence: run the named queries COLD (fresh JVM per sample)
# at each dir in GRAFT_SF_DIRS (default: the three driver testdata SFs)
# and print one line per (query, dir). A 4th beyond-fixture point comes
# from graft.tools.GenCorpus:
#   java ... graft.tools.GenCorpus /tmp/graft_sfgen 100000 20000
#   GRAFT_SF_DIRS=/tmp/graft_sfgen tools/scalecurve.sh dd_minhash_neardup ...
# Usage: [GRAFT_SF_DIRS="dir ..."] tools/scalecurve.sh [query ...]
set -u
QUERIES=${@:-dd_dup_groups dd_simhash_neardup dd_minhash_neardup dd_ngram_jaccard ann_topk_ivfpq}
DIRS=${GRAFT_SF_DIRS:-/root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1}
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for q in $QUERIES; do
  for dir in $DIRS; do
    SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
    SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_WARM_RUNS=1 SPARK_GRAFT_ONLY=$q \
      java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
        -cp target/scala-2.13/classes:/opt/spark/jars/'*' graft.tools.ScaleCurve 2>/dev/null
  done
done
