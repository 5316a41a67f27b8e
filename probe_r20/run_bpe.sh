#!/bin/bash
# Round-20 BPE scale probes (VERDICT r19 next-round #1): bpeTrainBatched +
# bpeEncode at 10M docs / 8 g / default session, stage metrics on.
set -u
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
DDIR=/tmp/graft_sf10m
probe() {
  local q=$1 n=${2:-2}
  echo "=== $q @ $DDIR n=$n $(date +%H:%M:%S) ===" >> probe_r20/chain.log
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STAGE_METRICS=1 \
    timeout 7200 java $OPENS -Xmx8g \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.ProbeQuery "$q" "$DDIR" "$n" > "probe_r20/$q.log" 2>&1
  echo "=== $q rc=$? $(date +%H:%M:%S) ===" >> probe_r20/chain.log
}
#probe ta_bpe_train_batched
probe ta_bpe_encode
echo "BPE CHAIN DONE $(date +%H:%M:%S)" >> probe_r20/chain.log
