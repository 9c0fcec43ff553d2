#!/bin/bash
# Interleaved query-level A/B on the x100 slice (round-18 verdict
# order #2): alternate fresh JVMs of the r16 classes
# (/root/repo/.ab16, commit 432258a + QueryAB copied in) and HEAD
# classes on the SAME data, timing the worst x100 ratio queries with
# graft.QueryAB (Verify-style serial timing, parquet write included).
# Usage: tools/query_ab.sh <sfDir> <rounds> <queries-csv> <outFile>
set -u
SF=${1:-/root/repo/.scale/sf10}
ROUNDS=${2:-2}
QUERIES=${3:-mtail_engine_readmix,mtail_engine_seqcycle,multimodal_decode_meta,text_boilerplate_filter}
OUT=${4:-/root/repo/AB_X100_r18.txt}
JARS=$(echo /opt/spark/jars/*.jar | tr ' ' ':')
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JVM="-Xmx8g -Xms8g -XX:+AlwaysPreTouch -Dspark.ui.enabled=false"
: > "$OUT"
for r in $(seq 1 "$ROUNDS"); do
  for side in A B; do
    if [ "$side" = A ]; then
      CP=/root/repo/.ab16/target/scala-2.13/classes:$JARS
      TAG=r16
    else
      CP=/root/repo/target/scala-2.13/classes:$JARS
      TAG=r18
    fi
    echo "=== round $r: $side ($TAG) ===" | tee -a "$OUT"
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_AB_TAG=$TAG \
      SPARK_GRAFT_AB_QUERIES=$QUERIES SPARK_GRAFT_AB_RUNS=2 \
      SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-4} \
      java $ADD_OPENS $JVM -cp "$CP" graft.QueryAB 2>/dev/null \
      | grep '^{' | tee -a "$OUT"
  done
done
echo "done -> $OUT"
