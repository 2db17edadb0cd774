#!/bin/bash
# Heavy-family sweep under CONSTRAINED heap at a scaled-up replica dir —
# the VERDICT r15 #2 spill exercise: run the suite's heaviest plans at a
# scale/heap combination where spill_bytes > 0 actually appears, and
# record that they complete with zero errors (strict mode).
# Usage: run_spill_sweep.sh [sfDir] [outSuffix] [heap] [queries] [round]
#   defaults: /tmp/sf10, sf10spill, 16g, the VERDICT heavy six, r16
set -u
cd /root/repo
SF_DIR="${1:-/tmp/sf10}"
SUFFIX="${2:-sf10spill}"
HEAP="${3:-16g}"
QUERIES="${4:-q130_triangle_count,q67_market_basket,q131_pagerank,q43_approx_sketches,q245_exactsubstr,q205_semdedup}"
ROUND="${5:-r16}"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
SPARK_GRAFT_BENCH_WARMUPS=1 SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_STRICT=1 \
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "-Xmx$HEAP" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  > "/root/repo/${SUFFIX}_sweep_stdout.txt" 2> "/root/repo/${SUFFIX}_sweep_stderr.txt"
STATUS=$?
echo "exit=$STATUS" > "/root/repo/${SUFFIX}_sweep_done.txt"
if [ "$STATUS" -eq 0 ]; then
  cp bench_detail.json "bench_${SUFFIX}_detail_${ROUND}.json"
else
  echo "bench exited $STATUS — NOT renaming bench_detail.json" \
    >> "/root/repo/${SUFFIX}_sweep_done.txt"
fi
git checkout bench_detail.json
