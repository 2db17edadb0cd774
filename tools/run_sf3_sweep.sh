#!/bin/bash
# Full-suite sweep harness at a scaled-up replica dir (SCALE.md §8).
# Usage: run_sf3_sweep.sh [sfDir] [outSuffix] [round]
#   (defaults: /tmp/sf3, sf3, r16)
# Runs graft.Bench strict over the whole registry with the standard
# warmup+2-rep median protocol, preserves the per-query detail as
# bench_<suffix>_detail_<round>.json, and restores the committed
# bench_detail.json afterwards. The detail file is only renamed when
# the Bench run itself exited 0 (ADVICE r15: an early crash used to
# copy the committed PREVIOUS round's detail under the new sweep's
# name, then git checkout hid the evidence).
set -u
cd /root/repo
SF_DIR="${1:-/tmp/sf3}"
SUFFIX="${2:-sf3}"
ROUND="${3:-r16}"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_WARMUPS=1 SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_STRICT=1 \
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g \
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
