#!/bin/bash
# Round-15 late-session sweep: gate the queries added AFTER the r15
# re-baseline — safe type widening (q_sql_widen), the manifest-diff change
# feed (q_table_changes) and its exactly-once streaming consumer
# (q_changes_stream_equiv), SHALLOW CLONE (q_sql_clone) and RESTORE
# (q_sql_restore). All five are fixture-building lifecycles whose cost is
# the DML protocol itself; the scale question is whether the metadata-only
# commits and manifest-diff reads stay flat as the base tables grow.
#
# usage: tools/run_scale_r15d.sh
set -euo pipefail
cd "$(dirname "$0")/.."

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=$(for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do echo --add-opens=$p=ALL-UNNAMED; done)

QS="q_sql_widen q_table_changes q_changes_stream_equiv q_sql_clone q_sql_restore"

declare -A DIRS
DIRS[x1]="/root/testdata/sf0.1"
DIRS[x3]="target/scale/x3"
DIRS[x10]="target/scale/x10"

args=""
for f in x1 x3 x10; do
  out="/tmp/bench_R15D_${f}.json"
  echo ">>> R15D @ $f (${DIRS[$f]})"
  env SPARK_GRAFT_SF_DIR="${DIRS[$f]}" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_ONLY="$QS" SPARK_GRAFT_BENCH_OUT="$out" \
    java $OPENS -Xmx8g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
      2>/dev/null | tail -1 || true
  args="$args $f:$out"
done
python3 tools/scale_report.py "BENCH_SCALE_R15D.json" $args \
  && echo "R15D: clean" || echo "R15D: exit $? (2=indeterminate window, 1=superlinear)"
python3 tools/scale_index.py
git add -f SCALE_INDEX.json BENCH_SCALE_R15D.json 2>/dev/null || true
echo "R15D artifacts staged"
