#!/bin/bash
# Round-15 scale-stress sweep: gate the new r15 queries (R15A — reference-
# mode COW DML, DROP/RENAME schema evolution) and RE-gate every query whose
# execution path changed this round (R15B — the DML verbs now retrying on
# commit conflicts and reading through ref-aware readVersion/readSubset;
# R15C — snapshot-economics accounting riding SHOW SNAPSHOTS consumers).
# One family at a time, one factor at a time — a contended window flags
# per-factor canaries and scale_report exits 2 (indeterminate).
#
# usage: tools/run_scale_r15.sh [familyA familyB ...]   (default: all)
set -euo pipefail
cd "$(dirname "$0")/.."

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=$(for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do echo --add-opens=$p=ALL-UNNAMED; done)

declare -A FAM
FAM[R15A]="q_sql_dml_cow_ref q_sql_evolve2"
FAM[R15B]="q_sql_dml_cow q_sql_insert q_sql_update q_sql_delete q_sql_merge q_sql_merge_delete q_sql_time_travel q_sql_evolve"
FAM[R15C]="q_table_snapshots q_sql_maintenance q_sql_ctas q_zonemap_travel"

declare -A DIRS
DIRS[x1]="/root/testdata/sf0.1"
DIRS[x3]="target/scale/x3"
DIRS[x10]="target/scale/x10"

fams=${*:-"R15A R15B R15C"}
for fam in $fams; do
  args=""
  for f in x1 x3 x10; do
    out="/tmp/bench_${fam}_${f}.json"
    echo ">>> $fam @ $f (${DIRS[$f]})"
    env SPARK_GRAFT_SF_DIR="${DIRS[$f]}" SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_ONLY="${FAM[$fam]}" SPARK_GRAFT_BENCH_OUT="$out" \
      java $OPENS -Xmx8g -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
        2>/dev/null | tail -1 || true
    args="$args $f:$out"
  done
  python3 tools/scale_report.py "BENCH_SCALE_${fam}.json" $args \
    && echo "$fam: clean" || echo "$fam: exit $? (2=indeterminate window, 1=superlinear)"
done
python3 tools/scale_index.py
# round-close hygiene (r14 verdict #7, the eighth consecutive note): the
# round's evidence artifacts are part of the round, commit them
git add -f SCALE_INDEX.json BENCH_SCALE_R15*.json 2>/dev/null || true
for f in LEAKCHECK.json COPYCHECK.json CORRECTNESS_r15.json BENCH_r15.json; do
  [ -f "$f" ] && git add -f "$f" || true
done
echo "round artifacts staged (commit separately with the round-close message)"
