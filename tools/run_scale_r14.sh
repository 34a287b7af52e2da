#!/bin/bash
# Round-14 scale-stress sweep: gate the new r14 queries (R14A — MERGE
# clause generality, the COW DML family, SQL time travel) and RE-gate
# every query whose execution path changed this round (R14B — the DML
# verbs now committing copy-on-write + the metadata AVG path; R14C — the
# dedup/text queries whose staged caches now ROLL instead of leaking,
# plus connected components' rolled result cache). One family at a time,
# one factor at a time — a contended window flags per-factor canaries and
# scale_report exits 2 (indeterminate).
#
# usage: tools/run_scale_r14.sh [familyA familyB ...]   (default: all)
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
FAM[R14A]="q_sql_merge_delete q_sql_dml_cow q_sql_time_travel"
FAM[R14D]="q_sql_evolve"
FAM[R14B]="q_sql_delete q_sql_update q_sql_merge q_sql_insert q_sql_overwrite q_sql_ctas q_sql_maintenance q_meta_agg_sum"
FAM[R14C]="q_containment_pairs q_jaccard_pairs q_incremental_dedup q_dedup_clusters q_domain_overlap q_bigram_likelihood q_ccnet_buckets q_embed_clusters"

declare -A DIRS
DIRS[x1]="/root/testdata/sf0.1"
DIRS[x3]="target/scale/x3"
DIRS[x10]="target/scale/x10"

fams=${*:-"R14A R14B R14C"}
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
