#!/bin/bash
# Round-12 scale-stress sweep (VERDICT r11 items 3/6): gate the new r12
# query family (R12A), replace the indeterminate R11J window for
# q_sql_maintenance (R12J), and re-gate two non-canonically-stressed
# legacy families (R12C/R12D) under canonical canaries to push
# stressed_canonical past 110. One family at a time, one factor at a
# time — the machine must be otherwise quiet or the per-factor canary
# flags the window and scale_report exits 2 (indeterminate).
#
# usage: tools/run_scale_r12.sh [familyA familyB ...]   (default: all)
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
FAM[R12A]="q_meta_agg_filtered q_join_prune_multikey q_mv_rewrite_refresh"
FAM[R12J]="q_sql_maintenance"
FAM[R12C]="q_asof_join q_asof_forward q_asof_tolerance q_attribution q_events_funnel q_events_hourly q_events_pivot q_events_sessionize q_chunk_windows q_cast_schema"
FAM[R12F]="q_zonemap_or"
FAM[R12H]="q_bloom_prune q_bloom_sql"
FAM[R12E]="q_zonemap_isnull q_zonemap_prefix q_domain_mix q_domain_quota q_corpus_report q_dq_report q_dq_regex q_events_json q_fuzz_12 q_fuzz_18 q_fuzz_25 q_fuzz_27"
FAM[R12D]="q_cms_sketch q_cms_by_source q_cms_heavy q_embed_stats q_embed_quantize q_embed_neardup q_dedup_exact q_dup_spans q_fingerprint_winnow q_distinct q1_agg q_agg_global"

declare -A DIRS
DIRS[x1]="/root/testdata/sf0.1"
DIRS[x3]="target/scale/x3"
DIRS[x10]="target/scale/x10"

fams=${*:-"R12A R12J R12C R12D R12E R12F R12H"}
for fam in $fams; do
  args=""
  for f in x1 x3 x10; do
    out="/tmp/bench_${fam}_${f}.json"
    echo ">>> $fam @ $f (${DIRS[$f]})"
    env SPARK_GRAFT_SF_DIR="${DIRS[$f]}" SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_ONLY="${FAM[$fam]}" SPARK_GRAFT_BENCH_OUT="$out" \
      java $OPENS -Xmx8g -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
        2>/dev/null | tail -1 || true # a failed query still writes the
        # artifact; scale_report's provenance gate judges it below
    args="$args $f:$out"
  done
  python3 tools/scale_report.py "BENCH_SCALE_${fam}.json" $args \
    && echo "$fam: clean" || echo "$fam: exit $? (2=indeterminate window, 1=superlinear)"
done
python3 tools/scale_index.py
