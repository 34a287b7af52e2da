#!/bin/bash
# Round-11 scale-stress sweep: re-gate the >1s never-/non-canonically
# stressed tail plus the new r11 query family at x1/x3/x10 under canonical
# canaries (VERDICT r10 item 6). One family at a time, one factor at a
# time — the machine must be otherwise quiet or the per-factor canary
# flags the window and scale_report exits 2 (indeterminate).
#
# usage: tools/run_scale_r11.sh [familyA familyB ...]   (default: all)
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
FAM[R11A]="q_meta_agg_sql q_zonemap_sql q_zonemap_travel q_fuzzy_neighbors_2pass"
FAM[R11B]="q_tpch_q2 q_tpch_q3 q_tpch_q4 q_tpch_q5 q_tpch_q8 q_tpch_q11 q_tpch_q15 q_tpch_q16 q_tpch_q17 q_tpch_q18 q_tpch_q21"
FAM[R11C]="q_ccnet_buckets q_bm25_topk q_lsh_pairs q_simhash_pairs q_tfidf_topk q_events_retention q_hot_split_join q_skew_report"
FAM[R11D]="q_pipeline_e2e q_multimodal_audio q_compact_roundtrip"
FAM[R11E]="q_fuzz_39 q_fuzz_44 q_fuzz_46 q_fuzz_49 q_fuzz_56 q_fuzz_57 q_fuzz_60 q_knn_incremental q_join_star q_topk q_tpch_q7 q_tpch_q20 q_embed_clusters q_knn_recall"
FAM[R11F]="q_fuzz_08 q_fuzz_31 q_fuzz_32 q_fuzz_41 q_jdbc_pull q_decontaminate q_domain_overlap"
FAM[R11G]="q_meta_agg_group q_zonemap_zorder q_join_prune q_join_prune_sql"
FAM[R11H]="q_bloom_prune q_bloom_sql"
FAM[R11I]="q_mv_rewrite"
FAM[R11J]="q_sql_maintenance"

declare -A DIRS
DIRS[x1]="/root/testdata/sf0.1"
DIRS[x3]="target/scale/x3"
DIRS[x10]="target/scale/x10"

fams=${*:-"R11A R11B R11C R11D"}
for fam in $fams; do
  args=""
  for f in x1 x3 x10; do
    out="/tmp/bench_${fam}_${f}.json"
    echo ">>> $fam @ $f (${DIRS[$f]})"
    env SPARK_GRAFT_SF_DIR="${DIRS[$f]}" SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_ONLY="${FAM[$fam]}" SPARK_GRAFT_BENCH_OUT="$out" \
      java $OPENS -Xmx8g -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
        2>/dev/null | tail -1
    args="$args $f:$out"
  done
  python3 tools/scale_report.py "BENCH_SCALE_${fam}.json" $args \
    && echo "$fam: clean" || echo "$fam: exit $? (2=indeterminate window, 1=superlinear)"
done
python3 tools/scale_index.py
