#!/bin/bash
# Round-13 scale-stress sweep: gate the new r13 query family (R13A — SQL
# DML verbs, disjunction bloom leaves, interval metadata evidence, the
# decimal stats domain, MV containment) and stress the ENTIRE remaining
# never-stressed tail (R13B..R13G — text analysis, intake/pipeline
# fixtures, CDC/JDBC/DQ, sketches/sampling/multimodal, and the SQL-fuzz
# draws), driving stressed_canonical past the r12 verdict's >=150 target.
# One family at a time, one factor at a time — the machine must be
# otherwise quiet or the per-factor canary flags the window and
# scale_report exits 2 (indeterminate).
#
# usage: tools/run_scale_r13.sh [familyA familyB ...]   (default: all)
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
FAM[R13A]="q_sql_merge q_sql_delete q_bloom_or q_meta_agg_range q_zonemap_decimal q_mv_rewrite_filtered"
FAM[R13B]="q_text_stats q_text_quality q_text_langid q_text_normalize q_text_repetition q_text_gopher q_token_freq q_token_bigrams q_tokenize_bpe q_quality_profile"
FAM[R13C]="q_archive_union q_bulk_manifest q_catalog_append_reorder q_catalog_sql q_csv_trim_skip q_json_column_read q_intake_conventions q_unstructured_intake q_watcher_ledger q_xlsx_read q_http_ingest q_guid_v5"
FAM[R13D]="q_cdc_apply q_cdc_chunks q_mssql_cdc q_mssql_pairing q_jdbc_roundtrip q_dq_policy q_eventbus_filters q_schema_validation q_type_mapping q_text_sink_roundtrip q_orc_roundtrip"
FAM[R13E]="q_kmv_distinct q_kmv_by_source q_simhash64 q_pii_scrub q_quantiles q_range_boundaries q_split_assign q_train_order q_multimodal_meta q_multimodal_features q_multimodal_frames q_multimodal_video"
FAM[R13F]="q_fuzz_01 q_fuzz_02 q_fuzz_03 q_fuzz_04 q_fuzz_05 q_fuzz_06 q_fuzz_09 q_fuzz_10 q_fuzz_11 q_fuzz_13 q_fuzz_14 q_fuzz_17"
FAM[R13H]="q_sql_update q_mv_rewrite_rollup"
FAM[R13I]="q_sql_insert q_sql_overwrite q_sql_ctas q_meta_agg_sum"
# R13J-N: re-gate every query whose best scale evidence predated the
# canary (SCALE_INDEX canonical=false tail, 48 queries across the
# pre-r9 TPCH/REL/ANN/R7/R8* artifacts)
FAM[R13J]="q_tpch_q6 q_tpch_q10 q_tpch_q12 q_tpch_q13 q_tpch_q14 q_tpch_q19 q_tpch_q22 q_project_filter"
FAM[R13K]="q_grouping_sets q_join_anti q_join_semi q_merge_upsert q_pivot_priority q_range_join q_rollup q_salted_agg q_setops q_window_rank q_window_running q_dq_referential"
FAM[R13L]="q_knn_brute q_knn_ivf q_knn_quantized q_minhash_sig q_mix_temperature q_pack_sequences q_quality_classifier q_semdedup_prune q_span_scrub"
FAM[R13M]="q_fuzz_47 q_fuzz_48 q_fuzz_50 q_fuzz_51 q_fuzz_52 q_fuzz_53 q_fuzz_54 q_fuzz_55 q_fuzz_58 q_fuzz_59"
FAM[R13N]="q_fuzz_61 q_fuzz_62 q_fuzz_63 q_fuzz_64 q_fuzz_65 q_fuzz_66 q_fuzz_67 q_fuzz_68 q_fuzz_69"
FAM[R13G]="q_fuzz_20 q_fuzz_22 q_fuzz_23 q_fuzz_24 q_fuzz_26 q_fuzz_28 q_fuzz_29 q_fuzz_33 q_fuzz_34 q_fuzz_35 q_fuzz_37 q_fuzz_38 q_fuzz_42 q_fuzz_43 q_fuzz_45"

declare -A DIRS
DIRS[x1]="/root/testdata/sf0.1"
DIRS[x3]="target/scale/x3"
DIRS[x10]="target/scale/x10"

fams=${*:-"R13A R13B R13C R13D R13E R13F R13G"}
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
