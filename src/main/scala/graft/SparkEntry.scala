package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one implemented operator from SURVEY.md §2
  * (or a beyond-reference training-data op); [[oracleSql]] carries the
  * DuckDB-equivalent SQL for the driver's hash-compare correctness gate.
  */
object SparkEntry {

  /** All operator queries, grouped by domain. */
  private val allDefs: Seq[QueryDef] =
    Relational.defs ++ Events.defs ++ Text.defs ++ Embeddings.defs ++
      Embeddings.recallDefs ++ Embeddings.quantDefs ++
      Dedup.defs ++ Dedup.clusterDefs ++
      Dedup.incrementalDefs ++ Dedup.containmentDefs ++
      Dedup.streamEquivDefs ++ Dedup.fuzzyDefs ++
      Curation.defs ++ CurationOps.defs ++ PipelineQueries.defs ++
      PipelineQueries.cdcDefs ++ PipelineQueries.infraDefs ++
      MultimodalQueries.defs ++ OpsQueries.defs ++ FuzzSql.defs ++
      OperatorFuzz.defs ++ Stats.defs ++ Subqueries.defs ++ TpchFull.defs

  /** Flagship: the full config-driven pipeline (read → DQ → script
    * transform → cast → partitioned catalog table → SQL) — the engine's
    * actual product. Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pipeline_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.query).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
