package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Order-statistics and sampling operators for the analytics/curation
  * surface (SURVEY.md §2.5-§2.6 analytics breadth; training-pipeline
  * sampling ops).
  *
  * Scale notes (100 TB design stance):
  *   - `q_quantiles` uses exact `percentile_disc`, a sort-based aggregate
  *     whose per-group state is the group's value multiset — fine for
  *     low-cardinality strata (here: 3 return flags), wrong for
  *     high-cardinality groups. The scale path is `approx_percentile`
  *     (Greenwald-Khanna, bounded state, mergeable partials);
  *     `QuantileSpec` pins the approx result to the exact one within the
  *     published rank-error bound so the swap is evidence-backed.
  *   - `q_stratified_sample` is a pure narrow map: the sampling decision
  *     is a deterministic hash of the row key, so it needs no shuffle, no
  *     count pass, and no driver state; every executor makes the same
  *     decision for the same row at any scale, and re-runs are idempotent
  *     (the property that matters when a 100 TB sample job restarts).
  */
object Stats {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** House md5-bucket convention (Dedup.scala:35, splits): first 15 hex
    * chars → 60-bit non-negative long, mod the bucket count.
    */
  private def keyBucket(c: org.apache.spark.sql.Column, buckets: Int) =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType) % buckets

  private val bucketSql = (expr: String, buckets: Int) =>
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT) % $buckets"

  val defs: Seq[QueryDef] = Seq(

    // ---- exact per-stratum order statistics -----------------------------
    QueryDef(
      "q_quantiles",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("cnt"),
            expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)")
              .as("p25"),
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
              .as("p50"),
            expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)")
              .as("p75"),
            expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)")
              .as("p99"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(*) AS cnt,
             |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
             |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
             |  percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
             |  percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- deterministic stratified sampling ------------------------------
    // Per-stratum rates out of 1000 on the row's unique key: the sample is
    // a pure filter (no shuffle), reproducible across runs and engines.
    QueryDef(
      "q_stratified_sample",
      (s, d) => {
        val rate = when(col("l_returnflag") === "A", 100L)
          .when(col("l_returnflag") === "N", 500L)
          .otherwise(1000L)
        t(s, d, "lineitem")
          .filter(keyBucket(
            concat_ws("#", col("l_orderkey"), col("l_linenumber")), 1000) < rate)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
              |FROM lineitem
              |WHERE ${bucketSql("CONCAT(l_orderkey, '#', l_linenumber)", 1000)}
              |  < CASE l_returnflag WHEN 'A' THEN 100 WHEN 'N' THEN 500 ELSE 1000 END
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- deterministic per-group reservoir (exact-k per stratum) --------
    // Balanced per-class sampling: exactly k rows per stratum, chosen by
    // ranking on the md5 of the row key — pseudo-random but reproducible
    // across runs and engines. The rank<=k filter plans as Spark's
    // WindowGroupLimit (bounded top-k held per group on BOTH sides of the
    // shuffle, never a full ranked materialization — plan-guarded), so
    // per-group state is O(k) however large the stratum gets.
    QueryDef(
      "q_reservoir_per_group",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val key = concat_ws("#", col("l_orderkey"), col("l_linenumber"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(md5(key), col("l_orderkey"), col("l_linenumber"))
        t(s, d, "lineitem")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 50)
          .select("l_returnflag", "rk", "l_orderkey", "l_linenumber")
          .orderBy("l_returnflag", "rk")
      },
      Some("""SELECT l_returnflag, rk, l_orderkey, l_linenumber
             |FROM (
             |  SELECT l_returnflag, l_orderkey, l_linenumber,
             |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |      ORDER BY md5(CONCAT(l_orderkey, '#', l_linenumber)),
             |               l_orderkey, l_linenumber) AS rk
             |  FROM lineitem)
             |WHERE rk <= 50
             |ORDER BY l_returnflag, rk""".stripMargin)),

    // ---- Z-order layout roundtrip ---------------------------------------
    // Rewrites lineitem clustered along the Morton curve of
    // (l_partkey, l_suppkey), then answers a two-dimensional range query
    // from the clustered copy. The oracle runs the same query on the
    // ORIGINAL table: a layout operator must be invisible to results while
    // `ZOrderSpec` separately proves the files got range-prunable.
    QueryDef(
      "q_zorder_agg",
      (s, d) => {
        val path = graft.Scratch.fresh("graft-zorder")
        graft.operators.ZOrder.write(
          t(s, d, "lineitem"), Seq("l_partkey", "l_suppkey"), 16, path)
        s.read.parquet(path)
          .filter(col("l_partkey").between(20, 120) &&
            col("l_suppkey").between(2, 7))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("cnt"),
            QueryDef.dsum(col("l_quantity")).as("sum_qty"),
            QueryDef.dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
             |FROM lineitem
             |WHERE l_partkey BETWEEN 20 AND 120 AND l_suppkey BETWEEN 2 AND 7
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)))
}
