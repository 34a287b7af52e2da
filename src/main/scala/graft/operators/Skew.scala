package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators for the cases AQE's skew-join split does NOT
  * cover (AQE rebalances sort-merge join partitions, but a skewed groupBy
  * or a broadcast-ineligible hot-key join still serializes on one task).
  *
  * At 100 TB, one hot key (the empty string, a default id, a boilerplate
  * bucket) routinely carries 1000× the median key's rows; these operators
  * keep such keys off the single-task path.
  */
object Skew {

  /** Two-phase (salted) aggregation: groupBy(keys) where some keys are hot.
    * Phase 1 aggregates on (keys, salt) — hot keys spread over `saltBuckets`
    * tasks; phase 2 re-aggregates the (tiny) per-salt partials. Works for
    * any algebraic aggregate expressed as (partial, merge) column pairs.
    *
    * Example — count + sum:
    * {{{
    * Skew.saltedAgg(df, Seq("k"), 32,
    *   partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   merge   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    val salted = df.withColumn("_graft_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys :+ "_graft_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Hot-key split join: equi-join where a small set of LEFT keys is
    * pathologically frequent. Hot-key rows join against a BROADCAST of the
    * right side's matching rows (the heavy rows never shuffle); everything
    * else takes the normal shuffle join. The two halves union.
    *
    * `hotKeys` is a DataFrame with a `key` column — nothing is ever
    * collected to the driver and no literal `isin` is built, so the plan is
    * identical at sf0.01 and at 100 TB. The split is four broadcast
    * semi/anti joins against the (bounded, see [[hotKeys]]) key set;
    * Catalyst's exchange-reuse collapses the four identical broadcast
    * subtrees into ONE executed exchange. Assumes the right side is
    * dim-like per key (few rows per join key) so the hot-right broadcast
    * stays small — the usual shape for fact-to-dim hot-key skew.
    */
  def hotSplitJoin(left: DataFrame, right: DataFrame, key: String,
      hotKeys: DataFrame): DataFrame = {
    val hk = broadcast(hotKeys.select(col(key)).distinct())
    val cold = left.join(hk, Seq(key), "left_anti")
      .join(right.join(hk, Seq(key), "left_anti"), key)
    val hot = left.join(hk, Seq(key), "left_semi")
      .join(broadcast(right.join(hk, Seq(key), "left_semi")), key)
    cold.unionByName(hot)
  }

  /** Detect hot keys: keys carrying more than `threshold` rows, capped at
    * the `topN` heaviest so the broadcast stays bounded no matter how the
    * data is distributed ("|df|/threshold keys" is not a bound at 100 TB).
    * One partial-aggregated pass; returns a DataFrame — the caller never
    * sees driver-side values.
    */
  def hotKeys(df: DataFrame, key: String, threshold: Long,
      topN: Int = 10000): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
      .orderBy(col("n").desc)
      .limit(topN)
      .select(col(key))

  /** Detect hot keys by row fraction: keys carrying more than `fraction` of
    * the input's rows (e.g. 0.001 → any key owning >0.1% of a 100 TB table
    * is hot). Scale-relative, so the same spec works at every SF. The total
    * count rides along the same aggregation pass as a window-less scalar
    * subquery — still no driver-side values.
    */
  def hotKeysByFraction(df: DataFrame, key: String, fraction: Double,
      topN: Int = 10000): DataFrame = {
    require(fraction > 0 && fraction < 1, "fraction must be in (0, 1)")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("t"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") > col("t") * fraction)
      .orderBy(col("n").desc)
      .limit(topN)
      .select(col(key))
  }
}
