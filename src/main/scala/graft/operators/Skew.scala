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

  /** Hot-key split join: equi-join where a known small set of LEFT keys is
    * pathologically frequent. Hot-key rows join against a BROADCAST of the
    * right side's matching rows (no shuffle of the heavy rows at all);
    * everything else takes the normal shuffle join. The two halves union.
    *
    * `hotKeys` is typically the output of a cheap pre-aggregation
    * (`df.groupBy(key).count().filter($"count" > threshold)`) — bounded by
    * definition, so collecting it to build the broadcast filter is safe.
    */
  def hotSplitJoin(left: DataFrame, right: DataFrame, key: String,
      hotKeys: Seq[Any]): DataFrame = {
    if (hotKeys.isEmpty) return left.join(right, key)
    val isHot = col(key).isin(hotKeys: _*)
    val cold = left.filter(!isHot).join(right.filter(!isHot), key)
    val hot = left.filter(isHot).join(broadcast(right.filter(isHot)), key)
    cold.unionByName(hot)
  }

  /** Detect hot keys: keys carrying more than `threshold` rows. One cheap
    * partial-aggregated pass; the result is small by construction (at most
    * |df| / threshold keys).
    */
  def hotKeys(df: DataFrame, key: String, threshold: Long): Seq[Any] =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
      .select(col(key))
      .collect().map(_.get(0)).toSeq
}
