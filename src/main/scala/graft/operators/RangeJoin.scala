package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: points (key, p) ⋈ intervals (key, lo, hi) where
  * lo <= p <= hi.
  *
  * Spark executes a raw range condition as BroadcastNestedLoopJoin (or an
  * exploded cartesian within key groups) — quadratic in the common case of
  * low-cardinality keys. The scale-correct composition bucketizes the
  * range dimension: each point belongs to exactly ONE bucket of width W,
  * each interval replicates to ceil(span/W)+1 buckets, and the join is a
  * plain equi-join on (key, bucket) plus the residual BETWEEN filter.
  * Replication is bounded by span/W; each (point, interval) pair meets in
  * exactly one bucket (the point's), so no post-join dedup is needed.
  *
  * Pick W around the TYPICAL interval span: smaller W → fewer false
  * bucket-mates to filter; larger W → less interval replication.
  */
object RangeJoin {

  /** @param points    rows with `pointCol` (numeric/long)
    * @param intervals rows with `loCol`/`hiCol` (inclusive bounds, same unit)
    * @param keys      equi-key columns on both sides
    * @param bucketWidth bucket size in the range dimension's unit
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("_rj_bucket",
      floor(col(pointCol) / bucketWidth))
    val ib = intervals.withColumn("_rj_bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    pb.join(ib, keys :+ "_rj_bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_rj_bucket")
  }
}
