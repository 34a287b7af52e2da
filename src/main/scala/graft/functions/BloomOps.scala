package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Scala-side access to Spark's OWN bloom-filter expressions (the engine
  * behind AQE runtime filters): build a filter over a key column with a
  * distributed partial-agg merge, materialize its bits (numBits/8 bytes —
  * the bounded summary), and probe any other column with a codegen'd
  * `might_contain`. The two-phase decontamination path uses this when the
  * eval-gram set outgrows a broadcast hash set: Bloom prune (map-side,
  * false-positives-only) then exact verify over the survivors.
  *
  * SQL users get the same via `bloom_filter_agg`/`might_contain`
  * registered in [[graft.GraftExtensions]].
  */
object BloomOps {

  /** Aggregate `df[keyCol]` (LongType) into bloom-filter bits.
    * Driver-side result is `numBits / 8` bytes by construction — the same
    * boundedness class as an IVF centroid table.
    */
  def buildBloom(df: DataFrame, keyCol: String,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftSqlBridge.expression(df(keyCol)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.agg(GraftSqlBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Codegen'd probe: true when `c` (LongType) may be in the filter —
    * false positives possible at the configured rate, never negatives.
    */
  def mightContain(bloomBits: Array[Byte], c: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloomBits, BinaryType), GraftSqlBridge.expression(c)))
}
