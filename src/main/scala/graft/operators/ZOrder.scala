package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of 2-3
  * quantized key columns and range-partition + sort the table by the
  * resulting z-value before writing, so every output file covers a small
  * hyper-rectangle of the key space and parquet min/max row-group stats
  * prune multi-dimensional range predicates.
  *
  * Why it matters at 100 TB: a table sorted on ONE column prunes scans on
  * that column only — a filter on any other key reads every file. The
  * z-curve bounds every file in EVERY interleaved dimension at once
  * (each file's footer min/max span shrinks geometrically with the bits
  * consumed per dimension), so
  * `WHERE a BETWEEN ... AND b BETWEEN ...` skips the bulk of a petabyte
  * table from footers alone. Same mechanism the lakehouse formats expose
  * as OPTIMIZE ZORDER BY; here it is pure Spark: a codegen'd bit-interleave
  * expression + `repartitionByRange` + `sortWithinPartitions`.
  *
  * The z-value is computed with built-in bitwise functions only (shifts,
  * masks, OR) — no UDF, stays inside whole-stage codegen, and the
  * column-range scan that feeds quantization is a 1-row planning aggregate.
  */
object ZOrder {

  /** Bits per dimension: 2 dims × 16 bits = 32-bit z-value; 3 dims → 48. */
  final val BitsPerDim = 16

  /** Scale a numeric column into [0, 2^bits) using the column's [min, max]
    * — a monotone map, so range predicates survive quantization.
    */
  private def quantize(c: Column, min: Long, max: Long, bits: Int): Column = {
    val span = math.max(1L, max - min)
    val buckets = (1L << bits) - 1
    // (c - min) * buckets / span in long arithmetic; clamp handles values
    // outside the observed range (late-arriving rows in an appended file)
    val scaled = ((c.cast("long") - min) * buckets / span)
    greatest(lit(0L), least(lit(buckets), scaled))
  }

  /** The Morton interleave of `cols` (already quantized to `bits` each):
    * output bit (b * n + i) = bit b of column i.
    */
  def interleave(cols: Seq[Column], bits: Int = BitsPerDim): Column = {
    val n = cols.size
    require(n >= 2 && n <= 3, s"z-order wants 2-3 dims, got $n")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `df` with a `_z` column: the z-value of `keyCols` quantized by their
    * observed min/max (one 1-row aggregate over the input — a planning
    * collect, not a data collect).
    */
  def withZValue(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val aggs = keyCols.flatMap(k =>
      Seq(min(col(k).cast("long")), max(col(k).cast("long"))))
    val ranges = df.agg(aggs.head, aggs.tail: _*).head()
    val quantized = keyCols.zipWithIndex.map { case (k, i) =>
      quantize(col(k), ranges.getLong(2 * i), ranges.getLong(2 * i + 1), BitsPerDim)
    }
    df.withColumn("_z", interleave(quantized))
  }

  /** Rewrite `df` into `numFiles` files clustered along the z-curve of
    * `keyCols`. `repartitionByRange` samples the z distribution, so files
    * are even-sized even when the key space is skewed.
    */
  def layout(df: DataFrame, keyCols: Seq[String], numFiles: Int): DataFrame =
    withZValue(df, keyCols)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** Write a z-ordered parquet copy and return its path. */
  def write(df: DataFrame, keyCols: Seq[String], numFiles: Int, path: String): String = {
    layout(df, keyCols, numFiles).write.mode("overwrite").parquet(path)
    path
  }
}
