package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-load column-statistic profiles and version-to-version drift
  * detection — the data-quality MONITOR half the reference's rule engine
  * lacks (SURVEY §2.10 covers per-load validation; nothing in the
  * reference compares one load against the previous one, which is how
  * schema-valid-but-wrong data actually slips through: a feed silently
  * goes 40% null, a unit change doubles a mean, a filter upstream halves
  * the row count).
  *
  * Scale design: [[profile]] is ONE aggregation pass — every statistic is
  * map-side combinable (counts, null counts, decimal-exact sums,
  * min/max), so the shuffle carries one partial row per task regardless
  * of table width or height, and the |columns|-row result materializes
  * from a single-row aggregate via `inline` (driver never holds data
  * rows). [[drift]] joins two |columns|-row profiles — trivially
  * broadcast. Means use the engine-neutral decimal-sum convention
  * (`QueryDef.dsum` twin) rounded to 6 dp so a DuckDB oracle replays
  * them exactly; exact per-column distinct counts are deliberately NOT
  * here (multi-column COUNT DISTINCT plans through Expand, O(cols×rows)
  * shuffle — the KMV sketch family is the 100 TB path for that).
  */
object DriftReport {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** One row per column: non-null count, null count, and for numeric
    * columns the decimal-exact mean and rounded min/max (NULL for
    * non-numerics). Single aggregation pass; no shuffle beyond its
    * map-side-combined partials.
    */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "profile of a zero-column frame")
    val aggs: Seq[Column] = fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"n__${f.name}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn__${f.name}"))
      if (isNumeric(f.dataType)) base ++ Seq(
        sum(c.cast(DecimalType(28, 4))).cast(DoubleType).as(s"s__${f.name}"),
        round(min(c).cast(DoubleType), 6).as(s"mn__${f.name}"),
        round(max(c).cast(DoubleType), 6).as(s"mx__${f.name}"))
      else base
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.toSeq.map { f =>
      val n = col(s"n__${f.name}")
      val (mean, mn, mx) =
        if (isNumeric(f.dataType))
          (when(n > 0, round(col(s"s__${f.name}") / n, 6)),
            col(s"mn__${f.name}"), col(s"mx__${f.name}"))
        else (lit(null).cast(DoubleType), lit(null).cast(DoubleType),
          lit(null).cast(DoubleType))
      struct(
        lit(f.name).as("column"), n.as("n"),
        col(s"nn__${f.name}").as("n_null"),
        mean.as("mean"), mn.as("vmin"), mx.as("vmax"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Column-by-column comparison of two profiles (same relative-shift
    * threshold for row count, null fraction, and mean). All shift math is
    * IEEE double division over already-rounded inputs, rounded to 6 dp —
    * deterministic across engines. A column present in only one side
    * reports with nulls on the other (full outer on column name).
    */
  def drift(oldDf: DataFrame, newDf: DataFrame,
      relThreshold: Double = 0.05): DataFrame = {
    val po = profile(oldDf).select(
      col("column"), col("n").as("n_old"), col("n_null").as("null_old"),
      col("mean").as("mean_old"))
    val pn = profile(newDf).select(
      col("column"), col("n").as("n_new"), col("n_null").as("null_new"),
      col("mean").as("mean_new"))
    def relShift(a: Column, b: Column): Column =
      when(a.isNull || b.isNull, lit(null).cast(DoubleType))
        .otherwise(round(abs(b - a) / greatest(abs(a), lit(1e-9)), 6))
    po.join(pn, Seq("column"), "full_outer")
      .withColumn("count_shift",
        relShift(col("n_old").cast(DoubleType), col("n_new").cast(DoubleType)))
      .withColumn("null_frac_old",
        when(col("n_old") + col("null_old") > 0, round(
          col("null_old").cast(DoubleType) /
            (col("n_old") + col("null_old")).cast(DoubleType), 6)))
      .withColumn("null_frac_new",
        when(col("n_new") + col("null_new") > 0, round(
          col("null_new").cast(DoubleType) /
            (col("n_new") + col("null_new")).cast(DoubleType), 6)))
      .withColumn("mean_shift", relShift(col("mean_old"), col("mean_new")))
      .withColumn("drifted",
        coalesce(col("count_shift") > relThreshold, lit(false)) ||
          coalesce(abs(coalesce(col("null_frac_new"), lit(0.0)) -
            coalesce(col("null_frac_old"), lit(0.0))) > relThreshold, lit(false)) ||
          coalesce(col("mean_shift") > relThreshold, lit(false)) ||
          col("n_old").isNull || col("n_new").isNull)
      .select("column", "n_old", "n_new", "null_frac_old", "null_frac_new",
        "mean_old", "mean_new", "count_shift", "mean_shift", "drifted")
  }
}
