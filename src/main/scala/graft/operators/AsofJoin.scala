package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the largest
  * `rightTs <= leftTs` within the same key group (time-series point-in-time
  * join — quotes-to-trades, feature-to-event, latest-state-at-timestamp).
  *
  * Spark has no native ASOF JOIN. The scale-correct formulation is a
  * COMPOSITION (brief's tier (a)), not a custom plan: union both sides
  * tagged, sort each key group once by (ts, side), and carry the latest
  * right payload forward with `last(..., ignoreNulls)` over an unbounded-
  * preceding window. Cost: ONE shuffle of |left|+|right| rows hashed on
  * the key — no range-condition join (which Spark executes as a broadcast
  * nested loop or an exploded equi-range, both quadratic-ish at 100 TB).
  *
  * Ties: a right row at exactly leftTs matches (>=), implemented by
  * ordering right (side 0) before left (side 1) within equal timestamps.
  */
object AsofJoin {

  /** @param left      driving rows; all its columns survive
    * @param right     lookup rows; columns arrive prefixed
    * @param keys      equi-key columns present on both sides
    * @param leftTs    left ordering column name
    * @param rightTs   right ordering column name
    * @param rightPrefix prefix for the matched right columns in the output
    * @param tolerance max staleness `leftTs - rightTs` (backward) or max
    *                  lead `rightTs - leftTs` (forward) in the ts columns'
    *                  own units (numeric ts); a match further than this is
    *                  reported as NO match (nulled right columns) — pandas
    *                  merge_asof's `tolerance`. None = unbounded.
    * @param direction "backward" (latest right at-or-before leftTs — the
    *                  default point-in-time lookup) or "forward" (earliest
    *                  right at-or-after leftTs — pandas merge_asof
    *                  direction='forward'; the "next event after" shape).
    *                  Forward is the SAME one-shuffle plan with the window
    *                  order reversed — no extra pass, no range join.
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "asof_",
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(tolerance.forall(_ => !keys.contains(rightTs)),
      "tolerance needs the right ts column in the payload (not a key)")
    val rightPayload = right.columns.filterNot(c => keys.contains(c)).toSeq
    val leftCols = left.columns.toSeq

    // one unioned relation: left rows carry their payload + null right
    // struct; right rows carry a struct of their payload at their ts
    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_asof_ts"),
        lit(0).as("_asof_side"),
        struct(rightPayload.map(col): _*).as("_asof_payload")): _*)
      .select(keys.map(col) ++ Seq(col("_asof_ts"), col("_asof_side"),
        col("_asof_payload")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_asof_ts"),
        lit(1).as("_asof_side"),
        lit(null).cast(taggedRight.schema("_asof_payload").dataType)
          .as("_asof_payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // backward scans time ascending and carries the latest right forward;
    // forward scans DESCENDING and carries the earliest later right back.
    // Either way a right row at exactly leftTs sorts before the left row
    // (side 0 < 1), so exact ties match inclusively.
    val tsOrd =
      if (direction == "backward") col("_asof_ts").asc else col("_asof_ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL timestamps never match (SQL comparison semantics, either side):
    // a null-ts right row would otherwise sort first under asc-nulls-first
    // and phantom-match every left row; a null-ts left row would match in
    // forward mode (desc puts nulls last). Drop the former, null the latter.
    val matched = taggedRight.filter(col("_asof_ts").isNotNull)
      .unionByName(taggedLeft)
      .withColumn("_asof_match", when(col("_asof_ts").isNotNull,
        last(col("_asof_payload"), ignoreNulls = true).over(w)))
      .filter(col("_asof_side") === 1)
    // tolerance: a too-distant match degrades to no-match (payload → null);
    // a `when` without `otherwise` nulls both the distant and the already-
    // unmatched case in one expression
    val bounded = tolerance match {
      case Some(tol) =>
        val dist =
          if (direction == "backward")
            col("_asof_ts") - col("_asof_match").getField(rightTs)
          else col("_asof_match").getField(rightTs) - col("_asof_ts")
        matched.withColumn("_asof_match", when(dist <= tol, col("_asof_match")))
      case None => matched
    }
    bounded.select(leftCols.map(col) ++
      rightPayload.map(c => col(s"_asof_match.$c").as(s"$rightPrefix$c")): _*)
  }
}
