package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level diff of two versions of a keyed table — the "what actually
  * changed between snapshot v(n) and v(n+1)" report that pairs with
  * [[graft.dq.DriftReport]]'s statistical monitor. Drift says "the mean
  * moved"; diff says "4,102 rows changed, all of them in l_extendedprice".
  * Together they are the audit surface a versioned lake (ObjectStoreSink
  * replaceTable → snapshots → readVersion) makes possible and the
  * reference's write-only pipeline cannot offer.
  *
  * Semantics:
  *   - rows are matched on `keys` under NULL-SAFE equality (`<=>` — a
  *     NULL key component matches a NULL on the other side, so a
  *     byte-identical row with a NULL in its key reads as `unchanged`,
  *     not one `added` plus one `removed`); a key present on one side
  *     only is `added`/`removed`;
  *   - a matched row is `changed` iff ANY non-key column differs under
  *     null-safe equality (NULL vs NULL is equal; NULL vs value differs),
  *     else `unchanged`;
  *   - per-column change counts use the same null-safe test, counted only
  *     over matched rows.
  *
  * Scale stance (100 TB): ONE equi-shuffle — the full-outer join on the
  * key — followed by a map-side-combined aggregation that emits a single
  * row regardless of table size. No collect, no window, no skew hazard
  * beyond the join itself (a hot key in a *keyed table* means duplicate
  * primary keys, which is upstream corruption, not skew). If both versions
  * are written bucketed on the key ([[graft.sinks.BucketedTable]]), the
  * join plans with zero Exchange and the diff is a narrow pass.
  */
object TableDiff {

  /** Wide one-row report: rows_added / rows_removed / rows_changed /
    * rows_unchanged plus `changed_<col>` per non-key column.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"schema mismatch: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val dataCols = oldDf.columns.filterNot(keys.contains).toSeq

    def side(df: DataFrame, suffix: String, marker: String) =
      df.select(
        keys.map(c => col(c).as(s"${c}_$suffix")) ++
          dataCols.map(c => col(c).as(s"${c}_$suffix")) :+
          lit(1).as(marker): _*)

    val keyCond = keys
      .map(k => col(s"${k}_old") <=> col(s"${k}_new")).reduce(_ && _)
    val j = side(oldDf, "old", "_in_old")
      .join(side(newDf, "new", "_in_new"), keyCond, "full_outer")

    val matched = col("_in_old").isNotNull && col("_in_new").isNotNull
    def colChanged(c: String): Column =
      matched && !(col(s"${c}_old") <=> col(s"${c}_new"))
    val anyChanged =
      dataCols.map(c => when(colChanged(c), 1L).otherwise(0L)).reduce(_ + _) > 0

    def cnt(cond: Column) = sum(when(cond, 1L).otherwise(0L))

    val aggs =
      cnt(col("_in_old").isNull).as("rows_added") +:
        cnt(col("_in_new").isNull).as("rows_removed") +:
        cnt(matched && anyChanged).as("rows_changed") +:
        cnt(matched && !anyChanged).as("rows_unchanged") +:
        dataCols.map(c => cnt(colChanged(c)).as(s"changed_$c"))
    j.agg(aggs.head, aggs.tail: _*)
  }

  /** Schema-evolution diff — the structural third of the audit trio
    * (DriftReport = statistics, diff = rows, this = shape): one row per
    * column name present in either version, with status
    * added/removed/retyped/unchanged and both type names
    * (`catalogString`). Pure metadata — reads NO data, so it costs the
    * same at 100 TB as at 100 rows; the version log makes it a
    * between-any-two-snapshots question.
    */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val n = newDf.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val rows = (o.keySet ++ n.keySet).toSeq.sorted.map { c =>
      (o.get(c), n.get(c)) match {
        case (None, Some(t))              => (c, "added", null: String, t)
        case (Some(t), None)              => (c, "removed", t, null: String)
        case (Some(a), Some(b)) if a == b => (c, "unchanged", a, b)
        case (Some(a), Some(b))           => (c, "retyped", a, b)
        case (None, None)                 => sys.error("unreachable")
      }
    }
    val spark = oldDf.sparkSession
    import spark.implicits._
    rows.toDF("column", "status", "old_type", "new_type")
  }
}
