package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based MERGE upsert: matched rows take the source's values, unmatched
  * target rows are carried over, unmatched source rows are inserted.
  *
  * Re-expresses the reference's delegated MERGE shapes
  * (reference: IcebergUtil.scala:124-157 buildMergeIntoSql,
  * SnowflakeLoader.scala:233-291, RedshiftLoader.scala:149-184
  * delete+insert) as one Spark plan: a single full-outer shuffle join on the
  * key columns plus column-wise resolve — no external SQL engine.
  *
  * Scale: one shuffle of each side hashed on `keys`. When the update batch is
  * small relative to the target (the common CDC case), prefer
  * [[MergeUpsert.viaAnti]] which broadcasts the source key set.
  */
object MergeUpsert {

  def apply(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "MERGE requires at least one key column")
    val t = target.alias("t")
    val s = source.alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val cols = target.columns.map { c =>
      coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
    }
    // NOTE: coalesce-resolve means a source row cannot set a matched row's
    // non-key column to NULL; the reference's MERGE has the same effective
    // behavior for its CSV-sourced updates (empty string, not NULL). A
    // null-overwriting variant would use a marker column instead:
    //   when(col("s._present"), col(s"s.$c")).otherwise(col(s"t.$c"))
    t.join(s, cond, "full_outer").select(cols.toIndexedSeq: _*)
  }

  /** Anti-join + union variant (reference J3 delete+insert shape,
    * RedshiftLoader.scala:149-184): keep target rows whose key is absent from
    * the source, then append all source rows. The source side is typically a
    * small batch → Spark broadcasts it and the 100 TB target never shuffles.
    *
    * NULL-key semantics differ from [[apply]] BY DESIGN: the anti-join uses
    * SQL equality (a NULL key never matches), exactly like the
    * `DELETE ... WHERE key IN (SELECT key FROM source)` it re-expresses —
    * a NULL-key target row survives and a NULL-key source row appends a
    * second row, where [[apply]]'s `<=>` join would merge them. Matched
    * rows also take the source row WHOLE (no per-column coalesce): a NULL
    * source attribute overwrites, as delete+insert semantics demand.
    */
  def viaAnti(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val sKeys = broadcast(source.select(keys.map(col).toIndexedSeq: _*).distinct())
    target.join(sKeys, keys, "left_anti").unionByName(source)
  }
}
