package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit: per FK edge, how many child rows (and how
  * many distinct child keys) point at a parent key that does not exist.
  * The DQ rule the reference's per-load checks cannot express — its rules
  * see one file at a time, but orphaned facts are a CROSS-table property
  * (a dimension load that silently dropped rows strands facts everywhere).
  *
  * Scale stance (100 TB fact, small-to-large dims): the child collapses to
  * its DISTINCT-KEY grain first (map-side-combined groupBy — the shuffle
  * is |distinct child keys|, not |child rows|), then probes the parent's
  * key set with a left join; when the parent fits the broadcast threshold
  * the probe is shuffle-free on the child side. Output is one row per
  * edge regardless of scale.
  */
object ReferentialCheck {

  /** One edge: child(childKey) → parent(parentKey). */
  def check(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, edge: String): DataFrame = {
    val keys = child.filter(col(childKey).isNotNull)
      .groupBy(col(childKey).as("k")).agg(count(lit(1)).as("n"))
    val pkeys = parent.select(col(parentKey).as("k")).distinct()
      .withColumn("_p", lit(1))
    keys.join(pkeys, Seq("k"), "left")
      .agg(
        sum(col("n")).as("n_child_rows"),
        sum(when(col("_p").isNull, col("n")).otherwise(0L)).as("n_orphan_rows"),
        sum(when(col("_p").isNull, 1L).otherwise(0L)).as("n_orphan_keys"))
      .select(lit(edge).as("edge"), col("n_child_rows"),
        col("n_orphan_rows"), col("n_orphan_keys"))
  }

  /** Audit several edges into one report. */
  def report(edges: Seq[(DataFrame, String, DataFrame, String, String)]): DataFrame =
    edges.map { case (c, ck, p, pk, e) => check(c, ck, p, pk, e) }
      .reduce(_ unionByName _)
}
