package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, LongType}

/** Incremental maintenance of an additive aggregate table — materialized-
  * view delta maintenance: given the CURRENT aggregate snapshot and a DELTA
  * of newly appended base rows, produce the next snapshot WITHOUT
  * rescanning the base table. `advance(snapshot, delta) ==
  * aggregate(base ∪ delta)` exactly, because every state the snapshot
  * carries is a mergeable partial: counts and decimal-exact sums combine
  * by +, min/max by least/greatest (both null-skipping in Spark, so a
  * key present on one side only keeps that side's state).
  *
  * APPEND-ONLY by design: deletes/updates would need retractable state
  * (sums and counts still merge, min/max don't). The CDC path for
  * updatable tables is [[graft.streaming.CdcStream]]; this operator is
  * the rollup-freshness path for immutable fact history.
  *
  * Scale stance (100 TB): the daily refresh touches |delta rows| +
  * |snapshot groups| instead of the full history — aggregate(delta) is a
  * map-side-combined shuffle of the delta only, and the merge join
  * shuffles the AGGREGATE grain (|groups| rows), not the base table.
  * Snapshot state lives as a versioned table (ObjectStoreSink
  * replaceTable), so refresh is also atomic and time-travelable.
  */
object IncrementalAgg {

  /** A count-min-sketch state column: `slotsCol` names an input column
    * holding the depth-length slot array (the caller computes it with
    * [[graft.functions.CmsSketch.slotsFor]], keeping hashing on the
    * engine's md5 convention and the state DuckDB-replayable). The
    * snapshot stores the flattened width×depth counter matrix, which
    * merges by elementwise + — the same mergeable-partial property as the
    * sums, so heavy-hitter tracking refreshes at delta cost too.
    */
  final case class CmsCol(slotsCol: String, width: Int, depth: Int)

  /** A bottom-k-by-hash SAMPLE state column: `hashCol` names an input
    * column holding a unique row key's 60-bit hash (the md5-prefix
    * convention), `valueCol` the double payload to sample. The snapshot
    * stores the k lexicographically-smallest distinct (hash, value) pairs
    * ([[graft.functions.HashSample]]) — a reproducible uniform per-group
    * sample whose derived estimates (quantiles, means) refresh at delta
    * cost; two sketches merge as a bounded sorted-distinct union, the
    * exact KMV algebra with a payload.
    */
  final case class SampleCol(hashCol: String, valueCol: String, k: Int)

  /** A KMV distinct-count sketch state column: `hashCol` names an input
    * column holding the item's 60-bit hash (the engine's md5-prefix
    * convention — see [[graft.functions.KmvDistinct]]). The snapshot
    * stores the k smallest distinct hashes sorted ascending; two sketches
    * merge as a bounded sorted-distinct union (`slice∘array_sort∘
    * array_distinct∘concat` — all codegen'd builtins), so distinct-count
    * estimation refreshes at delta cost like every other state here.
    */
  final case class KmvCol(hashCol: String, k: Int)

  /** Which states the snapshot maintains. Sums are kept as DECIMAL(28,4)
    * partials (exact, order-independent — the dsum convention as stored
    * state); cast at publish time if doubles are wanted.
    */
  final case class Spec(keys: Seq[String], sumCols: Seq[String],
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      cmsCols: Seq[CmsCol] = Nil, kmvCols: Seq[KmvCol] = Nil,
      sampleCols: Seq[SampleCol] = Nil) {
    require(keys.nonEmpty, "aggregate needs at least one key")
    def stateCols: Seq[String] =
      "cnt" +: (sumCols.map("s_" + _) ++ minCols.map("mn_" + _) ++
        maxCols.map("mx_" + _) ++ cmsCols.map("cms_" + _.slotsCol) ++
        kmvCols.map("kmv_" + _.hashCol) ++
        sampleCols.map("smp_" + _.hashCol))
  }

  private val dec = DecimalType(28, 4)

  /** Aggregate base/delta rows into snapshot-state grain. */
  def aggregate(rows: DataFrame, spec: Spec): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +:
      (spec.sumCols.map(c => sum(col(c).cast(dec)).as(s"s_$c")) ++
        spec.minCols.map(c => min(col(c)).as(s"mn_$c")) ++
        spec.maxCols.map(c => max(col(c)).as(s"mx_$c")) ++
        spec.cmsCols.map(cc =>
          graft.functions.CmsSketch.cms(col(cc.slotsCol), cc.width, cc.depth)
            .as(s"cms_${cc.slotsCol}")) ++
        spec.kmvCols.map(kc =>
          graft.functions.KmvDistinct.kmv(col(kc.hashCol), kc.k)
            .as(s"kmv_${kc.hashCol}")) ++
        spec.sampleCols.map(sc =>
          graft.functions.HashSample.sample(col(sc.hashCol), col(sc.valueCol), sc.k)
            .as(s"smp_${sc.hashCol}")))
    rows.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two snapshot-grain states (commutative, associative).
    *
    * Key equality is NULL-SAFE (`<=>` per key): `groupBy` treats NULL as a
    * real group, so a snapshot's NULL-key state must merge with the
    * delta's NULL-key state — a plain equi-join would carry both rows
    * forever and break `advance == aggregate(base ∪ delta)`.
    */
  def merge(snapshot: DataFrame, deltaAgg: DataFrame, spec: Spec): DataFrame = {
    val expect = (spec.keys ++ spec.stateCols).sorted
    for (side <- Seq(snapshot, deltaAgg))
      require(side.columns.sorted.sameElements(expect),
        s"state schema mismatch: ${side.columns.sorted.mkString(",")} vs ${expect.mkString(",")}")
    def rename(df: DataFrame, suffix: String) =
      (spec.keys ++ spec.stateCols).foldLeft(df)((d, c) =>
        d.withColumnRenamed(c, c + suffix))
    val cond = spec.keys
      .map(k => col(s"${k}__o") <=> col(s"${k}__n")).reduce(_ && _)
    val j = rename(snapshot, "__o").join(rename(deltaAgg, "__n"),
      cond, "full_outer")
    val zero = lit(0).cast(dec)
    val keyCols = spec.keys.map(k =>
      coalesce(col(s"${k}__o"), col(s"${k}__n")).as(k))
    val merged =
      (coalesce(col("cnt__o"), lit(0L)) + coalesce(col("cnt__n"), lit(0L)))
        .as("cnt") +:
        (spec.sumCols.map { c =>
          // SUM over zero non-null inputs is NULL, not 0 — a sum state may
          // be NULL both for "group absent this side" and "all inputs were
          // NULL"; merging must preserve NULL when BOTH sides carry none
          val (o, n) = (col(s"s_${c}__o"), col(s"s_${c}__n"))
          when(o.isNull && n.isNull, lit(null).cast(dec))
            .otherwise(coalesce(o, zero) + coalesce(n, zero))
            .as(s"s_$c")
        } ++
          spec.minCols.map(c =>
            least(col(s"mn_${c}__o"), col(s"mn_${c}__n")).as(s"mn_$c")) ++
          spec.maxCols.map(c =>
            greatest(col(s"mx_${c}__o"), col(s"mx_${c}__n")).as(s"mx_$c")) ++
          spec.cmsCols.map { cc =>
            // counter matrices merge by elementwise +; a one-sided key
            // contributes against the zero matrix
            val z = array_repeat(lit(0L), cc.width * cc.depth)
            zip_with(coalesce(col(s"cms_${cc.slotsCol}__o"), z),
              coalesce(col(s"cms_${cc.slotsCol}__n"), z),
              (a, b) => a + b).as(s"cms_${cc.slotsCol}")
          } ++
          spec.kmvCols.map { kc =>
            // bounded sorted-distinct union: keep the k smallest of both
            // sketches' hashes; a one-sided key unions with empty
            val e = array().cast(ArrayType(LongType, containsNull = false))
            slice(array_sort(array_distinct(concat(
              coalesce(col(s"kmv_${kc.hashCol}__o"), e),
              coalesce(col(s"kmv_${kc.hashCol}__n"), e)))), 1, kc.k)
              .as(s"kmv_${kc.hashCol}")
          } ++
          spec.sampleCols.map { sc =>
            // same bounded union, struct-lexicographic on (h, v); a
            // one-sided key self-concats the present side (distinct
            // collapses it) — avoids a typed empty-struct-array literal
            val (o, n) = (col(s"smp_${sc.hashCol}__o"), col(s"smp_${sc.hashCol}__n"))
            slice(array_sort(array_distinct(concat(
              coalesce(o, n), coalesce(n, o)))), 1, sc.k)
              .as(s"smp_${sc.hashCol}")
          })
    j.select(keyCols ++ merged: _*)
  }

  /** One refresh step: fold an append-only delta into the snapshot. */
  def advance(snapshot: DataFrame, deltaRows: DataFrame, spec: Spec): DataFrame =
    merge(snapshot, aggregate(deltaRows, spec), spec)
}
