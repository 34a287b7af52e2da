package graft.operators

import graft.model.{ObjectStoreSpec, PipelineSpecException}
import graft.sinks.{ObjectStoreSink, TableManifest, ZoneMap}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, max, min}

/** Dim-driven join file pruning — the manifest-side analogue of dynamic
  * file pruning / runtime filters: before a fact-table equi-join runs, the
  * (selective) build side's join-key set is turned into a driver-side
  * file-skipping proof against the fact table's zone maps, so fact files
  * that provably hold no join partner are never even listed, let alone
  * scanned. The reference delegated all join execution (and therefore any
  * partition elimination) to its warehouse (AthenaUtil.scala:61-160);
  * Spark's own DPP covers partition columns only and its runtime bloom
  * filters still schedule a task per file — this prunes the LISTING, the
  * decision that matters first at 100 TB.
  *
  * Two proof strengths, applied in order:
  *   1. range — the key set relaxed to [min, max]
  *      ([[ZoneMap.prune]]): cheap, works even when the key set is too
  *      large to collect;
  *   2. key-set probe ([[ZoneMap.pruneInSet]]) — per file, a binary
  *      search for ANY dim key inside the file's recorded window:
  *      strictly stronger (a bimodal hot-old + hot-new id set spans the
  *      whole fact range yet leaves every middle file provably
  *      partner-free).
  *
  * Soundness contract: the returned frame is the fact snapshot MINUS
  * whole files proven to contain no row with `factKey` equal to any
  * non-null dim key — rows inside surviving files are untouched. That is
  * result-identical for INNER and LEFT-SEMI joins on that key (a dropped
  * row had no partner, so it contributed nothing); it is NOT a valid
  * input for outer joins that must preserve unmatched fact rows. Every
  * refusal path (no manifest stats, domain mismatch, NaN keys, key-set
  * overflow) degrades to a weaker prune or the full snapshot — never to a
  * guess.
  *
  * The dim-side key collection is the bounded build-side materialization
  * every runtime-filter scheme performs (Spark's DPP executes the build
  * plan at planning time the same way): one distinct projection capped at
  * `maxKeySet + 1` rows. Overflow falls back to a 1-row min/max
  * aggregate — O(1) driver memory at any dim size.
  */
object JoinPrune {

  /** `dimKeys` = distinct non-null build keys observed (`-1` when the cap
    * overflowed and only the range aggregate ran); `range`/`set`/`bloom`
    * are the per-strength skip accountings (`set` empty when refused or
    * overflowed; `bloom` empty when the fact table carries no
    * [[graft.sinks.BloomIndex]] sidecar for the key or the probe refused);
    * `result` is the accounting of the prune actually applied.
    */
  final case class Report(version: Int, dimKeys: Long, keySetUsed: Boolean,
      range: ZoneMap.PruneReport, set: Option[ZoneMap.PruneReport],
      bloom: Option[ZoneMap.PruneReport],
      result: ZoneMap.PruneReport)

  /** The fact snapshot pruned for an equi-join with `dim` on
    * `factKey = dimKey` — see the soundness contract above (inner /
    * left-semi only). `version` pins time travel like
    * [[ObjectStoreSink.readVersion]].
    */
  def factForEquiJoin(spark: SparkSession, spec: ObjectStoreSpec,
      dim: DataFrame, factKey: String, dimKey: String,
      version: Option[Int] = None, maxKeySet: Int = 100000)
      : (DataFrame, Report) = {
    val snaps = ObjectStoreSink.snapshots(spec)
    if (snaps.isEmpty) throw new PipelineSpecException(
      s"no committed versions for ${spec.database}.${spec.table} under ${spec.path}")
    val snap = version match {
      case None => snaps.last
      case Some(v) => snaps.find(_.version == v).getOrElse(
        throw new PipelineSpecException(
          s"version $v of ${spec.database}.${spec.table} does not exist or " +
            s"is not committed (have: ${snaps.map(_.version).mkString(", ")})"))
    }
    val manifest = TableManifest.read(java.nio.file.Paths.get(snap.path))
      .getOrElse(throw new PipelineSpecException(
        s"committed version ${snap.version} of ${spec.database}.${spec.table} " +
          "lost its manifest — refusing to substitute a directory listing"))

    // bounded build-side materialization: distinct non-null keys, capped
    val keyRows = dim.select(col(dimKey)).where(col(dimKey).isNotNull)
      .distinct().limit(maxKeySet + 1).collect()
    val overflowed = keyRows.length > maxKeySet

    val (lo, hi, nKeys) =
      if (!overflowed) {
        val ks = keyRows.map(_.get(0))
        (ks.minOption(AnyOrd), ks.maxOption(AnyOrd), ks.length.toLong)
      } else {
        // O(1)-driver fallback: one planning-aggregate row
        val r = dim.where(col(dimKey).isNotNull)
          .agg(min(dimKey), max(dimKey), count(dimKey)).head
        (Option(r.get(0)), Option(r.get(1)), -1L)
      }

    val rangeBound = ZoneMap.Bound(factKey, lower = lo, upper = hi,
      nonNull = true)
    val (rangeKept, rangeRep) = ZoneMap.prune(manifest, Seq(rangeBound))
    val setResult =
      if (overflowed) None
      else ZoneMap.pruneInSet(manifest, factKey, keyRows.map(_.get(0)).toSeq)

    val (kept, rep, usedSet) = setResult match {
      case Some((k, r)) => (k, r, true)
      case None => (rangeKept, rangeRep, false)
    }
    // third proof strength: per-file bloom probes refine the survivors —
    // the only prune an UNCLUSTERED fact layout can offer (every file's
    // [min, max] spans the key range, but a sparse key set still misses
    // most files' actual content). Sound superset semantics as above.
    val bloomResult =
      if (overflowed) None
      else graft.sinks.BloomIndex.pruneAmong(
        java.nio.file.Paths.get(snap.path), kept, factKey,
        keyRows.map(_.get(0)).toSeq, manifest.files.size,
        manifest.files.map(_.bytes).sum)
    val (finalKept, finalRep) = bloomResult.getOrElse((kept, rep))
    val df = ObjectStoreSink.readSubset(spark, snap.path, spec.fileFormat,
      finalKept, manifest.files.size)
    (df, Report(snap.version, nKeys, usedSet, rangeRep,
      setResult.map(_._2), bloomResult.map(_._2), finalRep))
  }

  /** Order for min/max over the collected external key values — used only
    * to pick range endpoints, and only among values of one column's type.
    * An incomparable pair (exotic key type) throws and surfaces as a
    * planning error, never a wrong prune: the endpoints feed
    * [[ZoneMap.Bound]], whose domain checks refuse anything lossy.
    */
  private object AnyOrd extends Ordering[Any] {
    def compare(x: Any, y: Any): Int = (x, y) match {
      case (a: Long, b: Long) => java.lang.Long.compare(a, b)
      case (a: Int, b: Int) => Integer.compare(a, b)
      case (a: Short, b: Short) => java.lang.Short.compare(a, b)
      case (a: Byte, b: Byte) => java.lang.Byte.compare(a, b)
      case (a: Double, b: Double) => java.lang.Double.compare(a, b)
      case (a: Float, b: Float) => java.lang.Float.compare(a, b)
      case (a: String, b: String) => a.compareTo(b)
      case (a: java.sql.Date, b: java.sql.Date) => a.compareTo(b)
      case (a: java.sql.Timestamp, b: java.sql.Timestamp) => a.compareTo(b)
      case (a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b)
      case (a: java.time.Instant, b: java.time.Instant) => a.compareTo(b)
      case _ => throw new IllegalArgumentException(
        s"incomparable join-key values: ${x.getClass} vs ${y.getClass}")
    }
  }
}
