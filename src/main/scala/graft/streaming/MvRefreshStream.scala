package graft.streaming

import java.nio.file.Paths

import graft.model.ObjectStoreSpec
import graft.operators.IncrementalAgg
import graft.sinks.{ObjectStoreSink, TableManifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming materialized-view refresh: a micro-batch stream of appended
  * fact rows folded into a versioned aggregate snapshot via
  * [[IncrementalAgg.advance]] — the streaming twin of `q_incremental_agg`,
  * and the pattern that keeps a 100 TB rollup seconds-fresh: each
  * micro-batch costs |batch| + |snapshot groups|, never a history rescan.
  *
  * Exactly-once WITHOUT an idempotent sink trick: every commit this
  * stream makes carries a [[TableManifest.TxnStamp]] (writer appId +
  * batch id) — the Delta `txn` mechanism — and the replay guard keys on
  * THE STAMP of the latest committed version, never the raw version
  * count. The legal states are exactly:
  *
  *   - no versions yet → batch 0 applies (anything else is out of order);
  *   - latest stamp is ours with `batchId == b` → foreachBatch replay
  *     (crash between replaceTable's commit and the checkpoint write) —
  *     skip, the batch already landed;
  *   - latest stamp is ours with `batchId == b - 1` → apply.
  *
  * EVERYTHING else fails loudly: a latest version with a foreign appId or
  * no stamp at all means some other writer (compaction, manual fix-up)
  * committed to the single-writer table; `batchId > b` means the
  * checkpoint was deleted/regressed while the snapshot table was kept
  * (a genuine replay can only ever be the one in-flight batch); a gap
  * means batches were lost. The naive `versions > b → skip` guard turned
  * all of these into silent no-ops — silent data loss — which is the
  * failure mode this stamp exists to make impossible.
  */
object MvRefreshStream {

  /** Apply micro-batch `b` (0-based) to the snapshot table; no-op only on
    * a verified same-writer replay of the in-flight batch.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, b: Long,
      spec: ObjectStoreSpec, aspec: IncrementalAgg.Spec,
      appId: String): Unit = {
    val snaps = ObjectStoreSink.snapshots(spec)
    if (snaps.isEmpty) {
      require(b == 0L,
        s"MV refresh out of order: batch $b arrived with no versions committed")
    } else {
      val lastPath = Paths.get(snaps.last.path)
      val stamp = TableManifest.read(lastPath).flatMap(_.txn)
      stamp match {
        case Some(TableManifest.TxnStamp(a, lb)) if a == appId =>
          if (lb == b) return // replayed in-flight batch: already committed
          require(lb == b - 1L,
            s"MV refresh checkpoint/table mismatch: batch $b arrived but " +
              s"writer '$appId' last applied batch $lb (checkpoint " +
              "deleted/regressed or batches lost) — refusing to guess")
        case other =>
          val who = other.map(t => s"writer '${t.appId}'").getOrElse("no txn stamp")
          throw new IllegalStateException(
            s"MV refresh single-writer violation on ${spec.database}.${spec.table}: " +
              s"latest version ${snaps.last.version} was committed by $who, " +
              s"expected writer '$appId' — a foreign commit (compaction/manual " +
              "fix-up) landed on a single-writer MV table; refusing to apply " +
              s"batch $b on top of unknown state")
      }
    }
    val next =
      if (snaps.isEmpty) IncrementalAgg.aggregate(batch, aspec)
      else IncrementalAgg.advance(
        ObjectStoreSink.readVersion(spark, spec, None), batch, aspec)
    ObjectStoreSink.replaceTable(spark, next, spec,
      Some(TableManifest.TxnStamp(appId, b))): Unit
  }

  /** Operator recovery (opt-in, explicit): adopt the CURRENT latest
    * committed table state as the result of batches `0..batchId` for
    * writer `appId` — commits a new version with IDENTICAL content
    * carrying `TxnStamp(appId, batchId)`. This is the escape hatch for a
    * stream bricked by a genuinely foreign commit (a manual fix-up, a
    * pre-stamp-carry-through maintenance tool, or a table that predates
    * the TxnStamp protocol): instead of rebuilding the MV and checkpoint
    * from scratch, the operator ASSERTS the current content is the
    * correct through-batch-`batchId` state and re-arms the replay guard.
    * Deliberately not automatic — the whole point of the guard is that
    * unknown foreign state needs a human decision, so adoption is a
    * separate call, never a flag the stream quietly applies. The commit
    * CAS-es on the adopted version still being latest; racing writers
    * surface as [[graft.sinks.ConcurrentCommitException]], not as a
    * silent mis-stamp. Content-preserving compaction does NOT need this:
    * [[graft.operators.Compaction]] carries the stamp through on its own.
    */
  def adopt(spark: SparkSession, spec: ObjectStoreSpec, appId: String,
      batchId: Long): Unit = {
    val snaps = ObjectStoreSink.snapshots(spec)
    require(snaps.nonEmpty,
      s"nothing to adopt: ${spec.database}.${spec.table} has no committed versions")
    ObjectStoreSink.replaceTable(spark,
      ObjectStoreSink.readVersion(spark, spec, Some(snaps.last.version)), spec,
      Some(TableManifest.TxnStamp(appId, batchId)),
      expectVersion = Some(snaps.last.version)): Unit
  }

  /** Start the refresh stream over `src` (a streaming DataFrame of fact
    * rows). AvailableNow drains what exists and stops; a real deployment
    * passes a processing-time trigger instead. The writer id defaults to
    * the checkpoint location — stable across restarts, unique per stream
    * — exactly Delta's `txnAppId` convention.
    */
  def start(spark: SparkSession, src: DataFrame, spec: ObjectStoreSpec,
      aspec: IncrementalAgg.Spec, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      appId: Option[String] = None): StreamingQuery = {
    val writer = appId.getOrElse(checkpoint)
    src.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        applyBatch(spark, batch, id, spec, aspec, writer))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Drain everything currently available and re-arm the MV rewrite seam
    * ([[graft.plans.MvRewriteRule]]) for `mvName` when the drain commits
    * cleanly. Ordering is what makes the re-arm sound: the freshness
    * watermark is captured BEFORE the AvailableNow drain starts, the
    * drain applies at-least everything committed at capture time (the
    * trigger snapshots availability at start, start > capture), so the
    * refreshed snapshot can only be AHEAD of the pin — and a base append
    * landing mid-drain leaves the query-time version ahead of the pin,
    * which refuses until the next drain. A mid-flight trigger (the
    * always-on processing-time form) has no such quiesce point; its
    * operator re-arms at an explicit drain instead, which is why this is
    * a separate entry point and not a flag on [[start]].
    */
  def refreshAndRearm(spark: SparkSession, src: DataFrame,
      spec: ObjectStoreSpec, aspec: IncrementalAgg.Spec, checkpoint: String,
      mvName: String, appId: Option[String] = None): Unit = {
    val pin = graft.plans.MvRewriteRule.beginRefresh(mvName)
    val q = start(spark, src, spec, aspec, checkpoint,
      Trigger.AvailableNow(), appId)
    q.awaitTermination()
    graft.plans.MvRewriteRule.completeRefresh(mvName, pin)
  }
}
