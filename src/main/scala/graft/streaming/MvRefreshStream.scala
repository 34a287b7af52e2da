package graft.streaming

import graft.model.ObjectStoreSpec
import graft.operators.IncrementalAgg
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming materialized-view refresh: a micro-batch stream of appended
  * fact rows folded into a versioned aggregate snapshot via
  * [[IncrementalAgg.advance]] — the streaming twin of `q_incremental_agg`,
  * and the pattern that keeps a 100 TB rollup seconds-fresh: each
  * micro-batch costs |batch| + |snapshot groups|, never a history rescan.
  *
  * Exactly-once WITHOUT an idempotent sink trick: the commit protocol
  * itself is the replay guard. Batch b's apply produces table version
  * b+1, so on foreachBatch replay (crash between replaceTable's commit
  * and the checkpoint write) `snapshots(spec).size > b` proves the batch
  * already landed and the apply is skipped — the double-count a naive
  * re-aggregation would silently introduce cannot happen. This is the
  * same commit-log-as-dedup-ledger idea Delta's `txn` appIds implement;
  * here the version NUMBER is the transaction id because the stream is
  * the table's only writer (single-writer MV refresh).
  */
object MvRefreshStream {

  /** Apply micro-batch `b` (0-based) to the snapshot table; no-op when the
    * version log shows it already applied.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, b: Long,
      spec: ObjectStoreSpec, aspec: IncrementalAgg.Spec): Unit = {
    val applied = ObjectStoreSink.snapshots(spec).size
    if (applied > b) return // replayed batch: version b+1 is already committed
    require(applied == b,
      s"MV refresh out of order: batch $b arrived with $applied versions committed")
    val next =
      if (applied == 0) IncrementalAgg.aggregate(batch, aspec)
      else IncrementalAgg.advance(
        ObjectStoreSink.readVersion(spark, spec, None), batch, aspec)
    ObjectStoreSink.replaceTable(spark, next, spec): Unit
  }

  /** Start the refresh stream over `src` (a streaming DataFrame of fact
    * rows). AvailableNow drains what exists and stops; a real deployment
    * passes a processing-time trigger instead.
    */
  def start(spark: SparkSession, src: DataFrame, spec: ObjectStoreSpec,
      aspec: IncrementalAgg.Spec, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    src.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        applyBatch(spark, batch, id, spec, aspec))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
