package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalDedup
import graft.operators.IncrementalDedup.DedupIndex

/** Continuous corpus ingestion with ONLINE near-dup detection — the
  * streaming twin of [[graft.operators.IncrementalDedup]]: each
  * micro-batch of (doc_id, tokens) sketches its own documents, probes the
  * parquet-backed standing index, appends detected pairs to `pairsDir`,
  * and extends the index — per-batch cost O(batch + matched buckets),
  * never O(corpus), no matter how long the stream runs.
  *
  * Recovery semantics: foreachBatch replays a batch after a crash, so
  * every index append is made idempotent by anti-joining the batch's
  * doc_ids against the already-indexed counts table — a replayed document
  * is skipped (doc_ids are the intake identity, the same contract as the
  * watcher ledger). The INDEX is therefore exactly-once per doc; the PAIR
  * log is at-least-once (a crash between the pair write and the index
  * append replays the pair derivation) — readers key on (id_a, id_b),
  * which is naturally idempotent downstream (clustering is set-based).
  */
object DedupIndexStream {

  /** Start the stream. `docs` must be a streaming DataFrame with
    * (doc_id long, tokens array<string>).
    */
  def start(spark: SparkSession, docs: DataFrame, indexDir: String,
      pairsDir: String, checkpointDir: String,
      threshold: Double = 0.3): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batchDf: DataFrame, _: Long) =>
        applyBatch(spark, batchDf, indexDir, pairsDir, threshold)
      }
      .start()

  /** One micro-batch: dedupe against the ledger, probe, append, extend.
    * Exposed for AvailableNow-style catch-up use and the spec.
    */
  def applyBatch(spark: SparkSession, batchDf: DataFrame, indexDir: String,
      pairsDir: String, threshold: Double): Unit = synchronized {
    val existing = loadIndex(spark, indexDir)
    // idempotence: drop docs the index already holds (crash-replayed batch)
    // and collapse same-id re-deliveries WITHIN the batch — either would
    // double the doc's index rows and corrupt the verify counts
    val deduped = batchDf.dropDuplicates("doc_id")
    val fresh = existing match {
      case Some(idx) =>
        deduped.join(idx.counts.select("doc_id"), Seq("doc_id"), "left_anti")
      case None => deduped
    }
    val batchIdx = IncrementalDedup.buildIndex(fresh)
    // cache the (small) batch index once: pairs + three appends read it
    batchIdx.bands.persist(); batchIdx.hashes.persist(); batchIdx.counts.persist()
    try {
      if (batchIdx.counts.isEmpty) return
      existing match {
        case Some(idx) =>
          val pairs = IncrementalDedup.newPairs(idx, batchIdx, threshold)
          pairs.write.mode(SaveMode.Append).parquet(pairsDir)
        case None =>
          // first batch: only batch-internal pairs exist
          val empty = emptyIndex(spark, batchIdx)
          val pairs = IncrementalDedup.newPairs(empty, batchIdx, threshold)
          pairs.write.mode(SaveMode.Append).parquet(pairsDir)
      }
      batchIdx.bands.write.mode(SaveMode.Append).parquet(s"$indexDir/bands")
      batchIdx.hashes.write.mode(SaveMode.Append).parquet(s"$indexDir/hashes")
      batchIdx.counts.write.mode(SaveMode.Append).parquet(s"$indexDir/counts")
    } finally {
      batchIdx.bands.unpersist(); batchIdx.hashes.unpersist()
      batchIdx.counts.unpersist(): Unit
    }
  }

  /** The standing index, if any batch has landed yet. */
  def loadIndex(spark: SparkSession, indexDir: String): Option[DedupIndex] =
    if (Files.exists(Paths.get(indexDir, "counts")))
      Some(DedupIndex(
        spark.read.parquet(s"$indexDir/bands"),
        spark.read.parquet(s"$indexDir/hashes"),
        spark.read.parquet(s"$indexDir/counts")))
    else None

  private def emptyIndex(spark: SparkSession, like: DedupIndex): DedupIndex =
    DedupIndex(
      like.bands.filter(lit(false)),
      like.hashes.filter(lit(false)),
      like.counts.filter(lit(false)))
}
