package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalDedup
import graft.operators.IncrementalDedup.DedupIndex

/** Continuous corpus ingestion with ONLINE near-dup detection — the
  * streaming twin of [[graft.operators.IncrementalDedup]]: each
  * micro-batch of (doc_id, tokens) sketches its own documents, probes the
  * parquet-backed standing index, writes detected pairs, and extends the
  * index — per-batch cost O(batch + matched buckets), never O(corpus), no
  * matter how long the stream runs.
  *
  * Commit protocol (exactly-once for BOTH the index and the pair log):
  * each batch's index rows land under their own
  * `indexDir/batches/<key>/{bands,hashes,counts}` directory, with a
  * `_COMMIT` marker written LAST; readers union only committed batch
  * directories, so a crash between the three writes can never surface a
  * partial batch (the uncommitted directory is deleted and rewritten on
  * replay). Pairs go to `pairsDir/batch=<key>` in overwrite mode — a
  * replayed batch overwrites its own partition rather than appending a
  * duplicate, so the pair log is exactly-once per batch key. Documents
  * redelivered under a DIFFERENT batch key are dropped by an anti-join
  * against the committed counts ledger (doc_id is the intake identity,
  * the same contract as the watcher ledger).
  */
object DedupIndexStream {

  /** Start the stream. `docs` must be a streaming DataFrame with
    * (doc_id long, tokens array<string>). The checkpointed foreachBatch
    * batchId — stable across crash replays — is the batch key.
    */
  def start(spark: SparkSession, docs: DataFrame, indexDir: String,
      pairsDir: String, checkpointDir: String,
      threshold: Double = 0.3): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batchDf: DataFrame, batchId: Long) =>
        applyBatch(spark, batchDf, indexDir, pairsDir, threshold, s"b$batchId")
      }
      .start()

  /** One micro-batch: dedupe against the ledger, probe, write pairs,
    * extend the index, commit. Exposed for AvailableNow-style catch-up
    * use and the spec. `batchKey` must be stable across replays of the
    * same batch (foreachBatch's checkpointed batchId provides that).
    */
  def applyBatch(spark: SparkSession, batchDf: DataFrame, indexDir: String,
      pairsDir: String, threshold: Double, batchKey: String): Unit =
    synchronized {
      val batchDir = Paths.get(indexDir, "batches", batchKey)
      val marker = batchDir.resolve("_COMMIT")
      if (Files.exists(marker)) return // replayed, already fully applied
      // a batch key a compaction has already superseded means the stream's
      // checkpoint was reset against a surviving index — continuing would
      // SILENTLY exclude this batch from the index forever (its name is on
      // a _MERGES list). Fail loudly: the operator needs a fresh index dir
      // or a fresh batch-key namespace, not quiet under-deduplication.
      if (Files.isDirectory(batchDir.getParent) &&
          supersededNames(batchDir.getParent)(batchKey))
        throw new IllegalStateException(
          s"batch key '$batchKey' was merged into a compacted index — the " +
            "stream checkpoint appears reset; use a fresh checkpoint WITH a " +
            "fresh index dir, or a distinct batch-key namespace")
      // a crashed earlier attempt may have left uncommitted partial writes
      deleteTree(batchDir)

      val existing = loadIndex(spark, indexDir)
      // drop docs the committed index already holds (same doc redelivered
      // under a new batch key) and collapse same-id re-deliveries WITHIN
      // the batch — either would double the doc's index rows and corrupt
      // the verify counts
      val deduped = batchDf.dropDuplicates("doc_id")
      val fresh = existing match {
        case Some(idx) =>
          deduped.join(idx.counts.select("doc_id"), Seq("doc_id"), "left_anti")
        case None => deduped
      }
      val batchIdx = IncrementalDedup.buildIndex(fresh)
      // cache the (small) batch index once: pairs + three writes read it
      batchIdx.bands.persist(); batchIdx.hashes.persist()
      batchIdx.counts.persist()
      try {
        // nothing fresh: no state to commit, replay re-derives the same
        if (batchIdx.counts.isEmpty) return
        val idx = existing.getOrElse(emptyIndex(spark, batchIdx))
        val pairs = IncrementalDedup.newPairs(idx, batchIdx, threshold)
        pairs.persist()
        try {
          if (!pairs.isEmpty)
            pairs.write.mode(SaveMode.Overwrite)
              .parquet(s"$pairsDir/batch=$batchKey")
        } finally pairs.unpersist(): Unit
        batchIdx.bands.write.parquet(s"$batchDir/bands")
        batchIdx.hashes.write.parquet(s"$batchDir/hashes")
        batchIdx.counts.write.parquet(s"$batchDir/counts")
        Files.write(marker, Array.emptyByteArray) // the commit point
        ()
      } finally {
        batchIdx.bands.unpersist(); batchIdx.hashes.unpersist()
        batchIdx.counts.unpersist(): Unit
      }
    }

  /** The standing index: the union of COMMITTED batch directories (minus
    * any superseded by a committed [[compactIndex]] merge). Uncommitted
    * (crashed mid-write) batches are invisible. Batch count grows with
    * stream lifetime — [[compactIndex]] merges it back to one directory
    * (metadata-only concern; the per-batch probe never scans old×old
    * regardless).
    */
  def loadIndex(spark: SparkSession, indexDir: String): Option[DedupIndex] = {
    val base = Paths.get(indexDir, "batches")
    if (!Files.isDirectory(base)) return None
    val committed = committedDirs(base).map(_.toString)
    if (committed.isEmpty) None
    else Some(DedupIndex(
      spark.read.parquet(committed.map(_ + "/bands"): _*),
      spark.read.parquet(committed.map(_ + "/hashes"): _*),
      spark.read.parquet(committed.map(_ + "/counts"): _*)))
  }

  /** All detected pairs so far: (id_a, id_b, jaccard, batch). */
  def loadPairs(spark: SparkSession, pairsDir: String): DataFrame =
    spark.read.parquet(pairsDir)

  /** Compact the standing index: merge every committed batch directory
    * into ONE, with the same crash-safe commit discipline as the stream —
    * the merged batch materializes fully (marker written last) before the
    * old directories retire, and a reader/crash at any point sees either
    * the old committed set or the new one, never both or neither. Bounds
    * the file-count growth of a long-lived stream (metadata-only concern;
    * probe cost never depended on batch count). Returns the number of
    * batch directories merged (0/1 = nothing to do).
    *
    * Run it from the same single-writer context as the stream (e.g. a
    * maintenance trigger between micro-batches) — it shares the object
    * lock with [[applyBatch]], so a concurrent batch can never interleave.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Int = synchronized {
    val base = Paths.get(indexDir, "batches")
    if (!Files.isDirectory(base)) return 0
    // sweep crash leftovers a prior compaction superseded but did not
    // finish deleting (committedDirs already excludes them from reads)
    val pastSuperseded = supersededNames(base)
    allDirs(base).filter(p => pastSuperseded(p.getFileName.toString))
      .foreach(deleteTree)
    val committed = committedDirs(base)
    if (committed.size <= 1) return committed.size
    // merged dir name never collides with the stream's b<id> keys
    val target = base.resolve(
      s"compact-${committed.last.getFileName.toString}-${committed.size}")
    deleteTree(target) // crashed earlier attempt
    val idx = loadIndex(spark, indexDir).get
    idx.bands.repartition(1).write.parquet(s"$target/bands")
    idx.hashes.repartition(spark.sparkContext.defaultParallelism / 4 max 1)
      .write.parquet(s"$target/hashes")
    idx.counts.repartition(1).write.parquet(s"$target/counts")
    // the supersede list makes the commit ATOMIC for readers: the instant
    // the marker lands, loadIndex serves the merged dir and EXCLUDES its
    // inputs even if their trees still exist — there is no window where
    // both (double counting) or neither (empty index) are visible. The
    // list carries FORWARD every name its inputs had superseded: deleting
    // an input compact dir must not lose the record that ITS inputs'
    // crash leftovers are dead (they would otherwise resurrect as
    // duplicates once the only _MERGES naming them disappeared).
    val supersedes =
      committed.map(_.getFileName.toString).toSet ++ pastSuperseded
    Files.writeString(target.resolve(MergesName),
      supersedes.toSeq.sorted.mkString("\n"))
    Files.write(target.resolve("_COMMIT"), Array.emptyByteArray)
    // retire the inputs at leisure; a crash here leaves excluded remnants
    // that the sweep at the top of the next compaction removes
    committed.foreach(deleteTree)
    committed.size
  }

  private val MergesName = "_MERGES"

  private def allDirs(base: Path): List[Path] = {
    val s = Files.list(base)
    try s.iterator().asScala.filter(Files.isDirectory(_))
      .toList.sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** Every batch name any committed compaction has superseded. */
  private def supersededNames(base: Path): Set[String] =
    allDirs(base).filter(p => Files.exists(p.resolve("_COMMIT")))
      .flatMap { p =>
        val m = p.resolve(MergesName)
        if (!Files.exists(m)) Nil
        else Files.readString(m).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      }.toSet

  /** Committed batch dirs, minus any superseded by a committed compaction
    * (its `_MERGES` list), oldest → newest.
    */
  private def committedDirs(base: Path): List[Path] = {
    val superseded = supersededNames(base)
    allDirs(base).filter(p => Files.exists(p.resolve("_COMMIT")))
      .filterNot(p => superseded(p.getFileName.toString))
  }

  private def emptyIndex(spark: SparkSession, like: DedupIndex): DedupIndex =
    DedupIndex(
      like.bands.filter(org.apache.spark.sql.functions.lit(false)),
      like.hashes.filter(org.apache.spark.sql.functions.lit(false)),
      like.counts.filter(org.apache.spark.sql.functions.lit(false)))

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
}
