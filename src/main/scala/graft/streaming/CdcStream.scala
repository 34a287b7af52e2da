package graft.streaming

import graft.cdc.{CdcApply, DebeziumCDC}
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** §2.9: the CDC consumer as one Structured Streaming job — envelope stream
  * → parse → `foreachBatch` MERGE into the catalog table. Replaces the
  * reference's four cooperating threads (runner/slave/publisher/processor,
  * DebeziumCDCRunner + CDCMessageProcessor) with checkpointed,
  * exactly-once-intake streaming:
  *
  *   - source: any envelope stream with a string `value` column. A file
  *     directory here (`readStream.text`); on a real deployment,
  *     `readStream.format("kafka")` with `subscribePattern` — the rest of
  *     the job is source-agnostic.
  *   - state: the checkpoint owns offsets (the reference's DynamoDB
  *     message-id dedup table, for free).
  *   - apply: per micro-batch, last-event-per-key reduction, one MERGE on
  *     the keys, deletes anti-joined — batch size no longer routes between
  *     SQL-per-row and file re-entry (threshold routing collapses).
  *
  * Apply I/O is PARTITION-SCOPED when the target is partitioned: the
  * affected partitions are derived from the batch's own images, only those
  * partitions are merged and rewritten (dynamic partition overwrite), and
  * untouched partition files are never read or written. A minute-level
  * micro-batch against a 100 TB target therefore costs O(touched
  * partitions), not O(table) — the full-image swap remains only for
  * unpartitioned targets, where it is the only consistent option without an
  * ACID table format.
  *
  * Watermark/window semantics are intentionally absent: CDC is applied in
  * arrival order exactly like the reference (SURVEY §2.9 "no event-time").
  */
object CdcStream {

  /** True when the Kafka source provider is on the classpath
    * (spark-sql-kafka is a separate artifact, absent in this offline
    * container). [[fromKafka]] requires it; the file-envelope path never
    * does.
    */
  lazy val kafkaAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Kafka-topic variant of [[start]] (reference DebeziumCDCRunner.scala:
    * 37-121 — topic-regex subscribe): same checkpointed apply, the source
    * line is the only difference. Fails fast with a capability error when
    * the kafka-sql jars are absent — a config problem surfaced at submit
    * time, not a stream that silently never starts. Untestable offline (no
    * broker, no jars): `CdcStreamKafkaSpec` documents + pins the seam and
    * skips itself when [[kafkaAvailable]] is false.
    */
  def fromKafka(spark: SparkSession, brokers: String, topicPattern: String,
      sink: ObjectStoreSpec, keys: Seq[String], checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(kafkaAvailable,
      "Kafka source not on the classpath: add the spark-sql-kafka artifact " +
        "matching your Spark version (capability flag CdcStream.kafkaAvailable)")
    val envelopes = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribePattern", topicPattern)
      .option("startingOffsets", "earliest") // checkpoint owns progress after start
      .load()
      .selectExpr("CAST(value AS STRING) AS value")
    applyStream(spark, envelopes, sink, keys, checkpointDir, trigger)
  }

  /** Start the stream; AvailableNow processes the backlog then stops —
    * tests and batch-catchup use it; continuous deployments pass
    * `Trigger.ProcessingTime(...)`.
    */
  def start(spark: SparkSession, envelopeDir: String, sink: ObjectStoreSpec,
      keys: Seq[String], checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    applyStream(spark,
      spark.readStream.option("maxFilesPerTrigger", 64).text(envelopeDir),
      sink, keys, checkpointDir, trigger)

  /** Source-agnostic tail of the job: any streaming DataFrame with a string
    * `value` column of Debezium envelopes (file dir, Kafka, a test
    * MemoryStream) gets the same parse → checkpointed MERGE apply.
    */
  private def applyStream(spark: SparkSession,
      envelopes: DataFrame, sink: ObjectStoreSpec,
      keys: Seq[String], checkpointDir: String,
      trigger: Trigger): StreamingQuery = {
    val fq = s"${sink.database}.${sink.table}"
    envelopes
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val msgs = DebeziumCDC.parse(batch).persist()
        try {
          if (!msgs.isEmpty) {
            // a crash between DROP and CREATE of a prior swap must not wedge
            // the stream: re-register from the latest committed version
            if (!ObjectStoreSink.recoverTable(spark, sink))
              throw new IllegalStateException(
                s"CDC target table $fq must exist (or have recoverable " +
                  "versioned data) before streaming into it")
            if (sink.partitionBy.isEmpty) {
              val next = CdcApply.applyBatch(spark.table(fq), msgs, keys)
              // full versioned swap: the applied image REPLACES the table (a
              // re-merge would resurrect rows the batch deleted)
              ObjectStoreSink.replaceTable(spark, next, sink): Unit
            } else applyPartitionScoped(spark, fq, sink, msgs, keys)
          }
        } finally msgs.unpersist(): Unit
      }
      .start()
  }

  /** Merge the batch into ONLY the partitions its images touch.
    *
    *   1. affected = distinct partition tuples from the after images
    *      (inserts/updates) and before images (deletes, and the old side of
    *      partition-moving updates) — bounded by the micro-batch, collected;
    *   2. slice the target with a STATIC partition predicate built from
    *      those tuples: planning-time partition pruning, guaranteed (a
    *      broadcast-semi-join slice was measured NOT to trigger dynamic
    *      pruning on catalog file sources — the scan read every partition);
    *   3. CdcApply on the slice;
    *   4. dynamic-partition-overwrite the result — Spark rewrites exactly
    *      the partitions present in it;
    *   5. partitions the batch emptied entirely (absent from the applied
    *      result) are dropped explicitly, dirs included, so they cannot
    *      resurrect via a later partition re-sync.
    *
    * A batch touching more than [[MaxStaticPartitions]] partitions falls
    * back to a broadcast semi-join slice (full scan, still correct) rather
    * than building a degenerate many-term predicate.
    *
    * Caveat (documented, matches Debezium semantics): cleaning the OLD side
    * of a partition-moving update needs the before image; envelopes without
    * one (REPLICA IDENTITY not FULL) leave the stale copy behind.
    */
  private val MaxStaticPartitions = 1000

  /** OR-of-ANDs partition predicate over collected partition tuples
    * (null-safe equality so a null partition value still matches).
    */
  private[graft] def partitionPredicate(pcols: Seq[String],
      tuples: Seq[org.apache.spark.sql.Row]): org.apache.spark.sql.Column =
    tuples.map { row =>
      pcols.zipWithIndex.map { case (c, i) => col(c) <=> lit(row.get(i)) }
        .reduce(_ && _)
    }.reduce(_ || _)

  private def applyPartitionScoped(spark: SparkSession, fq: String,
      sink: ObjectStoreSpec, msgs: org.apache.spark.sql.Dataset[graft.cdc.CDCMessage],
      keys: Seq[String]): Unit = {
    val target = spark.table(fq)
    val pcols = sink.partitionBy
    val df = msgs.toDF()

    def partitionTuples(image: String): DataFrame =
      df.select(pcols.map { k =>
        val dt = target.schema(k).dataType
        expr(s"try_cast(element_at($image, '$k') AS ${dt.sql})").as(k)
      }: _*).na.drop("all", pcols)

    val affectedDf = partitionTuples("after").unionByName(partitionTuples("before"))
      .distinct()
    // bounded by the batch's touched partitions — safe to collect, and a
    // static predicate is the only guaranteed pruning path
    val affected = affectedDf.limit(MaxStaticPartitions + 1).collect()
    if (affected.isEmpty) return
    val slice =
      if (affected.length > MaxStaticPartitions)
        target.join(broadcast(affectedDf), pcols, "left_semi")
      else target.filter(partitionPredicate(pcols, affected.toSeq))
    val next = CdcApply.applyBatch(slice, msgs, keys)
      .persist() // consumed twice: the write and the emptied-partition diff

    val cat = target.columns
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try next.select(cat.map(col).toIndexedSeq: _*)
      .write.mode(SaveMode.Overwrite).insertInto(fq)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    val remaining = next.select(pcols.map(col): _*).distinct().collect()
      .map(r => pcols.indices.map(r.get)).toSet
    val emptied = affected.filterNot(r => remaining(pcols.indices.map(r.get)))
    if (emptied.nonEmpty) {
      val loc = java.nio.file.Paths.get(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(fq)).location)
      emptied.foreach { row =>
        val kv = pcols.zipWithIndex.map { case (c, i) =>
          c -> String.valueOf(row.get(i))
        }
        val specSql = kv.map { case (c, v) => s"`$c`='${v.replace("'", "''")}'" }
          .mkString(", ")
        graft.model.InternalDdl.run {
          spark.sql(s"ALTER TABLE $fq DROP IF EXISTS PARTITION ($specSql)"): Unit
        }
        val dir = kv.foldLeft(loc) { case (p, (c, v)) => p.resolve(s"$c=$v") }
        deleteTree(dir)
      }
    }
    // in-place partition rewrite changed the committed file set — republish
    // the manifest so it stays the source of truth (TableManifest protocol).
    // The rewritten + emptied partition dirs are passed through so a
    // reference-mode manifest drops carried `ref` entries under them (their
    // content was superseded wholesale by the dynamic overwrite).
    val overwrote = (remaining.toSeq.map(_.toSeq) ++
      emptied.toSeq.map(r => pcols.indices.map(r.get).toSeq))
      .map(vals => pcols.zip(vals)
        .map { case (c, v) => s"$c=${String.valueOf(v)}" }.mkString("/"))
      .toSet
    graft.sinks.ObjectStoreSink.refreshManifest(spark, fq, sink, overwrote)
    next.unpersist(): Unit
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
      finally s.close()
    }
}
