package graft.streaming

import graft.cdc.{CdcApply, DebeziumCDC}
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.SparkSession
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
  * Watermark/window semantics are intentionally absent: CDC is applied in
  * arrival order exactly like the reference (SURVEY §2.9 "no event-time").
  */
object CdcStream {

  /** Start the stream; AvailableNow processes the backlog then stops —
    * tests and batch-catchup use it; continuous deployments pass
    * `Trigger.ProcessingTime(...)`.
    */
  def start(spark: SparkSession, envelopeDir: String, sink: ObjectStoreSpec,
      keys: Seq[String], checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val fq = s"${sink.database}.${sink.table}"
    spark.readStream
      .option("maxFilesPerTrigger", 64)
      .text(envelopeDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val msgs = DebeziumCDC.parse(batch)
        if (!spark.catalog.tableExists(fq))
          throw new IllegalStateException(
            s"CDC target table $fq must exist before streaming into it")
        val target = spark.table(fq)
        val next = CdcApply.applyBatch(target, msgs, keys)
        // full staged swap: the applied image REPLACES the table (a re-merge
        // would resurrect rows the batch deleted)
        ObjectStoreSink.replaceTable(spark, next, sink): Unit
      }
      .start()
  }
}
