package graft.runtime

import graft.model.PipelineSpec
import graft.sources.Intake
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** S1: the ingestion trigger — a watched landing directory with a
  * processed-file ledger, replacing the reference's S3-event → SQS poll →
  * DynamoDB message-id dedup loop (ScheduledBatchTasks.scala:53-98).
  *
  * `poll()` scans the landing dir once, resolves each unseen file through
  * the intake conventions (filename / manifest / archive), runs the
  * matching dataset's pipeline, and records the file in the ledger so a
  * crash-and-restart never double-processes — the same at-least-once-with-
  * dedup contract the reference gets from its TTL table. Call it from any
  * scheduler (cron, a loop thread, or a Structured Streaming trigger).
  */
final class Watcher(
    spark: SparkSession,
    landingDir: Path,
    specs: Map[String, PipelineSpec],
    ledgerPath: Path) {

  final case class Processed(file: String, dataset: String,
      result: Either[Throwable, Pipeline.Result])

  private def ledger: Set[String] =
    if (Files.exists(ledgerPath))
      Files.readAllLines(ledgerPath).asScala.map(_.trim).filter(_.nonEmpty).toSet
    else Set.empty

  private def record(name: String): Unit = {
    Files.createDirectories(ledgerPath.getParent)
    Files.writeString(ledgerPath, name + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  /** One scan: process every unseen file; returns what happened per file.
    * Failures are recorded in the ledger too (the reference also consumes
    * the SQS message either way) — re-delivery is the uploader's retry.
    */
  def poll(): Seq[Processed] = {
    val seen = ledger
    val files = {
      val s = Files.list(landingDir)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith(".")) // ledger/partials
        .toVector.sortBy(_.toString)
      finally s.close()
    }
    files.filterNot(f => seen(f.getFileName.toString)).map { f =>
      val name = f.getFileName.toString
      val outcome =
        try {
          val meta = Intake.resolve(f.toString)
          val spec = specs.getOrElse(meta.dataset,
            throw new IllegalArgumentException(
              s"no registered dataset '${meta.dataset}' for file $name"))
          val input =
            if (meta.paths.size == 1) meta.paths.head
            else Paths.get(meta.paths.head).getParent.toString
          Right(Pipeline.run(spark, spec, input))
        } catch { case e: Throwable => Left(e) }
      record(name)
      Processed(name, outcome.toOption.map(_.dataset).getOrElse("?"), outcome)
    }
  }
}
