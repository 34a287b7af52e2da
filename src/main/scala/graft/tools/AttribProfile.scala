package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Phase breakdown of the stream-stream attribution fixture (perf
  * investigation, not part of the driver contract): replays
  * q_attribution_stream_equiv's streaming body and prints each micro-batch's
  * engine-reported durations (addBatch / getBatch / walCommit /
  * stateManagement / commitOffsets), so the fixed per-batch overheads are
  * attributable before touching the query.
  */
object AttribProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(tag: String): Unit = {
      import org.apache.spark.sql.streaming.Trigger
      val s = spark
      val d = sfDir
      val t0 = System.nanoTime()
      val fileSchema = s.read.parquet(s"$d/events.parquet").schema
      val tsIsLong = fileSchema("ts").dataType == LongType
      def src() = {
        val tableFile = new java.io.File(s"$d/events.parquet")
        val raw =
          if (tableFile.isDirectory)
            s.readStream.schema(fileSchema).parquet(tableFile.getPath)
          else s.readStream.schema(fileSchema)
            .option("pathGlobFilter", "events.parquet").parquet(d)
        val sec =
          if (tsIsLong) expr("ts div 1000000000")
          else expr("unix_micros(cast(ts as timestamp)) div 1000000")
        raw.withColumn("tsec", timestamp_seconds(sec))
      }
      val views = src().filter(col("event_type") === "view")
        .select(col("tsec").as("ts"), col("user_id"))
      val purchases = src().filter(col("event_type") === "purchase")
        .select(col("tsec").as("ts"), col("user_id"), col("event_id"))
      val joined = graft.streaming.EventStreams.attributionJoin(
        views, purchases, windowMinutes = 60, watermark = "1 hour",
        how = "inner", carryPurchaseCols = Seq("event_id"))
      val sink = "attrib_prof_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation",
          graft.Scratch.fresh("graft-attrprof") + "/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      System.err.println(f"[$tag] stream total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      q.recentProgress.foreach { p =>
        System.err.println(s"[$tag] batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
      val t1 = System.nanoTime()
      val n = s.table(sink)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_timestamp(col("purchase_ts")).as("purchase_sec"),
          unix_timestamp(col("view_ts")).as("view_sec"))
        .groupBy("purchase_id", "user_id", "purchase_sec")
        .agg(count(lit(1)).as("n_views"),
          min(col("purchase_sec") - col("view_sec")).as("min_lag_sec"),
          max(col("purchase_sec") - col("view_sec")).as("max_lag_sec"))
        .count()
      System.err.println(f"[$tag] final agg ($n rows): ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    once("warm")
    once("timed")
    spark.stop()
  }
}
