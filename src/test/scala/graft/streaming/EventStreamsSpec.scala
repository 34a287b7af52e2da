package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourlyCounts: tumbling event-time windows over a memory stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val events = in.toDF().toDF("ts", "event_type", "user_id")
    val q = EventStreams.hourlyCounts(events)
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").start()
    try {
      in.addData(
        (ts("2026-08-12 10:05:00"), "click", 1L),
        (ts("2026-08-12 10:40:00"), "click", 2L),
        (ts("2026-08-12 10:59:00"), "view", 1L),
        (ts("2026-08-12 11:01:00"), "click", 1L))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .orderBy("hour_start", "event_type")
        .select("hour_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSeq
      rows shouldBe Seq(
        (ts("2026-08-12 10:00:00"), "click", 2L),
        (ts("2026-08-12 10:00:00"), "view", 1L),
        (ts("2026-08-12 11:00:00"), "click", 1L))
    } finally q.stop()
  }

  test("sessionize: gap-based session windows with state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val q = EventStreams.sessionize(events)
      .writeStream.format("memory").queryName("session_test")
      .outputMode("complete").start()
    try {
      in.addData(
        (ts("2026-08-12 10:00:00"), 1L),
        (ts("2026-08-12 10:10:00"), 1L), // same session (gap < 30m)
        (ts("2026-08-12 11:30:00"), 1L), // new session
        (ts("2026-08-12 10:00:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .orderBy("user_id", "session_start")
        .select("user_id", "n_events")
        .as[(Long, Long)].collect().toSeq
      rows shouldBe Seq((1L, 2L), (1L, 1L), (2L, 1L))
    } finally q.stop()
  }

  test("dedupeStream: re-delivered keys dropped within the watermark horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "doc_id", "payload")
    val q = EventStreams.dedupeStream(events, "ts", Seq("doc_id"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2026-08-12 10:00:00"), 1L, "a"),
        (ts("2026-08-12 10:00:00"), 1L, "a-redelivered"), // same key+ts → dropped
        (ts("2026-08-12 10:05:00"), 2L, "b"))
      q.processAllAvailable()
      // re-delivery in a LATER batch is dropped too (state store)
      in.addData((ts("2026-08-12 10:00:00"), 1L, "a-again"))
      q.processAllAvailable()
      spark.table("dedup_test").select("doc_id").as[Long].collect()
        .toSeq.sorted shouldBe Seq(1L, 2L)
    } finally q.stop()
  }

  test("enrich: stream-static join decorates events; unmatched keys survive") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_type")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrich(events, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2026-08-12 10:00:00"), 1L, "view"),
        (ts("2026-08-12 10:01:00"), 9L, "view")) // no dim row
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .select("user_id", "tier").as[(Long, Option[String])]
        .collect().toMap
      rows(1L) shouldBe Some("gold")
      rows(9L) shouldBe None
    } finally q.stop()
  }

  test("funnelProgress: per-user stage machine advances across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_type")
    val q = EventStreams.funnelProgress(events)
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode("update").start()
    try {
      // user 1 views then clicks; user 2 clicks with no prior view (stays 0)
      in.addData(
        (ts("2026-08-12 10:00:00"), 1L, "view"),
        (ts("2026-08-12 10:05:00"), 1L, "click"),
        (ts("2026-08-12 10:00:00"), 2L, "click"))
      q.processAllAvailable()
      // user 1 purchases in a LATER micro-batch — state carries the funnel
      in.addData((ts("2026-08-12 11:00:00"), 1L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("funnel_test")
        .groupBy("user_id").agg(max("stage").as("stage"))
        .as[(Long, Int)].collect().toMap
      rows(1L) shouldBe 3
      rows(2L) shouldBe 0
    } finally q.stop()
  }

  test("closedSessions: flatMapGroupsWithState emits on close with first/last event") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_type")
    val q = EventStreams.closedSessions(events)
      .writeStream.format("memory").queryName("closed_test")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has an intra-batch gap (>30m) → first session closes
      // immediately; the second stays open in state
      in.addData(
        (ts("2026-08-12 10:00:00"), 1L, "login"),
        (ts("2026-08-12 10:10:00"), 1L, "click"),
        (ts("2026-08-12 10:20:00"), 1L, "purchase"),
        (ts("2026-08-12 12:00:00"), 1L, "login"))
      q.processAllAvailable()
      val first = spark.table("closed_test")
        .as[(Long, Timestamp, Timestamp, Long, String, String)].collect().toSeq
      first shouldBe Seq(
        (1L, ts("2026-08-12 10:00:00"), ts("2026-08-12 10:20:00"), 3L, "login", "purchase"))

      // batch 2: advance the watermark far past 12:00 + gap → the open
      // session times out through the state store and is emitted
      in.addData((ts("2026-08-12 20:00:00"), 2L, "view"))
      q.processAllAvailable()
      in.addData((ts("2026-08-12 23:00:00"), 2L, "view"))
      q.processAllAvailable()
      val all = spark.table("closed_test")
        .orderBy("session_start")
        .as[(Long, Timestamp, Timestamp, Long, String, String)].collect().toSeq
      all.map(r => (r._1, r._2, r._4, r._5, r._6)) should contain (
        (1L, ts("2026-08-12 12:00:00"), 1L, "login", "login"))
    } finally q.stop()
  }

  test("attributionJoin inner: purchases match same-user views inside the window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vIn = MemoryStream[(Timestamp, Long)]
    val pIn = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.attributionJoin(
      vIn.toDF().toDF("ts", "user_id"), pIn.toDF().toDF("ts", "user_id"),
      windowMinutes = 60)
      .writeStream.format("memory").queryName("attr_inner_test")
      .outputMode("append").start()
    try {
      vIn.addData(
        (ts("2026-08-12 10:00:00"), 1L), // in-window for 10:30 purchase
        (ts("2026-08-12 10:20:00"), 1L), // also in-window → second match
        (ts("2026-08-12 08:00:00"), 2L)) // 2.5h before → out of window
      pIn.addData(
        (ts("2026-08-12 10:30:00"), 1L),
        (ts("2026-08-12 10:30:00"), 2L), // only the stale view → no match
        (ts("2026-08-12 09:50:00"), 3L)) // no view at all → no match
      q.processAllAvailable()
      val rows = spark.table("attr_inner_test")
        .select("user_id", "view_ts").as[(Long, Timestamp)]
        .collect().toSeq.sortBy(r => (r._1, r._2.getTime))
      rows shouldBe Seq(
        (1L, ts("2026-08-12 10:00:00")),
        (1L, ts("2026-08-12 10:20:00")))
    } finally q.stop()
  }

  test("attributionJoin left_outer: unmatched purchase emits nulls after the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vIn = MemoryStream[(Timestamp, Long)]
    val pIn = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.attributionJoin(
      vIn.toDF().toDF("ts", "user_id"), pIn.toDF().toDF("ts", "user_id"),
      windowMinutes = 60, watermark = "10 minutes", how = "left_outer")
      .writeStream.format("memory").queryName("attr_outer_test")
      .outputMode("append").start()
    try {
      vIn.addData((ts("2026-08-12 10:00:00"), 1L))
      pIn.addData(
        (ts("2026-08-12 10:30:00"), 1L), // matched immediately
        (ts("2026-08-12 10:30:00"), 2L)) // no view: held until watermark
      q.processAllAvailable()
      // watermark has not passed 10:30 yet — only the matched row is out
      spark.table("attr_outer_test").count() shouldBe 1L
      // advance both watermarks far past 10:30 + window
      vIn.addData((ts("2026-08-12 14:00:00"), 9L))
      pIn.addData((ts("2026-08-12 14:00:00"), 9L))
      q.processAllAvailable()
      // one more empty-ish batch lets the outer-null emission land
      vIn.addData((ts("2026-08-12 14:01:00"), 9L))
      q.processAllAvailable()
      val rows = spark.table("attr_outer_test")
        .select("user_id", "view_ts").as[(Long, Option[Timestamp])]
        .collect().toSeq
      rows should contain ((1L, Some(ts("2026-08-12 10:00:00"))))
      rows should contain ((2L, None))
    } finally q.stop()
  }

  test("attributionJoin survives stop/restart: join state carries across checkpointed runs") {
    // The production shape: a file-source stream processed in bounded
    // AvailableNow runs with a shared checkpoint — each run is a separate
    // StreamingQuery instance, so a matched pair whose two sides arrive in
    // DIFFERENT runs proves the join state store genuinely persists and
    // recovers (not just across micro-batches inside one query).
    val root = scratchDir("attrib-restart")
    val src = new java.io.File(root, "src"); src.mkdirs()
    val out = new java.io.File(root, "out").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType)))
    def land(rows: (Timestamp, Long, String)*): Unit =
      rows.toSeq.toDF("ts", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(src.getAbsolutePath)
    def runOnce(): Unit = {
      def side(kind: String) = spark.readStream.schema(schema)
        .parquet(src.getAbsolutePath)
        .filter(col("event_type") === kind).select(col("ts"), col("user_id"))
      val q = EventStreams
        .attributionJoin(side("view"), side("purchase"), windowMinutes = 60)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: only the view arrives — nothing can emit, state must buffer it
    land((ts("2026-08-12 10:00:00"), 1L, "view"))
    runOnce()
    spark.read.schema(StructTypeForOut).parquet(out).count() shouldBe 0L
    // run 2 (fresh query instance, same checkpoint): the matching purchase
    // arrives, plus a purchase with no view (inner → silent)
    land((ts("2026-08-12 10:30:00"), 1L, "purchase"),
      (ts("2026-08-12 10:30:00"), 2L, "purchase"))
    runOnce()
    val rows = spark.read.parquet(out)
      .select("user_id", "purchase_ts", "view_ts")
      .as[(Long, Timestamp, Timestamp)].collect().toSeq
    rows shouldBe Seq(
      (1L, ts("2026-08-12 10:30:00"), ts("2026-08-12 10:00:00")))
    // run 3: no new files — recovery alone must not re-emit anything
    runOnce()
    spark.read.parquet(out).count() shouldBe 1L
  }

  private val StructTypeForOut = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("purchase_ts",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("view_ts",
      org.apache.spark.sql.types.TimestampType)))
}
