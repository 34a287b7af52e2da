package graft.sinks

import graft.SparkSpec
import graft.model.{ObjectStoreSpec, PipelineSpecException}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** `RESTORE TABLE t [TO] VERSION|TIMESTAMP AS OF x`
  * ([[ObjectStoreSink.restoreVersion]]): rollback as a NEW carry commit —
  * O(files) metadata, data + schema + evolution state restore together,
  * the in-between history stays time-travel-readable.
  */
class RestoreSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def build(tag: String): ObjectStoreSpec = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).toString,
      database = "graft_restore", table = s"t_$tag")
    ObjectStoreSink.replaceTable(spark,
      (0L until 300L).map(i => (i, i % 7, s"s$i")).toDF("id", "v", "s")
        .repartitionByRange(3, col("id")), spec)
    spec
  }

  test("RESTORE rolls data back as a LINK commit: content equals the " +
      "target, files share inodes, the bad history stays readable") {
    val spec = build("basic")
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"DELETE FROM $fq WHERE id < 100").collect() // v2
    spark.sql(s"UPDATE $fq SET v = 0 WHERE id >= 200").collect() // v3
    val r = spark.sql(s"RESTORE TABLE $fq TO VERSION AS OF 1")
      .collect().head
    r.getInt(0) shouldBe 1
    r.getInt(1) shouldBe 4
    r.getInt(2) shouldBe 3 // all three v1 files carried
    // content is exactly v1's image
    spark.table(fq).orderBy("id").collect() shouldBe
      ObjectStoreSink.readVersion(spark, spec, Some(1))
        .orderBy("id").collect()
    // the carry is real inodes, not a rewrite
    val vs = ObjectStoreSink.snapshots(spec)
    val v1 = Paths.get(vs.find(_.version == 1).get.path)
    val v4 = Paths.get(vs.last.path)
    TableManifest.read(v1).get.files.count { e =>
      Files.exists(v4.resolve(e.path)) &&
        Files.isSameFile(v1.resolve(e.path), v4.resolve(e.path))
    } shouldBe 3
    // the rolled-back-over history is still time-travel-readable
    spark.sql(s"SELECT count(*) AS c FROM $fq VERSION AS OF 2")
      .head.getLong(0) shouldBe 200L
  }

  test("RESTORE past schema evolution rolls the SHAPE back too, and the " +
      "table keeps working after") {
    val spec = build("shape")
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"ALTER TABLE $fq ADD COLUMNS (w BIGINT)").collect() // v2
    spark.sql(s"ALTER TABLE $fq RENAME COLUMN v TO val").collect() // v3
    spark.sql(s"INSERT INTO $fq VALUES (9001, 1, 'x', 5)").collect() // v4
    spark.sql(s"RESTORE TABLE $fq VERSION AS OF 1").collect() // v5
    spark.table(fq).columns.toSeq shouldBe Seq("id", "v", "s")
    spark.table(fq).count() shouldBe 300L
    // the restored (pre-evolution) shape accepts its own arity again
    spark.sql(s"INSERT INTO $fq VALUES (9002, 2, 'y')").collect()
    spark.table(fq).count() shouldBe 301L
    // while v4 still reads under the evolved shape
    spark.sql(s"SELECT * FROM $fq VERSION AS OF 4").columns.toSeq shouldBe
      Seq("id", "val", "s", "w")
  }

  test("RESTORE TIMESTAMP AS OF resolves against commit times; errors " +
      "are informative; foreign tables keep Spark's own error") {
    val spec = build("ts")
    val fq = s"${spec.database}.${spec.table}"
    val t1 = ObjectStoreSink.snapshots(spec).last.committedAtMs
    spark.sql(s"DELETE FROM $fq WHERE id < 50").collect()
    val lit = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(t1),
      java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone")))
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    spark.sql(s"RESTORE TABLE $fq TO TIMESTAMP AS OF '$lit'").collect()
    spark.table(fq).count() shouldBe 300L
    val e = intercept[PipelineSpecException](
      spark.sql(s"RESTORE TABLE $fq TO VERSION AS OF 99"))
    e.getMessage should include("does not exist")
    // a foreign table gets the DELEGATE's error (Spark has no RESTORE)
    intercept[Exception](
      spark.sql("RESTORE TABLE graft_restore.nope TO VERSION AS OF 1"))
  }

  test("reference-mode RESTORE carries by reference: zero data files in " +
      "the restored version dir") {
    val spec = build("ref")
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"DELETE FROM $fq WHERE id < 150").collect()
    val prev = TableManifest.publisher
    TableManifest.publisher = ReferenceCommitPublisher
    try {
      spark.sql(s"RESTORE TABLE $fq VERSION AS OF 1").collect()
      val live = Paths.get(ObjectStoreSink.snapshots(spec).last.path)
      TableManifest.dataFiles(live) shouldBe empty
      spark.table(fq).count() shouldBe 300L
    } finally TableManifest.publisher = prev
  }
}
