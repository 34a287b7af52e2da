package graft.streaming

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.{ObjectStoreSink, TableManifest}
import org.apache.spark.sql.functions._

/** [[ChangeFeedStream]] — following a versioned table commit-by-commit
  * with the cursor carried exactly-once in the replica's own TxnStamps.
  */
class ChangeFeedStreamSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def build(tag: String): (ObjectStoreSpec, ObjectStoreSpec) = {
    val src = ObjectStoreSpec(path = scratchDir(tag).toString,
      database = "graft_cfs", table = s"src_$tag")
    ObjectStoreSink.replaceTable(spark,
      (0L until 300L).map(i => (i, i % 7, s"s$i")).toDF("id", "v", "s")
        .repartitionByRange(3, col("id")), src)
    (src, src.copy(table = s"rep_$tag"))
  }

  private def same(a: ObjectStoreSpec, b: ObjectStoreSpec): Unit = {
    val l = ObjectStoreSink.readVersion(spark, a).orderBy("id", "v", "s")
      .collect()
    val r = ObjectStoreSink.readVersion(spark, b).orderBy("id", "v", "s")
      .collect()
    r shouldBe l
  }

  test("the consumer follows commit-by-commit: every poll applies exactly " +
      "the new steps, a caught-up poll no-ops, the replica always equals " +
      "the source") {
    val (src, rep) = build("follow")
    val fq = s"${src.database}.${src.table}"
    val r1 = ChangeFeedStream.poll(spark, src, rep, "c1")
    (r1.fromVersion, r1.toVersion) shouldBe ((0, 1))
    r1.inserts shouldBe 300L
    same(src, rep)
    spark.sql(s"DELETE FROM $fq WHERE id < 50").collect() // v2
    spark.sql(s"UPDATE $fq SET v = 99 WHERE id = 100").collect() // v3
    // one poll applies BOTH pending steps
    val r2 = ChangeFeedStream.poll(spark, src, rep, "c1")
    (r2.fromVersion, r2.toVersion) shouldBe ((1, 3))
    r2.deletes shouldBe 51L // 50 deleted + the update's delete half
    r2.inserts shouldBe 1L
    same(src, rep)
    // caught up: a replay/no-op poll changes nothing
    val r3 = ChangeFeedStream.poll(spark, src, rep, "c1")
    (r3.fromVersion, r3.toVersion) shouldBe ((3, 3))
    r3.inserts + r3.deletes shouldBe 0L
    ChangeFeedStream.cursor(rep, "c1") shouldBe 3
  }

  test("exactly-once: the cursor rides the replica's commit stamp — a " +
      "foreign writer on the replica fails loudly, never silent drift") {
    val (src, rep) = build("stamp")
    ChangeFeedStream.poll(spark, src, rep, "mine")
    // a foreign commit lands on the replica (no stamp)
    ObjectStoreSink.replaceTable(spark,
      ObjectStoreSink.readVersion(spark, rep), rep)
    val e = intercept[IllegalStateException](
      ChangeFeedStream.poll(spark, src, rep, "mine"))
    e.getMessage should include("expected consumer")
  }

  test("type widening mid-follow casts the replica up; a rename refuses " +
      "with the re-bootstrap message") {
    val src = ObjectStoreSpec(path = scratchDir("evo").toString,
      database = "graft_cfs", table = "src_evo")
    ObjectStoreSink.replaceTable(spark,
      (0L until 300L).map(i => (i, i % 7, s"s$i")).toDF("id", "v", "s")
        .select(col("id"), col("v").cast("int").as("v"), col("s"))
        .repartitionByRange(3, col("id")), src)
    val rep = src.copy(table = "rep_evo")
    val fq = s"${src.database}.${src.table}"
    ChangeFeedStream.poll(spark, src, rep, "c1")
    spark.sql(s"ALTER TABLE $fq ALTER COLUMN v TYPE BIGINT")
      .collect() // v2: metadata-only, feed is empty but shape widens
    spark.sql(s"INSERT INTO $fq VALUES (9001, ${3000000000L}, 'w')")
      .collect()
    val r = ChangeFeedStream.poll(spark, src, rep, "c1")
    r.inserts shouldBe 1L
    same(src, rep)
    ObjectStoreSink.readVersion(spark, rep)
      .schema("v").dataType.sql shouldBe "BIGINT"
    spark.sql(s"ALTER TABLE $fq RENAME COLUMN v TO val").collect()
    spark.sql(s"INSERT INTO $fq VALUES (9002, 2, 'x')").collect()
    val e = intercept[IllegalStateException](
      ChangeFeedStream.poll(spark, src, rep, "c1"))
    e.getMessage should include("re-bootstrap")
  }

  test("reference-mode source follows identically") {
    val (src, rep) = build("ref")
    val fq = s"${src.database}.${src.table}"
    val prev = TableManifest.publisher
    TableManifest.publisher = graft.sinks.ReferenceCommitPublisher
    try {
      spark.sql(s"DELETE FROM $fq WHERE id >= 250").collect()
      ChangeFeedStream.poll(spark, src, rep, "c1")
      same(src, rep)
      ObjectStoreSink.readVersion(spark, rep).count() shouldBe 250L
    } finally TableManifest.publisher = prev
  }
}
