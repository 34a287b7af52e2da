package graft.operators

import graft.SparkSpec
import graft.model.{ObjectStoreSpec, PipelineSpecException}
import graft.sinks.{ObjectStoreSink, ReferenceCommitPublisher, TableManifest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Paths

/** [[ChangeFeed]] — the manifest-diff change feed (Delta CDF / Iceberg
  * changelog shape): row-level insert/delete rows per commit step,
  * reading ONLY the files each commit touched (link-carried entries
  * cancel as a driver-side path set difference), aligned across schema
  * evolution by physical column name, surfaced in SQL as
  * `TABLE_CHANGES('db.t', v1, v2)`.
  */
class ChangeFeedSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def build(tag: String): ObjectStoreSpec = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).toString,
      database = "graft_cf", table = s"t_$tag")
    val df = (0L until 300L).map(i => (i, i % 7, s"s$i")).toDF("id", "v", "s")
    ObjectStoreSink.replaceTable(spark,
      df.repartitionByRange(3, col("id")), spec)
    spec
  }

  private def feed(spec: ObjectStoreSpec, from: Int, to: Int): DataFrame =
    ChangeFeed.changesBetween(spark, spec, from, to)

  private def rows(df: DataFrame): Set[(Long, Long, String, String, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getString(r.fieldIndex("_change_type")),
      r.getInt(r.fieldIndex("_commit_version")))).toSet

  private def freshFiles(spec: ObjectStoreSpec): Set[String] = {
    val vs = ObjectStoreSink.snapshots(spec)
    val live = Paths.get(vs.last.path)
    val prevPaths = TableManifest.read(Paths.get(vs(vs.size - 2).path))
      .get.files.map(_.path).toSet
    TableManifest.read(live).get.files.filter(e => !prevPaths(e.path))
      .map(e => TableManifest.resolved(live, e).toAbsolutePath
        .normalize.toString).toSet
  }

  private def absPaths(df: DataFrame): Set[String] =
    df.inputFiles.map(f =>
      Paths.get(java.net.URI.create(f).getPath).normalize.toString).toSet

  test("a link-append INSERT feeds exactly the batch, reading ONLY the " +
      "fresh files — carried files never open") {
    val spec = build("ins")
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"INSERT INTO $fq VALUES (9001, 1, 'a'), (9002, 2, 'b')")
      .collect()
    val f = feed(spec, 1, 2)
    rows(f) shouldBe Set((9001L, 1L, "a", "insert", 2),
      (9002L, 2L, "b", "insert", 2))
    // O(delta): the feed's scan set is the fresh files only
    absPaths(f) shouldBe freshFiles(spec)
    f.inputFiles.length should be < ObjectStoreSink.snapshots(spec)
      .last.nFiles
  }

  test("COW DELETE feeds exactly the deleted rows; rewritten-but-" +
      "identical neighbors cancel in the bag difference") {
    val spec = build("del")
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"DELETE FROM $fq WHERE id BETWEEN 10 AND 12").collect()
    val f = feed(spec, 1, 2)
    rows(f) shouldBe (10L to 12L).map(i =>
      (i, i % 7, s"s$i", "delete", 2)).toSet
    // the COW commit linked 2 of 3 files; the feed reads only the touched
    // pair (removed original + rewritten survivor), never the linked ones
    val vs = ObjectStoreSink.snapshots(spec)
    f.inputFiles.length should be < (vs(vs.size - 2).nFiles + vs.last.nFiles)
  }

  test("COW UPDATE feeds the delete+insert pair per touched row only") {
    val spec = build("upd")
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"UPDATE $fq SET v = 99 WHERE id = 5").collect()
    rows(feed(spec, 1, 2)) shouldBe Set(
      (5L, 5L, "s5", "delete", 2), (5L, 99L, "s5", "insert", 2))
  }

  test("a metadata-only evolution step feeds ZERO change rows and ZERO " +
      "reads; a multi-step window stamps each step's version") {
    val spec = build("multi")
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"ALTER TABLE $fq ADD COLUMNS (w BIGINT)").collect() // v2
    spark.sql(s"INSERT INTO $fq VALUES (9001, 1, 'a', 7)").collect() // v3
    spark.sql(s"DELETE FROM $fq WHERE id = 0").collect() // v4
    val evo = feed(spec, 1, 2)
    evo.count() shouldBe 0L
    evo.inputFiles shouldBe empty // the step read nothing at all
    val f = feed(spec, 1, 4).orderBy("_commit_version", "id")
    f.columns.toSeq shouldBe
      Seq("id", "v", "s", "w", "_change_type", "_commit_version",
        "_commit_timestamp_ms")
    f.collect().map(r => (r.getLong(0),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      r.getString(4), r.getInt(5))).toSeq shouldBe Seq(
      (9001L, 7L, "insert", 3),
      (0L, -1L, "delete", 4))
  }

  test("schema evolution across the window aligns by physical name: " +
      "renamed columns match, widened types up-cast, old deletes surface " +
      "in the TO shape") {
    val spec = ObjectStoreSpec(path = scratchDir("evo").toString,
      database = "graft_cf", table = "t_evo")
    ObjectStoreSink.replaceTable(spark,
      (0L until 90L).map(i => (i, i % 5, s"s$i")).toDF("id", "v", "s")
        .select(col("id").cast("int").as("id"), col("v"), col("s"))
        .repartitionByRange(3, col("id")), spec)
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"DELETE FROM $fq WHERE id = 3").collect() // v2: pre-evolution
    spark.sql(s"ALTER TABLE $fq RENAME COLUMN v TO val").collect() // v3
    spark.sql(s"ALTER TABLE $fq ALTER COLUMN id TYPE BIGINT").collect() // v4
    spark.sql(s"INSERT INTO $fq VALUES (3000000000, 8, 'wide')").collect() // v5
    val f = feed(spec, 1, 5)
    f.columns.toSeq shouldBe
      Seq("id", "val", "s", "_change_type", "_commit_version",
        "_commit_timestamp_ms")
    f.schema("id").dataType.sql shouldBe "BIGINT"
    f.orderBy("_commit_version").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getString(2), r.getString(3), r.getInt(4))).toSeq shouldBe
      Seq((3L, 3L, "s3", "delete", 2),
        (3000000000L, 8L, "wide", "insert", 5))
  }

  test("reference-mode commits feed identically: carried references " +
      "cancel by logical path, only the delta is read") {
    val spec = build("ref")
    val fq = s"${spec.database}.${spec.table}"
    val prev = TableManifest.publisher
    TableManifest.publisher = ReferenceCommitPublisher
    try {
      spark.sql(s"DELETE FROM $fq WHERE id = 7").collect()
      rows(feed(spec, 1, 2)) shouldBe Set((7L, 0L, "s7", "delete", 2))
    } finally TableManifest.publisher = prev
  }

  test("a partitioned table feeds through the partition-valued subset " +
      "read: COW DELETE rows carry their partition values, INSERT steps " +
      "scan only the fresh files") {
    val spec = ObjectStoreSpec(path = scratchDir("part").toString,
      database = "graft_cf", table = "t_part", partitionBy = Seq("p"))
    ObjectStoreSink.replaceTable(spark,
      (0L until 300L).map(i => (i, i % 7, s"s$i", (i % 3).toInt))
        .toDF("id", "v", "s", "p"), spec)
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"DELETE FROM $fq WHERE id = 7").collect() // v2 (p=1)
    spark.sql(s"INSERT INTO $fq VALUES (9001, 1, 'a', 2)").collect() // v3
    val f = ChangeFeed.changesBetween(spark, spec, 1, 3)
      .orderBy("_commit_version")
    f.collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("p")),
      r.getString(r.fieldIndex("_change_type")),
      r.getInt(r.fieldIndex("_commit_version")))).toSeq shouldBe Seq(
      (7L, 1, "delete", 2), (9001L, 2, "insert", 3))
    // the INSERT step scans only the fresh partition file(s)
    val step3 = ChangeFeed.changesBetween(spark, spec, 2, 3)
    absPaths(step3) shouldBe freshFiles(spec)
  }

  test("SQL surface: TABLE_CHANGES composes with WHERE/ORDER BY, masks " +
      "string literals, refuses foreign tables and bad version ranges") {
    val spec = build("sql")
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"INSERT INTO $fq VALUES (9001, 1, 'a')").collect()
    spark.sql(s"DELETE FROM $fq WHERE id = 1").collect()
    val got = spark.sql(
      s"""SELECT id, _change_type, _commit_version
         |FROM TABLE_CHANGES('$fq', 1, 3)
         |WHERE _change_type = 'delete' ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    got.toSeq shouldBe Seq((1L, "delete", 3))
    // a literal containing the function shape is data, not a table ref
    spark.sql(s"SELECT 'TABLE_CHANGES(''x'', 1, 2)' AS s")
      .head.getString(0) shouldBe "TABLE_CHANGES('x', 1, 2)"
    // empty window is a typed empty feed
    spark.sql(s"SELECT * FROM TABLE_CHANGES('$fq', 3, 3)").count() shouldBe 0L
    // foreign table: loud refusal, never a delegate guess
    val e = intercept[PipelineSpecException](
      spark.sql("SELECT * FROM TABLE_CHANGES('graft_cf.nope', 1, 2)"))
    e.getMessage should include("not a graft versioned table")
    // bad ranges: informative errors
    intercept[PipelineSpecException](
      spark.sql(s"SELECT * FROM TABLE_CHANGES('$fq', 1, 99)"))
    intercept[PipelineSpecException](
      spark.sql(s"SELECT * FROM TABLE_CHANGES('$fq', 3, 1)"))
  }
}
