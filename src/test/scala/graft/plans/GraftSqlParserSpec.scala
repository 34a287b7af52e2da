package graft.plans

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.{ObjectStoreSink, TableManifest, ZoneMap}
import org.apache.spark.sql.functions._

/** The maintenance-SQL dialect: OPTIMIZE (bin-pack and ZORDER),
  * VACUUM, SHOW SNAPSHOTS — parsed in front of Spark's parser, executed
  * through the real operators, reported as rows; everything else
  * delegates untouched.
  */
class GraftSqlParserSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def commit(tag: String, n: Int, files: Int): ObjectStoreSpec = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_sqlm_$tag", table = "t")
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, n).toDF("id")
        .withColumn("grp", (col("id") % 7).cast("long"))
        .repartition(files), spec)
    spec
  }

  test("OPTIMIZE bin-packs a fragmented table through SQL: fewer files, " +
    "identical content, catalog still serves the table") {
    val spec = commit("opt", 2000, 16)
    val fq = s"${spec.database}.${spec.table}"
    val before = spark.table(fq).orderBy("id").collect()
    val r = spark.sql(s"OPTIMIZE $fq TARGET ${64L << 20} BYTES").collect()
    r should have size 1
    r.head.getString(0) shouldBe "compact"
    r.head.getInt(1) shouldBe 16
    r.head.getInt(2) should be < 16
    spark.table(fq).orderBy("id").collect() shouldBe before
  }

  test("OPTIMIZE ZORDER BY re-lays the table so BOTH dimensions prune " +
    "from the manifest; content identical; txn-stamp-free CAS commit") {
    val spec = commit("zord", 8000, 4)
    val fq = s"${spec.database}.${spec.table}"
    val before = spark.table(fq).orderBy("id").collect()
    // tiny TARGET so the re-layout spreads over many files even at
    // test-fixture bytes — the z-curve needs >1 file to prove skips
    val r = spark.sql(
      s"OPTIMIZE $fq ZORDER BY (id, grp) TARGET 2048 BYTES").collect()
    r.head.getString(0) shouldBe "zorder"
    r.head.getInt(2) should be > 1
    val live = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    val m = TableManifest.read(live).get
    ZoneMap.prune(m, Seq(ZoneMap.Bound("id", Some(0L), Some(200L))))
      ._2.filesSkipped should be > 0
    ZoneMap.prune(m, Seq(ZoneMap.Bound("grp", Some(0L), Some(1L))))
      ._2.filesSkipped should be > 0
    spark.table(fq).orderBy("id").collect() shouldBe before
  }

  test("VACUUM retires superseded versions past KEEP through SQL and " +
    "reports bytes; SHOW SNAPSHOTS inventories the survivors") {
    val spec = commit("vac", 100, 2)
    val fq = s"${spec.database}.${spec.table}"
    // two more commits → three versions on disk
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 150).toDF("id").withColumn("grp", col("id") % 7), spec)
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 200).toDF("id").withColumn("grp", col("id") % 7), spec)
    val grace0 = ObjectStoreSink.retireGraceMs
    ObjectStoreSink.retireGraceMs = 0L
    try {
      val r = spark.sql(s"VACUUM $fq KEEP 1").collect()
      r should have size 1
      r.head.getInt(0) should be >= 1
      r.head.getLong(1) should be > 0L
    } finally ObjectStoreSink.retireGraceMs = grace0
    val snaps = spark.sql(s"SHOW SNAPSHOTS $fq").collect()
    snaps should have size 1
    snaps.head.getBoolean(5) shouldBe true // live
    snaps.head.getLong(2) shouldBe 200L // row_count
    spark.table(fq).count() shouldBe 200L
  }

  test("SHOW SNAPSHOTS lists every committed version oldest → newest " +
    "with exact manifest accounting") {
    val spec = commit("snap", 50, 2)
    val fq = s"${spec.database}.${spec.table}"
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 80).toDF("id").withColumn("grp", col("id") % 7), spec)
    val rows = spark.sql(s"SHOW SNAPSHOTS $fq").collect()
    rows should have size 2
    rows.map(_.getInt(0)).toSeq shouldBe rows.map(_.getInt(0)).toSeq.sorted
    rows.map(_.getLong(2)).toSeq shouldBe Seq(50L, 80L)
    rows.map(_.getBoolean(5)).toSeq shouldBe Seq(false, true)
  }

  test("everything else delegates: plain SQL unchanged, malformed " +
    "maintenance shapes fall through to Spark's own parse error") {
    spark.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) shouldBe 2
    // not our shape (backticks) → Spark's parser, which rejects it
    an[Exception] should be thrownBy
      spark.sql("OPTIMIZE `weird table` TARGET x BYTES").collect()
    // unknown table through our shape → loud resolution error, not a guess
    an[Exception] should be thrownBy
      spark.sql("SHOW SNAPSHOTS no_such_db.no_such_table").collect()
  }

  test("a registered table that does NOT follow the versioned layout falls " +
    "through to the delegate parser — a co-installed extension owning the " +
    "verbs is never shadowed") {
    val dir = scratchDir("foreign").getAbsolutePath + "/plainloc"
    ss.range(0, 10).toDF("id").write.mode("overwrite").parquet(dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_foreign")
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_foreign.plain")
    spark.sql(s"CREATE TABLE graft_sqlm_foreign.plain (id BIGINT) " +
      s"USING parquet LOCATION '$dir'")
    // our parser declines; Spark's own parser (the delegate) rejects the
    // unknown verb — a PARSE error, never the layout-refusal exception
    val e = the[Exception] thrownBy
      spark.sql("OPTIMIZE graft_sqlm_foreign.plain TARGET 1024 BYTES").collect()
    e should not be a[graft.model.PipelineSpecException]
    e.getClass.getName should include("ParseException")
    // the plain table itself is untouched and still serves
    spark.table("graft_sqlm_foreign.plain").count() shouldBe 10L
  }

  test("maintenance runs under the manifest-RECORDED file format (an orc " +
    "table compacts as orc); legacy manifests without the field fall back " +
    "to extension matching") {
    val spec = ObjectStoreSpec(path = scratchDir("orcfmt").getAbsolutePath,
      database = "graft_sqlm_orc", table = "t", fileFormat = "orc")
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 500).toDF("id").repartition(8), spec)
    val fq = s"${spec.database}.${spec.table}"
    val live = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    TableManifest.read(live).get.fileFormat shouldBe "orc"
    val before = spark.table(fq).orderBy("id").collect()
    val r = spark.sql(s"OPTIMIZE $fq TARGET ${64L << 20} BYTES").collect()
    r.head.getString(0) shouldBe "compact"
    r.head.getInt(2) should be < 8
    spark.table(fq).orderBy("id").collect() shouldBe before
    // legacy manifest (field absent): rewrite the live manifest JSON
    // without fileFormat — specFor still resolves via the extension
    val live2 = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    val mf = live2.resolve(TableManifest.ManifestName)
    val stripped = java.nio.file.Files.readString(mf)
      .replaceAll(",?\\s*\"fileFormat\"\\s*:\\s*\"orc\"", "")
    java.nio.file.Files.writeString(mf, stripped)
    TableManifest.read(live2).get.fileFormat shouldBe ""
    ObjectStoreSink.specFor(spark, spec.database, spec.table)
      .fileFormat shouldBe "orc"
  }
}
