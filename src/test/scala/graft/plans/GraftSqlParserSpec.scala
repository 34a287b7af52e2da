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

  private def commitKv(tag: String, rows: Seq[(java.lang.Long, String)]): String = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_sqlm_$tag", table = "t")
    ObjectStoreSink.replaceTable(spark, rows.toDF("id", "v"), spec)
  }

  test("MERGE INTO upserts with ANSI semantics: SET overwrites (NULL " +
    "included), unmatched targets carry, unmatched sources insert, and the " +
    "report counts the commit") {
    val fq = commitKv("mrg",
      (0L to 9L).map(i => (java.lang.Long.valueOf(i), "t")))
    (5L to 14L).map(i => (java.lang.Long.valueOf(i),
      if (i == 5L) null else "s")).toDF("id", "v")
      .createOrReplaceTempView("mrg_src")
    val r = spark.sql(
      s"""MERGE INTO $fq d USING mrg_src s ON (d.id = s.id)
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"""
        .stripMargin).collect().head
    r.getString(0) shouldBe "merge"
    r.getLong(1) shouldBe 10L
    r.getLong(2) shouldBe 15L
    val got = spark.table(fq).orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    got shouldBe ((0L to 4L).map(_ -> "t") ++ Seq(5L -> null) ++
      (6L to 14L).map(_ -> "s")).toArray
  }

  test("MERGE NULL join keys never match: a NULL-key target row survives " +
    "and a NULL-key source row inserts — SQL equality, not null-safe") {
    val fq = commitKv("mrgnull",
      Seq((java.lang.Long.valueOf(1L), "a"), (null, "tnull")))
    Seq((null.asInstanceOf[java.lang.Long], "snull"),
      (java.lang.Long.valueOf(1L), "a2")).toDF("id", "v")
      .createOrReplaceTempView("mrgnull_src")
    spark.sql(
      s"""MERGE INTO $fq t USING mrgnull_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""
        .stripMargin).collect()
    val got = spark.table(fq).collect()
      .map(x => (if (x.isNullAt(0)) -1L else x.getLong(0), x.getString(1)))
      .sortBy(x => (x._1, x._2))
    got shouldBe Array((-1L, "snull"), (-1L, "tnull"), (1L, "a2"))
  }

  test("MERGE cardinality: a target row matched by two source rows errors " +
    "(ANSI), while duplicate source keys matching NO target row legally " +
    "insert twice") {
    val fq = commitKv("mrgcard", Seq((java.lang.Long.valueOf(1L), "a")))
    Seq((1L, "x"), (1L, "y")).toDF("id", "v")
      .createOrReplaceTempView("mrgcard_src")
    val e = the[Exception] thrownBy spark.sql(
      s"""MERGE INTO $fq t USING mrgcard_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""
        .stripMargin).collect()
    e.getMessage should include("cardinality")
    // same duplicate keys against a disjoint target: legal, inserts both
    val fq2 = commitKv("mrgcard2", Seq((java.lang.Long.valueOf(9L), "a")))
    spark.sql(
      s"""MERGE INTO $fq2 t USING mrgcard_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""
        .stripMargin).collect()
    spark.table(fq2).count() shouldBe 3L
  }

  test("DELETE FROM deletes only predicate-TRUE rows (NULL survives), the " +
    "whole-table form empties, and every delete is a versioned commit") {
    val fq = commitKv("del", (0L to 8L).map(i =>
      (java.lang.Long.valueOf(i), if (i % 3 == 0) null else s"v$i")))
    val r = spark.sql(s"DELETE FROM $fq WHERE v > 'v4'").collect().head
    r.getLong(0) shouldBe 9L
    r.getLong(1) shouldBe 3L // v5, v7, v8 — NULL v rows survive
    spark.table(fq).count() shouldBe 6L
    val r2 = spark.sql(s"DELETE FROM $fq").collect().head
    r2.getLong(1) shouldBe 6L
    spark.table(fq).count() shouldBe 0L
    val snaps = spark.sql(s"SHOW SNAPSHOTS $fq").collect()
    snaps.map(_.getLong(2)).toSeq shouldBe Seq(9L, 6L, 0L)
  }

  test("UPDATE: assignments read the PRE-update row (SET a=b,b=a swaps), " +
    "only predicate-TRUE rows change, WHERE-less updates touch every row, " +
    "and unknown columns are loud") {
    val spec = ObjectStoreSpec(path = scratchDir("upd").getAbsolutePath,
      database = "graft_sqlm_upd", table = "t")
    val fq = ObjectStoreSink.replaceTable(spark,
      Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L))
        .toDF("id", "a", "b"), spec)
    val r = spark.sql(
      s"UPDATE $fq SET a = b, b = a WHERE id <= 2").collect().head
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 2L
    spark.table(fq).orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))) shouldBe
      Array((1L, 100L, 10L), (2L, 200L, 20L), (3L, 30L, 300L)) // swapped!
    spark.sql(s"UPDATE $fq SET a = a + 1").collect()
      .head.getLong(1) shouldBe 3L
    spark.table(fq).agg(org.apache.spark.sql.functions.sum("a"))
      .head.getLong(0) shouldBe (100L + 200L + 30L + 3L)
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"UPDATE $fq SET nope = 1").collect()).getMessage should
      include("unknown column")
    // three commits → three versions, all row-preserving
    spark.sql(s"SHOW SNAPSHOTS $fq").collect()
      .map(_.getLong(2)).toSeq shouldBe Seq(3L, 3L, 3L)
  }

  test("MERGE / DELETE on a non-versioned-layout table delegate to Spark " +
    "(foreign v1 table → Spark's own unsupported-DML error, never ours)") {
    val dir = scratchDir("dmlforeign").getAbsolutePath + "/plainloc"
    ss.range(0, 5).toDF("id").write.mode("overwrite").parquet(dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_dmlforeign")
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_dmlforeign.plain")
    spark.sql("CREATE TABLE graft_sqlm_dmlforeign.plain (id BIGINT) " +
      s"USING parquet LOCATION '$dir'")
    ss.range(0, 2).toDF("id").createOrReplaceTempView("dmlforeign_src")
    val e1 = the[Exception] thrownBy spark.sql(
      """MERGE INTO graft_sqlm_dmlforeign.plain t USING dmlforeign_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""
        .stripMargin).collect()
    e1 should not be a[graft.model.PipelineSpecException]
    val e2 = the[Exception] thrownBy spark.sql(
      "DELETE FROM graft_sqlm_dmlforeign.plain WHERE id = 1").collect()
    e2 should not be a[graft.model.PipelineSpecException]
    spark.table("graft_sqlm_dmlforeign.plain").count() shouldBe 5L
  }

  test("malformed MERGE clauses on OUR tables fail loudly with the " +
    "supported grammar — never a confusing delegate error") {
    val fq = commitKv("mrgbad", Seq((java.lang.Long.valueOf(1L), "a")))
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("mrgbad_src")
    def merge(on: String, set: String, ins: String) = spark.sql(
      s"""MERGE INTO $fq t USING mrgbad_src s ON $on
         |WHEN MATCHED THEN UPDATE SET $set
         |WHEN NOT MATCHED THEN INSERT $ins""".stripMargin).collect()
    (the[graft.model.PipelineSpecException] thrownBy
      merge("t.id > s.id", "*", "*")).getMessage should include("equi")
    (the[graft.model.PipelineSpecException] thrownBy
      merge("t.id = s.id", "nope = s.v", "*")).getMessage should
      include("unknown column")
    (the[graft.model.PipelineSpecException] thrownBy
      merge("t.id = s.id", "*", "(id, v) VALUES (s.id)")).getMessage should
      include("values")
  }

  test("a graft table in a bad legacy state (manifest without fileFormat, " +
    "unrecognizable extension) keeps maintenance OURS: the informative " +
    "refusal, not a foreign parse error — r12 advice") {
    val spec = ObjectStoreSpec(path = scratchDir("badfmt").getAbsolutePath,
      database = "graft_sqlm_badfmt", table = "t")
    ObjectStoreSink.replaceTable(spark, ss.range(0, 10).toDF("id"), spec)
    val live = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    val mf = live.resolve(TableManifest.ManifestName)
    val doctored = java.nio.file.Files.readString(mf)
      .replaceAll(",?\\s*\"fileFormat\"\\s*:\\s*\"parquet\"", "")
      .replace(".parquet", ".mystery")
    java.nio.file.Files.writeString(mf, doctored)
    val e = the[Exception] thrownBy spark.sql(
      s"OPTIMIZE ${spec.database}.${spec.table} TARGET 1024 BYTES").collect()
    e shouldBe a[graft.model.PipelineSpecException]
    e should not be a[graft.model.TableLayoutException]
    e.getMessage should include("cannot determine the file format")
  }

  test("specFor recovers bloom columns from the live shard filenames, so " +
    "OPTIMIZE and SQL MERGE commits rebuild the index instead of dropping it") {
    val spec = ObjectStoreSpec(path = scratchDir("bloomkeep").getAbsolutePath,
      database = "graft_sqlm_bloomkeep", table = "t",
      bloomColumns = Seq("id"))
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 2000).toDF("id").withColumn("v", col("id") % 5)
        .repartition(4), spec)
    val fq = s"${spec.database}.${spec.table}"
    ObjectStoreSink.specFor(spark, spec.database, spec.table)
      .bloomColumns shouldBe Seq("id")
    spark.sql(s"OPTIMIZE $fq TARGET ${64L << 20} BYTES").collect()
    val live = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    java.nio.file.Files.exists(
      live.resolve(graft.sinks.BloomIndex.shardName("id"))) shouldBe true
    spark.range(0, 1).selectExpr("id + 5000 AS id", "CAST(1 AS BIGINT) AS v")
      .createOrReplaceTempView("bloomkeep_src")
    spark.sql(
      s"""MERGE INTO $fq t USING bloomkeep_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""
        .stripMargin).collect()
    val live2 = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    live2 should not be live
    java.nio.file.Files.exists(
      live2.resolve(graft.sinks.BloomIndex.shardName("id"))) shouldBe true
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

  test("INSERT INTO is a LINK-APPEND commit: only the batch is written, " +
    "the prior version's files carry by inode, the manifest carries their " +
    "entries verbatim, and ANSI column-list semantics NULL-fill the rest") {
    val fq = commitKv("ins",
      (0L to 9L).map(i => (java.lang.Long.valueOf(i), s"v$i")))
    val spec = ObjectStoreSink.specFor(spark, "graft_sqlm_ins", "t")
    val v1 = java.nio.file.Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    val m1 = TableManifest.read(v1).get

    val r = spark.sql(
      "INSERT INTO graft_sqlm_ins.t (id) VALUES (100), (101)").collect()
    r should have size 1
    r.head.getLong(0) shouldBe 2L            // rows_inserted
    r.head.getInt(1) shouldBe m1.files.size  // files_linked
    val v2 = java.nio.file.Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    v2 should not be v1
    val m2 = TableManifest.read(v2).get
    m2.rowCount shouldBe m1.rowCount + 2
    // every v1 entry rides verbatim (same rel path, bytes, rows, stats) and
    // the data file is the SAME inode — no data was copied, let alone read
    m1.files.foreach { e =>
      m2.files.find(_.path == e.path) shouldBe Some(e)
      java.nio.file.Files.isSameFile(
        v1.resolve(e.path), v2.resolve(e.path)) shouldBe true
    }
    // ANSI list semantics: unlisted column NULL-fills, values cast
    spark.table(fq).where(col("id") >= 100L).collect()
      .map(r0 => (r0.getLong(0), r0.isNullAt(1))).toSet shouldBe
      Set((100L, true), (101L, true))
    spark.table(fq).count() shouldBe 12L
    // time travel to the pre-insert image
    ObjectStoreSink.readVersion(spark, spec, Some(1)).count() shouldBe 10L
  }

  test("INSERT INTO a partitioned versioned table links files inside " +
    "partition dirs and EXTENDS the bloom sidecar over only the new files " +
    "(carried filters bit-identical, new files covered, probes stay sound)") {
    val spec = ObjectStoreSpec(path = scratchDir("insp").getAbsolutePath,
      database = "graft_sqlm_insp", table = "t",
      partitionBy = Seq("p"), bloomColumns = Seq("k"))
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 400).toDF("k")
        .withColumn("p", (col("k") % 4).cast("long")), spec)
    val v1 = java.nio.file.Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    val shard1 = graft.sinks.BloomIndex.readCol(v1, "k").get

    spark.sql("INSERT INTO graft_sqlm_insp.t VALUES " +
      "(9001, 1), (9002, 2), (9003, 3)").collect()
    val v2 = java.nio.file.Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    val m2 = TableManifest.read(v2).get
    val shard2 = graft.sinks.BloomIndex.readCol(v2, "k").get
    // carried entries are bit-identical; new files got fresh filters
    shard1.files.foreach { case (rel, bits) =>
      shard2.files(rel) shouldBe bits
      java.nio.file.Files.isSameFile(
        v1.resolve(rel), v2.resolve(rel)) shouldBe true
    }
    shard2.files.size should be > shard1.files.size
    // probes stay sound across the append: an absent key prunes files,
    // an inserted key keeps at least the file that holds it
    val all = m2.files
    val prAbsent = graft.sinks.BloomIndex.pruneAmong(v2, all, "k",
      Seq(java.lang.Long.valueOf(555555L)), all.size, m2.totalBytes)
    prAbsent should not be empty
    prAbsent.get._1.size should be < all.size
    val prHit = graft.sinks.BloomIndex.pruneAmong(v2, all, "k",
      Seq(java.lang.Long.valueOf(9001L)), all.size, m2.totalBytes)
    prHit should not be empty
    prHit.get._1 should not be empty
    spark.table("graft_sqlm_insp.t").where(col("k") === 9001L)
      .select("p").collect()
      .map(_.getAs[Number](0).longValue()).toSeq shouldBe Seq(1L)
    spark.table("graft_sqlm_insp.t").count() shouldBe 403L
  }

  test("INSERT INTO delegates for everything that is not a versioned graft " +
    "table: foreign v1 tables keep Spark's insert, missing tables get " +
    "Spark's standard error; malformed lists on OUR tables fail loudly") {
    // foreign external table: Spark's own INSERT must still work
    val dir = scratchDir("insforeign").getAbsolutePath + "/plainloc"
    ss.range(0, 3).toDF("id").write.mode("overwrite").parquet(dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_insforeign")
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_insforeign.plain")
    spark.sql("CREATE TABLE graft_sqlm_insforeign.plain (id BIGINT) " +
      s"USING parquet LOCATION '$dir'")
    spark.sql("INSERT INTO graft_sqlm_insforeign.plain VALUES (77)").collect()
    spark.table("graft_sqlm_insforeign.plain").count() shouldBe 4L
    // missing table: the delegate's standard resolution error, not ours
    val e = the[Exception] thrownBy spark.sql(
      "INSERT INTO graft_sqlm_insforeign.nope VALUES (1)").collect()
    e should not be a[graft.model.PipelineSpecException]
    // our table, bad lists: loud grammar-naming failures
    val fq = commitKv("insbad", Seq((java.lang.Long.valueOf(1L), "a")))
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"INSERT INTO $fq (id, nope) VALUES (1, 'x')").collect())
      .getMessage should include("unknown column")
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"INSERT INTO $fq (id, id) VALUES (1, 2)").collect())
      .getMessage should include("duplicate")
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"INSERT INTO $fq (id) VALUES (1, 'x')").collect())
      .getMessage should include("source produces")
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"INSERT INTO $fq VALUES (1)").collect())
      .getMessage should include("match the arity")
    spark.table(fq).count() shouldBe 1L // nothing committed by refusals
  }

  test("INSERT OVERWRITE replaces the content as a NEW version (old image " +
    "time-travels) and TRUNCATE commits an empty version with the schema " +
    "kept — Spark's v1 behaviors would corrupt or refuse") {
    val fq = commitKv("insow",
      (0L to 9L).map(i => (java.lang.Long.valueOf(i), s"v$i")))
    val spec = ObjectStoreSink.specFor(spark, "graft_sqlm_insow", "t")
    val r = spark.sql(
      s"INSERT OVERWRITE $fq (id) VALUES (100), (101)").collect()
    r.head.getLong(0) shouldBe 2L
    spark.table(fq).collect().map(r0 =>
      (r0.getLong(0), r0.isNullAt(1))).toSet shouldBe
      Set((100L, true), (101L, true))
    ObjectStoreSink.readVersion(spark, spec, Some(1)).count() shouldBe 10L
    val tr = spark.sql(s"TRUNCATE TABLE $fq").collect()
    tr.head.getLong(0) shouldBe 2L
    spark.table(fq).count() shouldBe 0L
    spark.table(fq).schema.fieldNames.toSeq shouldBe Seq("id", "v")
    // refilling the truncated table goes through the link-append verb
    spark.sql(s"INSERT INTO $fq VALUES (7, 'x')").collect()
    spark.table(fq).count() shouldBe 1L
    // foreign tables: Spark's own TRUNCATE error surface, not ours
    val dir = scratchDir("owforeign").getAbsolutePath + "/plainloc"
    ss.range(0, 3).toDF("id").write.mode("overwrite").parquet(dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_owforeign")
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_owforeign.plain")
    spark.sql("CREATE TABLE graft_sqlm_owforeign.plain (id BIGINT) " +
      s"USING parquet LOCATION '$dir'")
    val e = the[Exception] thrownBy spark.sql(
      "TRUNCATE TABLE graft_sqlm_owforeign.plain").collect()
    e should not be a[graft.model.PipelineSpecException]
  }

  test("CREATE TABLE USING GRAFT: versioned commit with OPTIONS flowing " +
    "through (sums/blooms/partitioning), OR REPLACE commits a NEW version " +
    "with time travel, plain re-CREATE and bad options refuse loudly") {
    val root = scratchDir("ctas").getAbsolutePath
    ss.range(0, 60).toDF("id")
      .withColumn("p", (col("id") % 3).cast("long"))
      .withColumn("amt", (col("id") * 2).cast("decimal(10,2)"))
      .createOrReplaceTempView("ctas_spec_src")
    val r = spark.sql(
      s"""CREATE TABLE graft_ctas.t USING GRAFT
         |OPTIONS (path '$root', sums 'amt', blooms 'id')
         |PARTITIONED BY (p) AS
         |SELECT id, amt, p FROM ctas_spec_src""".stripMargin).collect()
    r.head.getLong(0) shouldBe 60L
    spark.table("graft_ctas.t").count() shouldBe 60L
    val spec = ObjectStoreSink.specFor(spark, "graft_ctas", "t")
    spec.sumColumns shouldBe Seq("amt")
    spec.bloomColumns shouldBe Seq("id")
    spec.partitionBy shouldBe Seq("p")
    // metadata SUM answers zero-scan on the freshly created table
    val q = spark.sql("SELECT sum(amt) AS sa FROM graft_ctas.t")
    q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
    } shouldBe empty
    q.head.getDecimal(0).longValueExact() shouldBe (0L until 60L).map(_ * 2).sum
    // plain CREATE refuses; OR REPLACE commits version 2, v1 time-travels
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"CREATE TABLE graft_ctas.t USING GRAFT OPTIONS (path '$root') AS " +
        "SELECT 1 AS x").collect()).getMessage should include("already exists")
    // partition keys are immutable through OR REPLACE (same guard as
    // every other commit): dropping PARTITIONED BY refuses…
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"""CREATE OR REPLACE TABLE graft_ctas.t USING GRAFT
         |OPTIONS (path '$root') AS
         |SELECT id, amt, p FROM ctas_spec_src WHERE id < 10""".stripMargin)
      .collect()).getMessage should include("immutable")
    // …and the like-partitioned replacement commits version 2
    spark.sql(
      s"""CREATE OR REPLACE TABLE graft_ctas.t USING GRAFT
         |OPTIONS (path '$root') PARTITIONED BY (p) AS
         |SELECT id, amt, p FROM ctas_spec_src WHERE id < 10""".stripMargin)
      .collect()
    spark.table("graft_ctas.t").count() shouldBe 10L
    ObjectStoreSink.readVersion(spark, spec, Some(1)).count() shouldBe 60L
    // unknown option and malformed pair both name the grammar
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"CREATE TABLE graft_ctas.t2 USING GRAFT OPTIONS (nope 'x') AS " +
        "SELECT 1 AS a").collect()).getMessage should include("unknown option")
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"CREATE TABLE graft_ctas.t2 USING GRAFT OPTIONS (path = 7) AS " +
        "SELECT 1 AS a").collect()).getMessage should include("pairs")
    // a PARTITIONED BY column the query doesn't produce refuses
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"CREATE TABLE graft_ctas.t2 USING GRAFT OPTIONS (path '$root') " +
        "PARTITIONED BY (ghost) AS SELECT 1 AS a").collect())
      .getMessage should include("not produced")
    // plain CREATE TABLE ... USING parquet still goes to Spark untouched
    spark.sql("DROP TABLE IF EXISTS graft_ctas.plainct")
    spark.sql("CREATE TABLE graft_ctas.plainct USING parquet LOCATION " +
      s"'$root/plainct' AS SELECT 1 AS a").collect()
    spark.table("graft_ctas.plainct").count() shouldBe 1L
  }

  test("TRUNCATE and whole-table DELETE on a PARTITIONED table commit a " +
    "schema-preserving empty version and the table refills by INSERT") {
    val spec = ObjectStoreSpec(path = scratchDir("trpart").getAbsolutePath,
      database = "graft_sqlm_trpart", table = "t", partitionBy = Seq("p"))
    val fq = ObjectStoreSink.replaceTable(spark,
      Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("id", "v", "p"), spec)
    spark.sql(s"TRUNCATE TABLE $fq").collect()
      .head.getLong(0) shouldBe 2L
    spark.table(fq).count() shouldBe 0L
    spark.table(fq).schema.fieldNames.toSeq should contain allOf ("id", "v", "p")
    spark.sql(s"INSERT INTO $fq (id, v, p) VALUES (9, 'z', 0)").collect()
    spark.table(fq).count() shouldBe 1L
    // whole-table DELETE (the reference's DELETE FROM t shape), same path
    val spec2 = spec.copy(table = "t2")
    val fq2 = ObjectStoreSink.replaceTable(spark,
      Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("id", "v", "p"), spec2)
    spark.sql(s"DELETE FROM $fq2").collect()
    spark.table(fq2).count() shouldBe 0L
    ObjectStoreSink.readVersion(spark, spec2, Some(1)).count() shouldBe 2L
    // a delete that REMOVES a whole partition: its old version dir still
    // exists on disk, so a stale catalog partition would resurrect the
    // deleted rows — the repoint must drop partitions pointing outside
    // the new version dir
    val spec3 = spec.copy(table = "t3")
    val fq3 = ObjectStoreSink.replaceTable(spark,
      Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L)).toDF("id", "v", "p"),
      spec3)
    spark.sql(s"DELETE FROM $fq3 WHERE p = 0").collect()
    spark.table(fq3).orderBy("id").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(3L)
    ObjectStoreSink.readVersion(spark, spec3, Some(1)).count() shouldBe 3L
  }

  test("appendVersion guards: batch schema must match exactly, CAS aborts " +
    "on a stale expected version, and a drifted prior version degrades to " +
    "a correct full rewrite") {
    val fq = commitKv("insapi",
      (0L to 4L).map(i => (java.lang.Long.valueOf(i), s"v$i")))
    val spec = ObjectStoreSink.specFor(spark, "graft_sqlm_insapi", "t")
    // schema drift refused
    (the[graft.model.PipelineSpecException] thrownBy
      ObjectStoreSink.appendVersion(spark,
        Seq((9L, 9L)).toDF("id", "v"), spec)).getMessage should
      include("does not match the table schema")
    // stale CAS refused
    a[graft.sinks.ConcurrentCommitException] should be thrownBy
      ObjectStoreSink.appendVersion(spark,
        Seq((java.lang.Long.valueOf(9L), "x")).toDF("id", "v"),
        spec, expectVersion = Some(99))
    // drifted prior version (manifest names a file that is gone) still
    // commits the correct union — via the full-rewrite degradation
    val v1 = java.nio.file.Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    val m1 = TableManifest.read(v1).get
    val victim = v1.resolve(m1.files.head.path)
    java.nio.file.Files.delete(victim)
    ObjectStoreSink.appendVersion(spark,
      Seq((java.lang.Long.valueOf(100L), "new")).toDF("id", "v"), spec)
    val got = spark.table(fq).orderBy("id").collect().map(_.getLong(0)).toSeq
    got.last shouldBe 100L
    got.size shouldBe (5 - m1.files.head.rows + 1).toInt
  }

  // --- copy-on-write DML ----------------------------------------------------

  /** Range-clustered multi-file fixture: `files` parquet files, each
    * covering a disjoint id window — the layout zone-map evidence proves
    * per-file untouchability on.
    */
  private def commitClustered(tag: String, n: Int,
      files: Int): ObjectStoreSpec = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_sqlm_$tag", table = "t")
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, n).toDF("id")
        .withColumn("v", (col("id") % 13).cast("long"))
        .repartitionByRange(files, col("id")),
      spec)
    spec
  }

  private def sharedInodes(spec: ObjectStoreSpec): Int = {
    val vs = ObjectStoreSink.snapshots(spec)
    val (prev, live) = (java.nio.file.Paths.get(vs(vs.size - 2).path),
      java.nio.file.Paths.get(vs.last.path))
    TableManifest.read(prev).get.files.count { e =>
      val a = prev.resolve(e.path); val b = live.resolve(e.path)
      java.nio.file.Files.exists(b) && java.nio.file.Files.isSameFile(a, b)
    }
  }

  test("DELETE WHERE on a range-clustered table is COPY-ON-WRITE: provably-" +
    "clean files hard-link (N-1 inodes shared), only the touched file " +
    "rewrites, content and time travel exact") {
    val spec = commitClustered("delcow", 4000, 4)
    val fq = s"${spec.database}.${spec.table}"
    val expect = spark.table(fq).where("NOT (id BETWEEN 100 AND 200)")
      .orderBy("id").collect()
    val r = spark.sql(
      s"DELETE FROM $fq WHERE id BETWEEN 100 AND 200").collect().head
    r.getLong(0) shouldBe 4000L
    r.getLong(1) shouldBe 101L
    r.getInt(3) shouldBe 3 // files_linked REPORTED
    sharedInodes(spec) shouldBe 3 // ...and REAL (same inode on disk)
    spark.table(fq).orderBy("id").collect() shouldBe expect
    ObjectStoreSink.readVersion(spark, spec, Some(1)).count() shouldBe 4000L
  }

  test("DELETE whose predicate provably matches NOTHING links every file " +
    "(commit is pure metadata + links); an evidence-free predicate " +
    "degrades to the full rewrite and stays correct") {
    val spec = commitClustered("delnone", 1000, 4)
    val fq = s"${spec.database}.${spec.table}"
    val r = spark.sql(s"DELETE FROM $fq WHERE id > 999999").collect().head
    r.getLong(1) shouldBe 0L
    r.getInt(3) shouldBe 4
    sharedInodes(spec) shouldBe 4
    spark.table(fq).count() shouldBe 1000L
    // no-evidence shape (a function of a column): full rewrite, 0 links,
    // ANSI-correct result
    val r2 = spark.sql(
      s"DELETE FROM $fq WHERE pmod(id, 10) = 3").collect().head
    r2.getLong(1) shouldBe 100L
    r2.getInt(3) shouldBe 0
    spark.table(fq).where("pmod(id, 10) = 3").count() shouldBe 0L
  }

  test("UPDATE WHERE on a range-clustered table is COW with a SINGLE scan " +
    "of the touched subset: clean files link, the matched count is " +
    "OBSERVED on the write scan (no second pass), result exact") {
    val spec = commitClustered("updcow", 4000, 4)
    val fq = s"${spec.database}.${spec.table}"
    val expect = spark.table(fq)
      .selectExpr("id", "CASE WHEN id BETWEEN 3500 AND 3600 THEN v + 100 " +
        "ELSE v END AS v").orderBy("id").collect()
    // count every query execution that SCANS the table's files while the
    // UPDATE runs: exactly ONE (the COW write over the touched subset) —
    // the report's matched count must ride that same scan
    val scans = new java.util.concurrent.atomic.AtomicInteger
    val probe = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = {
        val reads = qe.analyzed.collect {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation
              if (l.relation match {
                case h: org.apache.spark.sql.execution.datasources
                  .HadoopFsRelation => h.location.rootPaths
                    .exists(_.toString.contains(s"/${spec.database}/t/"))
                case _ => false
              }) => l
        }
        if (reads.nonEmpty) scans.incrementAndGet(): Unit
      }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(probe)
    val r =
      try spark.sql(
        s"UPDATE $fq SET v = v + 100 WHERE id BETWEEN 3500 AND 3600")
        .collect().head
      finally {
        // listener delivery is async — settle before unregistering
        val deadline = System.nanoTime() + 5000000000L
        var last = -1
        while (System.nanoTime() < deadline && scans.get != last) {
          last = scans.get; Thread.sleep(300L)
        }
        spark.listenerManager.unregister(probe)
      }
    r.getLong(1) shouldBe 101L // matched count, observed not re-scanned
    r.getInt(3) shouldBe 3
    sharedInodes(spec) shouldBe 3
    scans.get shouldBe 1 // one scan of the target: the COW write itself
    spark.table(fq).orderBy("id").collect() shouldBe expect
  }

  test("MERGE clause generality: conditional MATCHED DELETE/UPDATE in " +
    "order (first-true-wins), conditional NOT MATCHED INSERT, and NOT " +
    "MATCHED BY SOURCE DELETE — ANSI semantics end to end") {
    val fq = commitKv("mrggen", Seq(
      (java.lang.Long.valueOf(1L), "keep-carry"), // no source partner, v long
      (java.lang.Long.valueOf(2L), "del-matched"),
      (java.lang.Long.valueOf(3L), "upd-matched"),
      (java.lang.Long.valueOf(4L), "bysource-del")))
    // source: 2 (cond-delete), 3 (update), 5 (cond-insert in), 6 (cond-
    // insert filtered out)
    Seq((2L, "DEL"), (3L, "NEW3"), (5L, "NEW5"), (6L, "skip"))
      .toDF("id", "v").createOrReplaceTempView("mrggen_src")
    // target rows 1 and 4 have no partner; the BY SOURCE clause deletes
    // only id=4 (cond); matched id=2 deletes by the FIRST clause, id=3
    // falls to the second (update); source 5 inserts, 6 is filtered
    val r = spark.sql(
      s"""MERGE INTO $fq t USING mrggen_src s ON t.id = s.id
         |WHEN MATCHED AND s.v = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED AND s.v != 'skip' THEN INSERT (id, v)
         |  VALUES (s.id, s.v)
         |WHEN NOT MATCHED BY SOURCE AND t.v = 'bysource-del' THEN DELETE"""
        .stripMargin).collect().head
    r.getString(0) shouldBe "merge"
    val got = spark.table(fq).orderBy("id").collect()
      .map(row => (row.getLong(0), row.getString(1))).toSeq
    got shouldBe Seq((1L, "keep-carry"), (3L, "NEW3"), (5L, "NEW5"))
  }

  test("MERGE clause-order matters: an earlier unconditional MATCHED " +
    "clause shadows a later one; NOT MATCHED BY SOURCE UPDATE rewrites " +
    "partner-free target rows only") {
    val fq = commitKv("mrgord", Seq(
      (java.lang.Long.valueOf(1L), "a"), (java.lang.Long.valueOf(2L), "b")))
    Seq((1L, "src")).toDF("id", "v").createOrReplaceTempView("mrgord_src")
    spark.sql(
      s"""MERGE INTO $fq t USING mrgord_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = 'first'
         |WHEN MATCHED AND s.v = 'src' THEN UPDATE SET v = 'second'
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'orphaned'"""
        .stripMargin).collect()
    spark.table(fq).orderBy("id").collect()
      .map(row => (row.getLong(0), row.getString(1))).toSeq shouldBe
      Seq((1L, "first"), (2L, "orphaned"))
  }

  test("unsupported MERGE clause shapes refuse with the supported " +
    "grammar: NOT MATCHED DELETE, MATCHED INSERT, garbage in the chain") {
    val fq = commitKv("mrgref", Seq((java.lang.Long.valueOf(1L), "a")))
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("mrgref_src")
    def merge(chain: String) = spark.sql(
      s"MERGE INTO $fq t USING mrgref_src s ON t.id = s.id $chain")
      .collect()
    (the[graft.model.PipelineSpecException] thrownBy
      merge("WHEN NOT MATCHED THEN DELETE")).getMessage should
      include("only INSERT")
    (the[graft.model.PipelineSpecException] thrownBy
      merge("WHEN MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"))
      .getMessage should include("NOT MATCHED")
    (the[graft.model.PipelineSpecException] thrownBy
      merge("WHEN MATCHED THEN UPDATE SET v = s.v AND ALSO NONSENSE " +
        "WHEN NOT MATCHED THEN FROB")).getMessage should
      include("supported")
  }

  test("MERGE on a range-clustered table is COPY-ON-WRITE: files provably " +
    "holding no source key hard-link; only the touched file merges; " +
    "BY SOURCE clauses disable the evidence path (they touch everything)") {
    val spec = commitClustered("mrgcow", 4000, 4)
    val fq = s"${spec.database}.${spec.table}"
    // source keys land entirely in the LAST file's range + fresh inserts
    Seq((3900L, 999L), (3950L, 999L), (99999L, 1L))
      .toDF("id", "v").createOrReplaceTempView("mrgcow_src")
    val r = spark.sql(
      s"""MERGE INTO $fq t USING mrgcow_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"""
        .stripMargin).collect().head
    r.getLong(2) shouldBe 4001L
    r.getInt(4) shouldBe 3 // files_linked
    sharedInodes(spec) shouldBe 3
    spark.table(fq).where("v = 999").count() shouldBe 2L
    spark.table(fq).where("id = 99999").count() shouldBe 1L
    spark.table(fq).count() shouldBe 4001L
    // a BY SOURCE clause must touch every file: full rewrite, 0 links
    Seq((1L, 5L)).toDF("id", "v").createOrReplaceTempView("mrgcow_src2")
    val r2 = spark.sql(
      s"""MERGE INTO $fq t USING mrgcow_src2 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED BY SOURCE AND t.id = 99999 THEN DELETE"""
        .stripMargin).collect().head
    r2.getInt(4) shouldBe 0
    spark.table(fq).where("id = 99999").count() shouldBe 0L
    spark.table(fq).where("id = 1").collect().head.getLong(1) shouldBe 5L
  }

  test("SQL time travel: VERSION AS OF reads a pinned committed snapshot, " +
    "TIMESTAMP AS OF resolves against committed_at_ms, travel composes " +
    "with joins, and errors are informative") {
    val spec = commit("travel", 100, 2)
    val fq = s"${spec.database}.${spec.table}"
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 40).toDF("id").withColumn("grp", (col("id") % 7)
        .cast("long")), spec)
    spark.sql(s"SELECT * FROM $fq VERSION AS OF 1").count() shouldBe 100L
    spark.sql(s"SELECT * FROM $fq VERSION AS OF 2").count() shouldBe 40L
    spark.sql(s"SELECT * FROM $fq").count() shouldBe 40L
    // synonyms + FOR
    spark.sql(s"SELECT * FROM $fq FOR SYSTEM_VERSION AS OF 1")
      .count() shouldBe 100L
    // TIMESTAMP AS OF at exactly v1's commit time resolves to v1
    val v1ms = ObjectStoreSink.snapshots(spec).head.committedAtMs
    val lit = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(v1ms),
      java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone")))
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    spark.sql(s"SELECT * FROM $fq TIMESTAMP AS OF '$lit'")
      .count() shouldBe 100L
    // travel in a self-join: rows deleted between v1 and live
    spark.sql(
      s"""SELECT count(*) AS gone FROM $fq VERSION AS OF 1 a
         |LEFT ANTI JOIN $fq b ON a.id = b.id""".stripMargin)
      .collect().head.getLong(0) shouldBe 60L
    // unknown version / too-early timestamp: informative refusals
    (the[Exception] thrownBy spark.sql(
      s"SELECT * FROM $fq VERSION AS OF 99").collect())
      .getMessage should include("99")
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"SELECT * FROM $fq TIMESTAMP AS OF '1990-01-01'").collect())
      .getMessage should include("no committed snapshot")
  }

  test("time travel on a FOREIGN table keeps the clause for the delegate " +
    "(Spark's own v1 error, never ours)") {
    val dir = scratchDir("travelforeign").getAbsolutePath + "/floc"
    ss.range(0, 5).toDF("id").write.mode("overwrite").parquet(dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_travelforeign")
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_travelforeign.plain")
    spark.sql("CREATE TABLE graft_sqlm_travelforeign.plain (id BIGINT) " +
      s"USING parquet LOCATION '$dir'")
    val e = the[Exception] thrownBy spark.sql(
      "SELECT * FROM graft_sqlm_travelforeign.plain VERSION AS OF 1")
      .collect()
    e should not be a[graft.model.PipelineSpecException]
  }

  test("cowVersion CAS: a stale expected version aborts instead of " +
    "resurrecting pre-commit content over a racing writer; stale carried " +
    "entries degrade to a correct full rewrite") {
    val spec = commitClustered("cowcas", 400, 2)
    val fq = s"${spec.database}.${spec.table}"
    val m1 = TableManifest.read(java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)).get
    // another writer commits first → the pinned-version COW must abort
    ObjectStoreSink.replaceTable(spark,
      spark.table(fq).where("id < 300"), spec)
    a[graft.sinks.ConcurrentCommitException] should be thrownBy
      ObjectStoreSink.cowVersion(spark,
        spark.table(fq).limit(0), spec, m1.files,
        fullImage = spark.table(fq), expectVersion = Some(1))
    // carried entries not in the LIVE manifest (v1's names) degrade the
    // commit to the full image, never a guess
    val rep = ObjectStoreSink.cowVersion(spark,
      spark.table(fq).limit(0), spec, m1.files,
      fullImage = ObjectStoreSink.readVersion(spark, spec)
        .where("id >= 100"),
      expectVersion = Some(2))
    rep.degraded shouldBe true
    spark.table(fq).count() shouldBe 200L // 100..299
  }

  test("INSERT variants outside the strict shapes REFUSE on a graft table " +
    "instead of delegating to Spark's destructive v1 insert (r13 advice); " +
    "foreign tables still delegate untouched") {
    val spec = commit("insref", 50, 2)
    val fq = s"${spec.database}.${spec.table}"
    val before = spark.table(fq).orderBy("id").collect()
    // PARTITION clause — the strict shape doesn't cover it
    val e1 = the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"INSERT INTO $fq PARTITION (grp=1) VALUES (1)")
    e1.getMessage should include("not supported on a graft versioned table")
    // backtick-quoted identifier — ditto
    val e2 = the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"INSERT INTO `${spec.database}`.`${spec.table}` VALUES (1, 2)")
    e2.getMessage should include("graft versioned table")
    // nothing was mutated by either refusal
    spark.table(fq).orderBy("id").collect() shouldBe before
    // a FOREIGN v1 table keeps Spark's own PARTITION-insert behavior
    val dir = scratchDir("insref_plain").getAbsolutePath + "/ploc"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_insref")
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_insref.plain")
    spark.sql("CREATE TABLE graft_sqlm_insref.plain (id BIGINT) " +
      s"USING parquet PARTITIONED BY (p INT) LOCATION '$dir'")
    spark.sql(
      "INSERT INTO graft_sqlm_insref.plain PARTITION (p=1) VALUES (7)")
    spark.table("graft_sqlm_insref.plain").count() shouldBe 1L
  }

  test("a graft table whose probe FAILS (bad manifest state) refuses the " +
    "plain INSERT instead of delegating — a flaky probe must never select " +
    "the destructive path (r13 advice)") {
    val spec = commit("insbad", 10, 1)
    val fq = s"${spec.database}.${spec.table}"
    val live = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    val mf = live.resolve(TableManifest.ManifestName)
    val doctored = java.nio.file.Files.readString(mf)
      .replaceAll(",?\\s*\"fileFormat\"\\s*:\\s*\"parquet\"", "")
      .replace(".parquet", ".mystery")
    java.nio.file.Files.writeString(mf, doctored)
    val e = the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"INSERT INTO $fq VALUES (1, 2)")
    e.getMessage should include("refusing to delegate")
  }

  test("non-widening column DDL on a graft table refuses (the catalog " +
    "schema must never drift behind the manifest); a foreign table's " +
    "ALTER delegates and applies") {
    val spec = commit("altref", 10, 1)
    val fq = s"${spec.database}.${spec.table}"
    // retype and REPLACE remain refused (DROP/RENAME are now metadata-only
    // versioned commits of their own — ColumnEvolveSpec)
    val e = the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"ALTER TABLE $fq ALTER COLUMN grp TYPE INT")
    e.getMessage should include("retype")
    val e2 = the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"ALTER TABLE $fq REPLACE COLUMNS (id BIGINT)")
    e2.getMessage should include("versioned")
    spark.table(fq).columns.toSeq shouldBe Seq("id", "grp")
    // foreign external parquet table: Spark applies ADD COLUMNS normally
    val dir = scratchDir("altref_plain").getAbsolutePath + "/aloc"
    ss.range(0, 3).toDF("id").write.mode("overwrite").parquet(dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_altref")
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_altref.plain")
    spark.sql("CREATE TABLE graft_sqlm_altref.plain (id BIGINT) " +
      s"USING parquet LOCATION '$dir'")
    spark.sql("ALTER TABLE graft_sqlm_altref.plain ADD COLUMNS (extra INT)")
    spark.table("graft_sqlm_altref.plain").columns.toSeq shouldBe
      Seq("id", "extra")
  }

  test("ALTER TABLE ADD COLUMNS is a METADATA-ONLY versioned commit: all " +
    "files hard-link, old rows read NULL, INSERT and COW DML work under " +
    "the widened shape, time travel keeps each version's own shape") {
    val spec = commitClustered("evolve", 2000, 4)
    val fq = s"${spec.database}.${spec.table}"
    val r = spark.sql(
      s"ALTER TABLE $fq ADD COLUMNS (score DOUBLE, note STRING)")
      .collect().head
    r.getInt(0) shouldBe 2
    r.getInt(1) shouldBe 4 // every prior file linked, none read
    sharedInodes(spec) shouldBe 4
    spark.table(fq).columns.toSeq shouldBe Seq("id", "v", "score", "note")
    spark.table(fq).where("score IS NOT NULL").count() shouldBe 0L
    spark.table(fq).count() shouldBe 2000L
    // the widened arity is live for INSERT (link-append carries the pin)
    spark.sql(s"INSERT INTO $fq VALUES (99999, 1, 2.5, 'hi')").collect()
    spark.table(fq).where("note = 'hi'").count() shouldBe 1L
    // COW DELETE over MIXED old/new files reads under the pinned shape
    val rDel = spark.sql(
      s"DELETE FROM $fq WHERE id BETWEEN 0 AND 100").collect().head
    rDel.getLong(1) shouldBe 101L
    rDel.getInt(3) shouldBe 4 // 4 of 5 files provably untouched
    spark.table(fq).count() shouldBe 1900L
    spark.table(fq).columns.length shouldBe 4
    // time travel: the pre-evolution image keeps the OLD shape
    spark.sql(s"SELECT * FROM $fq VERSION AS OF 1").columns.toSeq shouldBe
      Seq("id", "v")
    // duplicate names refuse (case-insensitive)
    (the[graft.model.PipelineSpecException] thrownBy spark.sql(
      s"ALTER TABLE $fq ADD COLUMNS (V BIGINT)")).getMessage should
      include("already exist")
  }

  test("partitioned evolution: added columns land BEFORE the partition " +
    "columns, partitions keep working, and later commits carry the pin") {
    val spec = ObjectStoreSpec(path = scratchDir("evolvep").getAbsolutePath,
      database = "graft_sqlm_evolvep", table = "t", partitionBy = Seq("p"))
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 300).toDF("id")
        .withColumn("p", (col("id") % 3).cast("int")), spec)
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"ALTER TABLE $fq ADD COLUMNS (w BIGINT)").collect()
    spark.table(fq).columns.toSeq shouldBe Seq("id", "w", "p")
    spark.table(fq).where("p = 1").count() shouldBe 100L
    spark.sql(s"INSERT INTO $fq VALUES (9999, 7, 1)").collect()
    spark.table(fq).where("w = 7").collect().head.getInt(2) shouldBe 1
    // a later UPDATE (full path) materializes and keeps the shape exact
    spark.sql(s"UPDATE $fq SET w = id WHERE p = 2").collect()
    spark.table(fq).where("p = 2 AND w IS NULL").count() shouldBe 0L
    spark.table(fq).where("p = 0 AND w IS NOT NULL").count() shouldBe 0L
  }

  test("a temp view SHADOWING a graft table name keeps the plain verbs " +
    "with Spark — temp views shadow tables in Spark's own resolution") {
    val spec = commit("shadow", 5, 1)
    val prevDb = spark.catalog.currentDatabase
    try {
      spark.catalog.setCurrentDatabase(spec.database)
      ss.range(0, 2).toDF("id").createOrReplaceTempView("t")
      val e = the[Exception] thrownBy spark.sql(
        "INSERT INTO t VALUES (9, 9)").collect()
      e should not be a[graft.model.PipelineSpecException]
      // the graft table behind the shadow is untouched
      spark.table(s"${spec.database}.t").count() shouldBe 5L
    } finally {
      spark.catalog.dropTempView("t")
      spark.catalog.setCurrentDatabase(prevDb)
    }
  }

  test("CREATE … USING GRAFT OPTIONS survives a quoted value containing " +
    "')' — the match is quote-aware, parseOptions does the validation") {
    val root = scratchDir("ctasparen").getAbsolutePath + "/lake(prod)"
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_paren.t")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_paren")
    val r = spark.sql(
      s"""CREATE TABLE graft_sqlm_paren.t USING GRAFT
         |OPTIONS (path '$root') AS SELECT 1 AS x""".stripMargin).collect()
    r.head.getLong(0) shouldBe 1L
    r.head.getString(2) should include("lake(prod)")
    spark.table("graft_sqlm_paren.t").collect().map(_.getInt(0)) shouldBe
      Array(1)
  }

  test("over-cap MERGE degrades to the RANGE proof, not a full rewrite: " +
    "provably-outside-band files still link") {
    val spec = ObjectStoreSpec(path = scratchDir("ovc").getAbsolutePath,
      database = "graft_sqlm_ovc", table = "t")
    ObjectStoreSink.replaceTable(spark,
      ss.range(0, 4000).toDF("id").withColumn("v", col("id") % 9)
        .repartitionByRange(4, col("id")), spec)
    val fq = s"${spec.database}.${spec.table}"
    // 50 distinct source keys, all inside the TOP range band — over the
    // (shrunk) cap, so the exact key-set proof refuses and the [min, max]
    // relaxation must take over
    ss.range(3800, 3850).toDF("id").withColumn("nv", lit(999L))
      .createOrReplaceTempView("ovc_src")
    val prev = spark.conf.getOption("spark.graft.merge.cowMaxKeys")
    spark.conf.set("spark.graft.merge.cowMaxKeys", "10")
    try {
      val r = spark.sql(
        s"""MERGE INTO $fq t USING ovc_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
        .collect().head
      withClue(s"report $r: ") { r.getInt(4) shouldBe 3 }
      spark.table(fq).where("v = 999").count() shouldBe 50L
      spark.table(fq).count() shouldBe 4000L
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.merge.cowMaxKeys", v)
      case None => spark.conf.unset("spark.graft.merge.cowMaxKeys")
    }
  }

  test("MERGE clause scope validation: out-of-scope column references " +
    "refuse instead of silently evaluating to NULL") {
    val spec = commit("scope", 100, 2)
    val fq = s"${spec.database}.${spec.table}"
    ss.range(0, 10).toDF("id").withColumn("nv", lit(1L))
      .createOrReplaceTempView("scope_src")
    // NOT MATCHED BY SOURCE sees only target columns
    val e1 = intercept[graft.model.PipelineSpecException](spark.sql(
      s"""MERGE INTO $fq t USING scope_src s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET grp = s.nv"""
        .stripMargin).collect())
    e1.getMessage should include("NOT MATCHED BY SOURCE")
    // NOT MATCHED [BY TARGET] INSERT sees only source columns
    val e2 = intercept[graft.model.PipelineSpecException](spark.sql(
      s"""MERGE INTO $fq t USING scope_src s ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT (id, grp) VALUES (s.id, t.grp)"""
        .stripMargin).collect())
    e2.getMessage should include("source columns are visible")
    // unqualified source-only names in a BY SOURCE condition refuse too
    val e3 = intercept[graft.model.PipelineSpecException](spark.sql(
      s"""MERGE INTO $fq t USING scope_src s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND nv > 0 THEN DELETE"""
        .stripMargin).collect())
    e3.getMessage should include("nv")
  }

  test("destructive catalog DDL refuses on graft tables; the engine's " +
    "own internal repoints keep working") {
    val spec = commit("ddl", 100, 2)
    val fq = s"${spec.database}.${spec.table}"
    def refused(sql: String): Unit = {
      val e = intercept[graft.model.PipelineSpecException](
        spark.sql(sql).collect())
      e.getMessage should include(spec.table)
    }
    refused(s"ALTER TABLE $fq ADD PARTITION (grp=99)")
    refused(s"ALTER TABLE $fq DROP PARTITION (grp=1)")
    refused(s"ALTER TABLE $fq SET LOCATION '/tmp/elsewhere'")
    refused(s"ALTER TABLE $fq RENAME TO ${spec.database}.t2")
    refused(s"ALTER TABLE $fq SET TBLPROPERTIES ('a'='b')")
    refused(s"MSCK REPAIR TABLE $fq")
    // a graft commit (which issues SET LOCATION + MSCK internally under
    // the InternalDdl marker) still goes through
    spark.sql(s"INSERT INTO $fq VALUES (9999, 0)").collect()
    spark.table(fq).count() shouldBe 101L
    // and a FOREIGN table keeps Spark's own semantics (delegated)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_sqlm_fr")
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_fr.plain")
    spark.sql(
      s"""CREATE TABLE graft_sqlm_fr.plain (id INT) USING parquet
         |LOCATION '${scratchDir("frn").getAbsolutePath}/plain'"""
        .stripMargin)
    spark.sql(
      "ALTER TABLE graft_sqlm_fr.plain SET TBLPROPERTIES ('a'='b')")
      .collect()
  }

  test("time travel rewrite is quote- and position-aware: a travel " +
    "SEQUENCE inside a string literal is data, not a table reference") {
    val spec = ObjectStoreSpec(path = scratchDir("ttq").getAbsolutePath,
      database = "graft_sqlm_ttq", table = "t")
    ObjectStoreSink.replaceTable(spark,
      Seq((1L, "seed")).toDF("id", "s"), spec)
    val fq = s"${spec.database}.${spec.table}"
    // the literal names THIS graft table with a travel clause — the old
    // position-blind rewrite would replace it with a temp-view name
    spark.sql(s"INSERT INTO $fq VALUES (2, '$fq VERSION AS OF 1')")
      .collect()
    spark.table(fq).where("id = 2").select("s").head.getString(0) shouldBe
      s"$fq VERSION AS OF 1"
    // real travel in FROM position still works, same statement shape
    spark.sql(s"SELECT count(*) AS c FROM $fq VERSION AS OF 1")
      .head.getLong(0) shouldBe 1L
    // and inside a comment it is ignored
    spark.sql(s"SELECT count(*) AS c -- $fq VERSION AS OF 99\nFROM $fq")
      .head.getLong(0) shouldBe 2L
  }

  test("SHOW SNAPSHOTS surfaces the COW economics: carried vs written " +
    "per version") {
    val spec = commit("econ", 2000, 4)
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"INSERT INTO $fq VALUES (90001, 0)").collect() // link-append
    spark.sql(s"ALTER TABLE $fq ADD COLUMNS (w DOUBLE)").collect() // metadata
    val rows = spark.sql(s"SHOW SNAPSHOTS $fq").collect()
    rows.map(_.getInt(0)).toSeq shouldBe Seq(1, 2, 3)
    val byV = rows.map(r => r.getInt(0) ->
      ((r.getInt(6), r.getInt(7), r.getLong(8)))).toMap
    byV(1)._1 shouldBe 0 // CTAS: nothing carried
    byV(1)._2 shouldBe 4
    byV(2)._1 shouldBe 4 // link-append: all 4 carried, 1 written
    byV(2)._2 shouldBe 1
    byV(3)._1 shouldBe 5 // metadata-only: all carried, ZERO bytes written
    byV(3)._2 shouldBe 0
    byV(3)._3 shouldBe 0L
  }
}
