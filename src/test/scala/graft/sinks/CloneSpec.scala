package graft.sinks

import graft.SparkSpec
import graft.model.{ObjectStoreSpec, PipelineSpecException}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** SHALLOW CLONE ([[ObjectStoreSink.cloneTable]] / `CREATE TABLE t2
  * SHALLOW CLONE t [VERSION AS OF n]`): a zero-copy metadata commit whose
  * v1 manifest references every source file, carrying stats/Bloom
  * evidence; the clone lives independently (its DML copy-on-writes, the
  * source never changes) while the [[CloneRegistry]] pins referenced
  * source versions against the source's own vacuum/retention.
  */
class CloneSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def build(tag: String, partitioned: Boolean = false)
      : ObjectStoreSpec = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).toString,
      database = "graft_clone", table = s"t_$tag",
      partitionBy = if (partitioned) Seq("p") else Nil,
      bloomColumns = Seq("id"))
    val df = (0L until 300L).map(i => (i, i % 7, s"s$i", (i % 3).toInt))
      .toDF("id", "v", "s", "p")
    ObjectStoreSink.replaceTable(spark,
      if (partitioned) df else df.repartitionByRange(3, col("id")), spec)
    spec
  }

  test("SHALLOW CLONE is a zero-copy metadata commit: content identical, " +
      "no data files written, refs resolve to the source's own files, " +
      "stats and Bloom evidence carried") {
    val spec = build("base")
    val srcFq = s"${spec.database}.${spec.table}"
    val r = spark.sql(
      s"CREATE TABLE graft_clone.c_base SHALLOW CLONE $srcFq")
      .collect().head
    r.getString(0) shouldBe "graft_clone.c_base"
    r.getInt(3) shouldBe 3
    // content identical
    spark.table("graft_clone.c_base").orderBy("id").collect() shouldBe
      spark.table(srcFq).orderBy("id").collect()
    // zero data files in the clone's version dir; every entry references
    // a real file physically inside the SOURCE's version dir
    val cSpec = spec.copy(table = "c_base")
    val v1 = Paths.get(ObjectStoreSink.snapshots(cSpec).last.path)
    TableManifest.dataFiles(v1) shouldBe empty
    val m = TableManifest.read(v1).get
    val srcV = Paths.get(ObjectStoreSink.snapshots(spec).last.path)
      .toAbsolutePath.normalize
    m.files.foreach { e =>
      e.ref should not be ""
      Files.isRegularFile(TableManifest.resolved(v1, e)) shouldBe true
      TableManifest.ownerDir(v1, e).toAbsolutePath.normalize shouldBe srcV
    }
    // carried stats zone-map-prune catalog scans of the clone
    val pruned = spark.table("graft_clone.c_base").where("id < 50")
    pruned.count() shouldBe 50L
    val reports = pruned.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location match {
              case z: graft.plans.ZoneMapPrunedIndex => Seq(z.report)
              case _ => Nil
            }
          case _ => Nil
        }
    }.flatten
    withClue("carried stats must zone-map-prune the clone: ") {
      reports should not be empty
      reports.head.filesKept should be < reports.head.filesTotal
    }
  }

  test("the clone lives independently: DML on the clone never touches " +
      "the source; DML on the source never reaches the clone") {
    val spec = build("indep")
    val srcFq = s"${spec.database}.${spec.table}"
    spark.sql(s"CREATE TABLE graft_clone.c_indep SHALLOW CLONE $srcFq")
      .collect()
    spark.sql("DELETE FROM graft_clone.c_indep WHERE id < 100").collect()
    spark.sql(s"UPDATE $srcFq SET v = 999 WHERE id = 200").collect()
    spark.table("graft_clone.c_indep").count() shouldBe 200L
    spark.table(srcFq).count() shouldBe 300L
    spark.table(srcFq).where("v = 999").count() shouldBe 1L
    spark.table("graft_clone.c_indep").where("v = 999").count() shouldBe 0L
  }

  test("clone at VERSION AS OF reads the pinned snapshot; clone of a " +
      "clone stays FLAT (references the original physical owner)") {
    val spec = build("ver")
    val srcFq = s"${spec.database}.${spec.table}"
    spark.sql(s"DELETE FROM $srcFq WHERE id >= 150").collect() // v2
    spark.sql(s"CREATE TABLE graft_clone.c_v1 SHALLOW CLONE $srcFq " +
      "VERSION AS OF 1").collect()
    spark.table("graft_clone.c_v1").count() shouldBe 300L
    spark.sql("CREATE TABLE graft_clone.c_v1b SHALLOW CLONE " +
      "graft_clone.c_v1").collect()
    val bSpec = spec.copy(table = "c_v1b")
    val v1b = Paths.get(ObjectStoreSink.snapshots(bSpec).last.path)
    val srcTableDir = Paths.get(spec.path, spec.database, spec.table)
      .toAbsolutePath.normalize
    TableManifest.read(v1b).get.files.foreach { e =>
      // flat: owner is the ORIGINAL table, not the intermediate clone
      TableManifest.ownerDir(v1b, e).getParent.toAbsolutePath.normalize shouldBe
        srcTableDir
    }
    spark.table("graft_clone.c_v1b").count() shouldBe 300L
  }

  test("the source's retention and vacuum pin clone-referenced versions " +
      "(registry-driven); a deleted clone unpins them") {
    val spec = build("vac")
    val srcFq = s"${spec.database}.${spec.table}"
    val srcTableDir = Paths.get(spec.path, spec.database, spec.table)
    spark.sql(s"CREATE TABLE graft_clone.c_vac SHALLOW CLONE $srcFq")
      .collect()
    val referenced = Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    // march the source forward past the keep window with zero grace:
    // without the registry pin, v1 would retire and tear the clone
    val grace = ObjectStoreSink.retireGraceMs
    ObjectStoreSink.retireGraceMs = 0L
    try {
      for (i <- 1 to 3)
        spark.sql(s"UPDATE $srcFq SET v = $i WHERE id = 1").collect()
      graft.operators.Vacuum.vacuumTable(srcTableDir, keep = 1, graceMs = 0L)
      Files.isDirectory(referenced) shouldBe true // pinned by the clone
      spark.table("graft_clone.c_vac").count() shouldBe 300L // intact
      // drop the clone: the pin dissolves and the version retires
      spark.sql("DROP TABLE graft_clone.c_vac")
      val cloneDir = Paths.get(spec.path, spec.database, "c_vac")
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.iterator().forEachRemaining(rm) finally s.close()
        }
        Files.deleteIfExists(p): Unit
      }
      rm(cloneDir)
      graft.operators.Vacuum.vacuumTable(srcTableDir, keep = 1, graceMs = 0L)
      Files.isDirectory(referenced) shouldBe false
    } finally ObjectStoreSink.retireGraceMs = grace
  }

  test("partitioned source: the clone's catalog reads partition-prune " +
      "through the reference listing") {
    val spec = build("part", partitioned = true)
    val srcFq = s"${spec.database}.${spec.table}"
    spark.sql(s"CREATE TABLE graft_clone.c_part SHALLOW CLONE $srcFq")
      .collect()
    val one = spark.table("graft_clone.c_part").where("p = 1")
    one.count() shouldBe 100L
    spark.table("graft_clone.c_part").count() shouldBe 300L
  }

  test("maintenance works on a clone: OPTIMIZE bin-packs the referenced " +
      "files into the clone's OWN versions, the source untouched") {
    val spec = build("opt")
    val srcFq = s"${spec.database}.${spec.table}"
    val srcV1 = Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    val srcFilesBefore = TableManifest.dataFiles(srcV1).size
    spark.sql(s"CREATE TABLE graft_clone.c_opt SHALLOW CLONE $srcFq")
      .collect()
    // 3 small referenced files bin-pack into the clone's own layout
    spark.sql("OPTIMIZE graft_clone.c_opt TARGET 268435456 BYTES").collect()
    spark.table("graft_clone.c_opt").count() shouldBe 300L
    spark.table("graft_clone.c_opt").agg(sum("v")).head.getLong(0) shouldBe
      (0L until 300L).map(_ % 7).sum
    // the source's physical layout never changed
    TableManifest.dataFiles(srcV1).size shouldBe srcFilesBefore
    spark.table(srcFq).count() shouldBe 300L
  }

  test("guards: existing target and non-graft source refuse loudly") {
    val spec = build("grd")
    val srcFq = s"${spec.database}.${spec.table}"
    spark.sql(s"CREATE TABLE graft_clone.c_grd SHALLOW CLONE $srcFq")
      .collect()
    val e = intercept[PipelineSpecException](spark.sql(
      s"CREATE TABLE graft_clone.c_grd SHALLOW CLONE $srcFq"))
    e.getMessage should include("already exists")
    // a plain parquet table is not cloneable — the verb is manifest-based
    val dir = scratchDir("grd_plain").getAbsolutePath + "/ploc"
    ss.range(0, 3).toDF("id").write.mode("overwrite").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS graft_clone.plain")
    spark.sql("CREATE TABLE graft_clone.plain (id BIGINT) USING parquet " +
      s"LOCATION '$dir'")
    intercept[Exception](spark.sql(
      "CREATE TABLE graft_clone.c_plain SHALLOW CLONE graft_clone.plain"))
  }
}
