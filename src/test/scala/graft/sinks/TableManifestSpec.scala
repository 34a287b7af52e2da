package graft.sinks

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.model.ObjectStoreSpec

class TableManifestSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def versionDirs(root: String, db: String, table: String) =
    Paths.get(root, db, table).toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-"))
      .sortBy(_.getName)

  test("commit publishes a manifest with exact files, bytes, and footer row count") {
    val root = scratchDir("mfcommit").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m1", table = "t",
      partitionBy = Seq("region"))
    ObjectStoreSink.write(spark,
      Seq((1, "us", 1.0), (2, "eu", 2.0), (3, "us", 3.0))
        .toDF("id", "region", "v"), spec)
    val live = versionDirs(root, "graft_m1", "t").last.toPath
    val m = TableManifest.read(live).get
    m.rowCount shouldBe 3 // parquet footer metadata, not a scan
    m.files should not be empty
    m.files.foreach { e =>
      Files.exists(live.resolve(e.path)) shouldBe true
      Files.size(live.resolve(e.path)) shouldBe e.bytes
    }
    m.totalBytes shouldBe m.files.map(_.bytes).sum
    m.schemaHash should have length 32
    // manifest lists exactly the non-hidden data files (source of truth)
    TableManifest.dataFiles(live).map(p => live.relativize(p).toString) shouldBe
      m.files.map(_.path)
  }

  test("a version dir without a manifest is an uncommitted crash leftover: never recovered") {
    val root = scratchDir("mfcrash").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m2", table = "t")
    ObjectStoreSink.write(spark, Seq((1, 1.0)).toDF("id", "v"), spec)
    // simulate a crashed writer: a NEWER version dir full of plausible data
    // files but no manifest (died before the atomic manifest publish)
    val live = versionDirs(root, "graft_m2", "t").last.toPath
    val orphan = live.getParent.resolve("v-000999")
    Seq((2, 2.0), (3, 3.0)).toDF("id", "v")
      .write.parquet(orphan.toString)
    TableManifest.isCommitted(orphan) shouldBe false
    // catalog lost: recovery must serve the committed version, not the
    // bigger-but-uncommitted orphan
    spark.sql("DROP TABLE graft_m2.t")
    ObjectStoreSink.recoverTable(spark, spec) shouldBe true
    spark.table("graft_m2.t").as[(Int, Double)].collect().toSeq shouldBe Seq((1, 1.0))
  }

  test("supersede stamp, not write mtime, drives retirement (swap-burst race)") {
    val root = scratchDir("mfgrace").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m3", table = "t")
    ObjectStoreSink.write(spark, Seq((1, 1.0)).toDF("id", "v"), spec)
    val v1 = versionDirs(root, "graft_m3", "t").last.toPath
    // v1 has been live for a long time (backdate every mtime far past grace)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 24 * 3600 * 1000L)
    val walk = Files.walk(v1)
    try walk.forEach(p => Files.setLastModifiedTime(p, old)) finally walk.close()
    // two rapid swaps push v1 past keep=2 while the grace is large: under
    // mtime-based grace v1 would be deleted instantly (now - mtime >> grace)
    // with a reader potentially mid-scan — the supersede stamp is fresh, so
    // it must survive
    val saved = ObjectStoreSink.retireGraceMs
    try {
      ObjectStoreSink.retireGraceMs = 3600 * 1000L
      ObjectStoreSink.replaceTable(spark, Seq((2, 2.0)).toDF("id", "v"), spec)
      ObjectStoreSink.replaceTable(spark, Seq((3, 3.0)).toDF("id", "v"), spec)
      Files.exists(v1) shouldBe true
      TableManifest.supersededAt(v1).isDefined shouldBe true
      // with the grace elapsed (stamp backdated), the next sweep retires it
      Files.writeString(v1.resolve(TableManifest.SupersededName),
        (System.currentTimeMillis() - 7200 * 1000L).toString)
      ObjectStoreSink.replaceTable(spark, Seq((4, 4.0)).toDF("id", "v"), spec)
      Files.exists(v1) shouldBe false
    } finally ObjectStoreSink.retireGraceMs = saved
  }

  test("supersede stamp is idempotent: the first supersede time wins") {
    val dir = scratchDir("mfstamp").toPath
    TableManifest.markSuperseded(dir)
    val first = TableManifest.supersededAt(dir).get
    Thread.sleep(5)
    TableManifest.markSuperseded(dir)
    TableManifest.supersededAt(dir).get shouldBe first
  }

  test("snapshots + time-travel: every committed version stays readable until retired") {
    val root = scratchDir("mftravel").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m5", table = "t")
    ObjectStoreSink.write(spark, Seq((1, 1.0)).toDF("id", "v"), spec)
    ObjectStoreSink.replaceTable(spark, Seq((1, 1.5), (2, 2.0)).toDF("id", "v"), spec)
    val snaps = ObjectStoreSink.snapshots(spec)
    snaps.map(_.version) shouldBe Seq(1, 2)
    snaps.map(_.rowCount) shouldBe Seq(1, 2)
    snaps.last.live shouldBe true
    snaps.head.supersededAtMs.isDefined shouldBe true
    snaps.last.supersededAtMs shouldBe None
    // time travel: v1 readable and stable; latest = live table
    ObjectStoreSink.readVersion(spark, spec, Some(1))
      .as[(Int, Double)].collect().toSeq shouldBe Seq((1, 1.0))
    ObjectStoreSink.readVersion(spark, spec)
      .as[(Int, Double)].collect().toSeq.sorted shouldBe Seq((1, 1.5), (2, 2.0))
    // an uncommitted orphan is not a snapshot and not readable
    an[graft.model.PipelineSpecException] should be thrownBy
      ObjectStoreSink.readVersion(spark, spec, Some(999))
  }

  test("legacy pre-manifest table: recoverTable adopts it instead of stranding it") {
    val root = scratchDir("mflegacy").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m6", table = "t")
    ObjectStoreSink.write(spark, Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), spec)
    val live = versionDirs(root, "graft_m6", "t").last.toPath
    // simulate a pre-manifest lake: strip the protocol files
    Files.deleteIfExists(live.resolve(TableManifest.ManifestName))
    Files.deleteIfExists(live.resolve(TableManifest.SupersededName))
    spark.sql("DROP TABLE graft_m6.t")
    // recovery adopts the legacy dir: commits a manifest and serves it
    ObjectStoreSink.recoverTable(spark, spec) shouldBe true
    spark.table("graft_m6.t").count() shouldBe 2
    TableManifest.read(live).get.rowCount shouldBe 2
    // with ANY committed version present, an uncommitted dir stays a
    // crash orphan — adoption applies only to fully-legacy layouts
    val orphan = live.getParent.resolve("v-000900")
    Seq((9, 9.0)).toDF("id", "v").write.parquet(orphan.toString)
    spark.sql("DROP TABLE graft_m6.t")
    ObjectStoreSink.recoverTable(spark, spec) shouldBe true
    spark.table("graft_m6.t").count() shouldBe 2 // not the orphan's 1
  }

  test("every metadata commit flows through the CommitPublisher seam") {
    // the object-store portability seam: swap the publisher and every
    // manifest publish / supersede stamp / commit-log write goes through
    // it — a real deployment injects a conditional-PUT implementation here
    val root = scratchDir("mfseam").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m8", table = "t")
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val prev = TableManifest.publisher
    TableManifest.publisher = new CommitPublisher {
      def publish(dir: java.nio.file.Path, name: String, content: String): Unit = {
        events.synchronized { events += s"publish:$name": Unit }
        PosixCommitPublisher.publish(dir, name, content)
      }
      def publishIfAbsent(dir: java.nio.file.Path, name: String,
          content: String): Boolean = {
        events.synchronized { events += s"ifAbsent:$name": Unit }
        PosixCommitPublisher.publishIfAbsent(dir, name, content)
      }
    }
    try {
      ObjectStoreSink.write(spark, Seq((1, "a")).toDF("id", "s"), spec)
      ObjectStoreSink.replaceTable(spark, Seq((2, "b")).toDF("id", "s"), spec)
      events should contain("publish:" + TableManifest.ManifestName)
      events should contain("publish:" + CommitLog.Name)
      events should contain("ifAbsent:" + TableManifest.SupersededName)
    } finally TableManifest.publisher = prev
  }

  test("a publisher that fails before visibility leaves the old version live") {
    val root = scratchDir("mffail").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m9", table = "t")
    ObjectStoreSink.write(spark, Seq((1, "a")).toDF("id", "s"), spec)
    val prev = TableManifest.publisher
    // a publish that dies before the object becomes visible (the crashed
    // conditional-PUT case): the commit must not happen at all
    TableManifest.publisher = new CommitPublisher {
      def publish(dir: java.nio.file.Path, name: String, content: String): Unit =
        throw new java.io.IOException("store unavailable")
      def publishIfAbsent(dir: java.nio.file.Path, name: String,
          content: String): Boolean =
        throw new java.io.IOException("store unavailable")
    }
    try
      an[java.io.IOException] should be thrownBy
        ObjectStoreSink.replaceTable(spark, Seq((2, "b")).toDF("id", "s"), spec)
    finally TableManifest.publisher = prev
    // old version still live and the only committed one; the half-written
    // v2 is an uncommitted leftover, invisible everywhere
    spark.table("graft_m9.t").collect().map(_.getInt(0)).toSeq shouldBe Seq(1)
    ObjectStoreSink.snapshots(spec).map(_.version) shouldBe Seq(1)
    ObjectStoreSink.readVersion(spark, spec).collect()
      .map(_.getInt(0)).toSeq shouldBe Seq(1)
  }

  test("commit log records versions and retirement prunes it") {
    val root = scratchDir("mflog").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m10", table = "t",
      writeMode = "overwrite")
    val tableDir = Paths.get(root, "graft_m10", "t")
    ObjectStoreSink.write(spark, Seq((1, "a")).toDF("id", "s"), spec)
    ObjectStoreSink.write(spark, Seq((2, "b")).toDF("id", "s"), spec)
    CommitLog.read(tableDir) shouldBe Some(Seq(1, 2))
    // retirement keeps the log truthful: with zero grace, a third commit
    // retires v1 and the log drops it
    val prevGrace = ObjectStoreSink.retireGraceMs
    ObjectStoreSink.retireGraceMs = 0L
    try ObjectStoreSink.write(spark, Seq((3, "c")).toDF("id", "s"), spec)
    finally ObjectStoreSink.retireGraceMs = prevGrace
    CommitLog.read(tableDir) shouldBe Some(Seq(2, 3))
    ObjectStoreSink.snapshots(spec).map(_.version) shouldBe Seq(2, 3)
    ObjectStoreSink.readVersion(spark, spec).collect()
      .map(_.getInt(0)).toSeq shouldBe Seq(3)
  }

  test("in-place append refreshes the manifest: file set and row count stay truthful") {
    val root = scratchDir("mfappend").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_m4", table = "t")
    ObjectStoreSink.write(spark, Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), spec)
    val live = versionDirs(root, "graft_m4", "t").last.toPath
    TableManifest.read(live).get.rowCount shouldBe 2
    // append goes through insertInto INTO the live version dir
    ObjectStoreSink.write(spark, Seq((3, 3.0)).toDF("id", "v"), spec)
    val m = TableManifest.read(live).get
    m.rowCount shouldBe 3
    m.files.map(_.path) shouldBe
      TableManifest.dataFiles(live).map(p => live.relativize(p).toString)
  }
}
