package graft.operators

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink

class VacuumSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("sweep retires superseded versions past keep+grace; live data intact") {
    val root = scratchDir("vacuum").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_vac", table = "t")
    // four swaps; the default reader-safety grace keeps every version
    (1 to 4).foreach { i =>
      ObjectStoreSink.replaceTable(spark, (1 to i).toDF("id"), spec)
    }
    def vdirs = new java.io.File(s"$root/graft_vac/t").listFiles()
      .count(f => f.isDirectory && f.getName.matches("v-\\d{6}"))
    vdirs shouldBe 4

    val report = Vacuum.vacuum(root, keep = 2, graceMs = 0L)
    report.tablesScanned shouldBe 1
    report.versionsRetired shouldBe 2
    report.bytesFreed should be > 0L
    vdirs shouldBe 2
    spark.table("graft_vac.t").count() shouldBe 4 // live version untouched
  }

  test("grace window shields young versions from the sweep") {
    val root = scratchDir("vacgrace").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_vac2", table = "t")
    (1 to 3).foreach { i =>
      ObjectStoreSink.replaceTable(spark, (1 to i).toDF("id"), spec)
    }
    val report = Vacuum.vacuum(root, keep = 1, graceMs = 3600000L)
    report.versionsRetired shouldBe 0 // all versions are seconds old
  }

  test("keep must retain at least the live version") {
    an[IllegalArgumentException] should be thrownBy Vacuum.vacuum("/tmp", keep = 0)
  }

  test("vacuum racing concurrent commits never loses a commit-log entry") {
    // regression for the CommitLog lost-update race: vacuum's prune is a
    // read-modify-write of _commits.json; without the sink's per-table
    // lock, a prune interleaving a commit's record could republish a log
    // missing the just-recorded version. Hammer both concurrently and
    // assert the final log names exactly the surviving committed dirs.
    val root = scratchDir("vacrace").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_vrace", table = "t")
    ObjectStoreSink.replaceTable(spark, Seq(0).toDF("id"), spec)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val sweeper = new Thread(() => {
      while (!stop.get()) {
        try Vacuum.vacuum(root, keep = 2, graceMs = 0L)
        catch { case t: Throwable => failures.add(t): Unit }
      }
    })
    sweeper.start()
    try
      for (i <- 1 to 8)
        ObjectStoreSink.replaceTable(spark, Seq(i).toDF("id"), spec)
    finally {
      stop.set(true)
      sweeper.join(30000)
    }
    import scala.jdk.CollectionConverters._
    failures.asScala.toList shouldBe Nil
    // one more sweep so retirement and the log settle deterministically
    Vacuum.vacuum(root, keep = 2, graceMs = 0L)
    val tableDir = java.nio.file.Paths.get(root, "graft_vrace", "t")
    val committedDirs = new java.io.File(tableDir.toString).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v-\\d{6}"))
      .filter(f => graft.sinks.TableManifest.isCommitted(f.toPath))
      .map(_.getName.drop(2).toInt).sorted.toSeq
    graft.sinks.CommitLog.read(tableDir) shouldBe Some(committedDirs)
    // the LIVE version (the newest commit) must have survived every sweep
    committedDirs.max shouldBe 9
    spark.table("graft_vrace.t").count() shouldBe 1
  }
}
