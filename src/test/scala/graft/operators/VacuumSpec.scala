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
}
