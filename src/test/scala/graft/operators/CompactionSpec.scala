package graft.operators

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def freshSpec(tag: String, partitionBy: Seq[String] = Nil) =
    ObjectStoreSpec(path = scratchDir(tag).toString, database = "graft_test",
      table = s"${tag}_${System.nanoTime()}", partitionBy = partitionBy)

  test("fragmented table compacts to the byte-derived file count, content intact") {
    val spec = freshSpec("cmp")
    val df = (0L until 4000L).map(i => (i, s"row$i")).toDF("id", "v")
    ObjectStoreSink.replaceTable(spark, df.repartition(32), spec)
    Compaction.liveFileCount(spark, spec) shouldBe 32
    val n = Compaction.compact(spark, spec, targetBytes = 1L << 30)
    n shouldBe 1
    val back = spark.table(s"${spec.database}.${spec.table}")
    back.count() shouldBe 4000
    back.as[(Long, String)].collect().sortBy(_._1) shouldBe
      (0L until 4000L).map(i => (i, s"row$i"))
  }

  test("already-compact table is a no-op") {
    val spec = freshSpec("noop")
    ObjectStoreSink.replaceTable(spark,
      (0L until 10L).toDF("id").repartition(1), spec)
    val before = Compaction.liveFileCount(spark, spec)
    Compaction.compact(spark, spec, targetBytes = 1L << 30) shouldBe before
  }

  test("partitioned table collapses to one file per populated partition") {
    val spec = freshSpec("part", partitionBy = Seq("p"))
    val df = (0L until 1000L).map(i => (i, (i % 4).toString)).toDF("id", "p")
    ObjectStoreSink.replaceTable(spark, df.repartition(16), spec)
    Compaction.liveFileCount(spark, spec) should be > 16 // ~16 per partition dir
    Compaction.compact(spark, spec, targetBytes = 1L << 30) shouldBe 4
    val back = spark.table(s"${spec.database}.${spec.table}")
    back.count() shouldBe 1000
    back.groupBy("p").count().as[(String, Long)].collect().toMap shouldBe
      Map("0" -> 250L, "1" -> 250L, "2" -> 250L, "3" -> 250L)
    // second compact is a no-op: one file per populated partition already,
    // so no new table version appears
    def versions = java.nio.file.Files.list(
      java.nio.file.Paths.get(spec.path, spec.database, spec.table))
      .filter(p => p.getFileName.toString.startsWith("v")).count()
    val before = versions
    Compaction.compact(spark, spec, targetBytes = 1L << 30) shouldBe 4
    versions shouldBe before
  }

  test("targetBytes slices an unpartitioned table into multiple files") {
    val spec = freshSpec("sliced")
    val df = (0L until 20000L).map(i => (i, ("x" * 64) + i)).toDF("id", "v")
    ObjectStoreSink.replaceTable(spark, df.repartition(40), spec)
    val bytes = Compaction.liveBytes(spark, spec)
    val target = math.max(1L, bytes / 4)
    val n = Compaction.compact(spark, spec, targetBytes = target)
    n should (be >= 3 and be <= 6)
    spark.table(s"${spec.database}.${spec.table}").count() shouldBe 20000
  }
}
