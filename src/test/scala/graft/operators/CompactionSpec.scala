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

  test("bin-pack is COPY-ON-WRITE: right-sized files hard-link (same " +
    "inode), only the fragment tail is read and re-packed; content exact") {
    val spec = freshSpec("cmpcow")
    // one big right-sized file + a fragment tail of 8 tiny files
    val big = (0L until 20000L).map(i => (i, s"payload-$i")).toDF("id", "v")
    ObjectStoreSink.replaceTable(spark, big.repartition(1), spec)
    val fq = s"${spec.database}.${spec.table}"
    val bigBytes = Compaction.liveBytes(spark, spec)
    // append 8 fragments via the link-append commit
    ObjectStoreSink.appendVersion(spark,
      (20000L until 20800L).map(i => (i, s"payload-$i")).toDF("id", "v")
        .repartition(8), spec)
    Compaction.liveFileCount(spark, spec) shouldBe 9
    val before = spark.table(fq).orderBy("id").collect()
    // target chosen so the big file is within the keep envelope and the
    // fragments are provably below it
    val r = Compaction.compactReport(spark, spec, targetBytes = bigBytes)
    r.changed shouldBe true
    r.filesLinked shouldBe 1
    r.filesRewritten shouldBe 8
    r.filesAfter shouldBe 2
    // the kept file is the SAME inode in the new version
    val vs = ObjectStoreSink.snapshots(spec)
    val prev = java.nio.file.Paths.get(vs(vs.size - 2).path)
    val live = java.nio.file.Paths.get(vs.last.path)
    val shared = graft.sinks.TableManifest.read(prev).get.files.count { e =>
      val a = prev.resolve(e.path); val b = live.resolve(e.path)
      java.nio.file.Files.exists(b) && java.nio.file.Files.isSameFile(a, b)
    }
    shared shouldBe 1
    spark.table(fq).orderBy("id").collect() shouldBe before
    // a single-fragment tail has nothing to merge: no-op, no commit
    val r2 = Compaction.compactReport(spark, spec, targetBytes = bigBytes)
    r2.changed shouldBe false
  }

  test("partitioned COW bin-pack: single-file partitions link, multi-file " +
    "partitions collapse to one file each; content exact") {
    val spec = freshSpec("cmpcowp", partitionBy = Seq("p"))
    val a = (0L until 1000L).map(i => (i, (i % 2).toInt)).toDF("id", "p")
    ObjectStoreSink.replaceTable(spark, a.repartition(col("p")), spec)
    val fq = s"${spec.database}.${spec.table}"
    // fragment ONLY partition p=1 via link-append (p cast to the
    // partition-inference int type the table reads back)
    ObjectStoreSink.appendVersion(spark,
      (1000L until 1200L).filter(_ % 2 == 1).map(i => (i, 1))
        .toDF("id", "p").repartition(4), spec)
    val before = spark.table(fq).orderBy("id").collect()
    val r = Compaction.compactReport(spark, spec)
    r.changed shouldBe true
    r.filesLinked shouldBe 1 // p=0's sole file carried
    r.filesAfter shouldBe 2
    spark.table(fq).orderBy("id").collect() shouldBe before
  }
}
