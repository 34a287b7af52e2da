package graft.plans

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.{ObjectStoreSink, TableManifest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential fuzz for the copy-on-write DML path: random layouts ×
  * random predicates × {DELETE, UPDATE}, each statement checked on FOUR
  * axes —
  *
  *   1. CONTENT: the post-statement table equals the expected image
  *      computed independently on the PRE-image DataFrame (the COW split
  *      must be invisible to results whatever the evidence decided);
  *   2. REPORT: rows_deleted / rows_updated match the expected counts
  *      (UPDATE's count is OBSERVED on the write scan — this pins the
  *      metric across arbitrary predicate shapes);
  *   3. COMMIT SHAPE: files_linked + freshly-written files == the live
  *      manifest's file count, and every linked file is the SAME inode
  *      as in the prior version;
  *   4. TIME TRAVEL: the pre-statement snapshot still reads in full.
  *
  * Layouts rotate range-clustered / hash-unclustered / partitioned (the
  * partition-dir evidence domain); predicates rotate ranges, equality,
  * IN-lists, LIKE-prefixes, IS NULL, disjunctions, and OPAQUE shapes
  * (pmod) that must force the full-rewrite degradation. Seeds pinned —
  * failures reproduce.
  */
class CowFuzzSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def buildTable(tag: String, rnd: scala.util.Random)
      : (ObjectStoreSpec, DataFrame) = {
    val n = 1500 + rnd.nextInt(1500)
    val layout = rnd.nextInt(3)
    val rows = (0L until n.toLong).map { i =>
      val s = s"${('a' + (i % 7).toInt).toChar}word$i"
      val v: java.lang.Long = if (i % 11 == 0) null else java.lang.Long.valueOf(i % 97)
      (i, v, s, (i % 5).toInt)
    }
    val df = rows.toDF("id", "v", "s", "p")
    val spec = ObjectStoreSpec(path = scratchDir(tag).toString,
      database = "graft_cowfuzz", table = s"t_$tag",
      partitionBy = if (layout == 2) Seq("p") else Nil,
      bloomColumns = if (rnd.nextBoolean()) Seq("id") else Nil)
    val shaped = layout match {
      case 0 => df.repartitionByRange(4, col("id"))
      case 1 => df.repartition(4)
      case _ => df
    }
    ObjectStoreSink.replaceTable(spark, shaped, spec)
    (spec, df)
  }

  private def predicates(rnd: scala.util.Random, n: Int): String = {
    val a = rnd.nextInt(n); val b = a + rnd.nextInt(n / 2 + 1)
    rnd.nextInt(10) match {
      case 0 => s"id BETWEEN $a AND $b"
      case 1 => s"id = $a"
      case 2 => s"id IN ($a, ${a + 7}, ${b})"
      case 3 => s"v > ${rnd.nextInt(97)}"
      case 4 => s"pmod(id, ${2 + rnd.nextInt(9)}) = 0" // opaque: full rewrite
      case 5 => s"s LIKE '${('a' + rnd.nextInt(7)).toChar}%'"
      case 6 => s"id < $a OR id > ${math.max(b, n - 50)}"
      case 7 => s"p = ${rnd.nextInt(5)}" // partition-dir evidence domain
      case 8 => s"p IN (${rnd.nextInt(5)}, ${rnd.nextInt(5)}) AND id <= $b"
      case _ => "v IS NULL"
    }
  }

  private def manifestOf(spec: ObjectStoreSpec): TableManifest.Manifest = {
    val live = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    TableManifest.read(live).get
  }

  private def sharedInodes(spec: ObjectStoreSpec): Int = {
    val vs = ObjectStoreSink.snapshots(spec)
    val prev = java.nio.file.Paths.get(vs(vs.size - 2).path)
    val live = java.nio.file.Paths.get(vs.last.path)
    TableManifest.read(prev).get.files.count { e =>
      val a = prev.resolve(e.path); val b = live.resolve(e.path)
      java.nio.file.Files.exists(b) && java.nio.file.Files.isSameFile(a, b)
    }
  }

  private def collectSorted(df: DataFrame): Seq[(Long, Any, String, Int)] =
    df.select("id", "v", "s", "p").collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2), r.getInt(3))).toSeq.sortBy(_._1)

  for (seed <- 1 to 10)
    test(s"COW DELETE equals the full rewrite on every axis — seed $seed") {
      val rnd = new scala.util.Random(seed * 7919)
      val (spec, pre) = buildTable(s"del$seed", rnd)
      val fq = s"${spec.database}.${spec.table}"
      val n = pre.count().toInt
      val w = predicates(rnd, n)
      val expected = collectSorted(
        pre.where(!coalesce(expr(w), lit(false))))
      val before = ObjectStoreSink.snapshots(spec).last
      val r = spark.sql(s"DELETE FROM $fq WHERE $w").collect().head
      withClue(s"predicate: $w\n") {
        // 1. content
        collectSorted(spark.table(fq)) shouldBe expected
        // 2. report
        r.getLong(1) shouldBe (n - expected.size).toLong
        // 3. commit shape: linked files are real links, accounted exactly
        val linked = r.getInt(3)
        sharedInodes(spec) shouldBe linked
        manifestOf(spec).files.size should be >= linked
        // 4. time travel
        ObjectStoreSink.readVersion(spark, spec, Some(before.version))
          .count() shouldBe n.toLong
      }
    }

  for (seed <- 1 to 10)
    test(s"COW UPDATE equals the full rewrite on every axis, observed " +
      s"count exact — seed $seed") {
      val rnd = new scala.util.Random(seed * 104729)
      val (spec, pre) = buildTable(s"upd$seed", rnd)
      val fq = s"${spec.database}.${spec.table}"
      val n = pre.count().toInt
      val w = predicates(rnd, n)
      val cond = coalesce(expr(w), lit(false))
      val expected = collectSorted(pre.select(col("id"),
        when(cond, coalesce(col("v"), lit(0L)) + 1000L)
          .otherwise(col("v")).as("v"),
        when(cond, concat(col("s"), lit("!"))).otherwise(col("s")).as("s"),
        col("p")))
      val expectedMatched = pre.where(cond).count()
      val before = ObjectStoreSink.snapshots(spec).last
      val r = spark.sql(
        s"""UPDATE $fq SET v = coalesce(v, 0) + 1000, s = concat(s, '!')
           |WHERE $w""".stripMargin).collect().head
      withClue(s"predicate: $w\n") {
        collectSorted(spark.table(fq)) shouldBe expected
        r.getLong(1) shouldBe expectedMatched // observed on the write scan
        val linked = r.getInt(3)
        sharedInodes(spec) shouldBe linked
        ObjectStoreSink.readVersion(spark, spec, Some(before.version))
          .count() shouldBe n.toLong
      }
    }
}
