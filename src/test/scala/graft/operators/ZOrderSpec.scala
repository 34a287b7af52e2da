package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Z-order layout: correctness of the bit interleave, content preservation,
  * and — the point of the operator — that the written files are
  * range-prunable in BOTH interleaved dimensions (per-file min/max spans
  * a fraction of the key range, where a single-column sort leaves the
  * other dimension spanning everything).
  */
class ZOrderSpec extends SparkSpec {

  /** Reference Morton interleave in plain Scala. */
  private def morton(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = xs.size
    for (b <- 0 until bits; i <- 0 until n)
      z |= ((xs(i) >> b) & 1L) << (b * n + i)
    z
  }

  test("interleave matches the reference Morton implementation") {
    import graft.SparkSpec.spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = rows.toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y"))).as("z"))
      .as[Long].collect()
    val want = rows.map { case (x, y) => morton(Seq(x, y), 16) }
    got.toSeq shouldBe want
    // 3-dim variant
    val rows3 = Seq.fill(50)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got3 = rows3.toDF("x", "y", "w")
      .select(ZOrder.interleave(Seq(col("x"), col("y"), col("w"))).as("z"))
      .as[Long].collect()
    got3.toSeq shouldBe rows3.map { case (x, y, w) => morton(Seq(x, y, w), 16) }
  }

  test("z-value locality: adjacent cells differ less than distant cells") {
    // Morton property used by the pruner: a small axis-aligned box maps to
    // a small number of contiguous z runs. Spot-check the 2-bit prefix:
    // all points in the same quadrant share their top 2 z bits.
    import graft.SparkSpec.spark.implicits._
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val z = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave(Seq(col("x") * 1024, col("y") * 1024)).as("z"))
      .collect()
    z.foreach { r =>
      val (x, y, zz) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val quadrant = ((y * 1024) >> 15 << 1) | ((x * 1024) >> 15)
      (zz >> 30) shouldBe quadrant
    }
  }

  test("layout preserves content and bounds per-file spans in both dims") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    val dir = scratchDir("zorder").getAbsolutePath + "/zli"
    ZOrder.write(li, Seq("l_partkey", "l_suppkey"), 16, dir)
    val back = spark.read.parquet(dir)

    // content identical (layout must be invisible to results)
    back.count() shouldBe li.count()
    back.exceptAll(li).count() shouldBe 0L
    li.exceptAll(back).count() shouldBe 0L

    // per-file key spans: with 16 z-files each file must cover a bounded
    // octant of the (partkey, suppkey) plane, not the full range — that is
    // the property parquet footer pruning feeds on
    val spans = back
      .withColumn("_f", input_file_name())
      .groupBy("_f")
      .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      .collect()
    spans.length should be >= 8
    val pSpan = li.agg(max("l_partkey") - min("l_partkey")).head().getLong(0).toDouble
    val avgWidth = spans.map(r =>
      (r.getAs[Long]("pmax") - r.getAs[Long]("pmin")).toDouble).sum / spans.length
    // natural (orderkey-ordered) layout leaves every file spanning ~100%
    // of the partkey range; the z-layout must do far better
    avgWidth / pSpan should be < 0.6
    val naturalSpans = {
      val nd = scratchDir("zorder-nat").getAbsolutePath + "/nat"
      li.repartition(16).write.mode("overwrite").parquet(nd)
      spark.read.parquet(nd).withColumn("_f", input_file_name())
        .groupBy("_f")
        .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"))
        .collect()
    }
    val natAvg = naturalSpans.map(r =>
      (r.getAs[Long]("pmax") - r.getAs[Long]("pmin")).toDouble).sum / naturalSpans.length
    avgWidth should be < natAvg * 0.75
  }

  test("range filter on the z-copy pushes down to the parquet scan") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val dir = scratchDir("zorder-push").getAbsolutePath + "/zli"
    ZOrder.write(li, Seq("l_partkey", "l_suppkey"), 8, dir)
    // formatted mode prints PushedFilters untruncated
    val plan = spark.read.parquet(dir)
      .filter(col("l_partkey").between(20, 120) && col("l_suppkey") <= 7)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("PushedFilters")
    plan should include("GreaterThanOrEqual(l_partkey,20)")
    plan should include("LessThanOrEqual(l_suppkey,7)")
  }
}
