package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

class CmsSketchSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private val W = 64
  private val D = 4

  private def sketchOf(items: Seq[String], partitions: Int): Seq[Long] =
    items.toDF("x").repartition(partitions)
      .agg(CmsSketch.cms(CmsSketch.slotsFor(col("x"), W, D), W, D).as("sk"))
      .head().getSeq[Long](0)

  test("merge across partitions equals the single-partition sketch") {
    val items = (1 to 500).map(i => s"tok${i % 37}")
    sketchOf(items, 8) shouldBe sketchOf(items, 1)
  }

  test("every row sums to the input count; estimates upper-bound exact counts") {
    val items = (1 to 300).map(i => s"w${i % 23}")
    val sk = sketchOf(items, 4)
    sk.length shouldBe W * D
    for (j <- 0 until D)
      sk.slice(j * W, (j + 1) * W).sum shouldBe items.size.toLong
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val slots = Seq("w0", "w7", "w22", "nope").toDF("x")
      .select(col("x"), CmsSketch.slotsFor(col("x"), W, D).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for ((tok, ss) <- slots) {
      val est = (0 until D).map(j => sk(j * W + ss(j).toInt)).min
      est should be >= exact.getOrElse(tok, 0L)
    }
  }

  test("cms_sketch is SQL-registered via GraftExtensions") {
    GraftExtensions.register(spark)
    Seq("a", "b", "a").toDF("x").createOrReplaceTempView("cms_in")
    val viaSql = spark.sql(
      s"""SELECT cms_sketch(
         |  array(${(0 until D).map(j =>
              s"CAST(conv(substring(md5(concat('$j#', x)), 1, 15), 16, 10) AS BIGINT) % $W")
              .mkString(", ")}),
         |  $W, $D) AS sk
         |FROM cms_in""".stripMargin)
      .head().getSeq[Long](0)
    viaSql shouldBe sketchOf(Seq("a", "b", "a"), 1)
  }

  test("out-of-range slots and wrong arity are rejected") {
    an[Exception] should be thrownBy
      Seq(1L).toDF("x")
        .agg(CmsSketch.cms(array(lit(-1L), lit(0L), lit(0L), lit(0L)), W, D))
        .collect()
    an[Exception] should be thrownBy
      Seq(1L).toDF("x")
        .agg(CmsSketch.cms(array(lit(0L)), W, D))
        .collect()
  }

  test("a NULL input item (NULL slot elements) skips the row like a NULL array") {
    // slotsFor(NULL) yields array(NULL,…) — non-null array, null elements;
    // the row must not count, and no counter may move partially
    val sk = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("x")
      .agg(CmsSketch.cms(CmsSketch.slotsFor(col("x"), W, D), W, D).as("sk"))
      .head().getSeq[Long](0)
    for (j <- 0 until D)
      sk.slice(j * W, (j + 1) * W).sum shouldBe 3L // only the non-null rows
    sk shouldBe sketchOf(Seq("a", "a", "b"), 1)
  }
}
