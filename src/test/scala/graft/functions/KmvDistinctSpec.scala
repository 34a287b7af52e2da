package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvDistinctSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._
  import KmvDistinct.kmv

  test("keeps the k smallest DISTINCT values, sorted ascending") {
    val df = Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L, 1L).toDF("h")
    val sk = df.agg(kmv(col("h"), 3).as("sk")).as[Seq[Long]].head()
    sk shouldBe Seq(1L, 3L, 5L)
  }

  test("fewer distinct values than k returns them all") {
    val df = Seq(4L, 2L, 4L, 2L).toDF("h")
    df.agg(kmv(col("h"), 10).as("sk")).as[Seq[Long]].head() shouldBe Seq(2L, 4L)
  }

  test("partition-distributed merge equals single-partition result") {
    val vals = (0L until 5000L).map(i => i % 997L)
    val one = vals.toDF("h").coalesce(1).agg(kmv(col("h"), 64).as("sk"))
      .as[Seq[Long]].head()
    val many = vals.toDF("h").repartition(16).agg(kmv(col("h"), 64).as("sk"))
      .as[Seq[Long]].head()
    many shouldBe one
    many shouldBe (0L until 64L)
  }

  test("nulls are ignored; registered SQL function works") {
    graft.GraftExtensions.register(spark)
    Seq(Some(5L), None, Some(2L)).toDF("h")
      .agg(kmv(col("h"), 4).as("sk")).as[Seq[Long]].head() shouldBe Seq(2L, 5L)
    val viaSql = spark.sql(
      "SELECT kmv_sketch(h, 2) AS sk FROM VALUES (9L), (1L), (4L) AS t(h)")
      .as[Seq[Long]].head()
    viaSql shouldBe Seq(1L, 4L)
  }

  test("estimator recovers cardinality within a few percent at 4k distinct") {
    // uniform 60-bit hashes via the engine hash convention
    val k = 256
    val est = (0 until 4000).map(_.toString).toDF("s")
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .agg(kmv(col("h"), k).as("sk"))
      .select((lit((k - 1).toDouble) /
        (element_at(col("sk"), k).cast("double") / pow(lit(2.0), lit(60.0))))
        .as("est"))
      .as[Double].head()
    est shouldBe 4000.0 +- 600.0
  }
}
