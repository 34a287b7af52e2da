package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKByScoreSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("equals window row_number ranking incl. ties (score desc, id asc)") {
    val df = Seq(
      ("a", 0.9, 1L), ("a", 0.9, 2L), ("a", 0.8, 3L), ("a", 0.95, 4L),
      ("b", 0.1, 9L), ("b", 0.1, 8L), ("b", 0.2, 7L), ("b", 0.05, 6L)
    ).toDF("g", "sim", "id")
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("sim").desc, col("id"))
      df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 2)
        .select("g", "id", "sim", "rank").orderBy("g", "rank")
        .as[(String, Long, Double, Int)].collect().toSeq
    }
    val viaAgg = df.groupBy("g")
      .agg(TopKByScore.topk(col("sim"), col("id"), 2).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("t.id"), col("t.score"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("g", "rank")
      .as[(String, Long, Double, Int)].collect().toSeq
    viaAgg shouldBe viaWindow
  }

  test("bounded buffer: many rows, k survivors; nulls skipped") {
    val df = ((1 to 10000).map(i => ("g", i.toDouble, i.toLong)) :+
      ("g", Double.box(null.asInstanceOf[Double]).doubleValue, 0L))
      .toDF("g", "sim", "id")
    val top = df.groupBy("g")
      .agg(TopKByScore.topk(col("sim"), col("id"), 3).as("top"))
      .select(explode(col("top")).as("t")).select("t.score", "t.id")
      .as[(Double, Long)].collect().toSeq
    top shouldBe Seq((10000.0, 10000L), (9999.0, 9999L), (9998.0, 9998L))
  }

  test("registered as a SQL aggregate via extensions") {
    val s2 = spark.newSession()
    graft.GraftExtensions.register(s2)
    Seq((1, 0.5, 10L), (1, 0.9, 20L), (1, 0.7, 30L)).toDF("g", "s", "i")
      .createOrReplaceTempView("tk_t")
    // note: view registered on the parent session is visible via shared state? no —
    // register on s2's own catalog
    import s2.implicits._
    Seq((1, 0.5, 10L), (1, 0.9, 20L), (1, 0.7, 30L)).toDF("g", "s", "i")
      .createOrReplaceTempView("tk_t2")
    val out = s2.sql(
      "SELECT topk_by_score(s, i, 2) AS top FROM tk_t2 GROUP BY g")
      .select(explode(col("top")).as("t")).select("t.id")
      .as[Long].collect().toSeq
    out shouldBe Seq(20L, 30L)
  }
}
