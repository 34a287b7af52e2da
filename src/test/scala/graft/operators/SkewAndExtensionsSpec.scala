package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAndExtensionsSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("saltedAgg equals plain groupBy for count+sum") {
    val df = (Seq.fill(500)(("hot", 1.0)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(df, Seq("k"), 8,
      partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
      merge = Seq(sum($"n").as("n"), sum($"s").as("s")))
      .orderBy("k").collect()
    salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq shouldBe
      plain.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("hotSplitJoin equals plain join; hot side broadcasts") {
    val left = (Seq.fill(300)((1, "hot")) ++ (2 to 40).map(i => (i, s"l$i"))).toDF("id", "lv")
    val right = (1 to 40).map(i => (i, s"r$i")).toDF("id", "rv")
    val plain = left.join(right, "id")
      .select("id", "lv", "rv").orderBy("id", "lv").collect()
    val hot = Skew.hotKeys(left, "id", threshold = 100)
    hot.collect().map(_.getInt(0)).toSeq shouldBe Seq(1)
    val split = Skew.hotSplitJoin(left, right, "id", hot)
      .select("id", "lv", "rv").orderBy("id", "lv").collect()
    split.toSeq shouldBe plain.toSeq
    // the hot half's physical plan carries a broadcast exchange, and the
    // split is collect-free: no driver-built IN-literal list anywhere
    val planStr = Skew.hotSplitJoin(left, right, "id", hot)
      .queryExecution.executedPlan.toString
    planStr should include ("Broadcast")
    (planStr should not).include("id IN (")
    (planStr should not).include("id INSET")
  }

  test("hotKeysByFraction: scale-relative detection, topN cap bounds output") {
    val df = (Seq.fill(500)((1, "hot")) ++ Seq.fill(300)((2, "warm")) ++
      (3 to 102).map(i => (i, s"l$i"))).toDF("id", "lv")
    Skew.hotKeysByFraction(df, "id", 0.2).collect().map(_.getInt(0)).toSet shouldBe
      Set(1, 2)
    Skew.hotKeysByFraction(df, "id", 0.2, topN = 1)
      .collect().map(_.getInt(0)).toSeq shouldBe Seq(1)
    Skew.hotKeysByFraction(df, "id", 0.9).count() shouldBe 0
    // empty hot set → hotSplitJoin still equals the plain join
    val right = (1 to 102).map(i => (i, s"r$i")).toDF("id", "rv")
    Skew.hotSplitJoin(df, right, "id", Skew.hotKeysByFraction(df, "id", 0.9))
      .count() shouldBe df.count()
  }

  test("extensions register the kernels as SQL functions") {
    val s2 = spark.newSession()
    graft.GraftExtensions.register(s2)
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("toks",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))))
    s2.createDataFrame(Seq(
      org.apache.spark.sql.Row(Seq(1.0, 2.0, 3.0), Seq("x y z", "y z w"))
    ).asJava, schema).createOrReplaceTempView("ext_t")
    val row = s2.sql(
      """SELECT dot_product(a, a) AS d, minhash_sig(toks, 4) AS mh,
        |       simhash_sig(toks) AS sh, winnow_fingerprint(toks, 2) AS wf
        |FROM ext_t""".stripMargin).collect()(0)
    row.getDouble(0) shouldBe 14.0
    row.getSeq[Long](1).length shouldBe 4
    row.getLong(2) should be >= 0L
    row.getSeq[Long](3).length should be >= 1
  }
}
