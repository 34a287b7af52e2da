package graft.dq

import graft.SparkSpec

class DriftReportSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("profile: one row per column, numeric stats only for numerics") {
    val df = Seq((1L, 2.0, "a"), (2L, 4.0, "b"), (3L, 6.0, null))
      .toDF("id", "v", "s")
    val p = DriftReport.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    p.keySet shouldBe Set("id", "v", "s")
    p("v").getLong(1) shouldBe 3L        // n
    p("v").getLong(2) shouldBe 0L        // n_null
    p("v").getDouble(3) shouldBe 4.0     // mean
    p("v").getDouble(4) shouldBe 2.0     // vmin
    p("v").getDouble(5) shouldBe 6.0     // vmax
    p("s").getLong(1) shouldBe 2L        // nulls excluded from n
    p("s").getLong(2) shouldBe 1L
    p("s").isNullAt(3) shouldBe true     // no numeric stats for strings
  }

  test("drift: count shift fires alone; identical columns stay quiet") {
    val old = Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0)).toDF("id", "v")
    val nw = Seq((1L, 10.0), (2L, 10.0)).toDF("id", "v") // half the rows
    val byCol = DriftReport.drift(old, nw).collect()
      .map(r => r.getString(0) -> r).toMap
    byCol("v").getAs[Double]("count_shift") shouldBe 0.5
    byCol("v").getAs[Boolean]("drifted") shouldBe true
    byCol("v").getAs[Double]("mean_shift") shouldBe 0.0 // mean unchanged
    // same frame vs itself: nothing drifts
    DriftReport.drift(old, old).collect()
      .foreach(r => r.getAs[Boolean]("drifted") shouldBe false)
  }

  test("drift: a column present on only one side is always flagged") {
    val old = Seq((1L, 2.0)).toDF("id", "v")
    val nw = Seq(Tuple1(1L)).toDF("id")
    val rows = DriftReport.drift(old, nw).collect()
      .map(r => r.getString(0) -> r).toMap
    rows("v").getAs[Boolean]("drifted") shouldBe true
    rows("v").isNullAt(rows("v").fieldIndex("n_new")) shouldBe true
    rows("id").getAs[Boolean]("drifted") shouldBe false
  }

  test("drift: null-fraction detector fires without a mean change") {
    val old = Seq[(Long, java.lang.Double)]((1L, 5.0), (2L, 5.0), (3L, 5.0),
      (4L, 5.0)).toDF("id", "v")
    val nw = Seq[(Long, java.lang.Double)]((1L, 5.0), (2L, 5.0), (3L, null),
      (4L, null)).toDF("id", "v")
    val v = DriftReport.drift(old, nw).collect()
      .map(r => r.getString(0) -> r).toMap.apply("v")
    v.getAs[Double]("null_frac_new") shouldBe 0.5
    v.getAs[Double]("mean_shift") shouldBe 0.0 // survivors unchanged
    v.getAs[Boolean]("drifted") shouldBe true
  }
}
