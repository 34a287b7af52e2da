package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("equals the naive BETWEEN join, incl. bucket-boundary cases") {
    val points = Seq((1, 5L, "p1"), (1, 10L, "p2"), (1, 25L, "p3"),
      (2, 10L, "p4")).toDF("k", "p", "pv")
    val ivals = Seq((1, 0L, 10L, "i1"), (1, 9L, 30L, "i2"),
      (2, 11L, 20L, "i3")).toDF("k", "lo", "hi", "iv")
    val naive = points.join(ivals, Seq("k"))
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .select("k", "pv", "iv").orderBy("pv", "iv")
      .as[(Int, String, String)].collect().toSeq
    // width 7 forces intervals to span multiple buckets; inclusive bounds
    // (p=10 matches both i1's hi and i2) must come through exactly once
    val bucketed = RangeJoin.pointInInterval(points, ivals, Seq("k"),
      "p", "lo", "hi", bucketWidth = 7)
      .select("k", "pv", "iv").orderBy("pv", "iv")
      .as[(Int, String, String)].collect().toSeq
    bucketed shouldBe naive
    naive.map(x => (x._2, x._3)) shouldBe Seq(
      ("p1", "i1"), ("p2", "i1"), ("p2", "i2"), ("p3", "i2"))
  }

  test("plan is an equi-join (SortMerge/Hash), not a nested loop") {
    val points = Seq((1, 5L)).toDF("k", "p")
    val ivals = Seq((1, 0L, 10L)).toDF("k", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, ivals, Seq("k"),
      "p", "lo", "hi", 7).queryExecution.executedPlan.toString
    plan should not include ("NestedLoop")
    plan should not include ("CartesianProduct")
  }
}
