package graft.dq

import graft.SparkSpec

class ReferentialCheckSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("orphan rows and keys counted; null child keys excluded; intact edge is zero") {
    val child = Seq(Some("a"), Some("a"), Some("b"), Some("b"), Some("c"), None)
      .toDF("fk")
    val parent = Seq("a", "c", "zz").toDF("pk")
    val r = ReferentialCheck.check(child, "fk", parent, "pk", "e1")
      .collect().head
    r.getString(0) shouldBe "e1"
    r.getLong(1) shouldBe 5L // null excluded
    r.getLong(2) shouldBe 2L // both 'b' rows
    r.getLong(3) shouldBe 1L // one orphan key
  }

  test("report unions edges; duplicate parent keys don't double-count") {
    val child = Seq("x", "y").toDF("fk")
    val parent = Seq("x", "x").toDF("pk") // dup parent keys
    val rows = ReferentialCheck.report(Seq(
      (child, "fk", parent, "pk", "dup_parent"),
      (child, "fk", child, "fk", "self")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    rows("dup_parent") shouldBe 1L // only 'y' orphaned, counted once
    rows("self") shouldBe 0L
  }
}
