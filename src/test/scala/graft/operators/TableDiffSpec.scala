package graft.operators

import graft.SparkSpec

class TableDiffSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def report(rows: Array[org.apache.spark.sql.Row],
      cols: Seq[String]): Map[String, Long] = {
    rows.length shouldBe 1
    cols.zipWithIndex.map { case (c, i) => c -> rows.head.getLong(i) }.toMap
  }

  test("diff classifies added/removed/changed/unchanged with per-column attribution") {
    val old = Seq(
      (1L, 10.0, "a"),   // unchanged
      (2L, 20.0, "b"),   // v changes
      (3L, 30.0, "c"),   // s changes
      (4L, 40.0, "d"),   // both change
      (5L, 50.0, "e"))   // removed
      .toDF("id", "v", "s")
    val nw = Seq(
      (1L, 10.0, "a"),
      (2L, 21.0, "b"),
      (3L, 30.0, "cc"),
      (4L, 41.0, "dd"),
      (6L, 60.0, "f"))   // added
      .toDF("id", "v", "s")
    val d = TableDiff.diff(old, nw, Seq("id"))
    val r = report(d.collect(), d.columns.toSeq)
    r("rows_added") shouldBe 1L
    r("rows_removed") shouldBe 1L
    r("rows_changed") shouldBe 3L
    r("rows_unchanged") shouldBe 1L
    r("changed_v") shouldBe 2L
    r("changed_s") shouldBe 2L
  }

  test("null-safe comparison: null vs null is unchanged, null vs value is changed") {
    val old = Seq(
      (1L, Option.empty[String]),
      (2L, Option.empty[String]),
      (3L, Some("x")))
      .toDF("id", "s")
    val nw = Seq(
      (1L, Option.empty[String]), // null == null → unchanged
      (2L, Some("y")),            // null → value → changed
      (3L, Option.empty[String])) // value → null → changed
      .toDF("id", "s")
    val d = TableDiff.diff(old, nw, Seq("id"))
    val r = report(d.collect(), d.columns.toSeq)
    r("rows_changed") shouldBe 2L
    r("rows_unchanged") shouldBe 1L
    r("changed_s") shouldBe 2L
  }

  test("a NULL key component matches null-safely: identical rows read unchanged") {
    // a null-unsafe key join would count the NULL-key row once as added
    // AND once as removed even when byte-identical across versions
    val old = Seq((Some(1L), "a"), (Option.empty[Long], "n"), (Some(2L), "b"))
      .toDF("id", "s")
    val nw = Seq((Some(1L), "a"), (Option.empty[Long], "n2"), (Some(3L), "c"))
      .toDF("id", "s")
    val d = TableDiff.diff(old, nw, Seq("id"))
    val r = report(d.collect(), d.columns.toSeq)
    r("rows_added") shouldBe 1L    // id=3
    r("rows_removed") shouldBe 1L  // id=2
    r("rows_changed") shouldBe 1L  // id=NULL, s: n → n2
    r("rows_unchanged") shouldBe 1L
    val same = TableDiff.diff(old, old, Seq("id"))
    val rs = report(same.collect(), same.columns.toSeq)
    rs("rows_added") shouldBe 0L
    rs("rows_removed") shouldBe 0L
    rs("rows_unchanged") shouldBe 3L
  }

  test("column order differences between versions are immaterial") {
    val old = Seq((1L, 1.0, "a")).toDF("id", "v", "s")
    val nw = Seq((1.0, "a", 1L)).toDF("v", "s", "id")
    val r0 = TableDiff.diff(old, nw, Seq("id"))
    val r = report(r0.collect(), r0.columns.toSeq)
    r("rows_unchanged") shouldBe 1L
    r("rows_changed") shouldBe 0L
  }

  test("schemaDiff reports added/removed/retyped/unchanged with catalog type names") {
    val old = Seq((1L, 1.0, "a")).toDF("id", "v", "s")
    val nw = Seq((1L, 1, true)).toDF("id", "v", "b")
    val rows = TableDiff.schemaDiff(old, nw).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    rows("id") shouldBe (("unchanged", "bigint", "bigint"))
    rows("v") shouldBe (("retyped", "double", "int"))
    rows("s") shouldBe (("removed", "string", null))
    rows("b") shouldBe (("added", null, "boolean"))
  }

  test("schema mismatch and empty keys are rejected") {
    val a = Seq((1L, 1.0)).toDF("id", "v")
    val b = Seq((1L, "x")).toDF("id", "w")
    an[IllegalArgumentException] should be thrownBy TableDiff.diff(a, b, Seq("id"))
    an[IllegalArgumentException] should be thrownBy TableDiff.diff(a, a, Seq.empty)
  }
}
