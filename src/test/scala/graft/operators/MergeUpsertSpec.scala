package graft.operators

import graft.SparkSpec

class MergeUpsertSpec extends SparkSpec {
  private lazy val sq = spark
  import sq.implicits._

  private def target = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
    .toDF("k", "name", "v")
  private def source = Seq((2, "b2", 99.0), (4, "d", 40.0))
    .toDF("k", "name", "v")

  test("full-outer merge: update matched, insert new, carry unmatched") {
    val out = MergeUpsert(target, source, Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0), (4, "d", 40.0)))
  }

  test("viaAnti merge matches full-outer merge on overlapping keys") {
    val a = MergeUpsert(target, source, Seq("k")).orderBy("k").collect()
    val b = MergeUpsert.viaAnti(target, source, Seq("k")).orderBy("k").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("composite keys and null-safe matching") {
    val t = Seq((Some(1), "x", 1.0), (None, "y", 2.0)).toDF("k", "name", "v")
    val s = Seq((Option.empty[Int], "y2", 3.0)).toDF("k", "name", "v")
    val out = MergeUpsert(t, s, Seq("k", "name"))
    assert(out.count() == 3) // (null,"y") vs (null,"y2") differ on name
    val out2 = MergeUpsert(t, s.withColumn("name",
      org.apache.spark.sql.functions.lit("y")), Seq("k", "name"))
    // null key matches null key (<=>), so (null, y) is updated in place
    assert(out2.count() == 2)
    assert(out2.filter("v = 3.0").count() == 1)
  }
}
