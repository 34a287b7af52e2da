package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatasetSplitSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("assignment is a pure function of the id — stable under repartition") {
    val ids = (0L until 2000L).toDF("id")
    val a = DatasetSplit.assign(ids, "id").select("id", "split")
    val b = DatasetSplit.assign(ids.repartition(13), "id").select("id", "split")
    a.except(b).count() shouldBe 0
    b.except(a).count() shouldBe 0
  }

  test("proportions approximate the per-mille thresholds") {
    val ids = (0L until 10000L).toDF("id")
    val counts = DatasetSplit.assign(ids, "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    counts("train").toDouble shouldBe 9000.0 +- 300.0
    counts("val").toDouble shouldBe 500.0 +- 120.0
    counts("test").toDouble shouldBe 500.0 +- 120.0
  }

  test("tables keyed by the same id land in the same split (leak safety)") {
    val docs = Seq((7L, "a"), (8L, "b")).toDF("id", "x")
    val feats = Seq((7L, 1.0), (8L, 2.0)).toDF("id", "f")
    val d = DatasetSplit.assign(docs, "id").select(col("id"), col("split").as("s1"))
    val f = DatasetSplit.assign(feats, "id").select(col("id"), col("split").as("s2"))
    d.join(f, "id").filter(col("s1") =!= col("s2")).count() shouldBe 0
  }

  test("growing the corpus never reassigns an existing id") {
    val small = (0L until 100L).toDF("id")
    val grown = (0L until 5000L).toDF("id")
    val a = DatasetSplit.assign(small, "id").select("id", "split")
    val b = DatasetSplit.assign(grown, "id").filter(col("id") < 100)
      .select("id", "split")
    a.except(b).count() shouldBe 0
  }

  test("threshold validation") {
    an[IllegalArgumentException] should be thrownBy
      DatasetSplit.split(lit(1L), trainPm = 800, valPm = 300)
  }

  test("string ids bucket identically to their numeric string form") {
    // bucket(id) hashes the id's string rendering, so "42" and 42L agree —
    // a corpus can migrate id types without resplitting
    val asLong = DatasetSplit.assign(Seq(42L, 7L).toDF("id"), "id")
      .select(col("id").cast("string").as("id"), col("split"))
    val asStr = DatasetSplit.assign(Seq("42", "7").toDF("id"), "id")
      .select("id", "split")
    asLong.except(asStr).count() shouldBe 0
    asStr.except(asLong).count() shouldBe 0
  }
}
