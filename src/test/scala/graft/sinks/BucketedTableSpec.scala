package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class BucketedTableSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("co-bucketed join plans with NO shuffle exchange on either side") {
    val dir = scratchDir("buck").getAbsolutePath
    val facts = (0L until 20000L).map(i => (i % 997, i)).toDF("k", "v")
    val feats = (0L until 997L).map(i => (i, i * 3)).toDF("k", "f")
    BucketedTable.write(spark, facts, "graft_buck", "facts",
      s"$dir/facts", Seq("k"), nBuckets = 8, sortCols = Seq("k"))
    BucketedTable.write(spark, feats, "graft_buck", "feats",
      s"$dir/feats", Seq("k"), nBuckets = 8, sortCols = Seq("k"))

    val joined = spark.table("graft_buck.facts")
      .hint("merge") // force SMJ so broadcast can't mask the property
      .join(spark.table("graft_buck.feats"), "k")
    val plan = executedPlan(joined)
    plan should include ("SortMergeJoin")
    (plan should not).include("Exchange")
    joined.count() shouldBe 20000L
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    val agg = spark.table("graft_buck.facts").groupBy("k")
      .agg(sum("v").as("sv"))
    val plan = executedPlan(agg)
    (plan should not).include("Exchange")
    agg.count() shouldBe 997L
  }

  test("join with equal-bucketed content is value-correct") {
    val out = spark.table("graft_buck.facts")
      .join(spark.table("graft_buck.feats"), "k")
      .filter(col("k") === 5L)
    out.select(max(col("f"))).as[Long].head() shouldBe 15L
  }
}
