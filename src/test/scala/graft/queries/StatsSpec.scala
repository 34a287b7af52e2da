package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Order statistics + stratified sampling (Stats.scala). The DuckDB oracle
  * covers cross-engine equality; these specs pin the semantics the oracle
  * can't see: the approx scale path's rank-error bound, the sampler's
  * rate accuracy and determinism, and the no-shuffle plan shape.
  */
class StatsSpec extends SparkSpec {

  test("percentile_disc returns an element of the column, at the right rank") {
    val out = SparkEntrySpecHelper.run(spark, "q_quantiles", sfDir)
    val rows = out.collect()
    rows.length shouldBe 3 // A, N, R
    val li = Tables.load(spark, sfDir, "lineitem").cache()
    try rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val vals = li.filter(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      for ((p, name) <- Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.99 -> "p99")) {
        val got = r.getAs[Double](name)
        // SQL-standard percentile_disc: smallest value with cume_dist >= p
        val want = vals(math.ceil(p * vals.length).toInt - 1)
        got shouldBe want
        vals should contain(got)
      }
    } finally { li.unpersist(): Unit }
  }

  test("approx_percentile (the 100 TB scale path) lands within rank error of exact") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val acc = 1000 // 1/acc relative rank error
    val row = li.agg(
      expr(s"approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), $acc)"))
      .head().getSeq[Double](0)
    val vals = li.select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    for ((p, got) <- Seq(0.25, 0.5, 0.75).zip(row)) {
      val n = vals.length
      val lo = vals((math.floor(p * n).toInt - n / acc - 1).max(0))
      val hi = vals((math.ceil(p * n).toInt + n / acc).min(n - 1))
      got should (be >= lo and be <= hi)
    }
  }

  test("stratified sample hits per-stratum rates and is deterministic") {
    val out = SparkEntrySpecHelper.run(spark, "q_stratified_sample", sfDir).cache()
    try {
      val li = Tables.load(spark, sfDir, "lineitem")
      val totals = li.groupBy("l_returnflag").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val sampled = out.groupBy("l_returnflag").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rates = Map("A" -> 0.1, "N" -> 0.5, "R" -> 1.0)
      for ((flag, rate) <- rates) {
        val frac = sampled.getOrElse(flag, 0L).toDouble / totals(flag)
        // md5 buckets are uniform; at sf0.001 strata have ~1.5-2.5k rows,
        // so allow +-6 sigma of binomial noise
        val sigma = math.sqrt(rate * (1 - rate) / totals(flag))
        math.abs(frac - rate) should be <= (6 * sigma + 1e-9)
      }
      // determinism: a second run selects the identical row set
      val again = SparkEntrySpecHelper.run(spark, "q_stratified_sample", sfDir)
      out.exceptAll(again).count() shouldBe 0L
      again.exceptAll(out).count() shouldBe 0L
    } finally { out.unpersist(): Unit }
  }

  test("stratified sample filters at the scan — no shuffle moves unsampled rows") {
    val plan = SparkEntrySpecHelper.run(spark, "q_stratified_sample", sfDir)
      .queryExecution.executedPlan.toString
    // the md5-bucket Filter must sit BELOW every Exchange (tree prints
    // top-down, so deepest node = latest index): rows fail the sample
    // before any shuffle ships them. The two legitimate exchanges are the
    // single-file-testdata rebalance (Tables.load, never taken on a real
    // multi-file layout) and the presentation sort.
    val filterIdx = plan.indexOf("Filter")
    val lastExchange = plan.lastIndexOf("Exchange")
    filterIdx should be > 0
    filterIdx should be > lastExchange
    // and the exchanges carry only sampled rows of the 4-column projection
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "ReusedExchange".r.findAllIn(plan).length
    exchanges should be <= 2
  }
}

/** Small indirection so specs run registered queries exactly as the driver
  * does (through SparkEntry.queries).
  */
object SparkEntrySpecHelper {
  def run(spark: org.apache.spark.sql.SparkSession, name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)
}
