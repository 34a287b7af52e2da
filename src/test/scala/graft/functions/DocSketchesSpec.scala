package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DocSketchesSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("simhash kernel matches the SQL 60-bit hash contract") {
    // single-token set: the signature IS that token's 60-bit hash
    val tok = "alpha beta gamma"
    val viaSql = spark.sql(
      s"SELECT conv(substring(md5('$tok'), 1, 15), 16, 10)")
      .collect()(0).getString(0).toLong
    val viaKernel = Seq(Tuple1(Seq(tok))).toDF("tokens")
      .select(DocSketches.simhash(col("tokens"))).collect()(0).getLong(0)
    viaKernel shouldBe viaSql
  }

  test("simhash: empty array -> null; vote ties break to 0") {
    val rows = Seq(
      (1L, Seq("x y z")),
      (2L, Seq.empty[String])
    ).toDF("id", "tokens")
      .select(col("id"), DocSketches.simhash(col("tokens")).as("s"))
      .orderBy("id").collect()
    rows(0).isNullAt(1) shouldBe false
    assert(rows(1).isNullAt(1))
  }

  test("winnow kernel: sliding-window mins, distinct ascending, short-input null") {
    // deterministic check against a hand-computed reference
    val toks = Seq("a b c", "b c d", "c d e", "d e f", "e f g")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = toks.map(t => DocSketches.hash28(md, t.getBytes("UTF-8")))
    val expected = (3 until 5).map(i => hs.slice(i - 3, i + 1).min).distinct.sorted
    val out = Seq(Tuple1(toks)).toDF("tokens")
      .select(DocSketches.winnow(col("tokens"), 4).as("fps"))
      .collect()(0).getSeq[Long](0)
    out.toSeq shouldBe expected
    // shorter than the window -> null
    val short = Seq(Tuple1(Seq("a", "b", "c"))).toDF("tokens")
      .select(DocSketches.winnow(col("tokens"), 4)).collect()(0)
    assert(short.isNullAt(0))
  }

  test("sketch queries plan as narrow maps (<=1 exchange incl. test rebalance)") {
    for (q <- Seq("q_simhash64", "q_fingerprint_winnow")) {
      val plan = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      withClue(q) {
        // the single allowed exchange is the final global ORDER BY (plus
        // Tables.load's test-only rebalance collapses into it)
        (plan.split("Exchange").length - 1) should be <= 2
      }
    }
  }
}
