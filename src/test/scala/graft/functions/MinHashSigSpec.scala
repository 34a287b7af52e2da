package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("kernel base hash matches the SQL contract (md5 first 7 hex)") {
    for (tok <- Seq("hello world foo", "a b c", "ünïcödé shingle x")) {
      val viaSql = spark.sql(
        s"SELECT conv(substring(md5('${tok.replace("'", "''")}'), 1, 7), 16, 10)")
        .collect()(0).getString(0).toLong
      MinHashSig.baseHashOf(tok) shouldBe viaSql
    }
  }

  test("signature equals the explode->groupBy formulation bit-for-bit") {
    val viaKernel = graft.queries.Dedup.minhashSignatures(spark, sfDir)
      .orderBy("doc_id").collect()
    val viaExplode = graft.queries.Dedup.minhashSignaturesExploded(spark, sfDir)
      .orderBy("doc_id").collect()
    assert(viaKernel.length == viaExplode.length)
    viaKernel.zip(viaExplode).foreach { case (a, b) => a shouldBe b }
  }

  test("empty and null shingle arrays produce null signatures") {
    val df = Seq(
      (1L, Seq("x y z", "y z w")),
      (2L, Seq.empty[String])
    ).toDF("id", "tokens")
      .select(col("id"), MinHashSig.sig(col("tokens"), 4).as("sig"))
    val rows = df.orderBy("id").collect()
    rows(0).getSeq[Long](1).length shouldBe 4
    assert(rows(1).isNullAt(1))
  }

  test("the plan is a narrow map — no exchange in the signature stage") {
    val plan = graft.queries.Dedup.minhashSignatures(spark, sfDir)
      .queryExecution.executedPlan.toString
    // Tables.load may rebalance the degenerate single-row-group test scan;
    // beyond that the signature computation itself must add no shuffle.
    plan.split("Exchange").length - 1 should be <= 1
  }
}
