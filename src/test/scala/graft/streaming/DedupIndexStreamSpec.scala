package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class DedupIndexStreamSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def toks(ids: Range, salt: String): Seq[String] =
    ids.map(i => s"tok$salt$i")

  test("cross-batch near-dups are detected against the standing index") {
    val dir = scratchDir("dedupstream").getAbsolutePath
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[String])]
    val q = DedupIndexStream.start(spark,
      in.toDF().toDF("doc_id", "tokens"),
      s"$dir/index", s"$dir/pairs", s"$dir/ckpt")
    try {
      // batch 1: three distinct docs
      in.addData((1L, toks(0 until 40, "a")), (2L, toks(0 until 40, "b")),
        (3L, toks(0 until 40, "c")))
      q.processAllAvailable()
      // batch 2: doc 10 is a near-copy of doc 1 (39/41 shared tokens)
      in.addData((10L, toks(0 until 39, "a") ++ Seq("x1", "x2")))
      q.processAllAvailable()

      val pairs = spark.read.parquet(s"$dir/pairs")
      pairs.filter(col("id_a") === 1L && col("id_b") === 10L)
        .count() shouldBe 1
      // unrelated docs never pair
      pairs.filter(col("id_b") === 2L or col("id_b") === 3L)
        .count() shouldBe 0
      // index holds all four docs exactly once
      spark.read.parquet(s"$dir/index/counts")
        .select("doc_id").as[Long].collect().sorted shouldBe
        Seq(1L, 2L, 3L, 10L)
    } finally q.stop()
  }

  test("replayed batch is idempotent on the index (no duplicate docs/pairs)") {
    val dir = scratchDir("dedupreplay").getAbsolutePath
    val batch = Seq((5L, toks(0 until 30, "z")), (6L, toks(0 until 30, "z")))
      .toDF("doc_id", "tokens")
    DedupIndexStream.applyBatch(spark, batch, s"$dir/index", s"$dir/pairs", 0.3)
    DedupIndexStream.applyBatch(spark, batch, s"$dir/index", s"$dir/pairs", 0.3)
    spark.read.parquet(s"$dir/index/counts").count() shouldBe 2
    spark.read.parquet(s"$dir/pairs")
      .filter(col("id_a") === 5L && col("id_b") === 6L).count() shouldBe 1
  }

  test("same-id re-delivery within one batch indexes the doc once") {
    val dir = scratchDir("dedupintra").getAbsolutePath
    val batch = Seq((7L, toks(0 until 30, "y")), (7L, toks(0 until 30, "y")))
      .toDF("doc_id", "tokens")
    DedupIndexStream.applyBatch(spark, batch, s"$dir/index", s"$dir/pairs", 0.3)
    spark.read.parquet(s"$dir/index/counts").count() shouldBe 1
    spark.read.parquet(s"$dir/index/counts")
      .select("n_tok").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .head() shouldBe 30L
  }
}
