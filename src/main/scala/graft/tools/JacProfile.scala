package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage breakdown of the jaccard dedup pipeline (dev harness). */
object JacProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.queries.Dedup
    // warmup
    graft.SparkEntry.queries("q_jaccard_pairs")(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    time("docTokens explode")(
      println("  rows=" + Dedup.docTokensPublic(spark, sfDir).count()))
    time("hashes distinct")(
      println("  rows=" + Dedup.docTokensPublic(spark, sfDir)
        .select(col("doc_id"), Dedup.baseHashPublic(col("token")).as("h"))
        .distinct().count()))
    time("minhash sigs")(
      println("  rows=" + Dedup.minhashSignatures(spark, sfDir).count()))
    time("lsh candidates")(
      println("  rows=" + Dedup.lshCandidates(spark, sfDir).count()))
    spark.catalog.clearCache()
    time("full jaccard")(
      println("  rows=" + graft.SparkEntry.queries("q_jaccard_pairs")(spark, sfDir).count()))
    spark.catalog.clearCache()
    time("full jaccard again")(
      println("  rows=" + graft.SparkEntry.queries("q_jaccard_pairs")(spark, sfDir).count()))
    spark.stop()
  }
}
