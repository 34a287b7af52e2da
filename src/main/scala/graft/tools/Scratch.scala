package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** Ad-hoc stage timing for performance investigation (not part of the
  * driver contract).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val toks = Dedup.docTokensPublic(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("toks.count")(toks.count())
    val hashes = toks
      .select(col("doc_id"), Dedup.baseHashPublic(col("token")).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("hashes.count")(hashes.count())
    val cand = Dedup.lshCandidates(spark, sfDir, Some(toks))
    time("cand.count")(cand.count())
    val a = hashes.select(col("doc_id").as("id_a"), col("h"))
    val b = hashes.select(col("doc_id").as("id_b"), col("h"))
    val common = broadcast(cand).join(a, "id_a").join(b, Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    time("common.count")(common.count())
    spark.stop()
  }
}
