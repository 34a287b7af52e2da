package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the streaming dedup-index intake (perf investigation,
  * not part of the driver contract): times each micro-batch apply and the
  * final index read of the q_dedup_stream_equiv shape separately, after a
  * warmup pass, so the expensive phase is visible.
  */
object DseProfile {
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
    import graft.streaming.DedupIndexStream

    def once(tag: String): Unit = {
      val dir = graft.Scratch.fresh("dseprof")
      val arrays = graft.queries.Dedup.docShingleArraysPublic(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val maxId = graft.Tables.load(spark, sfDir, "documents")
        .agg(max("doc_id")).head().getLong(0)
      val (c1, c2) = ((maxId + 1) / 3, (maxId + 1) * 2 / 3)
      def time[T](what: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(f"[$tag] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      time("materialize arrays")(arrays.count())
      time("b0")(DedupIndexStream.applyBatch(spark,
        arrays.filter(col("doc_id") < c1), s"$dir/index", s"$dir/pairs", 0.3, "b0"))
      time("b1")(DedupIndexStream.applyBatch(spark,
        arrays.filter(col("doc_id") >= c1 && col("doc_id") < c2),
        s"$dir/index", s"$dir/pairs", 0.3, "b1"))
      time("b2")(DedupIndexStream.applyBatch(spark,
        arrays.filter(col("doc_id") >= c2), s"$dir/index", s"$dir/pairs", 0.3, "b2"))
      arrays.unpersist()
      time("final read+join") {
        val idx = DedupIndexStream.loadIndex(spark, s"$dir/index").get
        idx.counts.join(
          idx.hashes.groupBy("doc_id").agg(expr("bit_xor(h)").as("hash_xor")),
          "doc_id").orderBy("doc_id").count()
      }
    }
    once("warm")
    once("timed")
    spark.stop()
  }
}
