package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress data generator: grows the sf0.1 `documents` table by an
  * integer factor via duplicate-and-reseed, for probing the dedup family's
  * growth curve ABOVE the driver's largest SF (the candidate-pair blowup a
  * 17 MB bench cannot see).
  *
  * Reseed contract: copy `c` suffixes every whitespace token with `_c<c>`,
  * which makes each copy's shingle vocabulary DISJOINT from every other
  * copy's — cross-copy near-dups are impossible, so the workload (docs,
  * shingles, LSH buckets, true pairs, clusters) grows exactly linearly in
  * the factor. A sound plan should therefore scale ~linearly; measured
  * superlinearity is plan pathology (quadratic candidate growth, skew), not
  * data artifact. Copies keep the intra-copy near-dup structure byte-for-
  * byte, so per-bucket sizes and similarity distributions match sf0.1.
  *
  * Other tables are symlinked from the base dir (the dedup family reads
  * only `documents`). Output: `<outRoot>/x<factor>/...` usable as a
  * SPARK_GRAFT_SF_DIR.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE", "/root/testdata/sf0.1")
    val outRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "target/scale")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "3,10")
      .split(",").map(_.trim.toInt).filter(_ >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$base/documents.parquet")
    factors.foreach { k =>
      val out = Paths.get(outRoot, s"x$k")
      Files.createDirectories(out)
      val scaled = (0 until k).map { c =>
        if (c == 0) docs
        else docs.select(
          (col("doc_id") + c * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1_c$c").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
      // multi-file layout: the scan splits natively, no degenerate-scan
      // rebalance — the shape a real lake would have
      scaled.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(out.resolve("documents.parquet").toString)
      graft.Tables.names.filter(_ != "documents").foreach { n =>
        val link = out.resolve(s"$n.parquet")
        Files.deleteIfExists(link)
        Files.createSymbolicLink(link, Paths.get(base, s"$n.parquet")): Unit
      }
      val rows = spark.read.parquet(out.resolve("documents.parquet").toString).count()
      println(s"x$k: $rows docs -> $out")
    }
    spark.stop()
  }
}
