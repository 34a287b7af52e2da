package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress data generator: grows the sf0.1 `documents` and
  * `embeddings` tables by an integer factor via duplicate-and-reseed, for
  * probing the dedup and ANN families' growth curves ABOVE the driver's
  * largest SF (the candidate-pair blowup a 17 MB bench cannot see).
  *
  * Reseed contracts — both make the TRUE workload exactly linear in the
  * factor, so measured superlinearity is plan pathology, not data artifact:
  *   - documents: copy `c` suffixes every whitespace token with `_c<c>`,
  *     making each copy's shingle vocabulary DISJOINT from every other
  *     copy's — cross-copy near-dups are impossible, while intra-copy
  *     near-dup structure matches sf0.1 byte-for-byte.
  *   - embeddings: copy `c` multiplies each dimension by a copy-specific
  *     ±1 sign pattern. A diagonal ±1 matrix is an ISOMETRY applied to the
  *     whole copy — every intra-copy dot product (hence cosine, norm,
  *     neighbor ranking) is preserved EXACTLY, ±1 multiplication being
  *     exact in float — while cross-copy dot products decorrelate to ~0
  *     (about half the terms flip sign), so copies contribute no cross
  *     near-neighbors above any real threshold. The fixed query set
  *     (vec_id < 8) lives in copy 0 unchanged.
  *
  * Other tables are symlinked from the base dir. Output:
  * `<outRoot>/x<factor>/...` usable as a SPARK_GRAFT_SF_DIR.
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
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // copy-specific ±1 sign pattern; c=0 stays the identity
    def signs(c: Int): Array[Float] =
      Array.tabulate(dim)(d =>
        if (((c * 0x9E3779B9L + d * 0x85EBCA6BL) >> 7 & 1) == 1) -1f else 1f)
    factors.foreach { k =>
      val out = Paths.get(outRoot, s"x$k")
      Files.createDirectories(out)
      val scaledDocs = (0 until k).map { c =>
        if (c == 0) docs
        else docs.select(
          (col("doc_id") + c * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1_c$c").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
      val scaledEmb = (0 until k).map { c =>
        if (c == 0) emb
        else emb.select(
          (col("vec_id") + c * 10000000L).as("vec_id"),
          zip_with(col("embedding"), lit(signs(c)), (x, s) => x * s)
            .as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
      // multi-file layout: the scan splits natively, no degenerate-scan
      // rebalance — the shape a real lake would have
      Seq("documents.parquet", "embeddings.parquet")
        .foreach(n => if (Files.isSymbolicLink(out.resolve(n)))
          Files.delete(out.resolve(n)))
      scaledDocs.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(out.resolve("documents.parquet").toString)
      scaledEmb.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(out.resolve("embeddings.parquet").toString)
      graft.Tables.names.filterNot(Set("documents", "embeddings")).foreach { n =>
        val link = out.resolve(s"$n.parquet")
        Files.deleteIfExists(link)
        Files.createSymbolicLink(link, Paths.get(base, s"$n.parquet")): Unit
      }
      val nd = spark.read.parquet(out.resolve("documents.parquet").toString).count()
      val ne = spark.read.parquet(out.resolve("embeddings.parquet").toString).count()
      println(s"x$k: $nd docs, $ne vectors -> $out")
    }
    spark.stop()
  }
}
