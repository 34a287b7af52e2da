package graft.operators

import graft.SparkSpec
import graft.queries.Dedup
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  private def arrays = Dedup.docShingleArraysPublic(spark, sfDir)

  test("incremental pairs == batch-path pairs restricted to batch-involved") {
    val cutoff = 400L
    val index = IncrementalDedup.buildIndex(arrays.filter(col("doc_id") < cutoff))
    val batch = IncrementalDedup.buildIndex(arrays.filter(col("doc_id") >= cutoff))
    val inc = IncrementalDedup.newPairs(index, batch)
      .select("id_a", "id_b", "jaccard")

    // the one-shot pipeline over the full corpus, batch-involved pairs only
    val full = graft.SparkEntry.queries("q_jaccard_pairs")(spark, sfDir)
      .filter(col("id_b") >= cutoff)
      .select("id_a", "id_b", "jaccard")

    inc.except(full).count() shouldBe 0
    full.except(inc).count() shouldBe 0
    inc.count() should be > 0L // the slice must actually exercise the path
  }

  test("old-vs-old pairs are never produced") {
    val cutoff = 400L
    val index = IncrementalDedup.buildIndex(arrays.filter(col("doc_id") < cutoff))
    val batch = IncrementalDedup.buildIndex(arrays.filter(col("doc_id") >= cutoff))
    IncrementalDedup.newPairs(index, batch)
      .filter(col("id_b") < cutoff).count() shouldBe 0
  }

  test("index round-trips through parquet (persistable state)") {
    val cutoff = 400L
    val dir = scratchDir("dedupidx").getAbsolutePath
    val built = IncrementalDedup.buildIndex(arrays.filter(col("doc_id") < cutoff))
    built.bands.write.mode("overwrite").parquet(s"$dir/bands")
    built.hashes.write.mode("overwrite").parquet(s"$dir/hashes")
    built.counts.write.mode("overwrite").parquet(s"$dir/counts")
    val reloaded = IncrementalDedup.DedupIndex(
      spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/hashes"),
      spark.read.parquet(s"$dir/counts"))
    val batch = IncrementalDedup.buildIndex(arrays.filter(col("doc_id") >= cutoff))
    val a = IncrementalDedup.newPairs(built, batch).select("id_a", "id_b")
    val b = IncrementalDedup.newPairs(reloaded, batch).select("id_a", "id_b")
    a.except(b).count() shouldBe 0
    b.except(a).count() shouldBe 0
  }
}
