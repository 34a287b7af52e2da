package graft.operators

import graft.SparkSpec
import graft.queries.Embeddings
import org.apache.spark.sql.functions._

class AnnIndexSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def embeddings = graft.Tables.load(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")

  private def centroids = Embeddings.kmeansCentroids(spark, sfDir).toDF("cid", "ce")

  private def queries = embeddings.filter(col("vec_id") < 8)
    .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  test("build + topK equals the oracle-checked q_knn_ivf query") {
    val idx = AnnIndex.build(embeddings, centroids)
    val viaIndex = AnnIndex.topK(idx, queries)
      .select("query_id", "neighbor_id", "sim", "rank")
    val viaQuery = graft.SparkEntry.queries("q_knn_ivf")(spark, sfDir)
      .select("query_id", "neighbor_id", "sim", "rank")
    viaIndex.except(viaQuery).count() shouldBe 0
    viaQuery.except(viaIndex).count() shouldBe 0
  }

  test("index round-trips through parquet") {
    val dir = scratchDir("annidx").getAbsolutePath
    val idx = AnnIndex.build(embeddings, centroids)
    idx.centroids.write.mode("overwrite").parquet(s"$dir/cent")
    idx.assignments.write.mode("overwrite").parquet(s"$dir/asn")
    val reloaded = AnnIndex.IvfIndex(
      spark.read.parquet(s"$dir/cent"), spark.read.parquet(s"$dir/asn"))
    val a = AnnIndex.topK(reloaded, queries).select("query_id", "neighbor_id")
    val b = AnnIndex.topK(idx, queries).select("query_id", "neighbor_id")
    a.except(b).count() shouldBe 0
    b.except(a).count() shouldBe 0
  }

  test("incremental adds equal a fresh build over the grown corpus") {
    val base = AnnIndex.build(embeddings.filter(col("vec_id") < 400), centroids)
    val grown = AnnIndex.addVectors(base, embeddings.filter(col("vec_id") >= 400))
    val full = AnnIndex.build(embeddings, centroids)
    grown.assignments.select("cid", "vec_id")
      .except(full.assignments.select("cid", "vec_id")).count() shouldBe 0
    full.assignments.select("cid", "vec_id")
      .except(grown.assignments.select("cid", "vec_id")).count() shouldBe 0
    // already-indexed ids are not re-assigned (ledger stance)
    AnnIndex.addVectors(grown, embeddings)
      .assignments.count() shouldBe full.assignments.count()
  }
}
