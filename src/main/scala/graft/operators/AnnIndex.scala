package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TopKByScore, VectorOps}

/** Persistable IVF ANN index — the production artifact shape of the
  * `q_knn_ivf` query: centroids and nearest-centroid assignments live as
  * two plain DataFrames (tables), queries probe `nprobe` buckets, and new
  * vectors join the index WITHOUT touching existing rows (assignment is a
  * per-vector function of the fixed centroids, so incremental adds are
  * exact — the index after `addVectors` equals a fresh build over the
  * grown corpus, which the spec pins).
  *
  * Centroid training stays external (see Embeddings.kmeansCentroids — a
  * bounded Lloyd's over a sample); this operator owns the index lifecycle:
  * build / persist / probe / extend. All ranking runs through the bounded
  * [[TopKByScore]] aggregate with the engine-wide (rounded score DESC, id
  * ASC) tie-break.
  *
  * @see q_knn_ivf (oracle-checked query twin of build+topK)
  */
object AnnIndex {

  /** @param centroids   (cid long, ce array<double>, cn double)
    * @param assignments (cid long, vec_id long, embedding array<float>,
    *                    nrm double)
    */
  final case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  /** Build from (vec_id, embedding) and trained centroids (cid, ce). */
  def build(embeddings: DataFrame, centroids: DataFrame): IvfIndex = {
    val cent = centroids
      .select(col("cid"), col("ce"), VectorOps.norm(col("ce")).as("cn"))
    IvfIndex(cent, assignTo(cent, embeddings))
  }

  /** Nearest-centroid assignment — broadcast centroids, one bounded
    * aggregate; the corpus never shuffles by anything but vec_id.
    */
  private def assignTo(cent: DataFrame, vecs: DataFrame): DataFrame = {
    import TopKByScore.topk
    vecs
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"),
        round(VectorOps.dot(col("embedding"), col("ce")) /
          (col("nrm") * col("cn")), 6).as("csim"))
      .groupBy("vec_id")
      .agg(topk(col("csim"), col("cid"), 1).as("top"),
        first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
      .select(element_at(col("top"), 1).getField("id").as("cid"),
        col("vec_id"), col("embedding"), col("nrm"))
  }

  /** Extend with new vectors: assignment computed for the NEW rows only
    * (already-indexed ids are skipped — same ledger stance as the dedup
    * index), existing assignments untouched.
    */
  def addVectors(index: IvfIndex, newVecs: DataFrame): IvfIndex = {
    val fresh = newVecs.join(index.assignments.select("vec_id"),
      Seq("vec_id"), "left_anti")
    index.copy(assignments =
      index.assignments.unionByName(assignTo(index.centroids, fresh)))
  }

  /** Top-k neighbors per query over the probed buckets.
    * @param queries (query_id long, qe array<float>)
    */
  def topK(index: IvfIndex, queries: DataFrame, k: Int = 5,
      nprobe: Int = 2): DataFrame = {
    import TopKByScore.topk
    val q = queries.select(col("query_id"), col("qe"),
      VectorOps.norm(col("qe")).as("qn"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .select(col("query_id"), col("qe"), col("qn"), col("cid"),
        round(VectorOps.dot(col("qe"), col("ce")) /
          (col("qn") * col("cn")), 6).as("qsim"))
      .groupBy("query_id")
      .agg(topk(col("qsim"), col("cid"), nprobe).as("top"),
        first(col("qe")).as("qe"), first(col("qn")).as("qn"))
      .select(col("query_id"), col("qe"), col("qn"),
        explode(col("top")).as("t"))
      .select(col("query_id"), col("qe"), col("qn"), col("t.id").as("cid"))
    probes.join(index.assignments, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorOps.dot(col("qe"), col("embedding")) /
          (col("qn") * col("nrm")), 6).as("sim"))
      .groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("neighbor_id"),
        col("t.score").as("sim"), (col("pos") + 1).cast("int").as("rank"))
  }
}
