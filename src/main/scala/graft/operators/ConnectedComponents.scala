package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * a dedup pipeline needs BETWEEN pair detection and canonical-doc
  * selection: near-dup pairs (LSH/SimHash/Jaccard verified) form clusters,
  * and one representative per cluster survives.
  *
  * Algorithm: iterative min-label propagation with path halving. Every node
  * starts labeled with itself; each round takes the min of its own and its
  * neighbors' labels (hop), then follows its label's label (jump — the
  * pointer-halving step of the classic MapReduce CC algorithms, Kiveris et
  * al.), until a fixpoint. The jump halves every node's distance to its
  * component min, so rounds scale with log(diameter), not diameter. Each
  * round is two shuffle joins + one aggregation over the label table
  * (|nodes in any pair| rows, far smaller than the corpus).
  *
  * Fails loudly if `maxIters` rounds don't converge (a silent partial
  * clustering would under-deduplicate).
  */
object ConnectedComponents {

  /** (id, comp) for every node appearing in `edges`; comp = min node id of
    * the component. Ids may be any orderable type.
    */
  def components(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    // lineage is CUT each round by re-wrapping the round's computed RDD as a
    // fresh DataFrame: the iterated self-referencing join would otherwise
    // double the logical plan per round (2^rounds nodes before the optimizer
    // sees data). Plain persist (NOT localCheckpoint) keeps every cached
    // block in the CacheManager, so superseded rounds are freed here and a
    // session-level clearCache leaves nothing behind — checkpoint blocks
    // would leak past both.
    def cutLineage(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)

    // materialize the (possibly expensive) pair-detection input ONCE — the
    // symmetrization union has two branches, and an unmaterialized input
    // would be recomputed by each
    val e = edges.select(col(aCol).as("src"), col(bCol).as("dst")).persist()
    e.count()
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    var prevCut: Option[DataFrame] = None

    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      // hop step: min over own and neighbors' labels
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy("src").agg(min("comp").as("nmin"))
        .withColumnRenamed("src", "id")
      val hopped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("n1"))
      // path-halving step: follow the label's own label (labels only ever
      // decrease, so the grand-label is always ≤) — distance to the
      // component min halves each round, so rounds scale with
      // log(diameter) instead of diameter. ADAPTIVE: dense near-dup
      // clusters converge in the first hop-only rounds (one join each);
      // the extra jump join is paid only when chains prove long.
      val withNext =
        if (it < 3) hopped.select(col("id"), col("comp"), col("n1").as("next"))
        else {
          val nl = hopped.select(col("id"), col("n1"))
          val jumped = nl.join(
            nl.select(col("id").as("n1"), col("n1").as("g")), Seq("n1"), "left")
            .select(col("id"), coalesce(col("g"), col("n1")).as("next"))
          hopped.select(col("id"), col("comp")).join(jumped, Seq("id"))
        }
      val stepped = cutLineage(withNext).persist()
      val changed = stepped.filter(col("next") < col("comp")).count()
      prevCut.foreach(_.unpersist(): Unit) // superseded round's cache freed
      prevCut = Some(stepped)
      labels = stepped.select(col("id"), col("next").as("comp"))
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    e.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          "(pathological chain — raise maxIters)")
    labels
  }
}
