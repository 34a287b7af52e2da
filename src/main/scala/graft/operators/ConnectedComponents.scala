package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * a dedup pipeline needs BETWEEN pair detection and canonical-doc
  * selection: near-dup pairs (LSH/SimHash/Jaccard verified) form clusters,
  * and one representative per cluster survives.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round takes the min of its own label and its
  * neighbors' labels, until a fixpoint. Converges in O(cluster diameter)
  * rounds — near-dup clusters are dense (most pairs verified directly), so
  * diameters are small. Each round is one shuffle join on node id + one
  * aggregation; the label table is |nodes in any pair| rows, far smaller
  * than the corpus. At extreme scale the round count is cut by
  * alternating large-star/small-star steps (Kiveris et al., "Connected
  * Components in MapReduce") — same join shapes, fewer rounds; the hop
  * propagation here keeps the plan minimal and is exact regardless.
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
    // materialize the (possibly expensive) pair-detection input ONCE — the
    // symmetrization union has two branches, and an unmaterialized input
    // would be recomputed by each
    val e = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint(true)
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    // lineage is CUT each round (localCheckpoint): the iterated plan would
    // otherwise double in size per round — a persist caches data but keeps
    // the logical tree, and ten rounds of a self-referencing join is a
    // 2^10-node plan before the optimizer ever sees data
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp")).localCheckpoint(true)

    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy("src").agg(min("comp").as("nmin"))
        .withColumnRenamed("src", "id")
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("next"))
        .localCheckpoint(true)
      val changed = stepped.filter(col("next") < col("comp")).count()
      labels = stepped.select(col("id"), col("next").as("comp"))
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          "(pathological chain — raise maxIters)")
    labels
  }
}
