package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connected components over an undirected edge list — the clustering step
  * a dedup pipeline needs BETWEEN pair detection and canonical-doc
  * selection: near-dup pairs (LSH/SimHash/Jaccard verified) form clusters,
  * and one representative per cluster survives.
  *
  * Three-phase design, chosen for the shape of dedup graphs (edges are
  * near-dup PAIRS — orders of magnitude smaller than the corpus, but with
  * possibly long chains):
  *
  *  1. '''Partition-local contraction''' — one narrow `mapPartitions` pass
  *     runs union-find over each partition's edge subset and replaces it by
  *     a STAR (node → local component min). The union of the stars has the
  *     same components as the input graph, at most one row per
  *     (partition, node), and every within-partition chain collapsed to
  *     depth 1 — the classic local-contraction step of the MapReduce CC
  *     literature (Kiveris et al., "Connected Components in MapReduce and
  *     Beyond").
  *  2. '''Bounded single-task finish''' — if the contracted star set fits
  *     `localBound` rows, one more union-find pass over it on a single
  *     executor task produces the final labels outright: zero iterative
  *     rounds, three jobs total. This is the same bounded-materialization
  *     stance as a broadcast-join build side (the quotient graph is SMALL —
  *     that is the premise of near-dup clustering), not a driver collect.
  *  3. '''Iterative min-label fallback''' — only when the quotient is
  *     genuinely large: min-label propagation with path halving over the
  *     star edges. The star table is cached PRE-PARTITIONED on the join key
  *     so each round reshuffles only the (small) label table, and each
  *     round is two shuffles (one join + one union-aggregate). Rounds scale
  *     with log(diameter) of the ALREADY-CONTRACTED graph.
  *
  * Fails loudly if `maxIters` rounds don't converge (a silent partial
  * clustering would under-deduplicate).
  */
object ConnectedComponents {

  /** (id, comp) for every node appearing in `edges`; comp = min node id of
    * the component. Ids may be any numeric or string type.
    *
    * @param localBound max star-edge rows finished on a single task (the
    *                   broadcast-threshold analogue); 0 forces the
    *                   iterative path.
    */
  def components(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 30, localBound: Long = 4L << 20): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema(aCol).dataType
    val lt = lessThan(idType)
    val pairSchema = StructType(Seq(
      StructField("src", idType), StructField("dst", idType)))
    val pairEnc = Encoders.row(pairSchema)

    val e = edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)

    // Phase 1: per-partition union-find → star edges (node, local min).
    val stars = e.mapPartitions(it => unionFind(it, lt))(pairEnc)
      .distinct().persist()
    val nStar = stars.count()

    val labels =
      if (nStar == 0) {
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("id", idType), StructField("comp", idType))))
      } else if (nStar <= localBound) {
        // Phase 2: the contracted quotient fits one task — finish with a
        // single union-find pass (no rounds, no driver data).
        val out = stars.repartition(1)
          .mapPartitions(it => unionFind(it, lt))(pairEnc)
          .select(col("src").as("id"), col("dst").as("comp"))
        // the RESULT frame stays cached for the caller — ROLLING persist
        // (graft.StageCache) so repeated invocations in one session free
        // the prior result's blocks instead of stacking leaked cache
        graft.StageCache.roll("ConnectedComponents.labels", out)
        out.count()
        out
      } else {
        iterate(stars, idType, maxIters, spark)
      }
    stars.unpersist()
    labels
  }

  /** Union-find over an edge iterator; emits (node, component-min) for
    * every node seen. Union-by-min keeps the representative deterministic
    * (the component's smallest id) regardless of edge order.
    */
  private def unionFind(rows: Iterator[Row],
      lt: (Any, Any) => Boolean): Iterator[Row] = {
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) {
        val g = parent(parent(r)) // path halving
        parent(r) = g
        r = g
      }
      r
    }
    rows.foreach { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keysIterator.map(k => Row(k, find(k)))
  }

  /** Min-label propagation with path halving over star edges — the
    * large-quotient path. Two shuffles per round: the cached star table is
    * pre-partitioned on `dst`, so only the label table moves.
    */
  private def iterate(stars: DataFrame, idType: DataType, maxIters: Int,
      spark: SparkSession): DataFrame = {
    // lineage is CUT each round by re-wrapping the round's computed RDD as
    // a fresh DataFrame: the iterated self-referencing join would otherwise
    // double the logical plan per round (2^rounds nodes before the
    // optimizer sees data). Plain persist (NOT localCheckpoint) keeps every
    // cached block in the CacheManager, so superseded rounds are freed here
    // and a session-level clearCache leaves nothing behind.
    def cutLineage(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)

    val sym = stars
      .unionByName(stars.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst")) // cached partitioning reused by every round's join
      .persist()
    sym.count()

    // jump-start labels from the star mapping (already ≤ id everywhere)
    var labels = stars.groupBy(col("src").as("id")).agg(min("dst").as("comp"))
    var prevCut: Option[DataFrame] = None

    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      // hop: min over own and neighbors' labels, as ONE union + aggregate
      // (the old label carried through so convergence needs no extra join)
      val nbr = sym
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .select(col("src").as("id"), col("comp").as("cand"),
          lit(null).cast(idType).as("own"))
      val self = labels.select(col("id"), col("comp").as("cand"),
        col("comp").as("own"))
      val hopped = self.unionByName(nbr)
        .groupBy("id").agg(min("cand").as("n1"), max("own").as("comp"))
      // path-halving: follow the label's own label (labels only ever
      // decrease, so the grand-label is always ≤) — distance to the
      // component min halves each round. ADAPTIVE: dense near-dup clusters
      // converge in the first hop-only rounds; the extra jump join is paid
      // only when chains prove long.
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
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          "(pathological chain — raise maxIters)")
    // the final round's cache backs the returned labels — hand it to the
    // rolling registry so the NEXT invocation frees it (same tag as the
    // small-quotient path: one live result generation per session)
    prevCut.foreach(p => graft.StageCache.roll("ConnectedComponents.labels", p))
    labels
  }

  private def lessThan(dt: DataType): (Any, Any) => Boolean = dt match {
    case ByteType => (a, b) => a.asInstanceOf[Byte] < b.asInstanceOf[Byte]
    case ShortType => (a, b) => a.asInstanceOf[Short] < b.asInstanceOf[Short]
    case IntegerType => (a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case LongType => (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    // Float/Double ids are REJECTED on purpose: JVM `<` (NaN comparisons
    // all false, union direction arbitrary) disagrees with the iterate
    // path's SQL min()/max() (NaN largest), so a graph containing NaN ids
    // could label nondeterministically depending on which path ran. Ids
    // are identities — use integral, string, or decimal.
    case StringType => (a, b) =>
      a.asInstanceOf[String].compareTo(b.asInstanceOf[String]) < 0
    case _: DecimalType => (a, b) =>
      a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal]) < 0
    case other => throw new IllegalArgumentException(
      s"unsupported id type for connected components: $other")
  }
}
