package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Randomized property testing for the operator layer (VERDICT r8 #5),
  * in-JVM half: seeded generators draw small random tables — NULL keys,
  * NULL values, NULL timestamps, exact-tie timestamps, one-sided groups —
  * and every [[AsofJoin]] / [[MergeUpsert]] / [[IncrementalAgg]] result is
  * checked against an independent BRUTE-FORCE Scala reference model (an
  * O(n²) loop nobody optimized, so it can't share a bug with the
  * one-shuffle implementations). The cross-engine half of the same idea is
  * `q_opfuzz_*` ([[graft.queries.OperatorFuzz]]): fixed-seed instances
  * over the real tables through the driver's DuckDB gate.
  *
  * On failure the clue prints the seed and the full input tables — a
  * sample IS its own minimal reproducer (inputs are ≤ ~40 rows).
  */
object OperatorFuzzSpec {
  // top-level so the product encoders resolve without an outer pointer
  final case class LRow(k: Option[String], ts: Option[Long], id: Long)
  final case class RRow(k: Option[String], rts: Option[Long], payload: Long)
  final case class KRow(k: Option[String], a: Option[Int], b: Option[String])
}

class OperatorFuzzSpec extends SparkSpec {
  import OperatorFuzzSpec._

  private val ss = spark
  import ss.implicits._

  private val AsofSamples = sys.props.get("opFuzzAsof").map(_.toInt).getOrElse(100)
  private val MergeSamples = sys.props.get("opFuzzMerge").map(_.toInt).getOrElse(60)
  private val AggSamples = sys.props.get("opFuzzAgg").map(_.toInt).getOrElse(60)

  private val KeyPool: Seq[Option[String]] =
    Seq(Some("a"), Some("b"), Some("c"), None)

  // ---------------------------------------------------------------- as-of

  test(s"$AsofSamples random as-of instances match the brute-force model " +
    "(direction x tolerance x ties x null keys/ts)") {
    for (seed <- 1 to AsofSamples) {
      val rnd = new java.util.Random(seed * 104729L + 3L)
      val dir = if (rnd.nextInt(6) < 3) "backward" else "forward"
      val tol: Option[Long] =
        if (rnd.nextInt(3) == 0) None else Some(1L + rnd.nextInt(6))
      // left: free-form (duplicate ts, null ts, null keys all legal)
      val left = (0 until (5 + rnd.nextInt(25))).map { i =>
        LRow(KeyPool(rnd.nextInt(KeyPool.size)),
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20).toLong),
          i.toLong)
      }
      // right: UNIQUE (k, ts) — duplicate right stamps are ill-defined in
      // any engine; the operator's contract requires the lookup grain.
      // ~10% of samples carry one null-ts right row (must never match).
      val rightKeys = scala.collection.mutable.Set.empty[(Option[String], Option[Long])]
      val right = (0 until (3 + rnd.nextInt(20))).flatMap { _ =>
        val cand = (KeyPool(rnd.nextInt(KeyPool.size)),
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20).toLong))
        if (rightKeys.add(cand))
          Some(RRow(cand._1, cand._2, rnd.nextInt(1000).toLong))
        else None
      }
      val got = AsofJoin(left.toDF("k", "ts", "id"),
        right.toDF("k", "rts", "payload"), Seq("k"),
        leftTs = "ts", rightTs = "rts", tolerance = tol, direction = dir)
        .select(col("id"), col("asof_rts"), col("asof_payload"))
        .collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long])))
        .toMap

      // brute force: scan ALL right rows per left row
      val want = left.map { l =>
        val best = l.ts match {
          case None => None
          case Some(lts) =>
            val cands = right.filter(r => r.k == l.k && r.rts.isDefined)
              .filter(r =>
                if (dir == "backward") r.rts.get <= lts else r.rts.get >= lts)
            val nearest =
              if (cands.isEmpty) None
              else if (dir == "backward") Some(cands.maxBy(_.rts.get))
              else Some(cands.minBy(_.rts.get))
            nearest.filter { r =>
              val dist =
                if (dir == "backward") lts - r.rts.get else r.rts.get - lts
              tol.forall(dist <= _)
            }
        }
        l.id -> (best.map(_.rts.get), best.map(_.payload))
      }.toMap

      withClue(s"seed=$seed dir=$dir tol=$tol\nleft=$left\nright=$right\n") {
        got shouldBe want
      }
    }
  }

  // ---------------------------------------------------------------- merge

  test(s"$MergeSamples random MERGE instances match the models " +
    "(coalesce-resolve apply vs delete+insert viaAnti, null keys/values)") {
    for (seed <- 1 to MergeSamples) {
      val rnd = new java.util.Random(seed * 15485863L + 11L)
      def side(): Seq[KRow] = {
        val used = scala.collection.mutable.Set.empty[Option[String]]
        val pool = KeyPool ++ Seq(Some("d"), Some("e"), Some("f"))
        (0 until (2 + rnd.nextInt(7))).flatMap { _ =>
          val k = pool(rnd.nextInt(pool.size))
          if (used.add(k)) Some(KRow(k,
            if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(100)),
            if (rnd.nextInt(4) == 0) None else Some("v" + rnd.nextInt(10))))
          else None
        }
      }
      val tgt = side(); val src = side()
      val tDf = tgt.toDF("k", "a", "b"); val sDf = src.toDF("k", "a", "b")
      val tByK = tgt.map(r => r.k -> r).toMap
      val sByK = src.map(r => r.k -> r).toMap

      // apply(): null-safe key match, per-column coalesce resolve
      val wantApply = (tByK.keySet ++ sByK.keySet).toSeq.map { k =>
        (tByK.get(k), sByK.get(k)) match {
          case (Some(t), Some(s)) =>
            KRow(k, s.a.orElse(t.a), s.b.orElse(t.b))
          case (Some(t), None) => t
          case (None, Some(s)) => s
          case _ => sys.error("unreachable")
        }
      }
      val gotApply = MergeUpsert(tDf, sDf, Seq("k")).as[KRow].collect().toSeq
      withClue(s"seed=$seed apply\ntgt=$tgt\nsrc=$src\n") {
        gotApply.sortBy(_.toString) shouldBe wantApply.sortBy(_.toString)
      }

      // viaAnti(): SQL-equality anti (NULL target key always survives),
      // matched rows replaced WHOLE by the source row
      val srcKeys = sByK.keySet
      val wantAnti = tgt.filter(t =>
        t.k.isEmpty || !srcKeys.contains(t.k)) ++ src
      val gotAnti = MergeUpsert.viaAnti(tDf, sDf, Seq("k"))
        .as[KRow].collect().toSeq
      withClue(s"seed=$seed viaAnti\ntgt=$tgt\nsrc=$src\n") {
        gotAnti.sortBy(_.toString) shouldBe wantAnti.sortBy(_.toString)
      }
    }
  }

  // ----------------------------------------------------------- range join

  private val RangeSamples = sys.props.get("opFuzzRange").map(_.toInt).getOrElse(60)

  test(s"$RangeSamples random range-join instances match the brute-force model " +
    "(negative coords, random bucket widths, null keys/bounds)") {
    for (seed <- 1 to RangeSamples) {
      val rnd = new java.util.Random(seed * 49979687L + 13L)
      val bw = 1L + rnd.nextInt(7)
      def coord(): Option[Long] =
        if (rnd.nextInt(12) == 0) None else Some((rnd.nextInt(41) - 20).toLong)
      val points = (0 until (4 + rnd.nextInt(20))).map { i =>
        (KeyPool(rnd.nextInt(KeyPool.size)), coord(), i.toLong)
      }
      val intervals = (0 until (3 + rnd.nextInt(12))).map { i =>
        val (a, b) = (coord(), coord())
        val (lo, hi) = (a, b) match {
          case (Some(x), Some(y)) => (Some(x min y), Some(x max y))
          case other              => other
        }
        (KeyPool(rnd.nextInt(KeyPool.size)), lo, hi, i.toLong)
      }
      val got = RangeJoin.pointInInterval(
        points.toDF("k", "p", "pid"), intervals.toDF("k", "lo", "hi", "iid"),
        Seq("k"), pointCol = "p", loCol = "lo", hiCol = "hi",
        bucketWidth = bw)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // brute force; SQL equi-join semantics: NULL key or bound never matches
      val want = (for {
        (pk, pOpt, pid) <- points
        p <- pOpt.toSeq
        if pk.isDefined
        (ik, loOpt, hiOpt, iid) <- intervals
        if ik == pk
        lo <- loOpt.toSeq; hi <- hiOpt.toSeq
        if lo <= p && p <= hi
      } yield (pid, iid)).sorted
      withClue(s"seed=$seed bw=$bw\npoints=$points\nintervals=$intervals\n") {
        got shouldBe want
      }
    }
  }

  // ------------------------------------------------------------ components

  private val CcSamples = sys.props.get("opFuzzCc").map(_.toInt).getOrElse(40)

  test(s"$CcSamples random edge sets: ConnectedComponents (both finish paths) " +
    "matches a reference union-find") {
    for (seed <- 1 to CcSamples) {
      val rnd = new java.util.Random(seed * 86028121L + 19L)
      val nNodes = 3 + rnd.nextInt(28)
      val edges = (0 until (2 + rnd.nextInt(40))).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong) // self-loops ok
      }
      // reference union-find (union-by-min via path-compressed find)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.map(n => n -> find(n)).toMap
      val df = edges.toDF("a", "b")
      for (bound <- Seq(4L << 20, 0L)) { // single-task finish AND iterative
        val got = ConnectedComponents
          .components(df, "a", "b", localBound = bound)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        withClue(s"seed=$seed bound=$bound\nedges=$edges\n") {
          got shouldBe want
        }
      }
    }
  }

  // ------------------------------------------------- incremental aggregate

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test(s"$AggSamples random IncrementalAgg specs: advance over any split " +
    "equals full recompute (random state subsets, null keys/values)") {
    for (seed <- 1 to AggSamples) {
      val rnd = new java.util.Random(seed * 32452843L + 7L)
      val useSum = rnd.nextInt(2) == 1
      val useMin = rnd.nextInt(2) == 1
      val useMax = !useSum && !useMin || rnd.nextInt(2) == 1
      val spec = IncrementalAgg.Spec(keys = Seq("k"),
        sumCols = if (useSum) Seq("v") else Nil,
        minCols = if (useMin) Seq("v") else Nil,
        maxCols = if (useMax) Seq("v") else Nil)
      val rows = (0 until (4 + rnd.nextInt(30))).map { i =>
        (KeyPool(rnd.nextInt(KeyPool.size)),
          if (rnd.nextInt(6) == 0) None
          else Some(math.round((rnd.nextDouble() - 0.3) * 1000) / 4.0),
          i.toLong)
      }
      val df = rows.toDF("k", "v", "i")
      val cut = rnd.nextInt(rows.size + 1)
      val snap = IncrementalAgg.aggregate(df.filter(col("i") < cut), spec)
      val delta = df.filter(col("i") >= cut)
      val got = IncrementalAgg.advance(snap, delta, spec)
      val want = IncrementalAgg.aggregate(df, spec)
      withClue(s"seed=$seed cut=$cut spec=$spec\nrows=$rows\n") {
        canon(got) shouldBe canon(want)
      }
    }
  }
}
