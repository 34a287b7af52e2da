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
  /** CDC model row: nullable value + string column keyed by a Long id. */
  final case class CRow(v: Option[Double], s: Option[String])
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

  // --------------------------------------------------------- cdc apply

  private val CdcSamples = sys.props.get("opFuzzCdc").map(_.toInt).getOrElse(100)

  test(s"$CdcSamples random CDC op sequences through chained " +
    "CdcApply.applyBatch match a per-key replay model (interleaved " +
    "insert/update/delete, partial after-images, unparseable values, " +
    "deletes of absent keys)") {
    for (seed <- 1 to CdcSamples) {
      val rnd = new java.util.Random(seed * 52361057L + 41L)
      val K = 8 + rnd.nextInt(6) % 5 // key domain 0..K+2 (some never in target)
      // target: random subset of keys with nullable columns
      val target0 = (0 until K).flatMap { k =>
        if (rnd.nextInt(2) == 0) Some(k.toLong -> CRow(
          if (rnd.nextInt(5) == 0) None else Some((rnd.nextInt(400) - 200) / 4.0),
          if (rnd.nextInt(5) == 0) None else Some("s" + rnd.nextInt(8))))
        else None
      }.toMap
      val nBatches = 1 + rnd.nextInt(3)
      var seq = 0L
      // a batch: (key, isDelete, after-image) drawn ops, arrival-ordered
      val batches = (0 until nBatches).map { _ =>
        (0 until (1 + rnd.nextInt(10))).map { _ =>
          val k = rnd.nextInt(K + 3).toLong
          val isDel = rnd.nextInt(3) == 0
          seq += 1
          val after: Map[String, String] =
            if (isDel) Map.empty
            else Map("id" -> k.toString) ++
              (rnd.nextInt(4) match { // v: present | missing | garbage
                case 0 => Map.empty[String, String]
                case 1 if rnd.nextInt(8) == 0 => Map("v" -> "not a number")
                case _ => Map("v" -> ((rnd.nextInt(400) - 200) / 4.0).toString)
              }) ++
              (if (rnd.nextInt(4) == 0) Map.empty[String, String]
               else Map("s" -> ("s" + rnd.nextInt(8))))
          (k, isDel, after, seq)
        }
      }

      // engine: chain the real per-micro-batch MERGE apply
      val tDf = target0.toSeq.map { case (k, r) => (k, r.v, r.s) }
        .toDF("id", "v", "s")
      val got = batches.foldLeft(tDf) { (state, ops) =>
        val msgs = ops.map { case (k, isDel, after, sq) =>
          graft.cdc.CDCMessage("d", "p", "t",
            isInsert = !isDel && !target0.contains(k), isUpdate = !isDel,
            isDelete = isDel,
            before = if (isDel) Map("id" -> k.toString) else Map.empty,
            after = after, seq = sq)
        }.toDS()
        graft.cdc.CdcApply.applyBatch(state, msgs, Seq("id"))
      }.collect().map(r => r.getLong(0) -> CRow(
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[String]))).toMap

      // model: per batch, LAST op per key applied against batch-START state
      // (reference CDCMessageProcessor semantics: last event per key wins,
      // upsert columns coalesce — a missing or unparseable after-image
      // column keeps the matched row's old value)
      val want = batches.foldLeft(target0) { (state, ops) =>
        val last = ops.groupBy(_._1).map { case (k, os) => k -> os.maxBy(_._4) }
        last.foldLeft(state) { case (st, (k, (_, isDel, after, _))) =>
          if (isDel) st - k
          else {
            val av = after.get("v").flatMap(_.toDoubleOption)
            val as = after.get("s")
            val old = st.get(k)
            st + (k -> CRow(av.orElse(old.flatMap(_.v)),
              as.orElse(old.flatMap(_.s))))
          }
        }
      }
      withClue(s"seed=$seed\ntarget=$target0\nbatches=$batches\n") {
        got shouldBe want
      }
    }
  }

  // ------------------------------------------------- cdc stream (e2e fuzz)

  private val CdcStreamSamples =
    sys.props.get("opFuzzCdcStream").map(_.toInt).getOrElse(8)

  test(s"$CdcStreamSamples random CDC streams (partitioned + unpartitioned " +
    "targets, partition-moving updates, checkpoint restart between batches) " +
    "match the replay model") {
    import java.nio.file.Files
    for (seed <- 1 to CdcStreamSamples) {
      val rnd = new java.util.Random(seed * 87178291L + 53L)
      val partitioned = rnd.nextInt(6) < 3
      val K = 10
      def grpOf(g: Int) = g.toString
      // live state used for accurate mid-batch before images: key -> grp
      val target0 = (0 until K).flatMap { k =>
        if (rnd.nextInt(3) > 0) Some(k.toLong ->
          ((k % 3), (rnd.nextInt(400) - 200) / 4.0))
        else None
      }.toMap

      def jstr(v: String) = "\"" + v + "\"" // values are alnum-safe here
      def obj(m: Seq[(String, String)]) =
        if (m.isEmpty) "null"
        else m.map { case (k, v) => jstr(k) + ": " + jstr(v) }
          .mkString("{", ", ", "}")
      def env(op: String, before: Seq[(String, String)],
          after: Seq[(String, String)], sq: Long) =
        s"""{"payload": {"op": "$op", "before": ${obj(before)}, """ +
          s""""after": ${obj(after)}, "source": {"db": "d", "schema": "p", """ +
          s""""table": "t"}, "ts_ms": $sq}}"""

      // generate 2 batches; before images track MID-BATCH grp truth (what a
      // real Debezium source emits), the model applies last-op-per-key
      // against batch-start state (what the engine does)
      var seq = 0L
      var modelState = target0 // key -> (grp, v)
      val batchLines = (0 until 2).map { _ =>
        val midGrp = scala.collection.mutable.Map[Long, Int](
          modelState.view.mapValues(_._1).toSeq: _*)
        val ops = (1 + rnd.nextInt(8)) // (key, isDel, afterGrp, afterV, seq)
        val drawn = (0 until ops).map { _ =>
          val k = rnd.nextInt(K + 2).toLong
          seq += 1
          midGrp.get(k) match {
            case Some(g) if rnd.nextInt(4) == 0 => // delete live key
              midGrp.remove(k)
              (env("d", Seq("id" -> k.toString, "grp" -> grpOf(g)), Nil, seq),
                (k, true, 0, 0.0, seq))
            case Some(g) => // update, moving partition 1/3 of the time
              val ng = if (rnd.nextInt(3) == 0) (g + 1) % 3 else g
              val nv = (rnd.nextInt(400) - 200) / 4.0
              midGrp(k) = ng
              (env("u", Seq("id" -> k.toString, "grp" -> grpOf(g)),
                Seq("id" -> k.toString, "v" -> nv.toString,
                  "grp" -> grpOf(ng)), seq),
                (k, false, ng, nv, seq))
            case None if rnd.nextInt(5) == 0 => // delete of an absent key
              (env("d", Seq("id" -> k.toString,
                "grp" -> grpOf(rnd.nextInt(3))), Nil, seq),
                (k, true, 0, 0.0, seq))
            case None => // insert
              val ng = rnd.nextInt(3)
              val nv = (rnd.nextInt(400) - 200) / 4.0
              midGrp(k) = ng
              (env("c", Nil, Seq("id" -> k.toString, "v" -> nv.toString,
                "grp" -> grpOf(ng)), seq),
                (k, false, ng, nv, seq))
          }
        }
        val last = drawn.map(_._2).groupBy(_._1)
          .map { case (k, os) => k -> os.maxBy(_._5) }
        modelState = last.foldLeft(modelState) {
          case (st, (k, (_, isDel, g, v, _))) =>
            if (isDel) st - k else st + (k -> (g, v))
        }
        drawn.map(_._1)
      }

      val lake = scratchDir(s"cdcfz$seed").getAbsolutePath
      val inDir = scratchDir(s"cdcfzin$seed").toPath
      val ckpt = scratchDir(s"cdcfzck$seed").getAbsolutePath
      val sink = graft.model.ObjectStoreSpec(path = lake,
        database = "graft_cdcfz", table = s"t$seed",
        partitionBy = if (partitioned) Seq("grp") else Nil)
      graft.sinks.ObjectStoreSink.write(spark,
        target0.toSeq.map { case (k, (g, v)) => (k, v, grpOf(g)) }
          .toDF("id", "v", "grp"), sink)

      batchLines.zipWithIndex.foreach { case (lines, i) =>
        Files.writeString(inDir.resolve(s"b$i.jsonl"), lines.mkString("\n"))
        graft.streaming.CdcStream
          .start(spark, inDir.toString, sink, Seq("id"), ckpt)
          .awaitTermination(180000) shouldBe true
      }
      val got = spark.table(s"graft_cdcfz.t$seed")
        // partition-column type inference may read grp dirs back as int
        .select(col("id"), col("v"), col("grp").cast("string").as("grp"))
        .collect().map(r => r.getLong(0) ->
          ((r.getString(2).toInt, r.getDouble(1)))).toMap
      withClue(s"seed=$seed partitioned=$partitioned\ntarget=$target0\n" +
        s"batches=$batchLines\n") {
        got shouldBe modelState
      }
    }
  }

  // ------------------------------------------- mssql-cdc pairing (S12/J4)

  private val MsSqlSamples =
    sys.props.get("opFuzzMssql").map(_.toInt).getOrElse(30)

  test(s"$MsSqlSamples random MSSQL-style change tables: seqval pairing + " +
    "watermarked two-window poll + apply match a replay model") {
    import graft.cdc.{CdcApply, MsSqlStyleCdc, WatermarkStore}
    import graft.model.JdbcSourceSpec
    // Event grammar per real SQL Server CDC: a seqval carries ONE op-1
    // (delete, full before image), ONE op-2 (insert), or an op-3/op-4
    // update pair. Orphan halves cannot occur across polls — both halves
    // share the seqval and the watermark predicate is `seqval > wm`, so a
    // pair is never split by a window boundary (the reference's pairing
    // argument, MsSqlCDCRunnerSlave.scala:34-187); the generator therefore
    // never emits them, and `CdcSpec` pins the single-half passthrough.
    for (seed <- 1 to MsSqlSamples) {
      val rnd = new java.util.Random(seed * 15787001L + 59L)
      val dir = scratchDir(s"msfz$seed").toPath
      val url = s"jdbc:derby:$dir/db;create=true"
      val c = java.sql.DriverManager.getConnection(url)
      c.createStatement().executeUpdate(
        """CREATE TABLE ch ("__$operation" INT, "__$seqval" BIGINT,
          |id INT, v VARCHAR(20))""".stripMargin.replace("\n", " "))
      def ins(op: Int, seqval: Long, id: Int, v: Option[String]): Unit =
        c.createStatement().executeUpdate(
          s"INSERT INTO ch VALUES ($op, $seqval, $id, " +
            v.map(s => s"'$s'").getOrElse("NULL") + ")")

      val K = 8
      var state = (0 until K).flatMap { k =>
        if (rnd.nextInt(2) == 0) Some(k -> Option.when(rnd.nextInt(5) > 0)("v" + rnd.nextInt(9)))
        else None
      }.toMap
      val target = state.toSeq.map { case (k, v) => (k, v.orNull) }.toDF("id", "v")

      // two poll windows of events over ascending seqvals; the model is
      // last-event-per-key per WINDOW applied against window-start state
      // (CdcApply semantics — the engine's per-batch MERGE)
      var seqval = 100L
      def window(): Seq[(Long, Int, Int, Option[String])] = // seqval, op, id, v
        (0 until (2 + rnd.nextInt(7))).map { _ =>
          val id = rnd.nextInt(K + 2)
          seqval += 1 + rnd.nextInt(3)
          rnd.nextInt(3) match {
            case 0 => (seqval, 1, id, Option.when(rnd.nextInt(5) > 0)("d" + rnd.nextInt(9)))
            case 1 => (seqval, 2, id, Option.when(rnd.nextInt(5) > 0)("i" + rnd.nextInt(9)))
            case _ => (seqval, 34, id, Option.when(rnd.nextInt(5) > 0)("u" + rnd.nextInt(9)))
          }
        }
      def emit(w: Seq[(Long, Int, Int, Option[String])]): Unit = w.foreach {
        case (sv, 34, id, v) => // update pair: before half + after half
          ins(3, sv, id, Some("old" + id)); ins(4, sv, id, v)
        case (sv, op, id, v) => ins(op, sv, id, v)
      }
      def modelApply(w: Seq[(Long, Int, Int, Option[String])]): Unit = {
        val last = w.groupBy(_._3).map { case (id, evs) => id -> evs.maxBy(_._1) }
        last.toSeq.sortBy(_._1).foreach { case (id, (_, op, _, v)) =>
          if (op == 1) state -= id
          else { // insert or update-after: full image, v may be NULL →
                 // coalesce keeps the old value on matched keys
            val old = state.get(id)
            state += id -> v.orElse(old.flatten)
          }
        }
      }

      val store = new WatermarkStore(dir.resolve("wm.properties"))
      val spec = JdbcSourceSpec(url = url, table = "ch")
      var applied = target
      for (w <- Seq(window(), window())) {
        emit(w)
        val poll = MsSqlStyleCdc.poll(spark, s"ds$seed", spec, store)
        poll.rows shouldBe w.map(_._1).distinct.size
        applied = CdcApply.applyBatch(applied, poll.messages, Seq("id"))
          .persist()
        applied.count() // materialize before the next window mutates ch
        poll.commit(store, s"ds$seed")
        modelApply(w)
      }
      c.close()
      val got = applied.collect()
        .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
      withClue(s"seed=$seed\ntarget state progression expected=$state\n") {
        got shouldBe state
      }
    }
  }

  // ------------------------------------------------------ zone-map pruning

  private val ZoneSamples = sys.props.get("opFuzzZone").map(_.toInt).getOrElse(50)

  test(s"$ZoneSamples random lakes: zone-map pruned reads equal unpruned " +
    "filtered reads under NaN/±0.0/non-ASCII/null/temporal/extreme-long " +
    "mixed-domain adversaries") {
    import graft.model.ObjectStoreSpec
    import graft.sinks.{ObjectStoreSink, ZoneMap}
    import org.apache.spark.sql.functions.lit
    // the invariant that makes file skipping SAFE to ship: pruning is a
    // pure optimization — for ANY data layout and ANY bound, the pruned
    // read equals readVersion + the identical residual filter. The value
    // pools are chosen to hit every soundness cliff: NaN poisons footer
    // ranges (must suppress stats, and Spark treats NaN as greatest),
    // -0.0 == 0.0 in both IEEE compares and Spark, non-ASCII strings must
    // suppress stats only when they reach the recorded bounds, longs past
    // 2^53 must refuse double-domain proofs, Long.MinValue/MaxValue bounds
    // and values must compare without wrapping, pre-1970 dates/timestamps
    // must floor (not truncate) into epoch days/micros, and null-only
    // files must prune without ever eating rows from mixed files.
    val vPool: Seq[Option[Double]] = Seq(Some(1.5), Some(-3.25), Some(0.0),
      Some(-0.0), Some(Double.NaN), Some(1e300), Some(-1e300), None)
    val sPool: Seq[Option[String]] = Seq(Some(""), Some("aa"), Some("zz"),
      Some("café"), Some("row-42"), Some("z" * 50), None)
    val idPool: Seq[Option[Long]] = Seq(Some(0L), Some(5L), Some(-7L),
      Some(1L << 60), Some(123L), Some(Long.MinValue), Some(Long.MaxValue),
      None)
    def d(s: String) = java.sql.Date.valueOf(s)
    def t(s: String) =
      java.sql.Timestamp.from(java.time.Instant.parse(s))
    val dtPool: Seq[Option[java.sql.Date]] = Seq(Some(d("1969-12-31")),
      Some(d("1970-01-01")), Some(d("1900-02-28")), Some(d("2024-06-15")),
      Some(d("9999-12-31")), None)
    val tsPool: Seq[Option[java.sql.Timestamp]] = Seq(
      Some(t("1969-12-31T23:59:59.999999Z")), Some(t("1970-01-01T00:00:00Z")),
      Some(t("1905-03-04T05:06:07.000008Z")),
      Some(t("2262-04-11T23:47:16.854775Z")), None)
    var filesSkipped = 0
    for (seed <- 1 to ZoneSamples) {
      val rnd = new java.util.Random(seed * 48611L + 11L)
      val rows = (0 until (5 + rnd.nextInt(36))).map { _ =>
        (idPool(rnd.nextInt(idPool.size)), vPool(rnd.nextInt(vPool.size)),
          sPool(rnd.nextInt(sPool.size)), dtPool(rnd.nextInt(dtPool.size)),
          tsPool(rnd.nextInt(tsPool.size)))
      }
      val spec = ObjectStoreSpec(
        path = scratchDir(s"zmf$seed").getAbsolutePath,
        database = "graft_zmf", table = s"t$seed")
      ObjectStoreSink.replaceTable(spark,
        rows.toDF("id", "v", "s", "dt", "ts").repartition(1 + rnd.nextInt(4)),
        spec)
      def draw(colName: String): ZoneMap.Bound = {
        def boundVal(): Any = colName match {
          // cross-domain draws exercise the refuse-to-prune paths
          case "id" =>
            rnd.nextInt(12) match {
              case 0 => Long.MinValue
              case 1 => Long.MaxValue
              case n if n < 9 => rnd.nextInt(20).toLong - 8L
              case _ => rnd.nextInt(20).toDouble - 8.0
            }
          case "v" => if (rnd.nextInt(8) == 0) Double.NaN
            else (rnd.nextInt(40) - 20) / 4.0
          case "dt" =>
            // Date and LocalDate spellings must behave identically
            val dv = dtPool(rnd.nextInt(dtPool.size - 1)).get
            if (rnd.nextBoolean()) dv else dv.toLocalDate
          case "ts" =>
            val tv = tsPool(rnd.nextInt(tsPool.size - 1)).get
            if (rnd.nextBoolean()) tv else tv.toInstant
          case _ => sPool(rnd.nextInt(sPool.size - 1)).get // never null
        }
        ZoneMap.Bound(colName,
          lower = if (rnd.nextInt(10) < 7) Some(boundVal()) else None,
          upper = if (rnd.nextInt(10) < 7) Some(boundVal()) else None)
      }
      val cols = new scala.util.Random(rnd.nextLong())
        .shuffle(Seq("id", "v", "s", "dt", "ts")).take(1 + rnd.nextInt(3))
      val preds = cols.map(draw)
      val (pruned, rep) = ObjectStoreSink.readVersionPruned(spark, spec, preds)
      val full = preds.foldLeft(ObjectStoreSink.readVersion(spark, spec)) {
        (d, p) =>
          val c = col(p.column)
          val d1 = p.lower.map(x => d.where(c >= lit(x))).getOrElse(d)
          p.upper.map(x => d1.where(c <= lit(x))).getOrElse(d1)
      }
      withClue(s"seed=$seed preds=$preds report=$rep\nrows=$rows\n") {
        canon(pruned) shouldBe canon(full)
      }
      filesSkipped += rep.filesSkipped
    }
    // the sweep must actually exercise skipping, not vacuously keep all
    filesSkipped should be > 0
  }

  // --------------------------------------------- metadata-aggregate planner

  private val MetaAggSamples =
    sys.props.get("opFuzzMetaAgg").map(_.toInt).getOrElse(25)

  test(s"$MetaAggSamples random lakes: SQL aggregates with the planner " +
    "rules registered equal the relational answers — grouped and global, " +
    "partitioned and not, NaN/±0.0/extreme/null adversaries, refusal " +
    "paths included") {
    import graft.model.ObjectStoreSpec
    import graft.sinks.ObjectStoreSink
    // the invariant that makes the MetaAggRule SHIPPABLE: for ANY lake
    // layout and ANY supported aggregate query, the SQL answer with the
    // rules active equals the answer computed relationally from the
    // original rows — whether the rewrite fired (manifest answers) or
    // refused (scan answers). Effectiveness is asserted separately: the
    // sweep must actually rewrite some queries, or it only ever tested
    // the refusal path.
    import org.apache.spark.sql.functions.{count, lit, max, min}
    graft.GraftExtensions.register(spark)
    val grpPool: Seq[Option[String]] =
      Seq(Some("a"), Some("b"), Some("c"), None)
    val vPool: Seq[Option[Double]] = Seq(Some(1.5), Some(-3.25), Some(0.0),
      Some(-0.0), Some(Double.NaN), Some(1e300), None)
    val idPool: Seq[Option[Long]] = Seq(Some(0L), Some(7L), Some(-12L),
      Some(Long.MinValue), Some(Long.MaxValue), Some(1L << 60), None)
    var rewrites = 0
    for (seed <- 1 to MetaAggSamples) {
      val rnd = new java.util.Random(seed * 77261L + 5L)
      val rows = (0 until (4 + rnd.nextInt(40))).map { _ =>
        (idPool(rnd.nextInt(idPool.size)), grpPool(rnd.nextInt(grpPool.size)),
          vPool(rnd.nextInt(vPool.size)))
      }
      val partitioned = rnd.nextInt(5) < 3
      val spec = ObjectStoreSpec(
        path = scratchDir(s"maf$seed").getAbsolutePath,
        database = "graft_maf", table = s"t$seed",
        partitionBy = if (partitioned) Seq("grp") else Nil)
      val df = rows.toDF("id", "grp", "v")
      val fq = ObjectStoreSink.replaceTable(spark,
        df.repartition(1 + rnd.nextInt(3)), spec)
      val aggDefs = Seq(
        ("count(*)", count(lit(1))), ("count(id)", count(col("id"))),
        ("count(v)", count(col("v"))), ("count(grp)", count(col("grp"))),
        ("min(id)", min("id")), ("max(id)", max("id")),
        ("min(v)", min("v")), ("max(v)", max("v")),
        ("min(grp)", min("grp")), ("max(grp)", max("grp")))
      val picked = new scala.util.Random(rnd.nextLong())
        .shuffle(aggDefs).take(1 + rnd.nextInt(4))
      val grouped = rnd.nextBoolean()
      val sqlAggs = picked.zipWithIndex
        .map { case ((sql, _), i) => s"$sql AS a$i" }.mkString(", ")
      val cols = picked.zipWithIndex
        .map { case ((_, c), i) => c.as(s"a$i") }
      val (got, want) =
        if (grouped) (
          spark.sql(s"SELECT grp, $sqlAggs FROM $fq GROUP BY grp"),
          df.groupBy("grp").agg(cols.head, cols.tail: _*))
        else (
          spark.sql(s"SELECT $sqlAggs FROM $fq"),
          df.agg(cols.head, cols.tail: _*))
      val fired = got.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.nonEmpty
      if (fired) rewrites += 1
      // -0.0 == 0.0 in SQL: MIN/MAX may surface either bit pattern
      // depending on evaluation order (stats record -0.0 via parquet's
      // zero-widening; a scan returns whichever row came first) — both
      // answers are SQL-equal, so compare under zero normalization
      def canonZ(dfx: org.apache.spark.sql.DataFrame): Seq[String] = {
        val cs = dfx.columns.sorted
        dfx.select(cs.head, cs.tail: _*).collect()
          .map(_.toSeq.map {
            case d: java.lang.Double if d.doubleValue == 0.0 => "0.0"
            case x => String.valueOf(x)
          }.mkString("|")).sorted.toSeq
      }
      withClue(s"seed=$seed partitioned=$partitioned grouped=$grouped " +
        s"aggs=${picked.map(_._1)} fired=$fired\nrows=$rows\n") {
        canonZ(got) shouldBe canonZ(want)
      }
    }
    // the sweep must exercise the REWRITE path, not only refusals
    rewrites should be > 0
  }

  // ------------------------------------------------------ bloom index

  private val BloomSamples =
    sys.props.get("opFuzzBloom").map(_.toInt).getOrElse(20)

  test(s"$BloomSamples random lakes: bloom-pruned point/IN reads equal " +
    "the full filter — long/int/string/date/timestamp domains, unicode, " +
    "extremes, nulls, layouts, budget squeezes; refusals keep everything") {
    import graft.model.ObjectStoreSpec
    import graft.sinks.{BloomIndex, ObjectStoreSink, TableManifest}
    // the invariant that makes the index SHIPPABLE: for ANY committed
    // layout and ANY probe set the sidecar can prove against, reading
    // only the kept files under the equality/IN predicate returns
    // EXACTLY the full table's matching rows — no false negative ever.
    // Effectiveness is asserted separately across the sweep.
    var skips = 0L
    for (seed <- 1 to BloomSamples) {
      val rnd = new java.util.Random(seed * 48271L + 11L)
      val domain = Seq("long", "int", "string", "date", "ts")(rnd.nextInt(5))
      val n = 60 + rnd.nextInt(300)
      def strPool(i: Int) = Seq(s"doc-$i", s"ü-$i", s"漢字$i", s"$i")(i % 4)
      val longPool: Int => Option[Long] = i =>
        if (i % 17 == 0) None
        else if (i % 13 == 0) Some(Long.MaxValue - i)
        else if (i % 11 == 0) Some(Long.MinValue + i)
        else Some((i * 31L) % 500L)
      // (key as Any|null, payload)
      val rows: Seq[(Any, Int)] = (0 until n).map { i =>
        val k: Any = domain match {
          case "long" => longPool(i).orNull
          case "int" => if (i % 17 == 0) null else Int.box((i * 7) % 400)
          case "string" => if (i % 19 == 0) null else strPool(i)
          case "date" => if (i % 17 == 0) null
            else java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay((i * 97L) % 40000L - 5000L))
          case _ => if (i % 17 == 0) null
            else java.sql.Timestamp.from(
              java.time.Instant.ofEpochSecond(i * 86400L - 1000000L, 0))
        }
        (k, i)
      }
      val df = domain match {
        case "long" => rows.map(r => (Option(r._1).map(_.asInstanceOf[Long]), r._2))
          .toDF("key", "payload")
        case "int" => rows.map(r => (Option(r._1).map(_.asInstanceOf[Int]), r._2))
          .toDF("key", "payload")
        case "string" => rows.map(r => (Option(r._1).map(_.asInstanceOf[String]), r._2))
          .toDF("key", "payload")
        case "date" => rows.map(r => (Option(r._1).map(_.asInstanceOf[java.sql.Date]), r._2))
          .toDF("key", "payload")
        case _ => rows.map(r => (Option(r._1).map(_.asInstanceOf[java.sql.Timestamp]), r._2))
          .toDF("key", "payload")
      }
      val files = 2 + rnd.nextInt(5)
      val layout = rnd.nextInt(6) match {
        case 0 => df.repartition(files, col("payload")) // unrelated hash
        case 1 => df.repartitionByRange(files, col("key")) // clustered
        case _ => df.repartition(files, col("key")) // hash on key
      }
      val spec = ObjectStoreSpec(
        path = scratchDir(s"blf$seed").getAbsolutePath,
        database = "graft_blf", table = s"t$seed",
        bloomColumns = Seq("key"))
      ObjectStoreSink.replaceTable(spark, layout, spec)
      val vdir = java.nio.file.Paths.get(
        ObjectStoreSink.snapshots(spec).last.path)
      val m = TableManifest.read(vdir).get
      // random budget squeeze: rebuild with a tiny byte cap sometimes —
      // fpp degrades, soundness must not
      if (rnd.nextInt(3) == 0)
        BloomIndex.build(spark, vdir, "parquet", Seq("key"), m,
          maxIndexBytes = 32L * files)
      // probe sets: present / absent / mixed / with null / empty
      val present = rows.collect { case (k, _) if k != null => k }
      val absent: Seq[Any] = domain match {
        case "long" => Seq(999999L, -424242L)
        case "int" => Seq(Int.box(999999), Int.box(-5))
        case "string" => Seq("absent-…", "×")
        case "date" => Seq(java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(200000L)))
        case _ => Seq(java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(4102444800L)))
      }
      val draws: Seq[Seq[Any]] = Seq(
        Seq(present(rnd.nextInt(present.size))),
        absent,
        (0 until 3).map(_ => present(rnd.nextInt(present.size))) ++
          absent.take(1) :+ null,
        Seq.empty[Any])
      for (probe <- draws) {
        BloomIndex.prune(vdir, m, "key", probe) match {
          case None => fail(s"seed=$seed domain=$domain: prune refused a " +
            "convertible probe set — sidecar missing?")
          case Some((kept, rep)) =>
            skips += rep.filesSkipped
            val nn = probe.filterNot(_ == null)
            val want = df.where(
              if (nn.isEmpty) org.apache.spark.sql.functions.lit(false)
              else col("key").isin(nn: _*))
              .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
            val got = ObjectStoreSink.readSubset(spark, vdir.toString,
              "parquet", kept, m.files.size)
              .where(
                if (nn.isEmpty) org.apache.spark.sql.functions.lit(false)
                else col("key").isin(nn: _*))
              .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
            withClue(s"seed=$seed domain=$domain probe=$probe " +
              s"kept=${rep.filesKept}/${rep.filesTotal}\n") {
              got shouldBe want
            }
        }
      }
      // cross-domain refusal: a key that cannot convert losslessly
      val alien: Any = if (domain == "string") 3.5 else "alien"
      BloomIndex.prune(vdir, m, "key", Seq(alien)) shouldBe None
    }
    // the sweep must prove real skips, not only keep-everything paths
    skips should be > 0L
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
