package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Randomized differential testing for the OPERATOR layer (VERDICT r8 #5):
  * the SQL fuzzer ([[FuzzSql]]) exercises the relational A4 surface, but
  * the beyond-reference operators (as-of join, incremental aggregate
  * maintenance) rode hand-picked fixtures. This generator draws seeded
  * operator INSTANCES — direction × tolerance × event-type pairs (same
  * type on both sides = the all-exact-ties pattern) for
  * [[graft.operators.AsofJoin]], and random key/state column subsets ×
  * split points for [[graft.operators.IncrementalAgg]] — each paired with
  * an independent DuckDB oracle (native `ASOF JOIN` / full recompute), so
  * the driver's cross-engine gate checks inputs nobody hand-wrote.
  *
  * The wide in-JVM sweep is `OperatorFuzzSpec`: hundreds of samples per
  * run against brute-force Scala reference models (null keys, duplicate
  * timestamps, one-sided groups). The fixed seeds here are the committed
  * always-on subset, same split as FuzzSql's `q_fuzz_*` gate entries.
  *
  * Determinism contract: the as-of right side is collapsed to UNIQUE
  * (user_id, ts) via max(event_id) — with duplicate right timestamps the
  * "latest at-or-before" row is ill-defined in ANY engine (pandas takes
  * input order, DuckDB an arbitrary one), so the generator never emits
  * that shape; `AsofJoinSpec` pins the documented behavior instead.
  */
object OperatorFuzz {

  final case class Fuzzed(
      desc: String,
      df: (SparkSession, String) => DataFrame,
      sql: String)

  private val EventTypes = Seq("view", "click", "purchase", "signup")

  /** A seeded as-of instance over `events`: left/right event types (16
    * pairs incl. self-joins), backward/forward, tolerance ∈ {∞, 10 min,
    * 2 h}. Timestamps compared at µs (DuckDB's timestamp precision).
    */
  def sampleAsof(seed: Long): Fuzzed = {
    val rnd = new java.util.Random(seed * 7919L + 17L)
    // non-power-of-2 first bound: java.util.Random first draws are
    // top-bit correlated across sequential seeds
    val lt = EventTypes(rnd.nextInt(6) % 4)
    val rt = EventTypes(rnd.nextInt(4))
    val dir = if (rnd.nextInt(6) < 3) "backward" else "forward"
    val tol: Option[Long] = rnd.nextInt(3) match {
      case 0 => None
      case 1 => Some(600000000L)   // 10 min in µs
      case _ => Some(7200000000L)  // 2 h in µs
    }
    val desc = s"asof $dir left=$lt right=$rt tol=${tol.getOrElse(-1L)}"

    val df = (s: SparkSession, d: String) => {
      val ev = Tables.load(s, d, "events")
      val l = ev.filter(col("event_type") === lt)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"))
      val r = ev.filter(col("event_type") === rt)
        .groupBy(col("user_id"), expr("ts div 1000").as("r_ts"))
        .agg(max("event_id").as("r_id"))
      graft.operators.AsofJoin(l, r, Seq("user_id"),
        leftTs = "ts_us", rightTs = "r_ts",
        tolerance = tol, direction = dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("asof_r_id"), col("asof_r_ts"))
        .orderBy("event_id")
    }

    val (ineq, dist) =
      if (dir == "backward") ("l.ts_us >= r.r_ts", "l.ts_us - r.r_ts")
      else ("l.ts_us <= r.r_ts", "r.r_ts - l.ts_us")
    val proj = tol match {
      case Some(t) =>
        s"""CASE WHEN $dist <= $t THEN r.r_id END AS asof_r_id,
           |       CASE WHEN $dist <= $t THEN r.r_ts END AS asof_r_ts""".stripMargin
      case None => "r.r_id AS asof_r_id, r.r_ts AS asof_r_ts"
    }
    val sql =
      s"""WITH l AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
         |           FROM events WHERE event_type = '$lt'),
         |r AS (SELECT user_id, epoch_us(ts) AS r_ts, MAX(event_id) AS r_id
         |      FROM events WHERE event_type = '$rt' GROUP BY 1, 2)
         |SELECT l.user_id, l.event_id, l.ts_us,
         |       $proj
         |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND $ineq
         |ORDER BY l.event_id""".stripMargin
    Fuzzed(desc, df, sql)
  }

  private val LiKeyPool = Seq("l_returnflag", "l_linestatus", "l_linenumber")
  private val LiNumPool = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax")

  /** A seeded incremental-aggregate instance over `lineitem`: random key
    * subset, random sum/min/max column draws, random split point; the
    * snapshot is advanced through the operator while the oracle recomputes
    * the aggregate over the FULL table from scratch — split-invariance as
    * a cross-engine property. Sums ride the decimal-partial convention
    * (cast to double only at publish).
    */
  def sampleIncAgg(seed: Long): Fuzzed = {
    val rnd = new java.util.Random(seed * 6271L + 5L)
    val keys = {
      val n = 1 + (rnd.nextInt(6) % 2)
      Seq.fill(n)(LiKeyPool(rnd.nextInt(3))).distinct.sorted
    }
    val sums = LiNumPool.filter(_ => rnd.nextInt(2) == 1) match {
      case Nil => Seq("l_quantity")
      case xs  => xs
    }
    val mins = LiNumPool.filter(_ => rnd.nextInt(3) == 0)
    val maxs = LiNumPool.filter(_ => rnd.nextInt(3) == 0)
    val splitMod = 2 + rnd.nextInt(9) // delta = keys with l_orderkey % m == 0
    val desc = s"incagg keys=${keys.mkString("+")} sums=${sums.size} " +
      s"mins=${mins.size} maxs=${maxs.size} mod=$splitMod"

    val df = (s: SparkSession, d: String) => {
      val ia = graft.operators.IncrementalAgg
      val aspec = ia.Spec(keys = keys, sumCols = sums,
        minCols = mins, maxCols = maxs)
      val li = Tables.load(s, d, "lineitem")
        .select((keys ++ LiNumPool :+ "l_orderkey").distinct.map(col): _*)
      val old = li.filter(col("l_orderkey") % splitMod =!= 0)
      val delta = li.filter(col("l_orderkey") % splitMod === 0)
      val out = ia.advance(ia.aggregate(old, aspec), delta, aspec)
      val pub = col("cnt") +:
        (sums.map(c => col(s"s_$c").cast("double").as(s"sum_$c")) ++
          mins.map(c => col(s"mn_$c").as(s"min_$c")) ++
          maxs.map(c => col(s"mx_$c").as(s"max_$c")))
      out.select(keys.map(col) ++ pub: _*).orderBy(keys.map(col): _*)
    }

    val aggSql =
      "CAST(COUNT(*) AS BIGINT) AS cnt" +:
        (sums.map(c =>
          s"CAST(SUM(CAST($c AS DECIMAL(28,4))) AS DOUBLE) AS sum_$c") ++
          mins.map(c => s"MIN($c) AS min_$c") ++
          maxs.map(c => s"MAX($c) AS max_$c"))
    val sql =
      s"""SELECT ${keys.mkString(", ")},
         |  ${aggSql.mkString(",\n  ")}
         |FROM lineitem
         |GROUP BY ${keys.mkString(", ")}
         |ORDER BY ${keys.mkString(", ")}""".stripMargin
    Fuzzed(desc, df, sql)
  }

  /** A seeded CDC-apply instance over `customer` (VERDICT r9 #2 — the
    * streaming/CDC apply layer was the last oracled-but-never-fuzzed
    * surface): two randomized change batches — overlapping upsert key
    * ranges, periodic deletes, within-batch upsert-vs-delete conflicts
    * resolved by a drawn seq order, after-images with a periodically
    * OMITTED column (the coalesce-resolve path), deletes of keys that
    * were never present (before-image mismatch → no-op) — applied in
    * arrival order through TWO chained [[graft.cdc.CdcApply.applyBatch]]
    * calls (the exact MERGE the CdcStream foreachBatch runs per
    * micro-batch). The oracle replays both batches relationally:
    * last-event-per-key via ROW_NUMBER, upserts as FULL JOIN + per-column
    * COALESCE, deletes as NOT IN — semantics per reference
    * CDCMessageProcessor.scala:32-75 / CDCUtil.updateCreateSQL:63-88
    * (before-image keying, arrival order, last writer wins).
    *
    * Determinism: every op's seq is `2k + flip-bit`, so an upsert and a
    * delete on the same key in the same batch always have DISTINCT seqs
    * (no row_number tie), and values roundtrip exactly (Double.toString
    * is shortest-exact; both engines compute `c_acctbal + delta` from the
    * same parquet double).
    */
  def sampleCdc(seed: Long): Fuzzed = {
    val rnd = new java.util.Random(seed * 9949L + 23L)
    val T = Seq(600, 800, 1000)(rnd.nextInt(6) % 3)
    val d1 = Seq(25.0, 50.0, 75.0)(rnd.nextInt(3))
    val d2 = Seq(-10.0, 30.0, 60.0)(rnd.nextInt(3))
    val p1 = Seq(83, 97, 101)(rnd.nextInt(3))
    val p2 = Seq(61, 71, 89)(rnd.nextInt(3))
    val a1 = T - 50 - 50 * rnd.nextInt(3)   // batch-1 upsert keys in (a1, h1]
    val h1 = T + 50 + 75 * rnd.nextInt(3)
    val a2 = T - 100 - 50 * rnd.nextInt(3)  // batch-2 upsert keys in (a2, h2]
    val h2 = T + 100 * rnd.nextInt(3)       // may be <= a2 → empty upsert set
    val flip1 = rnd.nextInt(2) // 1 → the delete outranks the upsert on conflicts
    val flip2 = rnd.nextInt(2)
    val desc = s"cdc T=$T d=($d1,$d2) p=($p1,$p2) " +
      s"b1=($a1,$h1] b2=($a2,$h2] flip=($flip1,$flip2)"

    val df = (s: SparkSession, d: String) => {
      import s.implicits._
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val typed = cust.as[(Long, String, Double)]
      val target = cust.filter(col("c_custkey") <= T)
      def upserts(lo: Int, hi: Int, delta: Double, nullMod: Int, flip: Int) =
        typed.filter(t => t._1 > lo && t._1 <= hi).map { case (k, n, b) =>
          val after = Map("c_custkey" -> k.toString,
            "c_acctbal" -> (b + delta).toString) ++
            (if (k % nullMod == 0) Map.empty[String, String]
             else Map("c_name" -> n))
          graft.cdc.CDCMessage("tpch", "public", "customer",
            isInsert = k > T, isUpdate = k <= T, isDelete = false,
            before = Map.empty, after = after, seq = 2 * k + (1 - flip))
        }
      def deletes(pred: Long => Boolean, flip: Int) =
        typed.filter(t => pred(t._1)).map { case (k, _, _) =>
          graft.cdc.CDCMessage("tpch", "public", "customer",
            isInsert = false, isUpdate = false, isDelete = true,
            before = Map("c_custkey" -> k.toString), after = Map.empty,
            seq = 2 * k + flip)
        }
      val b1 = upserts(a1, h1, d1, 11, flip1).unionByName(
        deletes(k => (k <= T && k % p1 == 0) ||
          (k > a1 && k <= h1 && k % 7 == 0), flip1))
      val b2 = upserts(a2, h2, d2, 13, flip2).unionByName(
        deletes(k => (k <= h1 && k % p2 == 0) ||
          (k > a2 && k <= h2 && k % 5 == 0), flip2))
      val s1 = graft.cdc.CdcApply.applyBatch(target, b1, Seq("c_custkey"))
      graft.cdc.CdcApply.applyBatch(s1, b2, Seq("c_custkey"))
        .orderBy("c_custkey")
    }

    def batchSql(n: Int, lo: Int, hi: Int, delta: Double, nullMod: Int,
        delPred: String, flip: Int): String =
      s"""b$n AS (
         |  SELECT c_custkey AS k, FALSE AS isdel,
         |         CASE WHEN c_custkey % $nullMod = 0 THEN NULL
         |              ELSE c_name END AS n,
         |         c_acctbal + $delta AS b,
         |         2*c_custkey + ${1 - flip} AS seq
         |  FROM customer WHERE c_custkey > $lo AND c_custkey <= $hi
         |  UNION ALL
         |  SELECT c_custkey, TRUE, NULL, NULL, 2*c_custkey + $flip
         |  FROM customer WHERE $delPred),
         |b${n}w AS (
         |  SELECT k, isdel, n, b FROM (
         |    SELECT b$n.*, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |    FROM b$n) z WHERE rn = 1),
         |s$n AS (
         |  SELECT COALESCE(u.k, t.k) AS k, COALESCE(u.n, t.n) AS n,
         |         COALESCE(u.b, t.b) AS b
         |  FROM s${n - 1} t
         |  FULL JOIN (SELECT * FROM b${n}w WHERE NOT isdel) u ON t.k = u.k
         |  WHERE COALESCE(u.k, t.k) NOT IN (SELECT k FROM b${n}w WHERE isdel))""".stripMargin
    val sql =
      s"""WITH s0 AS (SELECT c_custkey AS k, c_name AS n, c_acctbal AS b
         |            FROM customer WHERE c_custkey <= $T),
         |${batchSql(1, a1, h1, d1, 11,
             s"(c_custkey <= $T AND c_custkey % $p1 = 0) OR " +
               s"(c_custkey > $a1 AND c_custkey <= $h1 AND c_custkey % 7 = 0)",
             flip1)},
         |${batchSql(2, a2, h2, d2, 13,
             s"(c_custkey <= $h1 AND c_custkey % $p2 = 0) OR " +
               s"(c_custkey > $a2 AND c_custkey <= $h2 AND c_custkey % 5 = 0)",
             flip2)}
         |SELECT k AS c_custkey, n AS c_name, b AS c_acctbal
         |FROM s2 ORDER BY c_custkey""".stripMargin
    Fuzzed(desc, df, sql)
  }

  /** Fixed-seed gate entries (the committed always-on subset): 9101 =
    * forward with a 10-min tolerance; 9105 = backward view-to-view
    * SELF-join, unbounded — every left row has an exact-tie match (the
    * inclusive-boundary pattern); 9200 = two-key incremental aggregate
    * with min and max states; 9300 = two chained CDC batches with a
    * delete-outranks-upsert conflict draw; 9301 = the same apply layer
    * driven through the REAL CdcStream file-envelope stream against a
    * PARTITIONED target ([[CdcStreamFuzz]]).
    */
  val gateSeedsAsof: Seq[Long] = Seq(9101L, 9105L)
  val gateSeedsIncAgg: Seq[Long] = Seq(9200L)
  val gateSeedsCdc: Seq[Long] = Seq(9300L)
  val gateSeedsCdcStream: Seq[Long] = Seq(9301L)

  val defs: Seq[QueryDef] = {
    val families: Seq[(Seq[Long], Long => Fuzzed)] = Seq(
      (gateSeedsAsof, sampleAsof),
      (gateSeedsIncAgg, sampleIncAgg),
      (gateSeedsCdc, sampleCdc),
      (gateSeedsCdcStream, CdcStreamFuzz.sampleCdcStream))
    families.foldLeft((Seq.empty[QueryDef], 1)) { case ((acc, i0), (seeds, gen)) =>
      val qs = seeds.zipWithIndex.map { case (s, i) =>
        val smp = gen(s)
        QueryDef(f"q_opfuzz_${i0 + i}%02d", (spark, dir) => smp.df(spark, dir),
          Some(smp.sql))
      }
      (acc ++ qs, i0 + seeds.size)
    }._1
  }
}
