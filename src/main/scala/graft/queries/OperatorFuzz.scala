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

  /** Fixed-seed gate entries (the committed always-on subset): 9101 =
    * forward with a 10-min tolerance; 9105 = backward view-to-view
    * SELF-join, unbounded — every left row has an exact-tie match (the
    * inclusive-boundary pattern); 9200 = two-key incremental aggregate
    * with min and max states.
    */
  val gateSeedsAsof: Seq[Long] = Seq(9101L, 9105L)
  val gateSeedsIncAgg: Seq[Long] = Seq(9200L)

  val defs: Seq[QueryDef] =
    gateSeedsAsof.zipWithIndex.map { case (s, i) =>
      val smp = sampleAsof(s)
      QueryDef(f"q_opfuzz_${1 + i}%02d", (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    } ++ gateSeedsIncAgg.zipWithIndex.map { case (s, i) =>
      val smp = sampleIncAgg(s)
      QueryDef(f"q_opfuzz_${1 + gateSeedsAsof.size + i}%02d",
        (spark, dir) => smp.df(spark, dir), Some(smp.sql))
    }
}
