package graft.queries

import scala.util.Random

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Randomized differential SQL testing (VERDICT r7 #3): a seeded generator
  * of small relational query plans — project / filter / FK join / aggregate
  * / window / top-k over the TPC-H-shaped tables — where every sample is
  * rendered TWICE from one AST:
  *
  *   - as a Spark DataFrame-API plan ([[Sample.df]]), and
  *   - as ANSI SQL in the dialect subset Spark and DuckDB share
  *     ([[Sample.sql]]).
  *
  * `DifferentialSqlSpec` asserts DataFrame-vs-`spark.sql` result equality
  * on hundreds of samples per run (two independent frontends into
  * Catalyst), and a fixed-seed subset is registered as `q_fuzz_*` entries
  * in [[graft.SparkEntry]] so the driver's DuckDB gate cross-checks the
  * SAME SQL text against an independent engine — testing the full A4
  * surface (SURVEY §2.5) on inputs nobody hand-wrote, not just curated
  * points.
  *
  * Dialect discipline (the house oracle conventions, QueryDef.scala):
  * doubles are summed through DECIMAL(28,4) on both sides; int sums are
  * CAST(... AS BIGINT) on the DuckDB side (its SUM(int) widens to
  * HUGEINT); double columns appear in comparisons and min/max (exact
  * parquet values) but never in raw sums; equality never tests doubles;
  * every ordered shape carries a unique tie-break. Timestamp columns are
  * excluded (generator v1).
  */
object FuzzSql {

  sealed trait Kind
  case object IntK extends Kind
  case object DblK extends Kind
  case object StrK extends Kind

  final case class Col(name: String, kind: Kind)

  /** `lits`: literal pool per column, rendered identically in both
    * dialects; chosen to be non-degenerate at every generated SF (keys are
    * 0-based and scale with SF, so thresholds sit low).
    */
  final case class Table(
      name: String,
      cols: Seq[Col],
      uk: Seq[String],
      fk: Option[(String, String, String)]) // (localCol, parentTable, parentCol)

  val lineitem: Table = Table("lineitem",
    Seq(Col("l_orderkey", IntK), Col("l_partkey", IntK), Col("l_suppkey", IntK),
      Col("l_linenumber", IntK), Col("l_quantity", DblK),
      Col("l_extendedprice", DblK), Col("l_discount", DblK), Col("l_tax", DblK),
      Col("l_returnflag", StrK), Col("l_linestatus", StrK)),
    uk = Seq("l_orderkey", "l_linenumber"),
    fk = Some(("l_orderkey", "orders", "o_orderkey")))

  val orders: Table = Table("orders",
    Seq(Col("o_orderkey", IntK), Col("o_custkey", IntK),
      Col("o_orderstatus", StrK), Col("o_totalprice", DblK),
      Col("o_orderpriority", StrK)),
    uk = Seq("o_orderkey"),
    fk = Some(("o_custkey", "customer", "c_custkey")))

  val customer: Table = Table("customer",
    Seq(Col("c_custkey", IntK), Col("c_name", StrK), Col("c_nationkey", IntK),
      Col("c_acctbal", DblK), Col("c_mktsegment", StrK)),
    uk = Seq("c_custkey"),
    fk = Some(("c_nationkey", "nation", "n_nationkey")))

  val nation: Table = Table("nation",
    Seq(Col("n_nationkey", IntK), Col("n_name", StrK), Col("n_regionkey", IntK)),
    uk = Seq("n_nationkey"),
    fk = Some(("n_regionkey", "region", "r_regionkey")))

  val region: Table = Table("region",
    Seq(Col("r_regionkey", IntK), Col("r_name", StrK)),
    uk = Seq("r_regionkey"), fk = None)

  // v4 star-join dims (not in the frozen v1-v3 chains; lineitem branches to
  // them on l_partkey / l_suppkey)
  val part: Table = Table("part",
    Seq(Col("p_partkey", IntK), Col("p_brand", StrK), Col("p_type", StrK),
      Col("p_size", IntK), Col("p_retailprice", DblK)),
    uk = Seq("p_partkey"), fk = None)
  val supplier: Table = Table("supplier",
    Seq(Col("s_suppkey", IntK), Col("s_nationkey", IntK),
      Col("s_acctbal", DblK)),
    uk = Seq("s_suppkey"), fk = None)

  private val byName: Map[String, Table] =
    Seq(lineitem, orders, customer, nation, region).map(t => t.name -> t).toMap

  /** Literal pools. Ints as Long, doubles as Double, strings raw. */
  private val intLits: Map[String, Seq[Long]] = Map(
    "l_orderkey" -> Seq(120, 400, 900), "l_partkey" -> Seq(30, 90, 160),
    "l_suppkey" -> Seq(2, 5, 8), "l_linenumber" -> Seq(1, 2, 4),
    "o_orderkey" -> Seq(120, 400, 900), "o_custkey" -> Seq(20, 60, 110),
    "c_custkey" -> Seq(20, 60, 110), "c_nationkey" -> Seq(5, 12, 19),
    "n_nationkey" -> Seq(5, 12, 19), "n_regionkey" -> Seq(0, 1, 3),
    "r_regionkey" -> Seq(0, 1, 3),
    "p_size" -> Seq(5, 15, 30, 45), "s_nationkey" -> Seq(5, 12, 19))
  private val dblLits: Map[String, Seq[Double]] = Map(
    "l_quantity" -> Seq(10.0, 25.0, 40.0),
    "l_extendedprice" -> Seq(10000.0, 30000.0, 60000.0),
    "l_discount" -> Seq(0.02, 0.05, 0.08), "l_tax" -> Seq(0.03, 0.06),
    "o_totalprice" -> Seq(50000.0, 150000.0, 300000.0),
    "c_acctbal" -> Seq(0.0, 2500.0, 7500.0),
    "p_retailprice" -> Seq(920.0, 950.0, 980.0),
    "s_acctbal" -> Seq(0.0, 2500.0, 7500.0))
  private val strLits: Map[String, Seq[String]] = Map(
    "l_returnflag" -> Seq("A", "N", "R"), "l_linestatus" -> Seq("O", "F"),
    "o_orderstatus" -> Seq("O", "F", "P"),
    "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"),
    "c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY"),
    "n_name" -> Seq("FRANCE", "GERMANY", "CHINA", "KENYA", "PERU", "JAPAN"),
    "r_name" -> Seq("ASIA", "EUROPE", "AFRICA", "AMERICA"),
    "p_brand" -> Seq("Brand#2", "Brand#5", "Brand#11", "Brand#20"),
    "p_type" -> Seq("ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO"))

  // ---- AST ------------------------------------------------------------

  sealed trait Pred { def sql: String; def expr: Column }
  final case class NumCmp(c: String, op: String, lit: String, isInt: Boolean)
      extends Pred {
    def sql = s"$c $op $lit"
    // int columns compare against LONG literals (same-type comparison stays
    // pushdown-eligible); doubles against double literals; `=` is int-only
    private def l: Any = if (isInt) lit.toLong else lit.toDouble
    def expr: Column = op match {
      case "<" => col(c) < l
      case "<=" => col(c) <= l
      case ">" => col(c) > l
      case ">=" => col(c) >= l
      case "=" => col(c) === lit.toLong // int equality only
    }
  }
  final case class StrCmp(c: String, neg: Boolean, lit: String) extends Pred {
    def sql = s"$c ${if (neg) "<>" else "="} '$lit'"
    def expr: Column = if (neg) col(c) =!= lit else col(c) === lit
  }
  final case class StrIn(c: String, lits: Seq[String]) extends Pred {
    def sql = s"$c IN (${lits.map(l => s"'$l'").mkString(", ")})"
    def expr: Column = col(c).isin(lits: _*)
  }
  // ---- v3 predicates --------------------------------------------------
  final case class OrPred(a: Pred, b: Pred) extends Pred {
    def sql = s"(${a.sql} OR ${b.sql})"
    def expr: Column = a.expr || b.expr
  }
  final case class BetweenP(c: String, lo: String, hi: String, isInt: Boolean)
      extends Pred {
    def sql = s"$c BETWEEN $lo AND $hi"
    def expr: Column =
      if (isInt) col(c).between(lo.toLong, hi.toLong)
      else col(c).between(lo.toDouble, hi.toDouble)
  }

  sealed trait AggFn { def sql: String; def expr: Column; def alias: String }
  case object Cnt extends AggFn {
    def sql = "COUNT(*)"; def expr: Column = count(lit(1)); def alias = "cnt"
  }
  final case class SumInt(c: String) extends AggFn {
    // DuckDB SUM(int) widens to HUGEINT → pin both sides to BIGINT
    def sql = s"CAST(SUM($c) AS BIGINT)"
    def expr: Column = sum(col(c)).cast("long")
    def alias = s"s_$c"
  }
  final case class DSum(c: String) extends AggFn {
    def sql = QueryDef.dsumSql(c)
    def expr: Column = QueryDef.dsum(col(c))
    def alias = s"ds_$c"
  }
  final case class MinC(c: String) extends AggFn {
    def sql = s"MIN($c)"; def expr: Column = min(col(c)); def alias = s"mn_$c"
  }
  final case class MaxC(c: String) extends AggFn {
    def sql = s"MAX($c)"; def expr: Column = max(col(c)); def alias = s"mx_$c"
  }

  /** v3: exact distinct count — identical semantics in both engines. */
  final case class CntDistinct(c: String) extends AggFn {
    def sql = s"CAST(COUNT(DISTINCT $c) AS BIGINT)"
    def expr: Column = countDistinct(col(c)).cast("long")
    def alias = s"cd_$c"
  }

  /** v3: scalar string functions as derived projection columns, rendered
    * identically in both dialects (1-based SUBSTRING, BIGINT length).
    */
  final case class StrFn(c: String, fn: Int) {
    def alias = s"f${fn}_$c"
    def sql: String = fn match {
      case 0 => s"UPPER($c)"
      case 1 => s"LOWER($c)"
      case 2 => s"CAST(LENGTH($c) AS BIGINT)"
      case _ => s"SUBSTRING($c, 1, 3)"
    }
    def expr: Column = fn match {
      case 0 => upper(col(c))
      case 1 => lower(col(c))
      case 2 => length(col(c)).cast("long")
      case _ => substring(col(c), 1, 3)
    }
  }

  /** v2: decimal-exact sum of an arithmetic expression over two double
    * columns — the `sum(price * (1 - discount))` family.
    */
  final case class ExprSum(a: String, b: String, form: Int) extends AggFn {
    private def sqlExpr = form match {
      case 0 => s"$a * (1.0 - $b)"
      case 1 => s"$a + $b"
      case _ => s"$a * $b"
    }
    private def dfExpr: Column = form match {
      case 0 => col(a) * (lit(1.0) - col(b))
      case 1 => col(a) + col(b)
      case _ => col(a) * col(b)
    }
    def sql: String = QueryDef.dsumSql(sqlExpr)
    def expr: Column = QueryDef.dsum(dfExpr)
    def alias = s"es${form}_${a}_$b"
  }

  /** v2: CASE WHEN c < lit THEN 'lo' ELSE 'hi' END — rendered identically
    * in both dialects; used as a derived projection column and as a
    * grouping expression (by ordinal, supported by Spark and DuckDB).
    */
  final case class Band(c: String, lit: String) {
    def sql = s"CASE WHEN $c < $lit THEN 'lo' ELSE 'hi' END"
    def expr: Column = when(col(c) < lit.toDouble, "lo").otherwise("hi")
  }

  sealed trait Shape
  final case class AggShape(groups: Seq[String], aggs: Seq[AggFn]) extends Shape
  final case class ProjectShape(cols: Seq[String], distinct: Boolean) extends Shape
  final case class WindowShape(part: String, ord: String, fn: String) extends Shape
  final case class TopKShape(ord: String, desc: Boolean, k: Int) extends Shape
  // ---- v2 shapes (new differential surface; v1 shapes stay frozen) ----
  final case class AggShape2(groups: Seq[String], band: Option[Band],
      aggs: Seq[AggFn], havingCntGt: Option[Long]) extends Shape
  final case class BandProject(cols: Seq[String], band: Band,
      distinct: Boolean) extends Shape
  /** predsB filters the second branch; `Sample.preds` filters the first. */
  final case class SetOpShape(cols: Seq[String], predsB: Seq[Pred],
      op: String) extends Shape
  // ---- v3 shapes ------------------------------------------------------
  /** Projection through scalar string functions (uk kept for total order). */
  final case class StrFnProject(cols: Seq[String], fns: Seq[StrFn]) extends Shape
  /** Windowed aggregate: per-partition total annotated onto each row.
    * `dec` = decimal-exact double sum (the dsum convention through a
    * window frame); otherwise BIGINT int sum.
    */
  final case class WinAggShape(part: String, valCol: String, dec: Boolean)
      extends Shape

  /** Common surface of every generated sample (chain v1-v3, star v4):
    * one AST, two renderings.
    */
  sealed trait Fuzzed {
    def seed: Long
    def sql: String
    def df(spark: SparkSession, dir: String): DataFrame
    /** one-line sweep log for FuzzDump */
    def describe: String
  }

  final case class Sample(
      seed: Long, base: Table, joined: Seq[Table], leftJoin: Boolean,
      preds: Seq[Pred], shape: Shape) extends Fuzzed {

    def describe: String =
      s"shape=${shape.getClass.getSimpleName} base=${base.name} " +
        s"joins=${joined.size} left=$leftJoin " +
        s"preds=${preds.map(_.getClass.getSimpleName).mkString("+")} " +
        s"detail=${shape.toString.take(120)}"

    /** FROM/JOIN/WHERE shared by both renderings. */
    private def joinChainSql: String = {
      var cur = base
      val sb = new StringBuilder(base.name)
      joined.foreach { p =>
        val (fkc, _, pkc) = cur.fk.get
        sb ++= s" ${if (leftJoin) "LEFT JOIN" else "JOIN"} ${p.name} ON $fkc = $pkc"
        cur = p
      }
      sb.toString
    }

    private def whereSql: String =
      if (preds.isEmpty) "" else "\nWHERE " + preds.map(_.sql).mkString(" AND ")

    def sql: String = shape match {
      case AggShape(groups, aggs) =>
        val sel = (groups ++ aggs.map(a => s"${a.sql} AS ${a.alias}")).mkString(", ")
        val grp = if (groups.isEmpty) "" else s"\nGROUP BY ${groups.mkString(", ")}"
        val ord = if (groups.isEmpty) "" else s"\nORDER BY ${groups.mkString(", ")}"
        s"SELECT $sel\nFROM $joinChainSql$whereSql$grp$ord"
      case ProjectShape(cols, distinct) =>
        val d = if (distinct) "DISTINCT " else ""
        // non-distinct projections carry the base unique key (always part of
        // `cols` by construction) so the ORDER BY is total
        s"SELECT $d${cols.mkString(", ")}\nFROM $joinChainSql$whereSql" +
          s"\nORDER BY ${cols.mkString(", ")}"
      case WindowShape(part, ord, fn) =>
        val tie = base.uk.mkString(", ")
        val out = (base.uk :+ part).distinct.mkString(", ")
        s"SELECT $out, ${fn.toUpperCase}() OVER (PARTITION BY $part ORDER BY $ord, $tie) AS rnk" +
          s"\nFROM $joinChainSql$whereSql\nORDER BY ${base.uk.mkString(", ")}"
      case TopKShape(ord, desc, k) =>
        val dir = if (desc) "DESC" else "ASC"
        val out = (base.uk :+ ord).distinct.mkString(", ")
        s"SELECT $out\nFROM $joinChainSql$whereSql" +
          s"\nORDER BY $ord $dir, ${base.uk.mkString(", ")}\nLIMIT $k"
      case AggShape2(groups, band, aggs, having) =>
        val keyExprs = groups ++ band.map(b => s"${b.sql} AS band")
        val sel = (keyExprs ++ aggs.map(a => s"${a.sql} AS ${a.alias}")).mkString(", ")
        val ords = (1 to keyExprs.size).map(_.toString)
        val grp = if (keyExprs.isEmpty) "" else s"\nGROUP BY ${ords.mkString(", ")}"
        val hav = having.map(n => s"\nHAVING COUNT(*) > $n").getOrElse("")
        val ord = if (keyExprs.isEmpty) "" else s"\nORDER BY ${ords.mkString(", ")}"
        s"SELECT $sel\nFROM $joinChainSql$whereSql$grp$hav$ord"
      case BandProject(cols, band, distinct) =>
        val d = if (distinct) "DISTINCT " else ""
        val sel = (cols :+ s"${band.sql} AS band").mkString(", ")
        s"SELECT $d$sel\nFROM $joinChainSql$whereSql" +
          s"\nORDER BY ${(cols :+ "band").mkString(", ")}"
      case SetOpShape(cols, predsB, op) =>
        val whereB =
          if (predsB.isEmpty) "" else "\nWHERE " + predsB.map(_.sql).mkString(" AND ")
        s"SELECT ${cols.mkString(", ")}\nFROM $joinChainSql$whereSql" +
          s"\n$op\nSELECT ${cols.mkString(", ")}\nFROM $joinChainSql$whereB" +
          s"\nORDER BY ${cols.mkString(", ")}"
      case StrFnProject(cols, fns) =>
        val out = (base.uk ++ cols).distinct
        val sel = (out ++ fns.map(f => s"${f.sql} AS ${f.alias}")).mkString(", ")
        s"SELECT $sel\nFROM $joinChainSql$whereSql\nORDER BY ${out.mkString(", ")}"
      case WinAggShape(part, v, dec) =>
        val out = (base.uk :+ part).distinct
        val win =
          if (dec)
            s"CAST(SUM(CAST($v AS DECIMAL(28,4))) OVER (PARTITION BY $part) AS DOUBLE)"
          else s"CAST(SUM($v) OVER (PARTITION BY $part) AS BIGINT)"
        s"SELECT ${out.mkString(", ")}, $win AS wsum" +
          s"\nFROM $joinChainSql$whereSql\nORDER BY ${out.mkString(", ")}"
    }

    def df(spark: SparkSession, dir: String): DataFrame = {
      var rel = Tables.load(spark, dir, base.name)
      var cur = base
      joined.foreach { p =>
        val (fkc, _, pkc) = cur.fk.get
        val parent = Tables.load(spark, dir, p.name)
        rel = rel.join(parent, col(fkc) === col(pkc),
          if (leftJoin) "left" else "inner")
        cur = p
      }
      val unfiltered = rel
      preds.foreach(p => rel = rel.filter(p.expr))
      shape match {
        case AggShape(groups, aggs) =>
          val aggCols = aggs.map(a => a.expr.as(a.alias))
          val out =
            if (groups.isEmpty) rel.agg(aggCols.head, aggCols.tail: _*)
            else rel.groupBy(groups.map(col): _*)
              .agg(aggCols.head, aggCols.tail: _*)
              .orderBy(groups.map(col): _*)
          out
        case ProjectShape(cols, distinct) =>
          val p = rel.select(cols.map(col): _*)
          val d = if (distinct) p.distinct() else p
          d.orderBy(cols.map(col): _*)
        case WindowShape(part, ord, fn) =>
          val w = Window.partitionBy(col(part))
            .orderBy((col(ord) +: base.uk.map(col)): _*)
          val f = fn match {
            case "rank" => rank()
            case "dense_rank" => dense_rank()
            case "row_number" => row_number()
          }
          rel.select(((base.uk :+ part).distinct.map(col) :+
            f.over(w).as("rnk")): _*)
            .orderBy(base.uk.map(col): _*)
        case TopKShape(ord, desc, k) =>
          val o = if (desc) col(ord).desc else col(ord).asc
          rel.orderBy((o +: base.uk.map(col)): _*)
            .select((base.uk :+ ord).distinct.map(col): _*)
            .limit(k)
        case AggShape2(groups, band, aggs, having) =>
          val keyCols = groups.map(col) ++ band.map(_.expr.as("band"))
          val aggCols = aggs.map(a => a.expr.as(a.alias))
          val grouped =
            if (keyCols.isEmpty) rel.agg(aggCols.head, aggCols.tail: _*)
            else rel.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
          // HAVING COUNT(*) filters on the always-present `cnt` alias
          val afterHaving = having.fold(grouped)(n => grouped.filter(col("cnt") > n))
          val ordCols = groups.map(col) ++ band.map(_ => col("band"))
          if (ordCols.isEmpty) afterHaving else afterHaving.orderBy(ordCols: _*)
        case BandProject(cols, band, distinct) =>
          val p = rel.select(cols.map(col) :+ band.expr.as("band"): _*)
          val d = if (distinct) p.distinct() else p
          d.orderBy((cols :+ "band").map(col): _*)
        case SetOpShape(cols, predsB, op) =>
          val a = rel.select(cols.map(col): _*)
          var relB = unfiltered
          predsB.foreach(p => relB = relB.filter(p.expr))
          val b = relB.select(cols.map(col): _*)
          val combined = op match {
            case "UNION ALL" => a.union(b)
            case "INTERSECT" => a.intersect(b)
            case _ => a.except(b)
          }
          combined.orderBy(cols.map(col): _*)
        case StrFnProject(cols, fns) =>
          val out = (base.uk ++ cols).distinct
          rel.select(out.map(col) ++ fns.map(f => f.expr.as(f.alias)): _*)
            .orderBy(out.map(col): _*)
        case WinAggShape(part, v, dec) =>
          val out = (base.uk :+ part).distinct
          val w = Window.partitionBy(col(part))
          val win =
            if (dec)
              sum(col(v).cast(org.apache.spark.sql.types.DecimalType(28, 4)))
                .over(w).cast("double")
            else sum(col(v)).over(w).cast("long")
          rel.select(out.map(col) :+ win.as("wsum"): _*)
            .orderBy(out.map(col): _*)
      }
    }
  }

  // ---- v4: star joins + subquery predicates ---------------------------

  /** Correlated membership predicate: EXISTS / NOT EXISTS rendered with a
    * correlated equality, IN / NOT IN rendered uncorrelated — all four
    * become one semi or anti join in the DataFrame rendering (the exact
    * decomposition Catalyst's RewritePredicateSubquery derives from the
    * SQL text, so the differential covers that rewrite end to end).
    * `child` is never in the outer FROM, so no aliasing is needed and
    * NOT IN is null-safe (join keys are non-null FK columns).
    */
  final case class SubPred(neg: Boolean, asIn: Boolean, key: String,
      child: Table, childKey: String, childPreds: Seq[Pred]) {
    def sql: String = {
      val whereC = childPreds.map(_.sql)
      if (asIn) {
        val w = if (whereC.isEmpty) "" else s" WHERE ${whereC.mkString(" AND ")}"
        s"$key ${if (neg) "NOT IN" else "IN"} (SELECT $childKey FROM ${child.name}$w)"
      } else {
        val conds = s"$childKey = $key" +: whereC
        s"${if (neg) "NOT EXISTS" else "EXISTS"} (SELECT 1 FROM ${child.name} " +
          s"WHERE ${conds.mkString(" AND ")})"
      }
    }
    def apply(rel: DataFrame, spark: SparkSession, dir: String): DataFrame = {
      var c = Tables.load(spark, dir, child.name)
      childPreds.foreach(p => c = c.filter(p.expr))
      rel.join(c.select(childKey), col(key) === col(childKey),
        if (neg) "left_anti" else "left_semi")
    }
  }

  /** Uncorrelated scalar-subquery threshold: `c op (SELECT MIN/MAX(srcCol)
    * FROM src WHERE ...)`. MIN/MAX of exact parquet doubles — no float
    * summation, so the scalar is bit-identical in both engines. The
    * DataFrame rendering is the scale-correct decomposition: a 1-row
    * broadcast cross join, never a driver-side collect.
    */
  final case class ScalarPred(c: String, op: String, isMax: Boolean,
      src: Table, srcCol: String, srcPreds: Seq[Pred]) {
    def sql: String = {
      val fn = if (isMax) "MAX" else "MIN"
      val w = if (srcPreds.isEmpty) ""
        else s" WHERE ${srcPreds.map(_.sql).mkString(" AND ")}"
      s"$c $op (SELECT $fn($srcCol) FROM ${src.name}$w)"
    }
    def apply(rel: DataFrame, spark: SparkSession, dir: String): DataFrame = {
      var s = Tables.load(spark, dir, src.name)
      srcPreds.foreach(p => s = s.filter(p.expr))
      val scalar = s.agg(
        (if (isMax) max(col(srcCol)) else min(col(srcCol))).as("__scal"))
      val cmp = op match {
        case "<" => col(c) < col("__scal")
        case "<=" => col(c) <= col("__scal")
        case ">" => col(c) > col("__scal")
        case _ => col(c) >= col("__scal")
      }
      rel.crossJoin(broadcast(scalar)).filter(cmp).drop("__scal")
    }
  }

  /** v4 sample: a branching star join (fact + up to three dims on
    * DIFFERENT keys — the v1-v3 chains only ever walk one FK path) with
    * optional membership and scalar-subquery predicates. Shapes are the
    * frozen AggShape / ProjectShape — the new surface is the WHERE clause
    * and the join topology, not the SELECT.
    */
  final case class StarSample(seed: Long, base: Table,
      branches: Seq[(String, Table, String)], preds: Seq[Pred],
      sub: Option[SubPred], scal: Option[ScalarPred],
      shape: Shape) extends Fuzzed {

    def describe: String =
      s"shape=${shape.getClass.getSimpleName} base=${base.name} " +
        s"star=${branches.map(_._2.name).mkString("+")} " +
        s"sub=${sub.map(s => (if (s.neg) "NOT-" else "") +
          (if (s.asIn) "IN" else "EXISTS")).getOrElse("-")} " +
        s"scal=${scal.map(_.op).getOrElse("-")} " +
        s"preds=${preds.map(_.getClass.getSimpleName).mkString("+")}"

    def sql: String = {
      val from = new StringBuilder(base.name)
      branches.foreach { case (lc, p, pc) =>
        from ++= s" JOIN ${p.name} ON $lc = $pc"
      }
      val conds = preds.map(_.sql) ++ sub.map(_.sql) ++ scal.map(_.sql)
      val where = if (conds.isEmpty) "" else s"\nWHERE ${conds.mkString(" AND ")}"
      shape match {
        case AggShape(groups, aggs) =>
          val sel = (groups ++ aggs.map(a => s"${a.sql} AS ${a.alias}")).mkString(", ")
          val grp = if (groups.isEmpty) "" else s"\nGROUP BY ${groups.mkString(", ")}"
          val ord = if (groups.isEmpty) "" else s"\nORDER BY ${groups.mkString(", ")}"
          s"SELECT $sel\nFROM $from$where$grp$ord"
        case ProjectShape(cols, distinct) =>
          val d = if (distinct) "DISTINCT " else ""
          s"SELECT $d${cols.mkString(", ")}\nFROM $from$where" +
            s"\nORDER BY ${cols.mkString(", ")}"
        case other =>
          sys.error(s"v4 generates only Agg/Project shapes, got $other")
      }
    }

    def df(spark: SparkSession, dir: String): DataFrame = {
      var rel = Tables.load(spark, dir, base.name)
      branches.foreach { case (lc, p, pc) =>
        rel = rel.join(Tables.load(spark, dir, p.name), col(lc) === col(pc))
      }
      preds.foreach(p => rel = rel.filter(p.expr))
      sub.foreach(s => rel = s.apply(rel, spark, dir))
      scal.foreach(s => rel = s.apply(rel, spark, dir))
      shape match {
        case AggShape(groups, aggs) =>
          val aggCols = aggs.map(a => a.expr.as(a.alias))
          if (groups.isEmpty) rel.agg(aggCols.head, aggCols.tail: _*)
          else rel.groupBy(groups.map(col): _*)
            .agg(aggCols.head, aggCols.tail: _*)
            .orderBy(groups.map(col): _*)
        case ProjectShape(cols, distinct) =>
          val p = rel.select(cols.map(col): _*)
          (if (distinct) p.distinct() else p).orderBy(cols.map(col): _*)
        case other =>
          sys.error(s"v4 generates only Agg/Project shapes, got $other")
      }
    }
  }

  // ---- generator ------------------------------------------------------

  private def pick[T](rnd: Random, xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

  /** One random pushable predicate over `allCols` (consumption order is
    * part of the frozen v1 stream — do not reorder the draws).
    */
  private def mkPred(rnd: Random, allCols: Seq[Col]): Option[Pred] = {
    val c = pick(rnd, allCols)
    c.kind match {
      case IntK => intLits.get(c.name).map { pool =>
        val op = pick(rnd, Seq("<", "<=", ">", ">=", "="))
        NumCmp(c.name, op, pick(rnd, pool).toString, isInt = true)
      }
      case DblK => dblLits.get(c.name).map { pool =>
        val op = pick(rnd, Seq("<", "<=", ">", ">="))
        NumCmp(c.name, op, pick(rnd, pool).toString, isInt = false)
      }
      case StrK => strLits.get(c.name).map { pool =>
        rnd.nextInt(3) match {
          case 0 => StrCmp(c.name, neg = false, pick(rnd, pool))
          case 1 => StrCmp(c.name, neg = true, pick(rnd, pool))
          case _ =>
            val n = 2 + rnd.nextInt(pool.size - 1)
            StrIn(c.name, rnd.shuffle(pool).take(n).sorted)
        }
      }
    }
  }

  /** Deterministic sample for `seed`. */
  def sample(seed: Long): Sample = {
    val rnd = new Random(seed)
    val base = pick(rnd, Seq(lineitem, lineitem, orders, orders, customer, nation))
    val depth = rnd.nextInt(10) match {
      case d if d <= 4 => 0
      case d if d <= 8 => 1
      case _ => 2
    }
    var joined = Vector.empty[Table]
    var cur = base
    var i = 0
    while (i < depth && cur.fk.isDefined) {
      val p = byName(cur.fk.get._2)
      joined :+= p; cur = p; i += 1
    }
    val visible: Seq[Table] = base +: joined
    val allCols: Seq[Col] = visible.flatMap(_.cols)

    val preds = (0 until rnd.nextInt(3)).flatMap(_ => mkPred(rnd, allCols)).distinct

    // window/top-k read base-table keys — a LEFT join can't null those, but
    // keep ordering columns from the base table for clarity
    val groupables = allCols.filter(c => c.kind == StrK ||
      (c.kind == IntK && Set("l_linenumber", "c_nationkey", "n_nationkey",
        "n_regionkey", "r_regionkey").contains(c.name)))
    val numerics = allCols.filter(c => c.kind == DblK || c.kind == IntK)
    val baseNumerics = base.cols.filter(c => c.kind == DblK ||
      (c.kind == IntK && !base.uk.contains(c.name)))

    val shape: Shape = rnd.nextInt(20) match {
      case s if s <= 7 => // aggregate
        val nG = rnd.nextInt(3) // 0 = global aggregate
        val groups = rnd.shuffle(groupables).take(nG).map(_.name).distinct
        val nAggs = 1 + rnd.nextInt(3)
        val aggs: Seq[AggFn] = Cnt +: (0 until nAggs).map { _ =>
          val c = pick(rnd, numerics)
          (c.kind, rnd.nextInt(3)) match {
            case (DblK, 0) => DSum(c.name)
            case (DblK, 1) => MinC(c.name)
            case (DblK, _) => MaxC(c.name)
            case (IntK, 0) => SumInt(c.name)
            case (IntK, 1) => MinC(c.name)
            case (IntK, _) => MaxC(c.name)
            case (StrK, _) => Cnt // unreachable: `numerics` excludes StrK
          }
        }
        AggShape(groups, aggs.distinctBy(_.alias))
      case s if s <= 12 => // projection (uk included unless distinct)
        val extra = rnd.shuffle(allCols.filterNot(c => base.uk.contains(c.name)))
          .take(1 + rnd.nextInt(3)).map(_.name)
        val distinct = rnd.nextBoolean()
        val cols = if (distinct) extra.distinct else (base.uk ++ extra).distinct
        ProjectShape(cols, distinct)
      case s if s <= 16 => // window rank over a base partition
        val partPool = base.cols.filter(c => c.kind == StrK ||
          (c.kind == IntK && !base.uk.contains(c.name)))
        val part = pick(rnd, if (partPool.nonEmpty) partPool else base.cols).name
        val ord = pick(rnd, if (baseNumerics.nonEmpty) baseNumerics else base.cols).name
        WindowShape(part, ord, pick(rnd, Seq("rank", "dense_rank", "row_number")))
      case _ => // top-k
        val ord = pick(rnd, if (baseNumerics.nonEmpty) baseNumerics else base.cols).name
        TopKShape(ord, rnd.nextBoolean(), 25 + rnd.nextInt(75))
    }

    // LEFT joins only where no shape/pred reads beyond what nulls allow:
    // aggregates and projections handle nulls identically in both engines;
    // window/top-k stay inner for a clean total order
    val leftOk = joined.nonEmpty && (shape match {
      case _: AggShape | _: ProjectShape => true
      case _ => false
    })
    val left = leftOk && rnd.nextInt(6) == 0 && preds.isEmpty

    Sample(seed, base, joined, left, preds, shape)
  }

  /** v2 generator: wider differential surface — HAVING, arithmetic
    * aggregate expressions (`sum(a * (1-b))` family), CASE band groupings
    * and projections, set operations (UNION ALL / INTERSECT / EXCEPT), and
    * LEFT JOINs combined with WHERE predicates (a post-join filter renders
    * identically in both dialects, null rows failing comparisons the same
    * way). The v1 stream above stays FROZEN — gate seeds 9001-9012 pin v1,
    * 9101+ pin v2.
    */
  def sampleV2(seed: Long): Sample = {
    val rnd = new Random(seed)
    val base = pick(rnd, Seq(lineitem, lineitem, orders, orders, customer, nation))
    val depth = rnd.nextInt(10) match {
      case d if d <= 4 => 0
      case d if d <= 8 => 1
      case _ => 2
    }
    var joined = Vector.empty[Table]
    var cur = base
    var i = 0
    while (i < depth && cur.fk.isDefined) {
      val p = byName(cur.fk.get._2)
      joined :+= p; cur = p; i += 1
    }
    val visible: Seq[Table] = base +: joined
    val allCols: Seq[Col] = visible.flatMap(_.cols)
    val preds = (0 until rnd.nextInt(3)).flatMap(_ => mkPred(rnd, allCols)).distinct

    val groupables = allCols.filter(c => c.kind == StrK ||
      (c.kind == IntK && Set("l_linenumber", "c_nationkey", "n_nationkey",
        "n_regionkey", "r_regionkey").contains(c.name)))
    val numerics = allCols.filter(c => c.kind == DblK || c.kind == IntK)
    val baseNumerics = base.cols.filter(c => c.kind == DblK ||
      (c.kind == IntK && !base.uk.contains(c.name)))
    val dblCols = allCols.filter(c => c.kind == DblK && dblLits.contains(c.name))
      .map(_.name)

    def mkBand(): Option[Band] = {
      if (dblCols.isEmpty) None
      else {
        val c = pick(rnd, dblCols)
        Some(Band(c, pick(rnd, dblLits(c)).toString))
      }
    }
    // DISCOVERED BOUNDARY (v2 sweep, seed 2044): the dsum convention's
    // decimal(28,4)→double final cast is exact only while |sum|·10⁴ ≤ 2⁵³
    // (~9e11 in value). Beyond that, Spark's Decimal.toDouble and DuckDB's
    // decimal→double can land 1 ulp apart — a true cross-ENGINE conversion
    // difference, not an engine bug. `sum(price · (1 − price))` reaches
    // ~1e14 and crossed it. Multiplicative forms therefore keep one factor
    // in the ratio domain (l_discount/l_tax ≤ 1), the real TPC-H shape;
    // additive sums of two prices stay ≤ ~7e11 even at sf0.1 join fan.
    val ratioCols = Seq("l_discount", "l_tax").filter(dblCols.contains)
    def mkAgg(): AggFn =
      if (dblCols.size >= 2 && rnd.nextInt(4) == 0) {
        val form = rnd.nextInt(3)
        if (form == 1) {
          val a = pick(rnd, dblCols)
          val b = pick(rnd, dblCols.filterNot(_ == a))
          ExprSum(a, b, 1)
        } else if (ratioCols.nonEmpty) {
          val b = pick(rnd, ratioCols)
          val a = pick(rnd, dblCols.filterNot(_ == b))
          ExprSum(a, b, form)
        } else DSum(pick(rnd, dblCols))
      } else {
        val c = pick(rnd, numerics)
        (c.kind, rnd.nextInt(3)) match {
          case (DblK, 0) => DSum(c.name)
          case (DblK, 1) => MinC(c.name)
          case (DblK, _) => MaxC(c.name)
          case (IntK, 0) => SumInt(c.name)
          case (IntK, 1) => MinC(c.name)
          case (IntK, _) => MaxC(c.name)
          case (StrK, _) => Cnt // unreachable: `numerics` excludes StrK
        }
      }

    val shape: Shape = rnd.nextInt(24) match {
      case s if s <= 7 => // aggregate w/ optional band key + HAVING
        val nG = rnd.nextInt(3)
        val groups = rnd.shuffle(groupables).take(nG).map(_.name).distinct
        val band = if (rnd.nextInt(3) == 0) mkBand() else None
        val aggs: Seq[AggFn] = Cnt +: (0 until 1 + rnd.nextInt(3)).map(_ => mkAgg())
        val having =
          if (rnd.nextInt(3) == 0) Some(Seq(1L, 5L, 20L, 100L)(rnd.nextInt(4)))
          else None
        AggShape2(groups, band, aggs.distinctBy(_.alias), having)
      case s if s <= 12 => // projection, optionally with a band column
        val extra = rnd.shuffle(allCols.filterNot(c => base.uk.contains(c.name)))
          .take(1 + rnd.nextInt(3)).map(_.name)
        val distinct = rnd.nextBoolean()
        val cols = if (distinct) extra.distinct else (base.uk ++ extra).distinct
        mkBand() match {
          case Some(b) if rnd.nextBoolean() => BandProject(cols, b, distinct)
          case _ => ProjectShape(cols, distinct)
        }
      case s if s <= 15 => // window rank (v1 shape, inner joins only)
        val partPool = base.cols.filter(c => c.kind == StrK ||
          (c.kind == IntK && !base.uk.contains(c.name)))
        val part = pick(rnd, if (partPool.nonEmpty) partPool else base.cols).name
        val ord = pick(rnd, if (baseNumerics.nonEmpty) baseNumerics else base.cols).name
        WindowShape(part, ord, pick(rnd, Seq("rank", "dense_rank", "row_number")))
      case s if s <= 18 => // top-k (v1 shape, inner joins only)
        val ord = pick(rnd, if (baseNumerics.nonEmpty) baseNumerics else base.cols).name
        TopKShape(ord, rnd.nextBoolean(), 25 + rnd.nextInt(75))
      case _ => // set operation: two filtered branches of the same chain
        val cols = rnd.shuffle(allCols).take(1 + rnd.nextInt(3)).map(_.name).distinct
        val predsB = (0 until 1 + rnd.nextInt(2)).flatMap(_ => mkPred(rnd, allCols)).distinct
        SetOpShape(cols, predsB, pick(rnd, Seq("UNION ALL", "INTERSECT", "EXCEPT")))
    }

    val leftOk = joined.nonEmpty && (shape match {
      case _: AggShape2 | _: ProjectShape | _: BandProject | _: SetOpShape => true
      case _ => false
    })
    // v2: LEFT JOIN may coexist with WHERE predicates — both renderings
    // filter AFTER the join, so nulls fail the predicate identically
    val left = leftOk && rnd.nextInt(4) == 0

    Sample(seed, base, joined, left, preds, shape)
  }

  /** v3 generator: disjunctive + range predicates (OR, BETWEEN), scalar
    * string functions (UPPER/LOWER/LENGTH/SUBSTRING as projection
    * columns), exact COUNT(DISTINCT), and windowed aggregates (per-
    * partition SUM annotated onto rows — BIGINT ints and the dsum
    * decimal convention through a window frame). v1/v2 streams stay
    * FROZEN; v3 gate seeds live at 9301+.
    */
  def sampleV3(seed: Long): Sample = {
    val rnd = new Random(seed)
    val base = pick(rnd, Seq(lineitem, lineitem, orders, orders, customer, nation))
    val depth = rnd.nextInt(10) match {
      case d if d <= 4 => 0
      case d if d <= 8 => 1
      case _ => 2
    }
    var joined = Vector.empty[Table]
    var cur = base
    var i = 0
    while (i < depth && cur.fk.isDefined) {
      val p = byName(cur.fk.get._2)
      joined :+= p; cur = p; i += 1
    }
    val visible: Seq[Table] = base +: joined
    val allCols: Seq[Col] = visible.flatMap(_.cols)

    /** v3 predicate: 50% a v1 atom, else BETWEEN or OR-of-two-atoms. */
    def mkPredV3(): Option[Pred] = rnd.nextInt(4) match {
      case 0 | 1 => mkPred(rnd, allCols)
      case 2 =>
        val c = pick(rnd, allCols.filter(c =>
          (c.kind == IntK && intLits.contains(c.name)) ||
            (c.kind == DblK && dblLits.contains(c.name))))
        val isInt = c.kind == IntK
        val pool: Seq[String] =
          if (isInt) intLits(c.name).map(_.toString)
          else dblLits(c.name).map(_.toString)
        val two = rnd.shuffle(pool).take(2)
          .sortBy(_.toDouble)
        if (two.size < 2) None
        else Some(BetweenP(c.name, two.head, two.last, isInt))
      case _ =>
        for (a <- mkPred(rnd, allCols); b <- mkPred(rnd, allCols))
          yield OrPred(a, b)
    }

    val preds = (0 until rnd.nextInt(3)).flatMap(_ => mkPredV3()).distinct

    val groupables = allCols.filter(c => c.kind == StrK ||
      (c.kind == IntK && Set("l_linenumber", "c_nationkey", "n_nationkey",
        "n_regionkey", "r_regionkey").contains(c.name)))
    val numerics = allCols.filter(c => c.kind == DblK || c.kind == IntK)
    val strCols = allCols.filter(_.kind == StrK).map(_.name)
    val dblCols = allCols.filter(c => c.kind == DblK && dblLits.contains(c.name))
      .map(_.name)
    val intValCols = base.cols
      .filter(c => c.kind == IntK && !base.uk.contains(c.name)).map(_.name)
    val partPool = base.cols.filter(c => c.kind == StrK ||
      (c.kind == IntK && !base.uk.contains(c.name)))

    def mkAggV3(): AggFn = {
      val c = pick(rnd, numerics)
      (c.kind, rnd.nextInt(4)) match {
        case (_, 0) => CntDistinct(c.name)
        case (DblK, 1) => DSum(c.name)
        case (DblK, 2) => MinC(c.name)
        case (DblK, _) => MaxC(c.name)
        case (IntK, 1) => SumInt(c.name)
        case (IntK, 2) => MinC(c.name)
        case (IntK, _) => MaxC(c.name)
        case (StrK, _) => Cnt // unreachable: `numerics` excludes StrK
      }
    }

    val shape: Shape = rnd.nextInt(20) match {
      case s if s <= 6 => // aggregate with the v3 pool (COUNT DISTINCT)
        val nG = rnd.nextInt(3)
        val groups = rnd.shuffle(groupables).take(nG).map(_.name).distinct
        val aggs: Seq[AggFn] = Cnt +: (0 until 1 + rnd.nextInt(3)).map(_ => mkAggV3())
        AggShape(groups, aggs.distinctBy(_.alias))
      case s if s <= 12 => // scalar-function projection
        if (strCols.isEmpty) {
          val extra = rnd.shuffle(allCols.filterNot(c => base.uk.contains(c.name)))
            .take(1 + rnd.nextInt(3)).map(_.name)
          ProjectShape((base.uk ++ extra).distinct, distinct = false)
        } else {
          val fns = rnd.shuffle(strCols).take(1 + rnd.nextInt(2))
            .map(c => StrFn(c, rnd.nextInt(4)))
          val extra = rnd.shuffle(allCols.filterNot(c => base.uk.contains(c.name)))
            .take(rnd.nextInt(3)).map(_.name)
          StrFnProject(extra.distinct, fns.distinctBy(_.alias))
        }
      case s if s <= 17 => // windowed aggregate
        val part = pick(rnd, if (partPool.nonEmpty) partPool else base.cols).name
        if (dblCols.nonEmpty && rnd.nextBoolean())
          WinAggShape(part, pick(rnd, dblCols), dec = true)
        else if (intValCols.nonEmpty)
          WinAggShape(part, pick(rnd, intValCols), dec = false)
        else WinAggShape(part, pick(rnd, dblCols), dec = true)
      case _ => // top-k (v1 shape)
        val baseNumerics = base.cols.filter(c => c.kind == DblK ||
          (c.kind == IntK && !base.uk.contains(c.name)))
        val ord = pick(rnd, if (baseNumerics.nonEmpty) baseNumerics else base.cols).name
        TopKShape(ord, rnd.nextBoolean(), 25 + rnd.nextInt(75))
    }

    // v3: LEFT JOIN allowed for agg + projection shapes (post-join WHERE
    // filters nulls identically in both dialects); window/top-k stay inner
    val leftOk = joined.nonEmpty && (shape match {
      case _: AggShape | _: ProjectShape | _: StrFnProject => true
      case _ => false
    })
    val left = leftOk && rnd.nextInt(4) == 0

    Sample(seed, base, joined, left, preds, shape)
  }

  /** v4 generator: branching star joins (lineitem fans out to orders /
    * part / supplier on three DIFFERENT keys; orders to customer; the
    * v1-v3 chains only ever walk one FK path) plus the subquery predicate
    * surface — EXISTS / NOT EXISTS / correlated-equality and IN / NOT IN
    * membership, and uncorrelated scalar MIN/MAX thresholds. The
    * DataFrame rendering hand-writes the decomposition Catalyst must
    * derive from the SQL (semi/anti join; 1-row broadcast), so the
    * differential pins RewritePredicateSubquery and scalar-subquery
    * planning end to end. v1-v3 streams stay FROZEN; v4 gate seeds live
    * at 9401+.
    */
  def sampleV4(seed: Long): Fuzzed = {
    val rnd = new Random(seed)
    val base = pick(rnd, Seq(lineitem, lineitem, lineitem, orders, orders, customer))

    // star branches: subset of the base's FK fan-out, in fixed order so
    // the FROM clause is deterministic per seed
    val pool: Seq[(String, Table, String)] = base.name match {
      case "lineitem" => Seq(
        ("l_orderkey", orders, "o_orderkey"),
        ("l_partkey", part, "p_partkey"),
        ("l_suppkey", supplier, "s_suppkey"))
      case "orders" => Seq(("o_custkey", customer, "c_custkey"))
      case _ => Seq(("c_nationkey", nation, "n_nationkey"))
    }
    val nBranch = rnd.nextInt(pool.size + 1)
    val branches0 = rnd.shuffle(pool).take(nBranch)
      .sortBy(b => pool.indexOf(b))
    // 50%: extend orders → customer (depth-2 inside the star)
    val branches =
      if (branches0.exists(_._2.name == "orders") && rnd.nextBoolean())
        branches0 :+ (("o_custkey", customer, "c_custkey"))
      else branches0

    val inFrom: Set[String] = Set(base.name) ++ branches.map(_._2.name)
    val allCols: Seq[Col] = (base +: branches.map(_._2)).flatMap(_.cols)

    val preds = (0 until rnd.nextInt(3)).flatMap(_ => mkPred(rnd, allCols)).distinct

    // membership subquery: a key-linked table NOT already in the FROM
    val subPool: Seq[(String, Table, String)] = (base.name match {
      case "lineitem" => Seq(
        ("l_orderkey", orders, "o_orderkey"),
        ("l_partkey", part, "p_partkey"),
        ("l_suppkey", supplier, "s_suppkey"))
      case "orders" => Seq(
        ("o_orderkey", lineitem, "l_orderkey"),
        ("o_custkey", customer, "c_custkey"))
      case _ => Seq(
        ("c_custkey", orders, "o_custkey"),
        ("c_nationkey", nation, "n_nationkey"))
    }).filterNot(s => inFrom.contains(s._2.name))
    val sub: Option[SubPred] =
      if (subPool.nonEmpty && rnd.nextInt(3) != 0) {
        val (key, child, childKey) = pick(rnd, subPool)
        val cps = (0 until rnd.nextInt(3))
          .flatMap(_ => mkPred(rnd, child.cols)).distinct
        // NOT-membership with an unfiltered child is always-empty (every
        // key value exists) — negation requires at least one child pred
        val neg = cps.nonEmpty && rnd.nextInt(3) == 0
        Some(SubPred(neg, asIn = rnd.nextBoolean(), key, child, childKey, cps))
      } else None

    // scalar threshold: source table outside the FROM and the subquery.
    // Compared columns must share a magnitude family — a ratio (≤ 0.1)
    // against a MIN of prices (thousands) is satisfiable by no row, and
    // an always-empty predicate has no differential power.
    val magClass: Map[String, Int] = Map(
      "l_extendedprice" -> 0, "o_totalprice" -> 0, "c_acctbal" -> 0,
      "p_retailprice" -> 0, "s_acctbal" -> 0,
      "l_discount" -> 1, "l_tax" -> 1, "l_quantity" -> 2)
    val scalPool = Seq(lineitem, orders, customer, part, supplier)
      .filterNot(t => inFrom.contains(t.name) ||
        sub.exists(_.child.name == t.name))
    val scalCols = allCols.filter(c => c.kind == DblK && dblLits.contains(c.name))
    val scal: Option[ScalarPred] =
      if (scalPool.nonEmpty && scalCols.nonEmpty && rnd.nextInt(3) == 0) {
        val src = pick(rnd, scalPool)
        val c = pick(rnd, scalCols)
        val srcDbl = src.cols.filter(s => s.kind == DblK &&
          dblLits.contains(s.name) && magClass.get(s.name) == magClass.get(c.name))
        if (srcDbl.isEmpty) None
        else {
          val sps = (0 until rnd.nextInt(2))
            .flatMap(_ => mkPred(rnd, src.cols)).distinct
          Some(ScalarPred(c.name,
            pick(rnd, Seq("<", "<=", ">", ">=")), rnd.nextBoolean(),
            src, pick(rnd, srcDbl).name, sps))
        }
      } else None

    val groupables = allCols.filter(c => c.kind == StrK ||
      (c.kind == IntK && Set("l_linenumber", "c_nationkey", "n_nationkey",
        "n_regionkey", "p_size", "s_nationkey").contains(c.name)))
    val numerics = allCols.filter(c => c.kind == DblK || c.kind == IntK)

    val shape: Shape =
      if (rnd.nextInt(5) <= 2) {
        val nG = rnd.nextInt(3)
        val groups = rnd.shuffle(groupables).take(nG).map(_.name).distinct
        val aggs: Seq[AggFn] = Cnt +: (0 until 1 + rnd.nextInt(3)).map { _ =>
          val c = pick(rnd, numerics)
          (c.kind, rnd.nextInt(3)) match {
            case (DblK, 0) => DSum(c.name)
            case (DblK, 1) => MinC(c.name)
            case (DblK, _) => MaxC(c.name)
            case (IntK, 0) => SumInt(c.name)
            case (IntK, 1) => MinC(c.name)
            case (IntK, _) => MaxC(c.name)
            case (StrK, _) => Cnt // unreachable: `numerics` excludes StrK
          }
        }
        AggShape(groups, aggs.distinctBy(_.alias))
      } else {
        val extra = rnd.shuffle(allCols.filterNot(c => base.uk.contains(c.name)))
          .take(1 + rnd.nextInt(3)).map(_.name)
        val distinct = rnd.nextBoolean()
        val cols = if (distinct) extra.distinct else (base.uk ++ extra).distinct
        ProjectShape(cols, distinct)
      }

    StarSample(seed, base, branches, preds, sub, scal, shape)
  }

  // ---- v5: FULL OUTER joins + framed windows + explicit null ordering ----

  sealed trait FoShape
  /** Aggregate over the coalesced join key. */
  final case class FoAgg(aggs: Seq[AggFn]) extends FoShape
  /** Row-level projection with IS NULL miss flags for each side. */
  final case class FoProject(lCol: String, rCol: String) extends FoShape
  /** Framed running aggregate per coalesced key: `nPrec = None` ⇒
    * UNBOUNDED PRECEDING, else N PRECEDING; always ... AND CURRENT ROW.
    * `valCol = None` ⇒ running COUNT of the right key (non-null counting
    * through the frame), else decimal-exact running SUM.
    */
  final case class FoWin(valCol: Option[String], nPrec: Option[Int])
      extends FoShape

  /** v5 sample: parent FULL OUTER child with side-local PRE-JOIN filters,
    * so BOTH directions produce null-extended rows. Every sort — final
    * ORDER BY and window ORDER BY — pins null placement EXPLICITLY
    * (`nullsFirst`), because this is exactly where engine defaults
    * diverge: Spark sorts ASC NULLS FIRST, DuckDB ASC NULLS LAST. An
    * ordering over nullable columns without the explicit clause would be
    * a bug in the query, not the engine — the generator makes writing
    * that bug impossible, and the differential proves both renderings
    * agree on the pinned semantics.
    */
  final case class FoSample(seed: Long, left: Table, right: Table,
      lk: String, rk: String, lPreds: Seq[Pred], rPreds: Seq[Pred],
      nullsFirst: Boolean, shape: FoShape) extends Fuzzed {

    def describe: String =
      s"v5 ${left.name} FULL OUTER ${right.name} " +
        s"${shape.getClass.getSimpleName} nf=$nullsFirst " +
        s"lpreds=${lPreds.size} rpreds=${rPreds.size}"

    private def nullsSql = if (nullsFirst) "NULLS FIRST" else "NULLS LAST"
    private def ordCol(c: String): Column =
      if (nullsFirst) col(c).asc_nulls_first else col(c).asc_nulls_last

    private def subSql(t: Table, ps: Seq[Pred]): String =
      if (ps.isEmpty) t.name
      else s"(SELECT * FROM ${t.name} WHERE ${ps.map(_.sql).mkString(" AND ")})"

    /** The joined relation with the coalesced key projected, as SQL. All
      * column names are globally unique in the TPC-H schema, so post-join
      * references need no qualification.
      */
    private def joinSql: String =
      s"SELECT COALESCE(l.$lk, r.$rk) AS k, l.*, r.*\n" +
        s"  FROM ${subSql(left, lPreds)} l\n" +
        s"  FULL JOIN ${subSql(right, rPreds)} r ON l.$lk = r.$rk"

    private def rUks: Seq[String] = right.uk
    private def flagCols = Seq(s"$lk IS NULL AS l_miss", s"$rk IS NULL AS r_miss")

    def sql: String = shape match {
      case FoAgg(aggs) =>
        val sels = "k" +: aggs.map(a => s"${a.sql} AS ${a.alias}")
        s"SELECT ${sels.mkString(", ")}\nFROM ($joinSql) j\n" +
          "GROUP BY k ORDER BY k"
      case FoProject(lc, rc) =>
        val outs = Seq("k") ++ flagCols ++ Seq(lc, rc)
        val ord = ("k" +: (left.uk ++ rUks))
          .map(c => s"$c ASC $nullsSql").mkString(", ")
        s"SELECT ${outs.mkString(", ")}\nFROM ($joinSql) j\nORDER BY $ord"
      case FoWin(v, nPrec) =>
        val frame = nPrec match {
          case Some(n) => s"ROWS BETWEEN $n PRECEDING AND CURRENT ROW"
          case None    => "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        }
        // the driver's lineitem is NOT unique on (l_orderkey, l_linenumber),
        // so the frame order appends the aggregated value itself: rows that
        // still tie are then value-identical, and a bounded frame over any
        // permutation of value-identical ties yields the same output
        // multiset — deterministic across engines without a unique key
        val wOrd = (rUks ++ v.toSeq).map(c => s"$c ASC $nullsSql").mkString(", ")
        val over = s"OVER (PARTITION BY k ORDER BY $wOrd $frame)"
        val win = v match {
          case Some(c) =>
            s"CAST(SUM(CAST($c AS DECIMAL(28,4))) $over AS DOUBLE) AS wsum"
          case None => s"CAST(COUNT(${rUks.head}) $over AS BIGINT) AS wcnt"
        }
        val ord = ("k" +: rUks).map(c => s"$c ASC $nullsSql").mkString(", ")
        s"SELECT k, ${rUks.mkString(", ")}, $win\nFROM ($joinSql) j\nORDER BY $ord"
    }

    def df(spark: SparkSession, dir: String): DataFrame = {
      def side(t: Table, ps: Seq[Pred]): DataFrame =
        ps.foldLeft(Tables.load(spark, dir, t.name))((d, p) => d.filter(p.expr))
      val ldf = side(left, lPreds)
      val rdf = side(right, rPreds)
      val j = ldf.join(rdf, ldf(lk) === rdf(rk), "full_outer")
        .withColumn("k", coalesce(col(lk), col(rk)))
      shape match {
        case FoAgg(aggs) =>
          j.groupBy("k")
            .agg(aggs.head.expr.as(aggs.head.alias),
              aggs.tail.map(a => a.expr.as(a.alias)): _*)
            .orderBy("k")
        case FoProject(lc, rc) =>
          j.select(col("k"), col(lk).isNull.as("l_miss"),
              col(rk).isNull.as("r_miss"), col(lc), col(rc))
            .orderBy(("k" +: (left.uk ++ rUks)).map(ordCol): _*)
        case FoWin(v, nPrec) =>
          val lo = nPrec.map(-_.toLong).getOrElse(Window.unboundedPreceding)
          val w = Window.partitionBy(col("k"))
            .orderBy((rUks ++ v.toSeq).map(ordCol): _*)
            .rowsBetween(lo, Window.currentRow)
          val win = v match {
            case Some(c) =>
              sum(col(c).cast(org.apache.spark.sql.types.DecimalType(28, 4)))
                .over(w).cast("double").as("wsum")
            case None => count(col(rUks.head)).over(w).cast("long").as("wcnt")
          }
          j.select(col("k") +: rUks.map(col) :+ win: _*)
            .orderBy(("k" +: rUks).map(ordCol): _*)
      }
    }
  }

  /** v5 generator: the FULL OUTER surface — see [[FoSample]]. v1-v4
    * streams stay FROZEN; v5 gate seeds live at 9501+.
    */
  def sampleV5(seed: Long): Fuzzed = {
    val rnd = new Random(seed)
    val (left, right, lk, rk) = pick(rnd, Seq(
      (customer, orders, "c_custkey", "o_custkey"),
      (nation, customer, "n_nationkey", "c_nationkey"),
      (orders, lineitem, "o_orderkey", "l_orderkey"),
      (supplier, lineitem, "s_suppkey", "l_suppkey"),
      (part, lineitem, "p_partkey", "l_partkey")))
    // side-local preds run BEFORE the join (derived tables) so both
    // directions can produce null-extended rows; at least one side is
    // filtered so child-side misses exist too
    def predsFor(t: Table, atLeast1: Boolean): Seq[Pred] = {
      val n = (if (atLeast1) 1 else 0) + rnd.nextInt(2)
      (0 until n).flatMap(_ => mkPred(rnd, t.cols)).distinct
    }
    val filterLeft = rnd.nextBoolean()
    val lPreds = predsFor(left, atLeast1 = filterLeft)
    val rPreds = predsFor(right, atLeast1 = !filterLeft)
    val nullsFirst = rnd.nextBoolean()

    val rDbl = right.cols.filter(_.kind == DblK)
    val lDbl = left.cols.filter(_.kind == DblK)
    val shape: FoShape = rnd.nextInt(3) match {
      case 0 =>
        val extras: Seq[AggFn] = Seq(
          Some(CntCol(rUkOf(right))),
          rDbl.headOption.map(c => DSum(c.name)),
          lDbl.headOption.map(c => MinC(c.name)),
          rDbl.lastOption.map(c => MaxC(c.name))).flatten
        FoAgg(Cnt +: rnd.shuffle(extras).take(1 + rnd.nextInt(2)).sortBy(_.alias))
      case 1 =>
        val lc = pick(rnd, left.cols.filterNot(c => left.uk.contains(c.name))).name
        val rc = pick(rnd, right.cols.filterNot(c => right.uk.contains(c.name))).name
        FoProject(lc, rc)
      case _ =>
        val v = if (rDbl.nonEmpty && rnd.nextBoolean())
          Some(pick(rnd, rDbl).name) else None
        val nPrec = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(3)) else None
        FoWin(v, nPrec)
    }
    FoSample(seed, left, right, lk, rk, lPreds, rPreds, nullsFirst, shape)
  }

  private def rUkOf(t: Table): String = t.uk.head

  // ---- v6: the temporal surface (o_orderdate / l_shipdate) ---------------

  /** Timestamp predicate with dual rendering. DF-side literals go through
    * `to_timestamp` (session-TZ parse, UTC here) so both frontends and
    * DuckDB's naive TIMESTAMP literal mean the same instant.
    */
  final case class DatePred(c: String, op: String, lo: String, hi: Option[String]) {
    def sql: String = hi match {
      case Some(h) => s"$c BETWEEN TIMESTAMP '$lo' AND TIMESTAMP '$h'"
      case None    => s"$c $op TIMESTAMP '$lo'"
    }
    def expr: Column = {
      val l = to_timestamp(lit(lo))
      hi match {
        case Some(h) => col(c) >= l && col(c) <= to_timestamp(lit(h))
        case None => op match {
          case "<"  => col(c) < l
          case "<=" => col(c) <= l
          case ">"  => col(c) > l
          case _    => col(c) >= l
        }
      }
    }
  }

  /** Field extractions valid with IDENTICAL names+semantics in Spark SQL
    * and DuckDB (dayofweek is deliberately absent: Spark counts 1=Sunday,
    * DuckDB 0=Sunday). Results cast to BIGINT on both sides — Spark's
    * extracts return INT, DuckDB's BIGINT.
    */
  private val dtExtracts: Seq[(String, String => String, String => Column)] = Seq(
    ("yy", d => s"CAST(year($d) AS BIGINT)", d => year(col(d)).cast("long")),
    ("qq", d => s"CAST(quarter($d) AS BIGINT)", d => quarter(col(d)).cast("long")),
    ("mm", d => s"CAST(month($d) AS BIGINT)", d => month(col(d)).cast("long")),
    ("dd", d => s"CAST(day($d) AS BIGINT)", d => dayofmonth(col(d)).cast("long")),
    ("doy", d => s"CAST(dayofyear($d) AS BIGINT)", d => dayofyear(col(d)).cast("long")))

  sealed trait DtShape
  /** Calendar-bucketed aggregation; `shiftMonths > 0` buckets on
    * `d + INTERVAL n MONTH` (calendar month addition, end-of-month
    * clamping — the same rule in both engines).
    */
  final case class DtAgg(unit: String, shiftMonths: Int,
      extraGroup: Option[String], aggs: Seq[AggFn]) extends DtShape
  /** Row-level field extraction projection. */
  final case class DtProject(fields: Seq[String]) extends DtShape

  /** v6 sample: the temporal query family over the timestamp columns the
    * v1-v5 streams never touch.
    */
  final case class DtSample(seed: Long, base: Table, dcol: String,
      joinOrders: Boolean, preds: Seq[Pred], dPreds: Seq[DatePred],
      shape: DtShape) extends Fuzzed {

    def describe: String =
      s"v6 ${base.name}${if (joinOrders) "⋈orders" else ""} " +
        s"${shape.getClass.getSimpleName} dpreds=${dPreds.size}"

    private def fromSql =
      if (joinOrders) s"${base.name} JOIN orders ON l_orderkey = o_orderkey"
      else base.name
    private def whereSql = {
      val all = dPreds.map(_.sql) ++ preds.map(_.sql)
      if (all.isEmpty) "" else s"\nWHERE ${all.mkString(" AND ")}"
    }
    private def bucketSql(unit: String, shift: Int): String =
      if (shift == 0) s"date_trunc('$unit', $dcol)"
      else s"date_trunc('$unit', $dcol + INTERVAL $shift MONTH)"

    def sql: String = shape match {
      case DtAgg(unit, shift, extraG, aggs) =>
        val groups = s"${bucketSql(unit, shift)} AS bucket" +: extraG.toSeq
        val sels = groups ++ aggs.map(a => s"${a.sql} AS ${a.alias}")
        val by = "bucket" +: extraG.toSeq
        s"SELECT ${sels.mkString(", ")}\nFROM $fromSql$whereSql\n" +
          s"GROUP BY ${by.mkString(", ")} ORDER BY ${by.mkString(", ")}"
      case DtProject(fields) =>
        val ex = dtExtracts.filter(e => fields.contains(e._1))
          .map { case (a, f, _) => s"${f(dcol)} AS ${a}_$dcol" }
        val sels = (base.uk ++ ex) :+ s"date_trunc('month', $dcol) AS tm"
        s"SELECT ${sels.mkString(", ")}\nFROM $fromSql$whereSql\n" +
          s"ORDER BY ${base.uk.mkString(", ")}"
    }

    def df(spark: SparkSession, dir: String): DataFrame = {
      var rel = Tables.load(spark, dir, base.name)
      if (joinOrders)
        rel = rel.join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
      rel = (dPreds.map(_.expr) ++ preds.map(_.expr))
        .foldLeft(rel)((d, p) => d.filter(p))
      shape match {
        case DtAgg(unit, shift, extraG, aggs) =>
          val shifted =
            if (shift == 0) col(dcol)
            else col(dcol) + make_interval(lit(0), lit(shift))
          val bucket = date_trunc(unit, shifted).as("bucket")
          rel.groupBy(bucket +: extraG.map(col).toSeq: _*)
            .agg(aggs.head.expr.as(aggs.head.alias),
              aggs.tail.map(a => a.expr.as(a.alias)): _*)
            .orderBy(("bucket" +: extraG.toSeq).map(col): _*)
        case DtProject(fields) =>
          val ex = dtExtracts.filter(e => fields.contains(e._1))
            .map { case (a, _, f) => f(dcol).as(s"${a}_$dcol") }
          rel.select((base.uk.map(col) ++ ex) :+
              date_trunc("month", col(dcol)).as("tm"): _*)
            .orderBy(base.uk.map(col): _*)
      }
    }
  }

  /** v6 generator: calendar buckets (incl. INTERVAL-shifted), field
    * extraction, timestamp range predicates — over lineitem.l_shipdate /
    * orders.o_orderdate, optionally through the fact-fact join so BOTH
    * date columns are in scope. v1-v5 streams stay FROZEN; v6 gate seeds
    * live at 9601+.
    */
  def sampleV6(seed: Long): Fuzzed = {
    val rnd = new Random(seed)
    // nextInt(6): a non-power-of-2 bound goes through the low bits, which
    // actually vary across sequential seeds — the first nextBoolean() of
    // java.util.Random is top-bit-correlated and picked the SAME base for
    // 140 consecutive seeds
    val (base, dcols) =
      if (rnd.nextInt(6) < 3) (orders, Seq("o_orderdate"))
      else (lineitem, Seq("l_shipdate"))
    val joinOrders = base.name == "lineitem" && rnd.nextInt(3) == 0
    val datePool = dcols ++ (if (joinOrders) Seq("o_orderdate") else Nil)
    val dcol = pick(rnd, dcols)
    val dateLits = Seq("1996-06-01 00:00:00", "1997-03-15 00:00:00",
      "1998-01-01 00:00:00", "1999-09-15 00:00:00", "2000-03-01 00:00:00")
    def mkDatePred(): DatePred = {
      val c = pick(rnd, datePool)
      if (rnd.nextInt(3) == 0) {
        val lo = pick(rnd, dateLits.take(3))
        val hi = pick(rnd, dateLits.drop(3))
        DatePred(c, "", lo, Some(hi))
      } else DatePred(c, pick(rnd, Seq("<", "<=", ">", ">=")),
        pick(rnd, dateLits), None)
    }
    val dPreds = (0 until rnd.nextInt(2)).map(_ => mkDatePred()).distinct
    val predCols = base.cols ++ (if (joinOrders) orders.cols else Nil)
    val preds = (0 until rnd.nextInt(2)).flatMap(_ => mkPred(rnd, predCols)).distinct

    val numerics = predCols.filter(c => c.kind == DblK || c.kind == IntK)
    val groupables = predCols.filter(_.kind == StrK)
    val shape: DtShape =
      if (rnd.nextInt(3) <= 1) {
        val unit = pick(rnd, Seq("year", "quarter", "month", "week"))
        val shift = if (rnd.nextInt(3) == 0) 1 + rnd.nextInt(5) else 0
        val extraG =
          if (rnd.nextBoolean() && groupables.nonEmpty)
            Some(pick(rnd, groupables).name) else None
        val aggs: Seq[AggFn] = Cnt +: (0 until rnd.nextInt(3)).map { _ =>
          val c = pick(rnd, numerics)
          (c.kind, rnd.nextInt(3)) match {
            case (DblK, 0) => DSum(c.name)
            case (IntK, 0) => SumInt(c.name)
            case (_, 1)    => MinC(c.name)
            case _         => MaxC(c.name)
          }
        }
        // min/max over the OTHER date column: timestamp-typed aggregates
        val dAgg: Seq[AggFn] =
          if (rnd.nextInt(3) == 0)
            Seq(if (rnd.nextBoolean()) MinC(pick(rnd, datePool))
            else MaxC(pick(rnd, datePool)))
          else Nil
        DtAgg(unit, shift, extraG, (aggs ++ dAgg).distinctBy(_.alias))
      } else {
        val n = 1 + rnd.nextInt(4)
        DtProject(rnd.shuffle(dtExtracts.map(_._1)).take(n).sorted)
      }
    DtSample(seed, base, dcol, joinOrders, preds, dPreds, shape)
  }

  /** COUNT(col) — non-null counting, the full-outer miss detector. */
  final case class CntCol(c: String) extends AggFn {
    def sql = s"COUNT($c)"
    def expr: Column = count(col(c))
    def alias = s"cc_$c"
  }

  // ---- v7: nested aggregation + conditional aggregates -------------------

  /** Conditional count rendered as SUM(CASE...) — the one spelling whose
    * result type and null behavior agree across Spark SQL, the DataFrame
    * API, and DuckDB (COUNT(CASE..) counts non-null ELSE branches; FILTER
    * clauses aren't in Spark's dialect).
    */
  final case class CondCnt(p: Pred) extends AggFn {
    def sql = s"CAST(SUM(CASE WHEN ${p.sql} THEN 1 ELSE 0 END) AS BIGINT)"
    def expr: Column = sum(when(p.expr, 1L).otherwise(0L)).cast("long")
    def alias = "ccnt"
  }

  /** Conditional decimal-exact sum — the dsum convention through a CASE;
    * both branches pinned to DECIMAL(28,4) so neither engine has to invent
    * a coercion.
    */
  final case class CondDSum(p: Pred, c: String) extends AggFn {
    def sql = s"CAST(SUM(CASE WHEN ${p.sql} THEN CAST($c AS DECIMAL(28,4)) " +
      "ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)"
    def expr: Column = {
      val dec = org.apache.spark.sql.types.DecimalType(28, 4)
      sum(when(p.expr, col(c).cast(dec)).otherwise(lit(0).cast(dec)))
        .cast("double")
    }
    def alias = s"cds_$c"
  }

  /** Level-2 regrouping key over the level-1 relation's `cnt`. */
  sealed trait NestKey { def sql: String; def expr: Column }
  final case class CntBand(lo: Long, hi: Long) extends NestKey {
    def sql =
      s"CASE WHEN cnt < $lo THEN 'lo' WHEN cnt < $hi THEN 'mid' ELSE 'hi' END"
    def expr: Column =
      when(col("cnt") < lo, "lo").when(col("cnt") < hi, "mid").otherwise("hi")
  }
  final case class CntMod(m: Int) extends NestKey {
    def sql = s"cnt % $m"
    def expr: Column = col("cnt") % m
  }

  /** v7 sample: the generalized TPC-H Q13 shape — a per-key level-1
    * aggregate (conditional CASE-in-aggregate terms, optional HAVING)
    * re-aggregated into a distribution over the level-1 groups, with an
    * optional NULLIF-guarded exact selectivity ratio at level 2. Level 2's
    * input is |level-1 groups| rows, so the second exchange is tiny at any
    * scale — the shape is one fact shuffle plus a reduction.
    */
  final case class NestSample(seed: Long, fact: Table, gkey: String,
      preds: Seq[Pred], l1Aggs: Seq[AggFn], havingMin: Option[Long],
      key: NestKey, mm: Seq[AggFn], ratio: Boolean) extends Fuzzed {

    def describe: String =
      s"v7 ${fact.name} per-$gkey ${key.getClass.getSimpleName} " +
        s"l1=${l1Aggs.map(_.alias).mkString(",")} having=$havingMin ratio=$ratio"

    private def whereSql =
      if (preds.isEmpty) ""
      else s"\n  WHERE ${preds.map(_.sql).mkString(" AND ")}"
    private def havingSql =
      havingMin.map(h => s" HAVING COUNT(*) >= $h").getOrElse("")

    def sql: String = {
      val l1Sels = s"$gkey AS g" +: "COUNT(*) AS cnt" +:
        l1Aggs.map(a => s"${a.sql} AS ${a.alias}")
      val l2Sels = Seq(
        s"${key.sql} AS grp",
        "CAST(COUNT(*) AS BIGINT) AS n_groups",
        "CAST(SUM(cnt) AS BIGINT) AS total_cnt") ++
        mm.map(a => s"${a.sql} AS ${a.alias}") ++
        (if (ratio)
          Seq("ROUND(CAST(SUM(ccnt) AS DOUBLE) / " +
            "NULLIF(CAST(SUM(cnt) AS DOUBLE), 0.0), 6) AS sel")
        else Nil)
      s"WITH l1 AS (\n  SELECT ${l1Sels.mkString(", ")}\n" +
        s"  FROM ${fact.name}$whereSql\n" +
        s"  GROUP BY $gkey$havingSql)\n" +
        s"SELECT ${l2Sels.mkString(", ")}\nFROM l1 GROUP BY grp ORDER BY grp"
    }

    def df(spark: SparkSession, dir: String): DataFrame = {
      val base = preds.foldLeft(Tables.load(spark, dir, fact.name))(
        (d, p) => d.filter(p.expr))
      val l1all = base.groupBy(col(gkey).as("g"))
        .agg(count(lit(1)).as("cnt"),
          l1Aggs.map(a => a.expr.as(a.alias)): _*)
      val l1 = havingMin.map(h => l1all.filter(col("cnt") >= h)).getOrElse(l1all)
      val totalD = sum(col("cnt")).cast("double")
      val core = Seq(
        count(lit(1)).cast("long").as("n_groups"),
        sum(col("cnt")).cast("long").as("total_cnt")) ++
        mm.map(a => a.expr.as(a.alias)) ++
        (if (ratio)
          Seq(round(sum(col("ccnt")).cast("double") /
            when(totalD === 0.0, lit(null)).otherwise(totalD), 6).as("sel"))
        else Nil)
      l1.groupBy(key.expr.as("grp"))
        .agg(core.head, core.tail: _*)
        .orderBy("grp")
    }
  }

  /** v7 generator: nested aggregation over orders-per-customer or
    * lineitem-per-{supplier,part,order}. v1-v6 streams stay FROZEN; v7
    * gate seeds live at 9801+.
    */
  def sampleV7(seed: Long): Fuzzed = {
    val rnd = new Random(seed)
    // non-power-of-2 bound: nextInt(2)/nextBoolean() are top-bit-correlated
    // across sequential seeds and picked lineitem for 200 straight draws
    val (fact, gkeys) =
      if (rnd.nextInt(6) < 3) (orders, Seq("o_custkey"))
      else (lineitem, Seq("l_suppkey", "l_partkey", "l_orderkey"))
    val gkey = pick(rnd, gkeys)
    val preds = (0 until rnd.nextInt(2)).flatMap(_ => mkPred(rnd, fact.cols)).distinct
    val condPool = fact.cols.filterNot(_.name == gkey)
    val dbls = fact.cols.filter(_.kind == DblK)
    val ints = fact.cols.filter(c => c.kind == IntK && c.name != gkey)
    val condCnt = if (rnd.nextInt(3) > 0) mkPred(rnd, condPool).map(CondCnt) else None
    val condSum =
      if (rnd.nextInt(2) == 0)
        mkPred(rnd, condPool).map(p => CondDSum(p, pick(rnd, dbls).name))
      else None
    val plain: Option[AggFn] = rnd.nextInt(3) match {
      case 0 => Some(DSum(pick(rnd, dbls).name))
      case 1 => Some(SumInt(pick(rnd, ints).name))
      case _ => None
    }
    val l1Aggs = (condCnt.toSeq ++ condSum.toSeq ++ plain.toSeq).distinctBy(_.alias)
    val havingMin =
      if (rnd.nextInt(3) == 0) Some(2L + rnd.nextInt(3)) else None
    val key: NestKey =
      if (rnd.nextBoolean()) {
        val (lo, hi) = pick(rnd, Seq((2L, 5L), (3L, 8L), (5L, 15L), (10L, 30L)))
        CntBand(lo, hi)
      } else CntMod(2 + rnd.nextInt(3))
    val mm: Seq[AggFn] =
      if (l1Aggs.isEmpty) Nil
      else {
        val a = pick(rnd, l1Aggs)
        Seq(if (rnd.nextBoolean()) MinC(a.alias) else MaxC(a.alias))
      }
    val ratio = condCnt.nonEmpty && rnd.nextInt(2) == 0
    NestSample(seed, fact, gkey, preds, l1Aggs, havingMin, key, mm, ratio)
  }

  // ---- v8: the analytic window-function surface ---------------------------

  sealed trait WfShape
  /** LAG/LEAD with explicit typed defaults over the unique-key order. */
  final case class WfLagLead(x: String, lagN: Int, leadN: Int) extends WfShape
  /** RANK + NTILE over a value ordering with unique-key tie-break. */
  final case class WfRankTile(x: String, tiles: Int, desc: Boolean) extends WfShape
  /** RANGE-framed decimal running sum over a single numeric order column.
    * RANGE frames include ALL peers of the current row, so the result is
    * deterministic even when the order column has ties — the property that
    * makes this shape differential-safe where a ROWS frame would need a
    * unique order.
    */
  final case class WfRangeSum(x: String, ordCol: String, prec: Long) extends WfShape

  /** v8 sample: LAG/LEAD (typed defaults), RANK/NTILE (tie-broken), and
    * RANGE-framed running sums — the analytic-function tier v1-v7 never
    * touched. All order columns are non-null keys or non-null doubles, so
    * engine null-placement defaults never engage; ties under RANK are
    * broken by the unique key, and RANGE frames are tie-immune by
    * definition.
    */
  final case class WfSample(seed: Long, fact: Table, pkey: String,
      preds: Seq[Pred], shape: WfShape) extends Fuzzed {

    private def uks = fact.uk

    def describe: String =
      s"v8 ${fact.name} per-$pkey ${shape.getClass.getSimpleName} " +
        s"preds=${preds.size}"

    private def whereSql =
      if (preds.isEmpty) "" else s"\nWHERE ${preds.map(_.sql).mkString(" AND ")}"
    private def ordSql = uks.mkString(", ")

    def sql: String = shape match {
      case WfLagLead(x, ln, dn) =>
        // the fact's uk is NOT unique (driver lineitem); appending x makes
        // tied rows fully interchangeable, so the lag/lead value sequence
        // is deterministic as a multiset on both engines
        val over = s"OVER (PARTITION BY $pkey ORDER BY $ordSql, $x)"
        s"SELECT ${uks.mkString(", ")}, $pkey, $x,\n" +
          s"  LAG($x, $ln, 0.0) $over AS lagv,\n" +
          s"  LEAD($x, $dn, -1.0) $over AS leadv\n" +
          s"FROM ${fact.name}$whereSql\nORDER BY $ordSql"
      case WfRankTile(x, t, desc) =>
        val dir = if (desc) "DESC" else "ASC"
        val over = s"OVER (PARTITION BY $pkey ORDER BY $x $dir, $ordSql)"
        s"SELECT ${uks.mkString(", ")}, $pkey, $x,\n" +
          s"  CAST(RANK() $over AS BIGINT) AS rnk,\n" +
          s"  CAST(NTILE($t) $over AS BIGINT) AS tile\n" +
          s"FROM ${fact.name}$whereSql\nORDER BY $ordSql"
      case WfRangeSum(x, oc, p) =>
        s"SELECT ${uks.mkString(", ")},\n" +
          s"  CAST(SUM(CAST($x AS DECIMAL(28,4))) OVER (PARTITION BY $pkey " +
          s"ORDER BY $oc RANGE BETWEEN $p PRECEDING AND CURRENT ROW) " +
          s"AS DOUBLE) AS wsum\n" +
          s"FROM ${fact.name}$whereSql\nORDER BY $ordSql"
    }

    def df(spark: SparkSession, dir: String): DataFrame = {
      val rel = preds.foldLeft(Tables.load(spark, dir, fact.name))(
        (d, p) => d.filter(p.expr))
      val dec = org.apache.spark.sql.types.DecimalType(28, 4)
      shape match {
        case WfLagLead(x, ln, dn) =>
          val w = Window.partitionBy(col(pkey))
            .orderBy(uks.map(col) :+ col(x): _*)
          rel.select(uks.map(col) ++ Seq(col(pkey), col(x),
            lag(col(x), ln, 0.0).over(w).as("lagv"),
            lead(col(x), dn, -1.0).over(w).as("leadv")): _*)
            .orderBy(uks.map(col): _*)
        case WfRankTile(x, t, desc) =>
          val ord = (if (desc) col(x).desc else col(x).asc) +: uks.map(col)
          val w = Window.partitionBy(col(pkey)).orderBy(ord: _*)
          rel.select(uks.map(col) ++ Seq(col(pkey), col(x),
            rank().over(w).cast("long").as("rnk"),
            ntile(t).over(w).cast("long").as("tile")): _*)
            .orderBy(uks.map(col): _*)
        case WfRangeSum(x, oc, p) =>
          val w = Window.partitionBy(col(pkey)).orderBy(col(oc))
            .rangeBetween(-p, Window.currentRow)
          rel.select(uks.map(col) :+
            sum(col(x).cast(dec)).over(w).cast("double").as("wsum"): _*)
            .orderBy(uks.map(col): _*)
      }
    }
  }

  /** v8 generator: analytic window functions over a keyed partition.
    * v1-v7 streams stay FROZEN; v8 gate seeds live at 10001+.
    */
  def sampleV8(seed: Long): Fuzzed = {
    val rnd = new Random(seed)
    // non-power-of-2 bound (see sampleV6/V7): sequential seeds decorrelate
    val (fact, pkey) = rnd.nextInt(6) match {
      case 0 | 1 => (orders, "o_custkey")
      case 2     => (lineitem, "l_suppkey")
      case 3     => (lineitem, "l_partkey")
      case _     => (customer, "c_nationkey")
    }
    val preds = (0 until rnd.nextInt(2)).flatMap(_ => mkPred(rnd, fact.cols)).distinct
    val dbls = fact.cols.filter(_.kind == DblK).map(_.name)
    val x = pick(rnd, dbls)
    val shape: WfShape = rnd.nextInt(3) match {
      case 0 => WfLagLead(x, 1 + rnd.nextInt(2), 1 + rnd.nextInt(3))
      case 1 => WfRankTile(x, 2 + rnd.nextInt(4), rnd.nextInt(6) < 3)
      case _ =>
        val oc = fact.uk.head // single numeric order column (ties allowed)
        WfRangeSum(x, oc, Seq(10L, 100L, 1000L)(rnd.nextInt(3)))
    }
    WfSample(seed, fact, pkey, preds, shape)
  }

  /** The fixed-seed samples registered as `q_fuzz_*` driver-gate queries —
    * cross-engine (Spark vs DuckDB) differential points. Seeds chosen once;
    * NEVER renumber (the driver compares against committed results).
    */
  val gateSeeds: Seq[Long] = Seq(
    9001L, 9002L, 9003L, 9004L, 9005L, 9006L,
    9007L, 9008L, 9009L, 9010L, 9011L, 9012L)

  /** v2 gate seeds → `q_fuzz_13`..`q_fuzz_21`; chosen once over the v2
    * shapes — band-group agg (9103), double-LEFT-JOIN agg (9104), EXCEPT
    * (9105), INTERSECT (9110), band projection (9113), UNION ALL (9124),
    * HAVING + ExprSum (9149, 9160), band + ExprSum agg (9187) — all
    * validated non-degenerate and DuckDB-green at sf0.001 AND sf0.01.
    * NEVER renumber.
    */
  val gateSeedsV2: Seq[Long] = Seq(
    9103L, 9104L, 9105L, 9110L, 9113L, 9124L, 9149L, 9160L, 9187L)

  /** v3 gate seeds → `q_fuzz_22`..`q_fuzz_29`; chosen once over the v3
    * features — OR-pred left-join agg (9301), windowed decimal sum
    * (9305), BETWEEN + COUNT DISTINCT + DSum (9307), LOWER/SUBSTRING
    * projection through a 2-join chain (9308), windowed int sum with
    * BETWEEN+IN (9315), LENGTH/UPPER over a LEFT join (9322),
    * nation-region LEFT-join scalar projection (9324), windowed sum over
    * a 2-join chain (9328) — all validated non-degenerate and
    * DuckDB-green at sf0.001 AND sf0.01. NEVER renumber.
    */
  val gateSeedsV3: Seq[Long] = Seq(
    9301L, 9305L, 9307L, 9308L, 9315L, 9322L, 9324L, 9328L)

  /** v4 gate seeds → `q_fuzz_30`..`q_fuzz_37`; chosen once over the v4
    * features — part+supplier star with EXISTS (9402), EXISTS plus a
    * scalar `>` threshold (9408), the full 4-dim star (9419), NOT EXISTS
    * with a `<=` scalar through orders→customer (9431), IN over an
    * orders→customer projection (9441), NOT IN with a `<` scalar on
    * customer→nation (9435), IN through a depth-2 star (9444), and IN
    * plus scalar on an orders→customer agg (9461) — all validated
    * non-degenerate and DuckDB-green at sf0.001 AND sf0.01. NEVER
    * renumber.
    */
  val gateSeedsV4: Seq[Long] = Seq(
    9402L, 9408L, 9419L, 9431L, 9441L, 9435L, 9444L, 9461L)

  /** v5 gate seeds → `q_fuzz_38`..`q_fuzz_45`; chosen once over the v5
    * surface — FULL OUTER with both-side filters and explicit null
    * placement: supplier⟗lineitem projection NULLS FIRST (9501),
    * orders⟗lineitem projection NULLS LAST (9506), part⟗lineitem agg
    * (9511), supplier⟗lineitem agg NULLS FIRST (9523), nation⟗customer
    * agg with both sides filtered (9560), nation⟗customer framed running
    * COUNT 1-PRECEDING (9524), orders⟗lineitem framed decimal running
    * SUM 3-PRECEDING over non-unique order keys (9530 — the tie-
    * regression shape), customer⟗orders unbounded running SUM (9526) —
    * all validated non-degenerate and DuckDB-green at sf0.001 AND
    * sf0.01. NEVER renumber.
    */
  val gateSeedsV5: Seq[Long] = Seq(
    9501L, 9506L, 9511L, 9523L, 9560L, 9524L, 9530L, 9526L)

  /** v6 gate seeds → `q_fuzz_46`..`q_fuzz_53`; chosen once over the v6
    * temporal surface — year-bucketed INTERVAL-shifted agg through the
    * lineitem⋈orders fact join (9602), week bucket + shift + timestamp
    * BETWEEN + date min/max agg (9606), extraction projection with a
    * BETWEEN pred (9616), month-bucketed join agg (9619),
    * quarter + shift + BETWEEN (9674), extraction projection THROUGH the join
    * (9666), year bucket + BETWEEN + date min/max on l_shipdate (9705),
    * month + shift + BETWEEN + date min/max (9726) — all validated
    * non-degenerate and DuckDB-green at sf0.001 AND sf0.01. NEVER
    * renumber.
    */
  val gateSeedsV6: Seq[Long] = Seq(
    9602L, 9606L, 9616L, 9619L, 9674L, 9666L, 9705L, 9726L)

  /** v7 gate seeds → `q_fuzz_54`..`q_fuzz_61`; chosen once over the v7
    * nested-aggregation surface — orders-per-customer banded distribution
    * with a plain decimal sum (9801), the full three-term level-1
    * (conditional count + conditional decimal sum + int sum) with HAVING
    * and the NULLIF ratio (9802), band + conditional sum (9813),
    * the bare-count pure-Q13 distribution with HAVING over
    * lineitem-per-supplier (9817), band + HAVING + ratio (9822),
    * lineitem-per-part mod-key with conditional and plain sums + ratio
    * (9843), per-supplier ratio with a plain decimal sum (9889), and
    * per-part band with an int sum (9896) — all validated non-degenerate
    * (≥2 level-2 groups) and DuckDB-green at sf0.001 AND sf0.01. NEVER
    * renumber.
    */
  val gateSeedsV7: Seq[Long] = Seq(
    9801L, 9802L, 9813L, 9817L, 9822L, 9843L, 9889L, 9896L)

  /** v8 gate seeds → `q_fuzz_62`..`q_fuzz_69`; chosen once over the v8
    * analytic-window surface — customer LAG/LEAD (10002), lineitem
    * RANGE-framed running sum with a pred (10003), orders RANK+NTILE
    * (10005), customer RANGE sum (10008), orders RANGE sum with a pred
    * (10011), lineitem LAG/LEAD with a pred over the NON-unique
    * (l_orderkey, l_linenumber) order — the tie shape the 200-seed sweep
    * flagged until the window order appended the value column (10016),
    * orders LAG/LEAD with a pred (10017), lineitem RANK+NTILE over 6000
    * rows (10021) — all validated non-degenerate and DuckDB-green at
    * sf0.001 AND sf0.01. NEVER renumber.
    */
  val gateSeedsV8: Seq[Long] = Seq(
    10002L, 10003L, 10005L, 10008L, 10011L, 10016L, 10017L, 10021L)

  val defs: Seq[QueryDef] =
    gateSeeds.map { s =>
      val smp = sample(s)
      QueryDef(f"q_fuzz_${s - 9000}%02d",
        (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    } ++ gateSeedsV2.zipWithIndex.map { case (s, i) =>
      val smp = sampleV2(s)
      QueryDef(f"q_fuzz_${13 + i}%02d",
        (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    } ++ gateSeedsV3.zipWithIndex.map { case (s, i) =>
      val smp = sampleV3(s)
      QueryDef(f"q_fuzz_${22 + i}%02d",
        (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    } ++ gateSeedsV4.zipWithIndex.map { case (s, i) =>
      val smp = sampleV4(s)
      QueryDef(f"q_fuzz_${30 + i}%02d",
        (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    } ++ gateSeedsV5.zipWithIndex.map { case (s, i) =>
      val smp = sampleV5(s)
      QueryDef(f"q_fuzz_${38 + i}%02d",
        (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    } ++ gateSeedsV6.zipWithIndex.map { case (s, i) =>
      val smp = sampleV6(s)
      QueryDef(f"q_fuzz_${46 + i}%02d",
        (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    } ++ gateSeedsV7.zipWithIndex.map { case (s, i) =>
      val smp = sampleV7(s)
      QueryDef(f"q_fuzz_${54 + i}%02d",
        (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    } ++ gateSeedsV8.zipWithIndex.map { case (s, i) =>
      val smp = sampleV8(s)
      QueryDef(f"q_fuzz_${62 + i}%02d",
        (spark, dir) => smp.df(spark, dir),
        Some(smp.sql))
    }
}
