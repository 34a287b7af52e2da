package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryDef.{dsum, dsumSql}

/** Subquery surface of the full-SQL tier (SURVEY.md §2.5 A4).
  *
  * The reference delegates arbitrary SELECTs over produced tables to Athena
  * (common/.../util/aws/AthenaUtil.scala:30-113) — which means EXISTS /
  * NOT EXISTS / IN / correlated scalar subqueries are all part of the
  * contract a user of the reference can run today. This file covers that
  * surface with the classic TPC-H subquery shapes (Q4/Q13/Q17/Q18/Q22,
  * adapted to the driver-generated star schema), deliberately expressed as
  * `spark.sql` text so Catalyst's subquery machinery is what's under test:
  * RewritePredicateSubquery turns EXISTS/IN into left-semi and NOT EXISTS
  * into left-anti joins, and RewriteCorrelatedScalarSubquery turns
  * per-group scalar aggregates into aggregate-then-join — exactly the
  * decomposition we'd hand-write, but derived by the optimizer. The
  * PlanAuditSpec entries pin that: no cartesian products, no nested-loop
  * execution of a correlated probe per outer row.
  *
  * Determinism (driver hash-compare): every aggregate threshold that feeds
  * a predicate is either integral (COUNT) or the decimal-exact dsum cast,
  * and division is algebraically removed (x < avg ⇔ x·n < sum, n > 0) so
  * neither engine's double-summation order nor division rounding can flip
  * a boundary row.
  *
  * Scale notes (100 TB stance):
  *   - the decorrelated aggregates group on the correlation key, so they
  *     are one partial-agg shuffle at fact grain — never a per-row rescan;
  *   - semi/anti join sides that scale are left to AQE (broadcast at small
  *     SF, shuffled-hash/SMJ at 100×) with no forced broadcast hints;
  *   - GROUPING SETS plans through a single Expand (rows × #sets) feeding
  *     one partial aggregate — not one job per set;
  *   - pivot passes its value list explicitly, skipping the extra distinct
  *     scan Spark otherwise runs to discover pivot columns.
  */
object Subqueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** spark.sql over the registered table views (Tables.registerAll). */
  private def sql(s: SparkSession, d: String, text: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(text)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- TPC-H Q4 shape: EXISTS with a correlated inequality --------------
    // Priority census of one order-date quarter, keeping only orders that
    // have at least one lineitem shipped after the order date. The EXISTS
    // carries an equality (orderkey) plus an inequality (shipdate >
    // orderdate) — Catalyst rewrites it to ONE left-semi join with the
    // mixed condition, probing the fact once, not per outer row.
    QueryDef(
      "q_tpch_q4",
      (s, d) => sql(s, d,
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          |  AND o_orderdate <  TIMESTAMP '1997-10-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin),
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
             |  AND o_orderdate <  TIMESTAMP '1997-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- TPC-H Q13 shape: customer order-count distribution ---------------
    // Left-outer join with an extra ON predicate (≠ 1-URGENT), counted at
    // customer grain, then the histogram of those counts. DataFrame form:
    // pre-filtering the right side IS the extra ON condition for an outer
    // join, and COUNT(o_orderkey) over the null-extended rows yields 0 for
    // order-less customers. Two partial-agg shuffles total (custkey, then
    // c_count) — both map-side combined.
    QueryDef(
      "q_tpch_q13",
      (s, d) => {
        val cust = t(s, d, "customer").select("c_custkey")
        val ord = t(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey) per_cust
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ---- TPC-H Q17 shape: correlated scalar aggregate ---------------------
    // Revenue of small-quantity lineitems of one brand, "small" meaning
    // below 20% of that part's average quantity. Two correlated scalar
    // subqueries (COUNT, decimal SUM) — decorrelated into ONE aggregate
    // over lineitem at partkey grain joined back to the probe, not a
    // rescan per row. The avg comparison is scaled by the count
    // (q·5·n < Σq) so no division ever happens: the threshold is exact on
    // both engines.
    QueryDef(
      "q_tpch_q17",
      (s, d) => sql(s, d,
        s"""SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly,
           |       COUNT(*) AS n_small
           |FROM lineitem JOIN part ON p_partkey = l_partkey
           |WHERE p_brand = 'Brand#23'
           |  AND l_quantity * 5.0 * CAST(
           |        (SELECT COUNT(*) FROM lineitem l2
           |         WHERE l2.l_partkey = p_partkey) AS DOUBLE)
           |      < (SELECT ${dsumSql("l2.l_quantity")} FROM lineitem l2
           |         WHERE l2.l_partkey = p_partkey)""".stripMargin),
      Some(
        s"""SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly,
           |       COUNT(*) AS n_small
           |FROM lineitem JOIN part ON p_partkey = l_partkey
           |WHERE p_brand = 'Brand#23'
           |  AND l_quantity * 5.0 * CAST(
           |        (SELECT COUNT(*) FROM lineitem l2
           |         WHERE l2.l_partkey = p_partkey) AS DOUBLE)
           |      < (SELECT ${dsumSql("l2.l_quantity")} FROM lineitem l2
           |         WHERE l2.l_partkey = p_partkey)""".stripMargin)),

    // ---- TPC-H Q18 shape: IN over a grouped HAVING subquery ---------------
    // Large-volume orders: the IN list is itself an aggregate (orders whose
    // total quantity exceeds 200) — rewritten to a left-semi join against
    // the aggregated fact, so the fact is scanned twice but aggregated
    // map-side both times; the HAVING threshold uses the decimal-exact sum.
    QueryDef(
      "q_tpch_q18",
      (s, d) => sql(s, d,
        s"""SELECT c_name, c_custkey, o_orderkey,
           |       date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
           |       o_totalprice, ${dsumSql("l_quantity")} AS sum_qty
           |FROM customer
           |JOIN orders   ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE o_orderkey IN (
           |  SELECT l_orderkey FROM lineitem
           |  GROUP BY l_orderkey
           |  HAVING ${dsumSql("l_quantity")} > 200.0)
           |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
           |ORDER BY o_totalprice DESC, o_orderkey
           |LIMIT 100""".stripMargin),
      Some(
        s"""SELECT c_name, c_custkey, o_orderkey,
           |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           |       o_totalprice, ${dsumSql("l_quantity")} AS sum_qty
           |FROM customer
           |JOIN orders   ON c_custkey = o_custkey
           |JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE o_orderkey IN (
           |  SELECT l_orderkey FROM lineitem
           |  GROUP BY l_orderkey
           |  HAVING ${dsumSql("l_quantity")} > 200.0)
           |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
           |ORDER BY o_totalprice DESC, o_orderkey
           |LIMIT 100""".stripMargin)),

    // ---- TPC-H Q22 shape: NOT EXISTS + uncorrelated scalar threshold ------
    // Above-average-balance customers with no recent urgent order, by
    // segment. The scalar pair (COUNT, decimal SUM over positive balances)
    // is uncorrelated → computed once and broadcast into the predicate;
    // NOT EXISTS becomes a left-anti join on custkey. The avg threshold is
    // count-scaled (bal·n > Σbal) — division-free, exact on both engines.
    QueryDef(
      "q_tpch_q22",
      (s, d) => sql(s, d,
        s"""SELECT c_mktsegment, COUNT(*) AS numcust,
           |       ${dsumSql("c_acctbal")} AS totacctbal
           |FROM customer
           |WHERE c_acctbal * CAST(
           |        (SELECT COUNT(*) FROM customer c2
           |         WHERE c2.c_acctbal > 0.0) AS DOUBLE)
           |      > (SELECT ${dsumSql("c2.c_acctbal")} FROM customer c2
           |         WHERE c2.c_acctbal > 0.0)
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey
           |                    AND o_orderpriority = '1-URGENT'
           |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin),
      Some(
        s"""SELECT c_mktsegment, COUNT(*) AS numcust,
           |       ${dsumSql("c_acctbal")} AS totacctbal
           |FROM customer
           |WHERE c_acctbal * CAST(
           |        (SELECT COUNT(*) FROM customer c2
           |         WHERE c2.c_acctbal > 0.0) AS DOUBLE)
           |      > (SELECT ${dsumSql("c2.c_acctbal")} FROM customer c2
           |         WHERE c2.c_acctbal > 0.0)
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey
           |                    AND o_orderpriority = '1-URGENT'
           |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin)),

    // ---- Pivot: long → wide with an explicit value list -------------------
    // Revenue per (segment × priority) as a wide row per segment. Passing
    // the five priority values explicitly matters at scale: without them
    // Spark runs an extra distinct scan of the fact just to learn the
    // column set. The oracle is the FILTER-clause spelling of the same
    // pivot — wide aggregates in one pass on both engines.
    QueryDef(
      "q_pivot_priority",
      (s, d) => {
        val ord = t(s, d, "orders")
          .select("o_custkey", "o_orderpriority", "o_totalprice")
        val cust = t(s, d, "customer").select("c_custkey", "c_mktsegment")
        ord.join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(dsum(col("o_totalprice")))
          .select(col("c_mktsegment"),
            col("1-URGENT").as("urgent"), col("2-HIGH").as("high"),
            col("3-MEDIUM").as("medium"), col("4-NOT SPECIFIED").as("notspec"),
            col("5-LOW").as("low"))
          .orderBy("c_mktsegment")
      },
      Some {
        def f(p: String) =
          s"CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) FILTER (WHERE o_orderpriority = '$p') AS DOUBLE)"
        s"""SELECT c_mktsegment,
           |  ${f("1-URGENT")} AS urgent,
           |  ${f("2-HIGH")} AS high,
           |  ${f("3-MEDIUM")} AS medium,
           |  ${f("4-NOT SPECIFIED")} AS notspec,
           |  ${f("5-LOW")} AS low
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin
      }),

    // ---- GROUPING SETS: region/nation rollup lattice in one pass ----------
    // Supplier census at (region, nation), (region), and grand-total
    // grains. Spark plans this as a single Expand (3 copies of each input
    // row, one per set) into one partial aggregate — one shuffle, not one
    // job per grain. Identical SQL runs on both engines; COALESCE labels
    // the super-aggregate rows so the output carries no NULL group keys.
    QueryDef(
      "q_grouping_sets",
      (s, d) => sql(s, d,
        s"""SELECT COALESCE(r_name, 'ALL') AS region,
           |       COALESCE(n_name, 'ALL') AS nation,
           |       COUNT(*) AS n_sup,
           |       ${dsumSql("s_acctbal")} AS bal
           |FROM supplier
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
           |ORDER BY region, nation""".stripMargin),
      Some(
        s"""SELECT COALESCE(r_name, 'ALL') AS region,
           |       COALESCE(n_name, 'ALL') AS nation,
           |       COUNT(*) AS n_sup,
           |       ${dsumSql("s_acctbal")} AS bal
           |FROM supplier
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
           |ORDER BY region, nation""".stripMargin))
  )
}
