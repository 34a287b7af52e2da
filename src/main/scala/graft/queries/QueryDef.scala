package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark implementation plus (when the
  * semantics are SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Oracle-less entries get the driver's weaker rows-only check.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *   - every query ends in a total ORDER BY (unique key tie-break);
  *   - no raw `sum(double)` in the output — double aggregation order is
  *     partition-dependent in Spark; instead both sides compute
  *     `cast(sum(cast(x as decimal(18,4))) as double)` which is exact;
  *   - column names are aliased identically on both sides.
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Decimal-safe double sum, Spark side (see DuckDB twin in oracles). */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    sum(c.cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double")
  }
  /** DuckDB twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,4))) AS DOUBLE)"
}
