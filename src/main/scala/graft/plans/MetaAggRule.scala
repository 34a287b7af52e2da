package graft.plans

import graft.sinks.{TableManifest, ZoneMap}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Planner seam for metadata-only aggregate answering: a global (ungrouped,
  * unfiltered) `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` over a
  * manifest-committed versioned table collapses to a [[LocalRelation]]
  * holding the answer — ZERO scan tasks, O(files) driver work, invariant to
  * table size. SQL users get it for free once the rule is registered
  * ([[graft.GraftExtensions]]); the reference's users just wrote SQL against
  * Athena (AthenaUtil.scala:30-113) and relied on the warehouse to shortcut
  * these — this is the Spark-native equivalent, the manifest-stats analogue
  * of Spark's own `OptimizeMetadataOnlyQuery` (which handles partition
  * columns only).
  *
  * Soundness gates (the rewrite fires only when ALL hold):
  *   - the aggregate's child is the BARE relation (or a column-pruning
  *     projection of it) — any surviving filter/expression disqualifies;
  *   - the relation is a single-root parquet scan whose root directory
  *     carries a committed [[TableManifest]], and the scan's enumerated
  *     file set is EXACTLY the manifest's file set — a foreign file or a
  *     stale manifest refuses the proof (the stats were lifted from those
  *     very footers, so identity of the file set is identity of evidence);
  *   - every aggregate is answerable from [[ZoneMap]]'s Option-typed API
  *     in a stats domain that maps LOSSLESSLY onto the column's Catalyst
  *     type (long↔integrals, double↔float/double, ASCII string, date,
  *     UTC-adjusted micro/milli timestamps). Unknown null counts, mixed
  *     domains, decimals, distinct/filtered aggregates → no rewrite, the
  *     scan runs. There is no "probably right" path.
  */
object MetaAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _) =>
      rewrite(agg, aggExprs, child).getOrElse(agg)
    case agg @ Aggregate(groupings, aggExprs, child, _)
        if groupings.nonEmpty && groupings.forall(_.isInstanceOf[AttributeReference]) =>
      rewriteGrouped(agg,
        groupings.map(_.asInstanceOf[AttributeReference]), aggExprs, child)
        .getOrElse(agg)
  }

  /** GROUP BY over columns that are SINGLE-VALUED per file (partition
    * columns — their dir-derived stats have min == max; any range-
    * clustered column where every file's min equals its max also
    * qualifies): each group is a set of whole files, so its COUNT(*) is
    * the sum of per-file footer row counts, its COUNT(col)/MIN/MAX are
    * the group's sub-manifest answers — the manifest-stats generalization
    * of Spark's OptimizeMetadataOnlyQuery. Any file where a grouping
    * column is multi-valued, unconvertible, or missing stats refuses the
    * whole rewrite. An empty table yields zero groups — exactly grouped-
    * aggregate semantics.
    */
  private def rewriteGrouped(agg: Aggregate, keys: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] =
    for {
      rel <- bareScan(child)
      m <- ManifestEvidence.exact(rel)
      rows <- groupedRows(keys, aggExprs, m)
    } yield LocalRelation(agg.output, rows)

  /** Grouping-key normalization mirroring Spark's NormalizeFloatingNumbers:
    * -0.0 and 0.0 are ONE group, but their boxed forms are not equal —
    * left unnormalized, two files constant at -0.0 and 0.0 would split a
    * group Spark's aggregation merges.
    */
  private def normalizeKey(v: Any): Any = v match {
    case d: Double if d == 0.0 => 0.0
    case f: Float if f == 0.0f => 0.0f
    case other => other
  }

  private def groupedRows(keys: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression],
      m: TableManifest.Manifest): Option[Seq[InternalRow]] = {
    // per file, the single value of every grouping column — or refuse
    val fileKeys: Seq[Option[Seq[Any]]] = m.files.map { fe =>
      traverseOpt(keys.map { k =>
        fe.stats.flatMap(_.get(k.name)).flatMap[Any] {
          case cs if cs.typ == "null" => Some(null) // NULL group key
          // single-valued means min == max AND provably zero nulls: a file
          // with {v, null} would otherwise fold its null rows (a separate
          // SQL group!) into v's group. min/max ignore nulls, so the range
          // alone cannot prove single-valuedness.
          case cs if cs.min == cs.max && cs.nulls == 0L =>
            internalValue(cs.typ, cs.min, k.dataType).map(normalizeKey)
          case _ => None // multi-valued (or not provably null-free)
        }
      })
    }
    if (fileKeys.exists(_.isEmpty)) return None
    val groups = m.files.zip(fileKeys.flatten).groupBy(_._2)
    val keyIndex = keys.map(_.exprId)
    val out = groups.toSeq.map { case (keyVals, members) =>
      val files = members.map(_._1)
      val groupRows =
        if (files.forall(_.rows >= 0)) files.map(_.rows).sum else -1L
      val subM = m.copy(files = files, rowCount = groupRows)
      traverseOpt(aggExprs.map {
        case a: AttributeReference if keyIndex.contains(a.exprId) =>
          Some(keyVals(keyIndex.indexOf(a.exprId)))
        case Alias(a: AttributeReference, _) if keyIndex.contains(a.exprId) =>
          Some(keyVals(keyIndex.indexOf(a.exprId)))
        case e => answer(e, subM)
      }).map(InternalRow.fromSeq)
    }
    traverseOpt(out)
  }

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] =
    for {
      rel <- bareScan(child)
      m <- ManifestEvidence.exact(rel)
      values <- traverseOpt(aggExprs.map(answer(_, m)))
    } yield LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))

  private def traverseOpt[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** The child qualifies only as a bare parquet file scan, optionally
    * under an attribute-only projection (column pruning changes nothing
    * the manifest proves; anything else might).
    */
  private def bareScan(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        bareScan(c)
      case l: LogicalRelation => l.relation match {
        case hfs: HadoopFsRelation => Some(hfs)
        case _ => None
      }
      case _ => None
    }

  /** The internal-format answer for one output expression, or None when
    * the manifest cannot prove it.
    */
  private def answer(e: NamedExpression, m: TableManifest.Manifest): Option[Any] =
    e match {
      case Alias(child, _) => child match {
        case lit: Literal => Some(lit.value)
        case ae: AggregateExpression => answerAgg(ae, m)
        case _ => None
      }
      case _ => None
    }

  private def answerAgg(ae: AggregateExpression,
      m: TableManifest.Manifest): Option[Any] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null => ZoneMap.metaCount(m)
      case Count(Seq(a: AttributeReference)) =>
        if (a.nullable) ZoneMap.metaNonNullCount(m, a.name)
        else ZoneMap.metaCount(m)
      case Min(a: AttributeReference) =>
        ZoneMap.metaRange(m, a.name).flatMap(cs => internalValue(cs.typ, cs.min, a.dataType))
      case Max(a: AttributeReference) =>
        ZoneMap.metaRange(m, a.name).flatMap(cs => internalValue(cs.typ, cs.max, a.dataType))
      case _ => None
    }
  }

  /** Lossless (stats domain → Catalyst type) conversions only; any other
    * pairing refuses. Stats never exist for NaN-carrying float ranges or
    * non-ASCII strings (TableManifest drops them at commit), so every value
    * here is exact.
    */
  private def internalValue(typ: String, v: String, dt: DataType): Option[Any] =
    (typ, dt) match {
      case ("long", LongType) => Some(v.toLong)
      case ("long", IntegerType) =>
        val l = v.toLong
        if (l.isValidInt) Some(l.toInt) else None
      case ("long", ShortType) =>
        val l = v.toLong
        if (l >= Short.MinValue && l <= Short.MaxValue) Some(l.toShort) else None
      case ("long", ByteType) =>
        val l = v.toLong
        if (l >= Byte.MinValue && l <= Byte.MaxValue) Some(l.toByte) else None
      case ("double", DoubleType) => Some(v.toDouble)
      case ("double", FloatType) =>
        // float stats were widened losslessly to double at commit; a value
        // that doesn't narrow back bit-exactly came from a real double
        val d = v.toDouble
        if (d.toFloat.toDouble == d || d.isNaN) Some(d.toFloat) else None
      case ("string", StringType) => Some(UTF8String.fromString(v))
      case ("date", DateType) =>
        val l = v.toLong
        if (l.isValidInt) Some(l.toInt) else None
      case ("tsus", TimestampType) => Some(v.toLong)
      case ("tsms", TimestampType) =>
        try Some(Math.multiplyExact(v.toLong, 1000L))
        catch { case _: ArithmeticException => None }
      case _ => None
    }
}
