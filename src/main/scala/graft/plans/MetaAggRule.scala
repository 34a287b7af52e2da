package graft.plans

import graft.sinks.TableManifest.FileEntry
import graft.sinks.{TableManifest, ZoneMap}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, NamedExpression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Planner seam for metadata-only aggregate answering: a global or
  * partition-filtered `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)`
  * over a manifest-committed versioned table collapses to a
  * [[LocalRelation]] holding the answer — ZERO scan tasks, O(files) driver
  * work, invariant to table size. SQL users get it for free once the rule
  * is registered ([[graft.GraftExtensions]]); the reference's users just
  * wrote SQL against Athena (AthenaUtil.scala:30-113) and relied on the
  * warehouse to shortcut these — this is the Spark-native equivalent, the
  * manifest-stats analogue of Spark's own `OptimizeMetadataOnlyQuery`
  * (which handles partition columns only and cannot do counts at all).
  *
  * Soundness gates (the rewrite fires only when ALL hold):
  *   - the aggregate's child is the relation under only column-pruning
  *     projections and [[Filter]]s exactly decidable FILE-BY-FILE: a
  *     conjunct over columns SINGLE-VALUED in a file (partition columns;
  *     min == max with provably zero nulls) evaluates on the constants,
  *     and a plain comparison over a stats-covered column decides
  *     three-valued against the file's [min, max] window + null count
  *     (all-true / all-false / straddling — [[ZoneMap.triMatch]]), so
  *     `WHERE ts < cut` on a range-clustered table forms a provable
  *     sub-table. Any file where any conjunct is undecidable refuses the
  *     whole rewrite — never a partial guess;
  *   - the relation is a single-root parquet scan under a committed
  *     [[TableManifest]]; unfiltered aggregates demand the scan's file set
  *     be EXACTLY the manifest's ([[ManifestEvidence.exact]] — totality of
  *     evidence), filtered ones demand every scanned file be IN the
  *     manifest ([[ManifestEvidence.covering]] — the retained Filter
  *     semantics apply to the scan's own file set, which catalog partition
  *     pruning may already have narrowed);
  *   - every aggregate is answerable from [[ZoneMap]]'s Option-typed API
  *     in a stats domain that maps LOSSLESSLY onto the column's Catalyst
  *     type (long↔integrals, double↔float/double, ASCII string, date,
  *     UTC-adjusted micro/milli timestamps, same-scale decimals via the
  *     manifest's unscaled-long "dec" domain). Unknown null counts, mixed
  *     domains, filtered aggregates → no rewrite, the scan runs; DISTINCT
  *     answers only where provable ([[answerDistinct]]) and refuses
  *     SUM/AVG DISTINCT outright.
  *     There is no "probably right" path.
  *
  * `spark.graft.metaAgg.enabled=false` disables the rule.
  */
object MetaAggRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.metaAgg.enabled", "true") != "true")
      return plan
    plan.transformDown {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        rewrite(agg, aggExprs, child).getOrElse(agg)
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if groupings.nonEmpty && groupings.forall(_.isInstanceOf[AttributeReference]) =>
        rewriteGrouped(agg,
          groupings.map(_.asInstanceOf[AttributeReference]), aggExprs, child)
          .getOrElse(agg)
    }
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
      m <- evidence(child)
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

  /** The single value a column provably holds in EVERY row of one file —
    * or None when the file cannot prove single-valuedness. Single-valued
    * means min == max AND provably zero nulls: a file with {v, null} would
    * otherwise fold its null rows (a separate SQL group / a row the filter
    * must judge as NULL) into v. min/max ignore nulls, so the range alone
    * cannot prove it. An all-null column ("null" typ) is the constant NULL.
    */
  private def singleValue(fe: FileEntry, a: AttributeReference): Option[Any] =
    fe.stats.flatMap(_.get(a.name)).flatMap[Any] {
      case cs if cs.typ == "null" => Some(null)
      case cs if cs.min == cs.max && cs.nulls == 0L =>
        internalValue(cs, cs.min, a.dataType).map(normalizeKey)
      case _ => None // multi-valued (or not provably null-free)
    }

  private def groupedRows(keys: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression],
      m: TableManifest.Manifest): Option[Seq[InternalRow]] = {
    // per file, the single value of every grouping column — or refuse
    val fileKeys: Seq[Option[Seq[Any]]] =
      m.files.map(fe => traverseOpt(keys.map(k => singleValue(fe, k))))
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
        // a deterministic scalar over GROUP KEYS ONLY (e.g. the
        // CAST(band AS BIGINT) the optimizer collapses into the
        // aggregate) is per-group constant: evaluate it on the group's
        // key values — exact, because the keys are exact
        case Alias(e, _) if e.deterministic && e.references.nonEmpty &&
            !e.exists(x => x.isInstanceOf[AggregateExpression] ||
              x.isInstanceOf[PlanExpression[_]]) &&
            e.references.forall(r => keyIndex.contains(r.exprId)) =>
          try {
            val bound = e.transform {
              case a: AttributeReference => BoundReference(
                keyIndex.indexOf(a.exprId), a.dataType, nullable = true)
            }
            Some(bound.eval(InternalRow.fromSeq(keyVals)))
          } catch { case _: Exception => None } // eval error: refuse
        case e => answer(e, subM)
      }).map(InternalRow.fromSeq)
    }
    traverseOpt(out)
  }

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] =
    for {
      m <- evidence(child)
      values <- traverseOpt(aggExprs.map(answer(_, m)))
    } yield LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))

  private def traverseOpt[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** The manifest restricted to exactly the rows the aggregate's child
    * produces — or None when no proof exists. Unfiltered children demand
    * file-set totality ([[ManifestEvidence.exact]]); a Filter chain
    * demands containment ([[ManifestEvidence.covering]] — the scan's own
    * file set, possibly already partition-pruned, is what the retained
    * predicate governs) and then keeps the files whose per-file constant
    * values satisfy every conjunct, recomputing the sub-manifest's row
    * count from per-file footer counts.
    */
  private def evidence(child: LogicalPlan): Option[TableManifest.Manifest] =
    unwrap(child).flatMap { case (rel, conds) =>
      if (conds.isEmpty) ManifestEvidence.exact(rel)
      else ManifestEvidence.covering(rel)
        .flatMap { case (_, m) => applyConds(conds, m) }
    }

  /** The child qualifies only as a parquet file scan under attribute-only
    * projections (column pruning changes nothing the manifest proves) and
    * Filters (collected as conjuncts for per-file evaluation); anything
    * else might change rows or values — refuse.
    */
  private def unwrap(plan: LogicalPlan)
      : Option[(HadoopFsRelation, Seq[Expression])] =
    plan match {
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(c)
      case Filter(cond, c) =>
        unwrap(c).map { case (rel, cs) =>
          (rel, splitConjunctivePredicates(cond) ++ cs) }
      case l: LogicalRelation => l.relation match {
        case hfs: HadoopFsRelation => Some((hfs, Nil))
        case _ => None
      }
      case _ => None
    }

  /** Keep the files whose rows PROVABLY all satisfy every conjunct, drop
    * the files where provably none do — exact SQL Filter semantics
    * decided file-by-file on two kinds of evidence, per conjunct:
    *
    *   - EXACT: every referenced column single-valued in the file
    *     (min == max, zero nulls) → evaluate the conjunct on the
    *     constants (NULL/false both mean "no row passes");
    *   - INTERVAL (r12 verdict #2): a plain `attr (cmp) literal`
    *     comparison over a stats-covered column three-valued against the
    *     file's [min, max] window + null count ([[ZoneMap.triMatch]]:
    *     all-true needs range containment AND proven zero nulls;
    *     all-false needs only disjointness), plus IS [NOT] NULL decided
    *     from the null accounting. This is what answers
    *     `count(*) WHERE ts < cut` from the manifest on a range-
    *     clustered table whose files are multi-valued.
    *
    * A file where ANY conjunct is undecidable — it straddles the cut, the
    * evidence is missing, the shape is foreign — refuses the WHOLE
    * rewrite: a partial answer is never served. Nondeterministic or
    * subquery conjuncts refuse up front.
    */
  private def applyConds(conds: Seq[Expression],
      m: TableManifest.Manifest): Option[TableManifest.Manifest] =
    try {
      if (conds.exists(c => !c.deterministic ||
        c.exists(_.isInstanceOf[PlanExpression[_]]))) return None
      val evals = conds.map(conjunctTri)
      val kept = Seq.newBuilder[FileEntry]
      m.files.foreach { fe =>
        val tris = evals.map(_(fe))
        if (tris.contains(Some(false))) () // provably no row passes: drop
        else if (tris.forall(_.contains(true))) kept += fe // all rows pass
        else return None // straddles / no evidence: refuse, the scan runs
      }
      val files = kept.result()
      Some(m.copy(files = files,
        rowCount =
          if (files.forall(_.rows >= 0)) files.map(_.rows).sum else -1L))
    } catch { case _: Exception => None } // refusal, never a guess

  /** Per-file three-valued evaluator for one conjunct: exact single-value
    * evaluation when every referenced column is constant in the file,
    * else interval evidence for the recognized comparison shapes.
    */
  private def conjunctTri(c: Expression): FileEntry => Option[Boolean] = {
    val refs = c.references.toSeq.collect { case a: AttributeReference => a }
    val idx = refs.map(_.exprId).zipWithIndex.toMap
    val bound =
      if (refs.size == c.references.size)
        Some(c.transform {
          case a: AttributeReference =>
            BoundReference(idx(a.exprId), a.dataType, nullable = true)
        })
      else None
    fe => {
      val exact = bound.flatMap { b =>
        val vals = refs.map(a => singleValue(fe, a))
        if (vals.exists(_.isEmpty)) None
        else Some(b.eval(InternalRow.fromSeq(vals.map(_.get))) == true)
      }
      exact.orElse(intervalTri(c, fe))
    }
  }

  /** Interval evidence for one recognized comparison shape over one file —
    * Some(allRowsPass), or None when the shape/evidence can't decide.
    * Strictness is preserved exactly (unlike the zone-map listing path's
    * closed relaxation, all-TRUE proofs must not widen `>` to `>=`).
    */
  private def intervalTri(c: Expression, fe: FileEntry): Option[Boolean] = {
    def ext(v: Any, dt: DataType): Option[Any] =
      ZoneMapScanRule.external(v, dt)
    def tri(a: AttributeReference, op: String, v: Any,
        dt: DataType): Option[Boolean] =
      ext(v, dt).flatMap(ZoneMap.triMatch(fe, a.name, op, _))
    c match {
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        tri(a, ">=", v, dt)
      case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
        tri(a, ">", v, dt)
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        tri(a, "<=", v, dt)
      case LessThan(a: AttributeReference, Literal(v, dt)) =>
        tri(a, "<", v, dt)
      case EqualTo(a: AttributeReference, Literal(v, dt)) =>
        tri(a, "=", v, dt)
      // flipped literal-first forms mirror with the inverted operator
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        tri(a, "<=", v, dt)
      case GreaterThan(Literal(v, dt), a: AttributeReference) =>
        tri(a, "<", v, dt)
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        tri(a, ">=", v, dt)
      case LessThan(Literal(v, dt), a: AttributeReference) =>
        tri(a, ">", v, dt)
      case EqualTo(Literal(v, dt), a: AttributeReference) =>
        tri(a, "=", v, dt)
      case IsNotNull(a: AttributeReference) => nullTri(a, fe, wantNull = false)
      case IsNull(a: AttributeReference) => nullTri(a, fe, wantNull = true)
      case _ => None
    }
  }

  /** IS [NOT] NULL decided from the file's null accounting. */
  private def nullTri(a: AttributeReference, fe: FileEntry,
      wantNull: Boolean): Option[Boolean] =
    fe.stats.flatMap(_.get(a.name)).flatMap { cs =>
      if (cs.typ == "null") Some(wantNull) // every row is NULL
      else if (cs.nulls == 0L) Some(!wantNull)
      else if (cs.nulls > 0L && fe.rows >= 0 && cs.nulls == fe.rows)
        Some(wantNull)
      else None // mixed or unknown count
    }

  /** The internal-format answer for one output expression, or None when
    * the manifest cannot prove it.
    */
  private def answer(e: NamedExpression, m: TableManifest.Manifest): Option[Any] =
    e match {
      case Alias(child, _) => answerExpr(child, m)
      case _ => None
    }

  /** A bare aggregate, a literal, or a deterministic scalar TREE over
    * answerable aggregates (`CAST(sum(x) AS DOUBLE)`, `sum(x) / 100` —
    * the shapes CollapseProject folds into the aggregate list): every
    * AggregateExpression leaf answers from the manifest, the remaining
    * row-independent scalar evaluates on those exact literals. Any outer
    * column reference, subquery, or unanswerable leaf refuses.
    */
  private def answerExpr(e: Expression, m: TableManifest.Manifest): Option[Any] =
    e match {
      case lit: Literal => Some(lit.value)
      case ae: AggregateExpression => answerAgg(ae, m)
      case _ if e.deterministic &&
          !e.exists(_.isInstanceOf[PlanExpression[_]]) &&
          e.exists(_.isInstanceOf[AggregateExpression]) =>
        try {
          var ok = true
          val replaced = e.transform {
            case ae: AggregateExpression => answerAgg(ae, m) match {
              case Some(v) => Literal(v, ae.dataType)
              case None => ok = false; ae
            }
          }
          // any reference SURVIVING the agg substitution is a row-level
          // column the scalar would read per-row — refuse
          if (!ok || replaced.references.nonEmpty) None
          else Some(replaced.eval(InternalRow.empty))
        } catch { case _: Exception => None } // eval error: refuse
      case _ => None
    }

  private def answerAgg(ae: AggregateExpression,
      m: TableManifest.Manifest): Option[Any] = {
    if (ae.filter.isDefined) return None
    if (ae.isDistinct) return answerDistinct(ae, m)
    ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null => ZoneMap.metaCount(m)
      case Count(Seq(a: AttributeReference)) =>
        if (a.nullable) ZoneMap.metaNonNullCount(m, a.name)
        else ZoneMap.metaCount(m)
      case Min(a: AttributeReference) =>
        ZoneMap.metaRange(m, a.name).flatMap(cs => internalValue(cs, cs.min, a.dataType))
      case Max(a: AttributeReference) =>
        ZoneMap.metaRange(m, a.name).flatMap(cs => internalValue(cs, cs.max, a.dataType))
      // SUM from recorded per-file sums (TableManifest.enrichSums) or
      // single-valued evidence; exact domains only. The answer is the
      // TRUE mathematical sum, so it agrees with execution under every
      // eval mode — when it can't (long overflow, precision overflow,
      // where LEGACY would wrap and ANSI would throw), refuse and let
      // the scan reproduce Spark's own semantics.
      case s: Sum => s.child match {
        case a: AttributeReference => sumValue(m, a, s.dataType)
        case _ => None
      }
      // AVG only in the decimal domain: the exact manifest sum and exact
      // non-null count are substituted into Average's OWN finish
      // expression (`evaluateExpression` with the sum/count buffer
      // attributes bound to literals) and evaluated — so the divide runs
      // at Spark's intermediate precision/scale and the checked cast
      // applies under the session's real decimal config, bit-equal to
      // execution by construction (incl. allowPrecisionLoss=false
      // returning NULL where a hand-rounded quotient would differ — r13
      // ADVICE). A sum that doesn't fit the buffer type, or an eval
      // error (ANSI overflow), refuses and lets the scan decide.
      // Integral/float AVG divides in DOUBLE inside Spark (order-
      // dependent low bits) — refuse rather than answer with a value a
      // re-run scan might not bit-match.
      case avg: Average => (avg.child, avg.dataType) match {
        case (a: AttributeReference, _: DecimalType)
            if a.dataType.isInstanceOf[DecimalType] =>
          ZoneMap.metaSum(m, a.name).flatMap { case (sum, nonNull, scale) =>
            if (a.dataType.asInstanceOf[DecimalType].scale != scale && nonNull > 0) None
            else if (nonNull == 0L) Some(null)
            else try {
              val sumAttr = avg.aggBufferAttributes.head
              val cntAttr = avg.aggBufferAttributes(1)
              val sumDt = sumAttr.dataType.asInstanceOf[DecimalType]
              val sumDec = Decimal(sum)
              // a true sum that overflows the buffer type → scan decides
              if (!sumDec.changePrecision(sumDt.precision, sumDt.scale)) None
              else {
                val bound = avg.evaluateExpression.transform {
                  case ar: AttributeReference if ar.exprId == sumAttr.exprId =>
                    Literal(sumDec, sumDt)
                  case ar: AttributeReference if ar.exprId == cntAttr.exprId =>
                    Literal(nonNull)
                }
                if (bound.references.nonEmpty) None // unexpected shape
                else Some(bound.eval(InternalRow.empty))
              }
            } catch { case _: Exception => None }
          }
        case _ => None
      }
      case _ => None
    }
  }

  /** DISTINCT aggregates the manifest can still prove:
    *
    *   - `MIN/MAX(DISTINCT col)` equal their non-distinct forms (the
    *     extremum of a set is the extremum of its distinct values) —
    *     answered by stripping the modifier;
    *   - `COUNT(DISTINCT col)` when EVERY file is single-valued in the
    *     column (partition columns; constant null-free files) or all-null:
    *     the distinct count is the number of distinct per-file constants,
    *     nulls excluded — the `count(distinct source)` shape users run
    *     against partitioned lakes, O(files) with no shuffle at all.
    *
    * Everything else (multi-valued files, SUM/AVG DISTINCT — those
    * change the result) refuses.
    */
  private def answerDistinct(ae: AggregateExpression,
      m: TableManifest.Manifest): Option[Any] =
    ae.aggregateFunction match {
      case Min(a: AttributeReference) =>
        ZoneMap.metaRange(m, a.name).flatMap(cs => internalValue(cs, cs.min, a.dataType))
      case Max(a: AttributeReference) =>
        ZoneMap.metaRange(m, a.name).flatMap(cs => internalValue(cs, cs.max, a.dataType))
      case Count(Seq(a: AttributeReference)) =>
        val perFile = m.files.map(fe => singleValue(fe, a))
        if (perFile.exists(_.isEmpty)) None
        else Some(perFile.flatten.filter(_ != null)
          .map(normalizeKey).distinct.size.toLong)
      case _ => None
    }

  /** SUM(attr) from [[ZoneMap.metaSum]], produced at the Sum expression's
    * own result type. Zero non-null rows → SQL NULL.
    */
  private def sumValue(m: TableManifest.Manifest, a: AttributeReference,
      resultType: DataType): Option[Any] =
    ZoneMap.metaSum(m, a.name).flatMap { case (sum, nonNull, scale) =>
      (a.dataType, resultType) match {
        case (LongType | IntegerType | ShortType | ByteType, LongType) =>
          if (nonNull == 0L) Some(null)
          else if (scale == 0 && sum.isValidLong) Some(sum.toLongExact)
          else None // out of long range: let the scan decide wrap-vs-throw
        case (cd: DecimalType, rt: DecimalType) if cd.scale == rt.scale =>
          if (nonNull == 0L) Some(null)
          else if (scale != cd.scale) None
          else try {
            val exact = sum.setScale(rt.scale)
            Some(org.apache.spark.sql.types.Decimal(
              exact, rt.precision, rt.scale))
          } catch { case _: Exception => None }
        case _ => None
      }
    }

  /** Lossless (stats domain → Catalyst type) conversions only; any other
    * pairing refuses. Stats never exist for NaN-carrying float ranges or
    * non-ASCII strings (TableManifest drops them at commit), so every value
    * here is exact.
    */
  private def internalValue(cs: graft.sinks.TableManifest.ColStats, v: String,
      dt: DataType): Option[Any] =
    (cs.typ, dt) match {
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
      case ("dec", d: DecimalType) =>
        // (unscaled, scale) reconstructs the exact value; it must rescale
        // EXACTLY to the column's scale (setScale throws on any rounding)
        // and fit its precision — else refuse, never round
        try {
          val exact = BigDecimal(BigInt(v.toLong), cs.scale).setScale(d.scale)
          Some(org.apache.spark.sql.types.Decimal(exact, d.precision, d.scale))
        } catch { case _: Exception => None }
      case _ => None
    }
}
