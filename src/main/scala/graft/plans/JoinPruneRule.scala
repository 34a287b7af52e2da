package graft.plans

import graft.sinks.ZoneMap
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, max, min}

/** Planner seam for dim-driven join file pruning — the automatic twin of
  * [[graft.operators.JoinPrune.factForEquiJoin]], and the manifest-side
  * analogue of dynamic file pruning / runtime filters: when an equi-join
  * pairs a manifest-committed fact scan with a small, result-stable build
  * side, the build side's distinct key set is collected AT PLANNING TIME
  * (the same bounded build-side materialization Spark's own DPP performs)
  * and turned into a driver-side file-skipping proof against the fact's
  * zone maps ([[ZoneMap.pruneInSet]]). Fact files provably holding no join
  * partner are never LISTED — scan tasks for them are never created.
  * Spark's DPP prunes partition directories only; its runtime bloom
  * filters still schedule a task per file. At 100 TB the listing is the
  * first decision that matters, and this makes it from metadata alone.
  * The reference delegated join execution (and any partition elimination)
  * to its warehouse (AthenaUtil.scala:61-160).
  *
  * Soundness. The join node is LEFT IN PLACE, so surviving rows are
  * re-matched exactly — pruning is strictly a listing optimization. A file
  * is dropped only when its recorded [min, max] window provably contains
  * no key EQUAL to any build-side key (EqualTo conjuncts only — never
  * `<=>`, whose NULL <=> NULL = true a null-free key-set proof cannot
  * cover). Which side may be pruned depends on the join type — the pruned
  * side must be one whose partner-free rows cannot reach the output:
  * Inner (both sides), LeftSemi (both), LeftOuter (right side only),
  * RightOuter (left only), LeftAnti (right only — a right row matching no
  * left key never flips any left row's match-existence). The key
  * attribute must reach the scan through value-preserving nodes only
  * (Project/Filter/Join/Union/Generate, or an Aggregate grouping BY the
  * key): a Window or Limit between scan and join could change SURVIVING
  * rows' values when files are dropped, so those shapes refuse. An
  * embedded outer join needs no refusal: pruning can only add
  * null-extended rows whose key IS NULL, and the retained top-level
  * equi-join discards them.
  *
  * The build side is executed twice (once collected here, once by the
  * real join), so it must be RESULT-STABLE: every node from a
  * deterministic whitelist, no Limit/Offset/Sample/Tail (their result
  * sets are execution-order-dependent), no streaming source, every
  * expression deterministic — and every relation LEAF a source whose two
  * executions provably see the same rows (literals, Range, file scans;
  * a mutable JDBC/custom source could return new keys between the two
  * executions, silently dropping already-pruned fact rows, so it
  * refuses). Data-file immutability between the two executions is the
  * versioned-table contract (commits write new version dirs; files never
  * mutate in place).
  *
  * EVERY equi-conjunct composes — a two-key join refines the kept file
  * set with both keys' probes (a surviving file must pass every conjunct,
  * the same conjunct semantics ZoneMapScanRule applies to bounds) — and
  * BOTH sides are attempted when the join type allows: an inner join of
  * two manifest-backed tables prunes each side's listing by the other's
  * keys, each computed against the other side's ORIGINAL plan (dropping a
  * partner-free row can never create or destroy a different row's
  * partner, so the two prunes don't interact).
  *
  * Cost gates: the build side's estimated size must be within
  * `spark.graft.joinPrune.maxDimBytes` (default: the session's
  * autoBroadcastJoinThreshold — the same "this side is small" judgment
  * that picks broadcast joins), the key collection is capped at
  * `spark.graft.joinPrune.maxKeys` distinct keys (overflow degrades to a
  * 1-row min/max aggregate and a range proof), and a rewrite only lands
  * when it provably skips at least one file. `spark.graft.joinPrune
  * .enabled=false` disables the rule. Every refusal path — no manifest,
  * foreign files, unstable build side, lossy key domain, nothing
  * skippable, any exception — leaves the plan untouched.
  */
object JoinPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Re-entrancy guard: collecting the build side runs the optimizer on
    * this thread again; the nested pass must not fire this rule.
    */
  private val inRule = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (inRule.get || conf.getConfString(
        "spark.graft.joinPrune.enabled", "true") != "true") return plan
    plan.transformUp {
      case j: Join => rewrite(j).getOrElse(j)
    }
  }

  /** Join types → which children may be pruned (partner-free rows of that
    * side cannot reach the output).
    */
  private def prunableSides(t: JoinType): (Boolean, Boolean) = t match {
    case Inner | LeftSemi => (true, true)
    case LeftOuter | LeftAnti => (false, true)
    case RightOuter => (true, false)
    case _ => (false, false)
  }

  private def rewrite(j: Join): Option[Join] = {
    val (leftOk, rightOk) = prunableSides(j.joinType)
    if (!leftOk && !rightOk) return None
    val conjuncts = j.condition.map(splitConjunctivePredicates).getOrElse(Nil)
    // oriented equi pairs: (left-side key, right-side key)
    val equis = conjuncts.collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
        (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if j.left.outputSet.contains(b) && j.right.outputSet.contains(a) =>
        (b, a)
    }
    if (equis.isEmpty) return None
    // every equi-conjunct composes (a surviving file must pass EVERY key's
    // probe — conjunct semantics, like ZoneMapScanRule's bounds), and both
    // sides are attempted when the join type allows: an inner join between
    // two manifest-backed tables prunes each side by the other's keys.
    // Build-side key sets are collected once per dim attribute.
    val collected =
      scala.collection.mutable.Map.empty[Long, Option[KeySet]]
    def keysOf(dim: LogicalPlan, k: AttributeReference): Option[KeySet] =
      collected.getOrElseUpdate(k.exprId.id, collectKeys(dim, k))
    val newLeft =
      if (leftOk) pruneSide(j.left, j.right, equis, keysOf) else None
    val newRight =
      if (rightOk) pruneSide(j.right, j.left, equis.map(_.swap), keysOf)
      else None
    if (newLeft.isEmpty && newRight.isEmpty) None
    else Some(j.copy(left = newLeft.getOrElse(j.left),
      right = newRight.getOrElse(j.right)))
  }

  /** The build side's evidence for one key: the distinct non-null key set,
    * or its [min, max] when the set exceeds `maxKeys`.
    */
  private type KeySet = Either[(Option[Any], Option[Any]), Seq[Any]]

  /** `factSide` with every manifest-eligible scan its keys reach pruned by
    * the dim side's key sets — None when nothing proves a skip.
    */
  private def pruneSide(factSide: LogicalPlan, dimSide: LogicalPlan,
      keys: Seq[(AttributeReference, AttributeReference)],
      keysOf: (LogicalPlan, AttributeReference) => Option[KeySet])
      : Option[LogicalPlan] =
    try {
      if (!resultStable(dimSide) || !dimSmall(dimSide)) return None
      // keys grouped by the scan INSTANCE they reach through value-
      // preserving nodes (reference identity — a self-join's structurally
      // equal scans are distinct prune targets, and a key must only ever
      // refine the scan its own attribute came from)
      val byScan = keys.flatMap { case (fk, dk) =>
        pathToScan(factSide, fk).map(scan => (scan, fk, dk))
      }
      val groups = byScan.foldLeft(
        Vector.empty[(LogicalRelation,
          Vector[(AttributeReference, AttributeReference)])]) {
        case (acc, (s, fk, dk)) =>
          acc.indexWhere(_._1.eq(s)) match {
            case -1 => acc :+ (s -> Vector((fk, dk)))
            case i => acc.updated(i, acc(i)._1 -> (acc(i)._2 :+ ((fk, dk))))
          }
      }
      val pruned = groups.flatMap { case (scan, pairs) =>
        pruneScan(scan, pairs, dimSide, keysOf).map(scan -> _)
      }
      if (pruned.isEmpty) None
      else Some(pruned.foldLeft(factSide) { case (side, (scan, idx)) =>
        val hfs = scan.relation.asInstanceOf[HadoopFsRelation]
        side.transformUp {
          case l: LogicalRelation if l.eq(scan) =>
            l.copy(relation = hfs.copy(location = idx)(hfs.sparkSession))
        }
      })
    } catch { case _: Exception => None } // refusal, never a guess

  /** The pruned FileIndex for one fact scan, refined by every key pair
    * that reaches it — None when gates refuse or nothing is skippable.
    */
  private def pruneScan(scan: LogicalRelation,
      pairs: Seq[(AttributeReference, AttributeReference)],
      dimSide: LogicalPlan,
      keysOf: (LogicalPlan, AttributeReference) => Option[KeySet])
      : Option[ZoneMapPrunedIndex] = {
    val hfs = scan.relation.asInstanceOf[HadoopFsRelation]
    ManifestEvidence.covering(hfs).flatMap { case (root, m) =>
      // benefit gate (the judgment Spark's own DPP applies): collecting
      // the build side is a PLANNING-TIME job, only worth paying when
      // the fact is big enough that skipped files buy back more than
      // the collection costs. Tiny facts refuse — scanning them whole
      // is cheaper than planning their prune.
      val totalBytes = m.files.map(_.bytes).sum
      if (totalBytes < conf.getConfString(
        "spark.graft.joinPrune.minFactBytes", (32L << 20).toString).toLong ||
        m.files.size <= 1) None
      else {
        // each key pair refines the kept set independently; a pair whose
        // key set can't carry a proof contributes nothing (never widens)
        val kept = pairs.foldLeft(m.files) { case (cur, (fk, dk)) =>
          keysOf(dimSide, dk).flatMap {
            case scala.util.Right(ks) =>
              // key-set zone-map probe, then the bloom sidecar refines —
              // on an UNCLUSTERED fact only the blooms can prove skips
              ZoneMap.pruneInSet(m.copy(files = cur), fk.name, ks)
                .map { case (k0, _) =>
                  graft.sinks.BloomIndex.pruneAmong(root, k0, fk.name,
                    ks, m.files.size, totalBytes).map(_._1).getOrElse(k0)
                }
            case scala.util.Left((lo, hi)) =>
              val b = ZoneMap.Bound(fk.name, lower = lo, upper = hi,
                nonNull = true)
              Some(ZoneMap.prune(m.copy(files = cur), Seq(b))._1)
          }.getOrElse(cur)
        }
        if (kept.size >= m.files.size) None // nothing provable — don't touch
        else {
          val rep = ZoneMap.PruneReport(m.files.size, kept.size,
            totalBytes, kept.map(_.bytes).sum)
          Some(new ZoneMapPrunedIndex(hfs.location,
            kept.map(fe => graft.sinks.TableManifest
              .resolved(root, fe).normalize.toString).toSet,
            rep))
        }
      }
    }
  }

  /** The unique manifest-eligible scan the key attribute reaches through
    * value-preserving nodes only. Project/Filter/Union/Generate pass rows
    * (and the key column) through unchanged; a Join can at most add
    * null-extended rows whose key is NULL (discarded by the retained
    * top-level equi-join); an Aggregate is sound only when the key is one
    * of its grouping ATTRIBUTES — then every group a dropped file touched
    * has a partner-free key. Anything else (Window, Limit, Expand, …)
    * could change surviving rows' values, so the walk refuses.
    */
  private def pathToScan(p: LogicalPlan,
      key: AttributeReference): Option[LogicalRelation] = p match {
    case l: LogicalRelation if l.outputSet.contains(key) =>
      l.relation match {
        case h: HadoopFsRelation if !h.location.isInstanceOf[ZoneMapPrunedIndex]
          => Some(l)
        case _ => None
      }
    case _: Project | _: Filter | _: Join | _: Union | _: Generate |
         _: SubqueryAlias =>
      p.children.filter(_.outputSet.contains(key)) match {
        case Seq(c) => pathToScan(c, key)
        case _ => None
      }
    case a: Aggregate if a.groupingExpressions.exists {
      case ar: AttributeReference => ar.exprId == key.exprId
      case _ => false
    } => pathToScan(a.child, key)
    case _ => None
  }

  /** Result-stable build side: executing it twice yields the same row
    * set. Whitelisted relational nodes only, every expression
    * deterministic, nothing execution-order-dependent
    * (Limit/Offset/Sample/Tail), no streaming source.
    */
  private def resultStable(p: LogicalPlan): Boolean =
    !p.isStreaming && p.collectFirst {
      case n if !stableNode(n) => n
      case n if n.expressions.exists(!_.deterministic) => n
    }.isEmpty

  private def stableNode(n: LogicalPlan): Boolean = n match {
    // relation leaves: only sources whose TWO executions provably see the
    // same rows qualify — literals, Range, and file scans (HadoopFsRelation
    // snapshots its file listing; data files are immutable under the
    // versioned-table contract). A mutable external source (JDBC, a custom
    // BaseRelation) can return NEW keys between the planning-time
    // collection and the real join, and fact files holding those keys
    // would already be pruned — silent row loss, so such leaves refuse.
    case l: LogicalRelation => l.relation.isInstanceOf[HadoopFsRelation]
    case _: LocalRelation | _: OneRowRelation | _: Range => true
    case _: Project | _: Filter | _: Join | _: Aggregate | _: Union |
         _: Distinct | _: Generate | _: Sort | _: Window | _: Expand |
         _: SubqueryAlias | _: RepartitionOperation => true
    case _ => false
  }

  private def dimSmall(dim: LogicalPlan): Boolean = {
    val cap = conf.getConfString("spark.graft.joinPrune.maxDimBytes", "")
      match {
        case "" =>
          val b = conf.autoBroadcastJoinThreshold
          if (b > 0) b else 10L << 20
        case s => s.toLong
      }
    dim.stats.sizeInBytes <= BigInt(cap)
  }

  /** The build side's distinct non-null keys (Right), or its [min, max]
    * when the set exceeds `maxKeys` (Left — the O(1)-driver fallback).
    * None when even the range is unknowable (all-null/empty dim still
    * returns Right(empty): every fact file is provably partner-free).
    */
  private def collectKeys(dim: LogicalPlan,
      key: AttributeReference): Option[KeySet] = {
    val maxKeys = conf.getConfString(
      "spark.graft.joinPrune.maxKeys", "100000").toInt
    inRule.set(true)
    try {
      // null filter + projection built logically (no name resolution —
      // duplicate or exotic column names in the build side can't bite),
      // then renamed to a clean handle for the API calls
      val ds = org.apache.spark.sql.GraftSqlBridge.ofRows(
        org.apache.spark.sql.SparkSession.active,
        Project(Seq(key), Filter(IsNotNull(key), dim))).toDF("k")
      val rows = ds.distinct().limit(maxKeys + 1).collect()
      if (rows.length <= maxKeys)
        Some(scala.util.Right(rows.toSeq.map(_.get(0))))
      else {
        val r = ds.agg(min(col("k")), max(col("k")), count(col("k"))).head
        if (r.isNullAt(0)) None
        else Some(scala.util.Left((Option(r.get(0)), Option(r.get(1)))))
      }
    } finally inRule.set(false)
  }
}
