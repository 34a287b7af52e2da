package graft.plans

import graft.sinks.ZoneMap
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types._

/** Planner seam for zone-map file skipping: a `Filter` whose range/equality
  * conjuncts constrain stats-covered columns of a manifest-committed
  * versioned table gets its scan's [[FileIndex]] swapped for a
  * [[ZoneMapPrunedIndex]] that simply never lists the provably-disjoint
  * files — scan tasks for skipped files are never created. SQL users write
  * `WHERE n_chars BETWEEN a AND b` and the manifest prunes for them, the
  * automatic twin of the explicit
  * [[graft.sinks.ObjectStoreSink.readVersionPruned]] API (which remains the
  * version-pinning entry point). The reference delegated exactly this to
  * its warehouse's metadata layer (AthenaUtil.scala:61-160).
  *
  * Soundness: the Filter node is LEFT IN PLACE, so the surviving files are
  * re-filtered exactly — pruning is strictly a listing optimization, and
  * every refusal path (no manifest, foreign file in the dir, no convertible
  * bound, nothing provably skippable) degrades to the unmodified plan.
  * Bound extraction is conservative: only direct `attr (cmp) literal`
  * conjuncts (=, <=>, <, <=, >, >=, literal IN-lists relaxed to their
  * [min, max], IS [NOT] NULL, LIKE-prefix) in losslessly-convertible
  * domains become bounds; strict comparisons weaken to closed bounds (a
  * superset — sound). DISJUNCTIONS prune through per-file may-match
  * trees: a file drops only when EVERY Or-branch is provably disjoint
  * from it (`lo1..hi1 OR lo2..hi2` skips the files between the bands —
  * the row-group-filter semantics Parquet applies inside a file, lifted
  * to the listing). Equality/IN leaves INSIDE a disjunction also carry
  * their exact key set and resolve against the per-file Bloom sidecar,
  * so `id = a OR id = b` prunes on UNCLUSTERED layouts where every
  * branch's [k, k] window spans every file. Anything else (casts,
  * functions) is ignored rather than approximated.
  *
  * At 100 TB the win is the same as Delta/Iceberg data skipping: the
  * driver drops files in O(files) metadata work instead of scheduling a
  * task per file to discover row-group disjointness one executor at a
  * time.
  */
object ZoneMapScanRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // kill-switch, matching the other planner seams' spark.graft.*.enabled
    // convention — lets a session (or a bench isolating per-rule overhead)
    // turn the seam off without rebuilding extensions
    if (conf.getConfString(
        "spark.graft.zoneMapScan.enabled", "true") != "true") return plan
    plan.transformDown {
      case f @ Filter(cond, l: LogicalRelation) =>
        rewrite(cond, l).map(nl => Filter(cond, nl)).getOrElse(f)
      // the rename projection (RefResolveRule: alias-only Project mapping
      // PHYSICAL attributes back to logical names) sits between Filter and
      // relation on rename-evolved tables — substitute the aliases into
      // the condition so bounds extract under the PHYSICAL names the
      // manifest's stats are keyed by; the Filter/Project stay in place,
      // pruning remains a listing decision
      case f @ Filter(cond,
          p @ org.apache.spark.sql.catalyst.plans.logical.Project(
            projList, l: LogicalRelation))
          if projList.forall {
            case _: AttributeReference => true
            case a: Alias => a.child.isInstanceOf[AttributeReference]
            case _ => false
          } =>
        val sub: Map[ExprId, AttributeReference] = projList.collect {
          case a: Alias =>
            a.exprId -> a.child.asInstanceOf[AttributeReference]
          case ar: AttributeReference => ar.exprId -> ar
        }.toMap
        val physCond = cond.transform {
          case ar: AttributeReference => sub.getOrElse(ar.exprId, ar)
        }
        rewrite(physCond, l)
          .map(nl => Filter(cond, p.copy(child = nl))).getOrElse(f)
    }
  }

  private def rewrite(cond: Expression,
      l: LogicalRelation): Option[LogicalRelation] = l.relation match {
    case hfs: HadoopFsRelation
        if !hfs.location.isInstanceOf[ZoneMapPrunedIndex] =>
      for {
        // covering (⊆), not exact: partition-pruned catalog scans whose
        // surviving files the manifest vouches for still qualify
        (root, m) <- ManifestEvidence.covering(hfs)
        conjuncts = splitConjunctivePredicates(cond)
        preds = extractBounds(conjuncts)
        keySets = extractKeySets(conjuncts)
        // disjunctive conjuncts (`a BETWEEN .. OR a BETWEEN ..`, cross-
        // column ORs) become per-file may-match TREES: a file drops only
        // when EVERY Or-branch is provably disjoint from it
        orTrees0 = conjuncts.collect { case o: Or => mayTree(o) }
          .filter(canProve)
        if preds.nonEmpty || keySets.nonEmpty || orTrees0.nonEmpty
        idx <- {
          val (kept0, rep0) = ZoneMap.prune(m, preds)
          // equality/IN conjuncts additionally probe the per-file bloom
          // sidecar ([[graft.sinks.BloomIndex]]) — the skipping proof for
          // UNCLUSTERED layouts whose zone-map windows all span the
          // predicate. Each key set refines independently (conjunct
          // semantics: a surviving file must pass every probe).
          val totalBytes = m.files.map(_.bytes).sum
          val (kept1, _) = keySets.foldLeft((kept0, rep0)) {
            case ((k, r), (c, ks)) =>
              graft.sinks.BloomIndex
                .pruneAmong(root, k, c, ks, m.files.size, totalBytes)
                .getOrElse((k, r))
          }
          // key-set leaves inside the trees resolve against the bloom
          // sidecar ONCE per distinct (column, keys) — each becomes the
          // set of files that may hold one of its keys, giving Or-of-
          // points pruning on unclustered layouts where every branch's
          // [k, k] window spans every file (r12 verdict #1)
          val orTrees = orTrees0.map(resolveKeys(_, root, m, totalBytes,
            collection.mutable.Map.empty)).filter(canProve)
          val kept = kept1.filter(fe =>
            orTrees.forall(t => mayMatchTree(t, fe)))
          val rep = ZoneMap.PruneReport(m.files.size, kept.size,
            totalBytes, kept.map(_.bytes).sum)
          if (rep.filesSkipped == 0) None // nothing provable — don't touch
          else {
            val keep = kept.map(fe => graft.sinks.TableManifest
              .resolved(root, fe).normalize.toString).toSet
            Some(new ZoneMapPrunedIndex(hfs.location, keep, rep))
          }
        }
      } yield l.copy(relation = hfs.copy(location = idx)(hfs.sparkSession))
    case _ => None
  }

  /** COW evidence for SQL DML ([[GraftSqlParser]]'s DELETE / UPDATE):
    * split a committed snapshot's files into (mayMatch, provablyClean)
    * under `cond` — an ANALYZED + OPTIMIZED boolean over the table's
    * columns (typed literals, casts folded — the shapes the extractors
    * match). A file lands in `clean` only when some conjunct of `cond`
    * is PROVABLY unsatisfied by every row of the file: zone-map range
    * disjointness, Bloom key-set absence, or a may-match tree over
    * And/Or shapes — the same proofs the scan rule prunes with, reused
    * as "this DELETE/UPDATE cannot touch this file, hard-link it".
    * Refusal is per-file and conservative: no evidence → mayMatch.
    */
  def splitByPredicate(root: java.nio.file.Path,
      m: graft.sinks.TableManifest.Manifest, cond: Expression)
      : (Seq[graft.sinks.TableManifest.FileEntry],
         Seq[graft.sinks.TableManifest.FileEntry]) = {
    val conjuncts = splitConjunctivePredicates(cond)
    val totalBytes = m.files.map(_.bytes).sum
    val cache =
      collection.mutable.Map.empty[(String, Seq[Any]), Option[Set[String]]]
    val trees = conjuncts
      .map(c => resolveKeys(mayTree(c), root, m, totalBytes, cache))
      .filter(canProve)
    if (trees.isEmpty) (m.files, Nil)
    else m.files.partition(fe => trees.forall(t => mayMatchTree(t, fe)))
  }

  /** COW evidence for SQL MERGE: split the files into (mayMatch,
    * provablyClean) against the source's equi-key sets — one
    * `(targetColumn, distinct source keys)` per ON conjunct. A match
    * requires EVERY key column equal, so a file provably holding none of
    * ANY one column's keys is clean: no source row can match a row in it
    * (zone-map key-window proof, refined by the Bloom sidecar — the
    * [[JoinPruneRule]] probe, reused as merge-touchability evidence).
    */
  def splitByKeySets(root: java.nio.file.Path,
      m: graft.sinks.TableManifest.Manifest, keySets: Seq[(String, Seq[Any])])
      : (Seq[graft.sinks.TableManifest.FileEntry],
         Seq[graft.sinks.TableManifest.FileEntry]) = {
    val totalBytes = m.files.map(_.bytes).sum
    val kept = keySets.foldLeft(m.files) { case (cur, (c, ks)) =>
      ZoneMap.pruneInSet(m.copy(files = cur), c, ks).map { case (k0, _) =>
        graft.sinks.BloomIndex.pruneAmong(root, k0, c, ks,
          m.files.size, totalBytes).map(_._1).getOrElse(k0)
      }.getOrElse(cur)
    }
    val keptSet = kept.map(_.path).toSet
    (kept, m.files.filterNot(fe => keptSet(fe.path)))
  }

  /** Per-file may-match tree for arbitrary And/Or predicate shapes — the
    * row-group-filter generalization of the conjunct-only path. Leaves
    * reuse [[extractBounds]]' single-expression shapes; equality/IN
    * leaves ALSO carry their exact key set ([[MayKeys]]) for bloom-
    * sidecar resolution; anything unconvertible becomes [[MayUnknown]]
    * (always matches — sound).
    */
  private sealed trait MayTree
  private case object MayUnknown extends MayTree
  private final case class MayLeaf(b: ZoneMap.Bound) extends MayTree
  private final case class MayKeys(col: String, keys: Seq[Any]) extends MayTree
  private final case class MayFiles(paths: Set[String]) extends MayTree
  private final case class MayAll(cs: Seq[MayTree]) extends MayTree
  private final case class MayAny(cs: Seq[MayTree]) extends MayTree

  private def mayTree(e: Expression): MayTree = e match {
    case And(a, b) => MayAll(Seq(mayTree(a), mayTree(b)))
    case Or(a, b) => MayAny(Seq(mayTree(a), mayTree(b)))
    case other =>
      val bound = extractBounds(Seq(other)).headOption.map(MayLeaf.apply)
      val keys = extractKeySets(Seq(other)).headOption
        .map { case (c, ks) => MayKeys(c, ks) }
      (bound, keys) match {
        case (Some(b), Some(k)) => MayAll(Seq(b, k)) // both proofs apply
        case (Some(b), None) => b
        case (None, Some(k)) => k
        case _ => MayUnknown
      }
  }

  /** Resolve every [[MayKeys]] leaf into the set of files that may hold
    * one of its keys, by ONE bloom-sidecar probe pass per distinct
    * (column, keys) — or [[MayUnknown]] when the sidecar can't answer
    * (no shard, foreign key domain, probe budget): no proof, keep.
    */
  private def resolveKeys(t: MayTree, root: java.nio.file.Path,
      m: graft.sinks.TableManifest.Manifest, totalBytes: Long,
      cache: collection.mutable.Map[(String, Seq[Any]), Option[Set[String]]])
      : MayTree = t match {
    case MayKeys(c, ks) =>
      cache.getOrElseUpdate((c, ks),
        graft.sinks.BloomIndex
          .pruneAmong(root, m.files, c, ks, m.files.size, totalBytes)
          .map(_._1.map(_.path).toSet))
        .map(MayFiles.apply).getOrElse(MayUnknown)
    case MayAll(cs) =>
      MayAll(cs.map(resolveKeys(_, root, m, totalBytes, cache)))
    case MayAny(cs) =>
      MayAny(cs.map(resolveKeys(_, root, m, totalBytes, cache)))
    case other => other
  }

  /** A tree that can never prove a skip (an Or with ANY unknown branch,
    * an And of unknowns) isn't worth evaluating per file.
    */
  private def canProve(t: MayTree): Boolean = t match {
    case MayUnknown => false
    case _: MayLeaf => true
    case _: MayKeys => true // resolves against the bloom sidecar
    case _: MayFiles => true
    case MayAll(cs) => cs.exists(canProve)
    case MayAny(cs) => cs.forall(canProve)
  }

  private def mayMatchTree(t: MayTree,
      fe: graft.sinks.TableManifest.FileEntry): Boolean = t match {
    case MayUnknown => true
    case MayLeaf(b) => ZoneMap.mayMatch(fe, b)
    case MayKeys(_, _) => true // unresolved: no proof, keep
    case MayFiles(paths) => paths.contains(fe.path)
    case MayAll(cs) => cs.forall(mayMatchTree(_, fe))
    case MayAny(cs) => cs.exists(mayMatchTree(_, fe))
  }

  /** Conjuncts of the shape `attr (cmp) literal` become [[ZoneMap.Bound]]s.
    * Sides that don't convert losslessly are dropped (pruning on fewer
    * constraints keeps more files — always sound); strict inequalities
    * use their closed relaxation for the same reason.
    */
  private def extractBounds(conjuncts: Seq[Expression]): Seq[ZoneMap.Bound] =
    conjuncts.flatMap {
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        mk(a, lo = Some((v, dt)), up = None)
      case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
        mk(a, lo = Some((v, dt)), up = None)
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        mk(a, lo = None, up = Some((v, dt)))
      case LessThan(a: AttributeReference, Literal(v, dt)) =>
        mk(a, lo = None, up = Some((v, dt)))
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        mk(a, lo = None, up = Some((v, dt)))
      case GreaterThan(Literal(v, dt), a: AttributeReference) =>
        mk(a, lo = None, up = Some((v, dt)))
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        mk(a, lo = Some((v, dt)), up = None)
      case LessThan(Literal(v, dt), a: AttributeReference) =>
        mk(a, lo = Some((v, dt)), up = None)
      case EqualTo(a: AttributeReference, Literal(v, dt)) =>
        mk(a, lo = Some((v, dt)), up = Some((v, dt)))
      case EqualTo(Literal(v, dt), a: AttributeReference) =>
        mk(a, lo = Some((v, dt)), up = Some((v, dt)))
      // null-safe equality to a NON-null literal is plain equality for
      // range purposes (null <=> lit is false, so no null row survives)
      case EqualNullSafe(a: AttributeReference, Literal(v, dt))
          if v != null =>
        mk(a, lo = Some((v, dt)), up = Some((v, dt)))
      case EqualNullSafe(Literal(v, dt), a: AttributeReference)
          if v != null =>
        mk(a, lo = Some((v, dt)), up = Some((v, dt)))
      // IN over literals relaxes to [min, max] of the list — a sound
      // superset. Dropped null elements match nothing extra; any
      // unconvertible or NaN element refuses the whole list.
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        inListBound(a, list.collect { case l: Literal => l })
      // large literal lists arrive as InSet (internal-format values)
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        inListBound(a, hset.toSeq.map(v => Literal(v, a.dataType)))
      case IsNotNull(a: AttributeReference) =>
        Some(ZoneMap.Bound(a.name, nonNull = true))
      // IS NULL: files with a PROVEN zero null count drop — the audit
      // sweep (`WHERE col IS NULL`) lists only files that can carry nulls
      case IsNull(a: AttributeReference) =>
        Some(ZoneMap.Bound(a.name, isNull = true))
      // LIKE 'p%' arrives as StartsWith: every matching row satisfies
      // p <= s (prefix order) and s < nextPrefix (last char bumped), so
      // the closed [p, nextPrefix] relaxation is a sound superset. ASCII
      // prefixes only — the manifest's string stats domain; when the last
      // char can't bump inside ASCII, the lower bound alone still prunes.
      case StartsWith(a: AttributeReference, Literal(v, StringType))
          if v != null && v.toString.nonEmpty &&
            v.toString.forall(c => c >= ' ' && c < 127) =>
        val p = v.toString
        val upper =
          if (p.last < 126) Some(p.init + (p.last + 1).toChar) else None
        Some(ZoneMap.Bound(a.name, Some(p), upper))
      case _ => None
    }

  /** Conjuncts carrying EXACT key sets (`=`, non-null `<=>`, literal
    * IN/InSet) for bloom probing — unlike [[extractBounds]]' [min, max]
    * relaxation, these keep every key: the per-file probe needs the
    * actual set. Null elements are dropped (`x = null` / `x IN (…, null)`
    * can never be true); any unconvertible element refuses the conjunct.
    */
  private def extractKeySets(
      conjuncts: Seq[Expression]): Seq[(String, Seq[Any])] =
    conjuncts.flatMap {
      case EqualTo(a: AttributeReference, Literal(v, dt)) if v != null =>
        external(v, dt).map(k => a.name -> Seq(k))
      case EqualTo(Literal(v, dt), a: AttributeReference) if v != null =>
        external(v, dt).map(k => a.name -> Seq(k))
      case EqualNullSafe(a: AttributeReference, Literal(v, dt)) if v != null =>
        external(v, dt).map(k => a.name -> Seq(k))
      case EqualNullSafe(Literal(v, dt), a: AttributeReference) if v != null =>
        external(v, dt).map(k => a.name -> Seq(k))
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        keySetOf(a, list.collect { case l: Literal => l })
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        keySetOf(a, hset.toSeq.map(v => Literal(v, a.dataType)))
      case _ => None
    }

  private def keySetOf(a: AttributeReference,
      lits: Seq[Literal]): Option[(String, Seq[Any])] = {
    val nn = lits.filter(_.value != null)
    if (nn.isEmpty) return None
    val ext = nn.map(l => external(l.value, l.dataType))
    if (ext.exists(_.isEmpty)) None else Some(a.name -> ext.flatten)
  }

  private def inListBound(a: AttributeReference,
      lits: Seq[Literal]): Option[ZoneMap.Bound] = {
    val ext = lits.filter(_.value != null)
      .map(l => external(l.value, l.dataType))
    if (ext.isEmpty || ext.exists(_.isEmpty)) return None
    val vals = ext.flatten
    if (vals.exists { case d: Double => d.isNaN; case f: Float => f.isNaN
      case _ => false }) return None // Spark orders NaN specially — refuse
    val sorted = try vals.sortWith(externalLt) catch {
      case _: Exception => return None
    }
    Some(ZoneMap.Bound(a.name, Some(sorted.head), Some(sorted.last)))
  }

  /** Value-domain order for the external representations [[external]]
    * emits; heterogeneous pairs throw and the caller refuses.
    */
  private def externalLt(x: Any, y: Any): Boolean = (x, y) match {
    case (a: Number, b: Number)
        if !a.isInstanceOf[java.lang.Double] && !a.isInstanceOf[java.lang.Float] &&
          !b.isInstanceOf[java.lang.Double] && !b.isInstanceOf[java.lang.Float] =>
      a.longValue < b.longValue
    case (a: Number, b: Number) => a.doubleValue < b.doubleValue
    case (a: String, b: String) => a < b
    case (a: java.time.LocalDate, b: java.time.LocalDate) => a.isBefore(b)
    case (a: java.time.Instant, b: java.time.Instant) => a.isBefore(b)
    case _ => throw new IllegalArgumentException("mixed domains")
  }

  private def mk(a: AttributeReference, lo: Option[(Any, DataType)],
      up: Option[(Any, DataType)]): Option[ZoneMap.Bound] = {
    val lower = lo.flatMap((external _).tupled)
    val upper = up.flatMap((external _).tupled)
    if (lower.isEmpty && upper.isEmpty) None
    else Some(ZoneMap.Bound(a.name, lower, upper))
  }

  /** Catalyst internal literal → the external value [[ZoneMap]] compares
    * in. Only domains with an exact mapping; a null literal never becomes
    * a bound (the comparison is unsatisfiable — Spark folds it anyway).
    * Shared with [[MetaAggRule]]'s interval evidence.
    */
  private[plans] def external(v: Any, dt: DataType): Option[Any] =
    if (v == null) None
    else dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType => Some(v)
      case StringType => Some(v.toString) // UTF8String → String
      case DateType => Some(java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        Some(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case _: DecimalType =>
        // exact: ZoneMap's "dec" domain compares true BigDecimal values
        Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
      case _ => None // binary/…: no lossless external compare
    }
}

/** A [[FileIndex]] view that never lists the zone-map-skipped files. All
  * metadata behavior delegates to the base index (partition discovery,
  * refresh, roots); only the file enumeration is filtered, so partition
  * pruning and this compose — a file survives iff BOTH its partition
  * matches and its stats may match.
  */
final class ZoneMapPrunedIndex(val base: FileIndex, keep: Set[String],
    val report: ZoneMap.PruneReport) extends FileIndex {

  // an unparseable path can never be proven skippable — keep, never drop
  private def keeps(p: org.apache.hadoop.fs.Path): Boolean =
    try keep.contains(java.nio.file.Paths.get(p.toUri.getPath).normalize.toString)
    catch { case _: Exception => true }

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] = base.rootPaths

  override def partitionSchema: StructType = base.partitionSchema

  override def refresh(): Unit = base.refresh()

  override def metadataOpsTimeNs: Option[Long] = base.metadataOpsTimeNs

  override def sizeInBytes: Long = report.bytesKept

  override def inputFiles: Array[String] = base.inputFiles.filter(u =>
    try keep.contains(java.nio.file.Paths.get(
      java.net.URI.create(u).getPath).normalize.toString)
    catch { case _: Exception => true })

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    base.listFiles(partitionFilters, dataFilters)
      .map(pd => PartitionDirectory(pd.values,
        pd.files.filter(f => keeps(f.getPath))))
      .filter(_.files.nonEmpty)

  override def toString: String =
    s"ZoneMapPrunedIndex(${report.filesKept}/${report.filesTotal} files, base = $base)"
}
