package graft.plans

import java.nio.file.{Files, Path, Paths}

import graft.sinks.TableManifest
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** Planner seam for REFERENCE-MODE versioned tables (object-store
  * deployments — [[graft.sinks.CommitPublisher.carryByReference]]): a
  * reference-mode commit's manifest points at data files physically owned
  * by PRIOR version dirs ([[TableManifest.FileEntry.ref]]), so the live
  * version DIRECTORY no longer equals the table's file set and any scan
  * that lists it — the catalog relation `spark.table(t)` resolves to, a
  * partition-pruned subset of it, a raw `spark.read.load(versionDir)` —
  * would silently read only the freshly-written files. This rule swaps
  * such a scan's [[org.apache.spark.sql.execution.datasources.FileIndex]]
  * for one listing the MANIFEST-RESOLVED file set (restricted to the
  * partition directories the original scan had already narrowed to, so
  * catalog partition pruning composes), built with `basePath` at the
  * TABLE dir so partition values keep deriving from the `key=value`
  * segments of each file's own version dir.
  *
  * The rewrite is a listing substitution only — schema, output attributes
  * and every predicate stay in place — and refuses (plan untouched) on
  * any doubt: no manifest, a manifest with no references, foreign roots,
  * unresolvable entries. Ordered BEFORE the other manifest-backed seams
  * ([[MetaAggRule]], [[ZoneMapScanRule]], [[JoinPruneRule]]) so they see
  * the resolved listing and their per-file evidence applies unchanged.
  * This is the scan half of the Iceberg discipline the reference's Athena
  * tables rely on (manifests referencing files across snapshots,
  * IcebergUtil.scala:28-157): the manifest, never the directory, is the
  * source of truth for a snapshot's files.
  */
object RefResolveRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(
        "spark.graft.refResolve.enabled", "true") != "true") return plan
    plan.transformDown {
      case l: LogicalRelation => l.relation match {
        case hfs: HadoopFsRelation
            if !hfs.location.isInstanceOf[ZoneMapPrunedIndex] =>
          // reference resolution first (listing substitution), then the
          // rename projection (physical-name read + logical aliases) —
          // each is identity when the table never evolved that way
          val l2 =
            if (hfs.location.isInstanceOf[RefResolvedIndex]) l
            else rewrite(l, hfs).getOrElse(l)
          l2.relation match {
            case h2: HadoopFsRelation => renameWrap(l2, h2).getOrElse(l2)
            case _ => l2
          }
        case _ => l
      }
    }
  }

  private def rewrite(l: LogicalRelation,
      hfs: HadoopFsRelation): Option[LogicalRelation] =
    try {
      val roots = hfs.location.rootPaths
      if (roots.isEmpty) return None
      val localRoots = roots.map(r => Paths.get(r.toUri).normalize)
      // the scan must sit inside ONE version dir (the live catalog
      // location or partition dirs under it) whose manifest references
      // prior versions' files — anything else is not ours to touch
      val vdirs = localRoots.map(ascendToManifest(_)).distinct
      val vdir = vdirs match {
        case Seq(Some(d)) => d
        case _ => return None
      }
      // mtime-keyed cache shared with the evidence seams: the optimizer
      // revisits plans several times per query and must not re-parse JSON
      val m = ManifestEvidence.cachedRead(vdir).getOrElse(return None)
      if (!m.files.exists(_.ref.nonEmpty)) return None
      // partition restriction: keep only entries whose LOGICAL partition
      // path falls under one of the original roots (vdir itself keeps all)
      val rels = localRoots.map(r =>
        vdir.relativize(r).toString).filter(_.nonEmpty)
      val entries =
        if (rels.isEmpty) m.files
        else m.files.filter(e => rels.exists(r => e.path.startsWith(r + "/")))
      if (entries.isEmpty) return None
      val resolved = entries.map(e => TableManifest.resolved(vdir, e))
      if (!resolved.forall(Files.isRegularFile(_))) return None
      // partition values cannot be INFERRED across version dirs (Spark's
      // walk-up parser requires one shared base) — build the partition
      // spec explicitly from each entry's LOGICAL `key=value` segments,
      // exactly the values the file carried in its own version dir
      val pspec = partitionSpecFor(hfs, vdir, entries)
      if (hfs.partitionSchema.nonEmpty && pspec.isEmpty) return None
      val idx = new RefResolvedIndex(hfs.sparkSession,
        resolved.map(p => new org.apache.hadoop.fs.Path(p.toUri)),
        Map("basePath" -> vdir.getParent.toString),
        Some(hfs.schema),
        FileStatusCache.getOrCreate(hfs.sparkSession),
        pspec)
      Some(l.copy(relation = hfs.copy(location = idx)(hfs.sparkSession)))
    } catch { case _: Exception => None } // refusal, never a guess

  /** One [[PartitionPath]] per distinct PHYSICAL parent directory of the
    * resolved files, its values parsed from the entry's LOGICAL partition
    * segments and cast to the relation's partition schema — the same
    * (path → typed values) mapping Spark's own inference would produce
    * inside a single version dir, made explicit so files spanning version
    * dirs co-exist in one listing. None when any value fails to parse or
    * cast losslessly (the rule then refuses the whole rewrite).
    */
  private def partitionSpecFor(hfs: HadoopFsRelation, vdir: Path,
      entries: Seq[TableManifest.FileEntry])
      : Option[org.apache.spark.sql.execution.datasources.PartitionSpec] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.execution.datasources.{PartitionPath, PartitionSpec}
    val pschema = hfs.partitionSchema
    if (pschema.isEmpty) return Some(PartitionSpec.emptySpec)
    val tz = Some(hfs.sparkSession.sessionState.conf.sessionLocalTimeZone)
    // partition paths must equal the listing's parent-dir keys EXACTLY
    // (hadoop Path equality is URI equality — qualify through the fs so
    // `file:///` vs `file:/` spellings can never miss)
    val hconf = hfs.sparkSession.sessionState.newHadoopConf()
    def parentOf(rel: String): String = {
      val i = rel.lastIndexOf('/'); if (i < 0) "" else rel.substring(0, i)
    }
    // (physical parent dir, logical partition dir) per entry, deduped
    val dirs = entries.map { e =>
      val phys = TableManifest.resolved(vdir, e).getParent.normalize
      (phys, parentOf(e.path))
    }.distinct
    val paths = dirs.map { case (phys, logical) =>
      val kvs = logical.split('/').filter(_.nonEmpty).flatMap { seg =>
        val i = seg.indexOf('=')
        if (i <= 0) None
        else Some(ExternalCatalogUtils.unescapePathName(seg.substring(0, i)) ->
          ExternalCatalogUtils.unescapePathName(seg.substring(i + 1)))
      }.toMap
      val values = pschema.fields.map { f =>
        val raw = kvs.find(_._1.equalsIgnoreCase(f.name)).map(_._2)
          .getOrElse(return None) // a partition column the path lacks
        if (raw == "__HIVE_DEFAULT_PARTITION__") null
        else Cast(Literal(raw), f.dataType, tz).eval(InternalRow.empty) match {
          case null => return None // uncastable value: refuse the rewrite
          case v => v
        }
      }
      // built from the PLAIN path string, then fs-qualified: Path(URI)
      // would pin the empty `file:///` authority, which is URI-unequal to
      // the null-authority `file:/` form the filesystem's own listing
      // keys carry — and the lookup is exact Path equality
      val raw = new org.apache.hadoop.fs.Path(phys.toString)
      PartitionPath(InternalRow.fromSeq(values.toIndexedSeq),
        raw.getFileSystem(hconf).makeQualified(raw))
    }
    Some(PartitionSpec(pschema, paths))
  }

  private def ascendToManifest(p: Path, depth: Int = 6): Option[Path] =
    if (depth < 0 || p == null) None
    else if (Files.exists(p.resolve(TableManifest.ManifestName))) Some(p)
    else ascendToManifest(p.getParent, depth - 1)

  /** The rename half of metadata-only schema evolution for CATALOG scans:
    * a table whose pinned sidecar maps logical → PHYSICAL column names
    * ([[graft.sinks.ObjectStoreSink.renameColumn]]) stores its data under
    * the physical names, but the catalog relation requests the logical
    * ones — parquet's name matching would silently read NULLs. Rewrite:
    * the relation re-reads under the PHYSICAL data schema (fresh
    * attributes), and a Project aliases each physical attribute back to
    * its logical name REUSING the original expression IDs, so every
    * parent reference stays bound. Scans of renamed tables trade away
    * scan-level column pruning and the zone-map seam (the Project sits
    * between Filter and relation) — sound, and only for tables that chose
    * rename-without-rewrite.
    */
  private def renameWrap(l: LogicalRelation,
      hfs: HadoopFsRelation): Option[LogicalPlan] =
    try {
      import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, NamedExpression}
      val roots = hfs.location.rootPaths
      if (roots.isEmpty) return None
      val vdirs = roots.map(r =>
        ascendToManifest(Paths.get(r.toUri).normalize)).distinct
      val vdir = vdirs match {
        case Seq(Some(d)) => d
        case several if several.flatten.nonEmpty &&
            several.forall(_.isDefined) &&
            several.flatten.map(_.getParent.normalize).distinct.size == 1 =>
          several.flatten.maxBy(_.getFileName.toString)
        case _ => return None
      }
      val pin = graft.sinks.ObjectStoreSink.sidecarSchema(vdir)
        .getOrElse(return None)
      val m = graft.sinks.ObjectStoreSink.physMap(pin)
      if (m.isEmpty) return None
      // idempotency: the inner (already-rewritten) relation carries the
      // PHYSICAL names — none of them equals a still-logical mapped name
      if (!hfs.dataSchema.fieldNames.exists(m.contains)) return None
      val physData = org.apache.spark.sql.types.StructType(
        hfs.dataSchema.fields.map(f =>
          m.get(f.name).fold(f)(pn => f.copy(name = pn))))
      val newRel = hfs.copy(dataSchema = physData)(hfs.sparkSession)
      val newOutput = l.output.map {
        case a: AttributeReference if m.contains(a.name) =>
          AttributeReference(m(a.name), a.dataType, a.nullable,
            a.metadata)(qualifier = a.qualifier)
        case a => a
      }
      val rel2 = l.copy(relation = newRel, output = newOutput)
      val projectList: Seq[NamedExpression] =
        l.output.zip(newOutput).map { case (orig, fresh) =>
          if (fresh.exprId == orig.exprId) orig
          else Alias(fresh, orig.name)(exprId = orig.exprId,
            qualifier = orig.qualifier)
        }
      Some(org.apache.spark.sql.catalyst.plans.logical.Project(
        projectList, rel2))
    } catch { case _: Exception => None } // refusal, never a guess
}

/** Marker subclass so the rule (and the downstream seams) can tell a
  * manifest-resolved listing from an ordinary one — idempotency under the
  * optimizer's fixpoint batches. Behavior is entirely
  * [[InMemoryFileIndex]]: the resolved files are the root paths and
  * partition values derive from their `key=value` directory segments
  * under the table-dir basePath.
  */
final class RefResolvedIndex(
    spark: org.apache.spark.sql.SparkSession,
    files: Seq[org.apache.hadoop.fs.Path],
    parameters: Map[String, String],
    schema: Option[org.apache.spark.sql.types.StructType],
    cache: FileStatusCache,
    pspec: Option[org.apache.spark.sql.execution.datasources.PartitionSpec])
  extends InMemoryFileIndex(spark, files, parameters, schema, cache, pspec)
