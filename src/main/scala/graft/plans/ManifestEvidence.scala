package graft.plans

import java.nio.file.{Files, Path, Paths}

import graft.sinks.TableManifest
import org.apache.spark.sql.execution.datasources.HadoopFsRelation

/** Shared evidence gate for the manifest-backed planner rules
  * ([[MetaAggRule]], [[ZoneMapScanRule]]): a rewrite may trust the
  * manifest's statistics only for files those statistics were lifted
  * from. The manifest governing a scan is located STRUCTURALLY — ascend
  * from each scan root to the nearest `_manifest.json` directory (a scan
  * that Spark's catalog partition pruning already narrowed has the kept
  * partition DIRS as its roots, all inside one version dir; a full-table
  * scan has the version dir itself) — and then verified by file-set
  * containment. Every failure mode (relative/remote paths, roots under
  * different manifests, a scanned file the manifest doesn't know)
  * refuses, and the plan runs unmodified.
  */
private[plans] object ManifestEvidence {

  /** The manifest governing this parquet scan plus the scan's files as
    * RESOLVED absolute paths — `scanned ⊆ manifest` NOT yet checked; use
    * [[exact]] or [[covering]]. Resolution is by PHYSICAL identity
    * ([[TableManifest.resolved]]), so reference-mode manifests — whose
    * entries point at files physically owned by sibling version dirs —
    * vouch exactly like link-mode ones. Roots ascending to SEVERAL
    * manifest dirs qualify when all are versions of one table (same
    * parent): the NEWEST sibling's manifest governs — per-file stats are
    * truths about immutable physical files, so any manifest whose
    * resolved entries cover the scan vouches soundly, and the newest is
    * the one a reference-resolved scan (files spanning versions) lists.
    */
  private def manifestFor(hfs: HadoopFsRelation)
      : Option[(Path, TableManifest.Manifest, Seq[String],
          Map[String, TableManifest.FileEntry])] = {
    if (!hfs.fileFormat.isInstanceOf[
      org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      return None
    val roots = hfs.location.rootPaths
    if (roots.isEmpty) return None
    try {
      val dirs = roots.map(r => ascendToManifest(Paths.get(r.toUri)))
      if (dirs.exists(_.isEmpty)) return None
      val distinct = dirs.flatten.distinct
      val root = distinct match {
        case Seq(one) => one
        case several
            if several.map(_.getParent.normalize).distinct.size == 1 =>
          several.maxBy(_.getFileName.toString)
        case _ => return None // roots under different tables
      }
      cachedRead(root).map { m =>
        val resolvedMap = m.files.map(e =>
          TableManifest.resolved(root, e).normalize.toString -> e).toMap
        val scanned = hfs.location.inputFiles.toSeq
          .map(u => Paths.get(new java.net.URI(u)).normalize.toString)
        (root, m, scanned, resolvedMap)
      }
    } catch { case _: Exception => None } // relative/remote/foreign paths
  }

  /** The optimizer revisits a plan several times per query (fixed-point
    * batches, AQE re-optimization), and each visit would otherwise
    * re-parse the manifest JSON. Cache by (path, mtime, size) — an
    * in-place republish (refreshManifest's atomic rename) changes the
    * identity, so staleness is bounded by mtime granularity exactly like
    * Spark's own file-listing caches. Bounded: cleared wholesale past 256
    * entries (manifests are per-table; a session touches few).
    */
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[
    (String, java.nio.file.attribute.FileTime, Long), Option[TableManifest.Manifest]]()

  private[plans] def cachedRead(root: Path): Option[TableManifest.Manifest] = {
    val mf = root.resolve(TableManifest.ManifestName)
    val key = (mf.toString, Files.getLastModifiedTime(mf), Files.size(mf))
    if (manifestCache.size > 256) manifestCache.clear()
    manifestCache.computeIfAbsent(key, _ => TableManifest.read(root))
  }

  /** Nearest ancestor (or self) holding a committed manifest, bounded so
    * a pathological layout can't walk the whole filesystem. Partition
    * dirs nest only a few levels under their version dir.
    */
  private def ascendToManifest(p: Path, depth: Int = 6): Option[Path] =
    if (depth < 0 || p == null) None
    else if (Files.exists(p.resolve(TableManifest.ManifestName))) Some(p)
    else ascendToManifest(p.getParent, depth - 1)

  /** Totality gate (aggregate answering): the scan's file set is EXACTLY
    * the manifest's — COUNT/MIN/MAX over the whole table are provable
    * only from all of it.
    */
  def exact(hfs: HadoopFsRelation): Option[TableManifest.Manifest] =
    manifestFor(hfs).collect {
      case (_, m, scanned, resolvedMap)
          if scanned.size == m.files.size &&
            scanned.toSet == resolvedMap.keySet => m
    }

  /** Per-file gate (zone-map pruning): every scanned file is IN the
    * manifest — a file's own stats refute a predicate for that file
    * regardless of which sibling files the scan kept, so partition-pruned
    * catalog scans still qualify. Returns the manifest restricted to the
    * scanned files, plus the manifest root.
    */
  def covering(hfs: HadoopFsRelation)
      : Option[(Path, TableManifest.Manifest)] =
    manifestFor(hfs).flatMap { case (root, m, scanned, resolvedMap) =>
      val entries = scanned.map(resolvedMap.get)
      if (entries.exists(_.isEmpty)) None // a file the manifest can't vouch for
      else Some((root, m.copy(files = entries.flatten)))
    }
}
