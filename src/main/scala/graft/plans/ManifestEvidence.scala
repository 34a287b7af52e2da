package graft.plans

import java.nio.file.{Path, Paths}

import graft.sinks.TableManifest
import org.apache.spark.sql.execution.datasources.HadoopFsRelation

/** Shared evidence gate for the manifest-backed planner rules
  * ([[MetaAggRule]], [[ZoneMapScanRule]]): a rewrite may trust the
  * manifest's statistics only when the scan it replaces reads EXACTLY the
  * file set those statistics were lifted from. Any mismatch — a foreign
  * file dropped into the directory, a stale manifest, a multi-root scan —
  * refuses, and the plan runs unmodified.
  */
private[plans] object ManifestEvidence {

  /** The scan's single root directory, iff it is a plain parquet scan on a
    * filesystem the manifest reader can reach. Refusal, never a throw: a
    * relative root (no URI scheme — streaming sinks under a relative
    * checkpoint dir do this) or a non-local scheme simply yields None and
    * the plan runs unmodified.
    */
  def bareParquetRoot(hfs: HadoopFsRelation): Option[(Path, HadoopFsRelation)] =
    hfs.location.rootPaths match {
      case Seq(root)
          if hfs.fileFormat.isInstanceOf[
            org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
        try Some((Paths.get(root.toUri), hfs))
        catch { case _: Exception => None }
      case _ => None
    }

  /** The manifest, iff committed AND its file set is exactly the scan's. */
  def committedManifest(root: Path,
      hfs: HadoopFsRelation): Option[TableManifest.Manifest] =
    TableManifest.read(root).filter { m =>
      try {
        val scanned = hfs.location.inputFiles.toSeq
          .map(u => root.relativize(Paths.get(new java.net.URI(u))).toString)
        scanned.sorted == m.files.map(_.path).sorted
      } catch { case _: Exception => false }
    }
}
