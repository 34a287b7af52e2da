package graft.operators

import java.nio.file.{Files, Path, Paths}

import graft.sinks.ObjectStoreSink

/** Lake-wide storage reclamation — the VACUUM companion to the versioned-
  * directory commit and [[Compaction]]: every table swap leaves its
  * predecessor on disk (reader-safety grace + crash recovery), so a
  * long-running lake accumulates superseded version directories. `vacuum`
  * walks `lakeRoot/<database>/<table>` and retires, per table, every
  * version beyond the newest `keep` that is also older than the
  * grace window — the same retention rule the commit path applies, run as
  * a maintenance sweep (the plain-parquet analogue of an ACID format's
  * expire-snapshots action).
  *
  * Driver-side directory walking only — version metadata is O(tables ×
  * versions), never data-proportional; no Spark jobs run.
  */
object Vacuum {

  final case class Report(tablesScanned: Int, versionsRetired: Int,
      bytesFreed: Long)

  /** Sweep every table under the lake root. `graceMs` defaults to the
    * commit path's reader-safety grace.
    */
  def vacuum(lakeRoot: String, keep: Int = 2,
      graceMs: Long = ObjectStoreSink.retireGraceMs): Report = {
    require(keep >= 1, "vacuum must keep at least the live version")
    var tables = 0
    var retired = 0
    var freed = 0L
    for {
      db <- listDirs(Paths.get(lakeRoot))
      table <- listDirs(db)
    } {
      val r = vacuumTable(table, keep, graceMs)
      tables += r.tablesScanned
      retired += r.versionsRetired
      freed += r.bytesFreed
    }
    Report(tables, retired, freed)
  }

  /** Retire one table's superseded versions — the per-table unit the
    * lake sweep (and the SQL `VACUUM <table>` command) delegates to.
    */
  def vacuumTable(tableDir: Path, keep: Int = 2,
      graceMs: Long = ObjectStoreSink.retireGraceMs): Report = {
    require(keep >= 1, "vacuum must keep at least the live version")
    val now = System.currentTimeMillis()
    val versions = listVersionDirs(tableDir)
    if (versions.isEmpty) return Report(0, 0, 0L)
    var retired = 0
    var freed = 0L
    // under the sink's per-table commit lock: CommitLog.prune is a
    // read-modify-write of _commits.json, and a vacuum racing a
    // concurrent commit's CommitLog.record would otherwise publish a
    // log that drops the just-recorded version (lost update)
    graft.sinks.ObjectStoreSink.withTableLock(tableDir) {
      // same retention rule as the commit path: committed versions
      // retire graceMs after their _superseded stamp (never from write
      // mtime); uncommitted crash leftovers once quiescent for the grace.
      // Reference-mode reachability rides on top: a dir whose files a
      // surviving manifest still references is pinned however old it is
      // (ObjectStoreSink.unreferencedOnly — the expire-snapshots vs
      // orphan-files distinction).
      val retiring = graft.sinks.ObjectStoreSink.unreferencedOnly(versions,
        versions.dropRight(keep)
          .filter(p => graft.sinks.TableManifest.retirable(p, now, graceMs)))
      retiring.foreach { p =>
        freed += treeBytes(p)
        deleteTree(p)
        retired += 1
      }
      if (retiring.nonEmpty) // keep the commit log truthful post-retire
        graft.sinks.CommitLog.prune(tableDir,
          v => tableDir.resolve(f"v-$v%06d"))
      // registry hygiene: registered clones whose table dir is GONE
      // (dropped and deleted) pin nothing — drop their entries so the
      // pin scan stays O(live clones)
      graft.sinks.CloneRegistry.pruneDead(tableDir)
    }
    Report(1, retired, freed)
  }

  private def listDirs(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_)).toSeq
      } finally s.close()
    }

  private def listVersionDirs(tableDir: Path): Seq[Path] =
    listDirs(tableDir)
      .filter(_.getFileName.toString.matches("v-\\d{6}"))
      .sortBy(_.getFileName.toString)

  private def treeBytes(dir: Path): Long = {
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
    } finally s.close()
  }

  private def deleteTree(p: Path): Unit = {
    val s = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    } finally s.close()
  }
}
