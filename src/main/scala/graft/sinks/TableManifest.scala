package graft.sinks

import java.nio.file.{Files, Path}

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Manifest-file commit protocol for the versioned-directory table format —
  * the step from "directory swap that works locally" to a commit that
  * survives object-store listing inconsistency at 100 TB (reference
  * analogue: the Iceberg snapshot+manifest chain, IcebergUtil.scala:28-157).
  *
  * Protocol:
  *   - a version directory is COMMITTED iff `_manifest.json` exists; the
  *     manifest is written to a temp name and published with one atomic
  *     rename AFTER every data file is fully written, so no reader of the
  *     manifest can ever observe a partial file set — directory listing is
  *     never the source of truth for committed versions;
  *   - the manifest records the data files (relative paths + sizes), total
  *     bytes, exact row count (parquet footer metadata — O(files) footer
  *     reads, never a data scan), a schema hash, and the commit timestamp;
  *   - when a newer version commits, every older committed version gets a
  *     `_superseded` marker stamped with the supersede TIME. Retirement
  *     grace is measured from that marker — not from the dir's write
  *     mtime — so a version that was live for a long time still gets its
  *     full reader-safety grace after being swapped out (a swap burst can
  *     never delete a version a reader resolved moments ago);
  *   - version dirs WITHOUT a manifest are uncommitted leftovers of a
  *     crashed write: invisible to recovery, retired once their newest
  *     file mtime is older than the grace (an in-progress writer keeps
  *     touching files, so an active write is never swept).
  *
  * In-place writers (catalog appends, CDC dynamic partition overwrite)
  * mutate a committed version's file set; they call [[refresh]] under the
  * table lock to re-list and atomically republish the manifest.
  */
object TableManifest {

  val ManifestName = "_manifest.json"
  val SupersededName = "_superseded"

  /** The atomic-publish seam every metadata commit goes through: POSIX
    * rename locally; a deployment against an object store (no atomic
    * rename) injects the store's conditional-PUT equivalent and nothing
    * above this seam changes. See [[CommitPublisher]].
    */
  @volatile var publisher: CommitPublisher = PosixCommitPublisher

  final case class FileEntry(path: String, bytes: Long)

  /** Writer-transaction stamp (the Delta `txn` mechanism): a streaming
    * writer records (appId, batchId) in the manifest it commits, so its
    * replay guard keys on ITS OWN last-applied batch instead of the raw
    * version count — a foreign commit (compaction, manual fix-up) is then
    * detectable as a version whose stamp isn't the writer's, and fails
    * loudly rather than masquerading as an applied batch.
    */
  final case class TxnStamp(appId: String, batchId: Long)

  final case class Manifest(
      files: Seq[FileEntry],
      totalBytes: Long,
      rowCount: Long, // -1 when not derivable from metadata (non-parquet)
      schemaHash: String,
      committedAtMs: Long,
      txn: Option[TxnStamp] = None)

  private implicit val formats: Formats = DefaultFormats

  def isCommitted(versionDir: Path): Boolean =
    Files.exists(versionDir.resolve(ManifestName))

  def read(versionDir: Path): Option[Manifest] = {
    val mf = versionDir.resolve(ManifestName)
    if (!Files.exists(mf)) None
    else
      try Some(JsonMethods.parse(Files.readString(mf)).extract[Manifest])
      catch { case _: Exception => None }
  }

  /** Build + atomically publish the manifest for a fully-written version
    * dir. MUST be called before the catalog repoints at the dir.
    */
  def commit(versionDir: Path, schemaHash: String, fileFormat: String,
      txn: Option[TxnStamp] = None): Manifest = {
    val files = dataFiles(versionDir)
    val entries = files.map(p =>
      FileEntry(versionDir.relativize(p).toString, Files.size(p)))
    val rows =
      if (fileFormat.equalsIgnoreCase("parquet")) parquetRowCount(files) else -1L
    val m = Manifest(entries, entries.map(_.bytes).sum, rows, schemaHash,
      System.currentTimeMillis(), txn)
    publish(versionDir, m)
    m
  }

  /** Re-list and republish after an in-place write into a committed dir
    * (append / dynamic partition overwrite). Keeps the original commit
    * time; row count is recomputed from footers; the schema hash updates
    * when the caller passes the current one (schema-change appends
    * re-create the catalog entry over the same location).
    */
  def refresh(versionDir: Path, fileFormat: String,
      schemaHash: Option[String] = None): Option[Manifest] =
    read(versionDir).map { old =>
      val files = dataFiles(versionDir)
      val entries = files.map(p =>
        FileEntry(versionDir.relativize(p).toString, Files.size(p)))
      val rows =
        if (fileFormat.equalsIgnoreCase("parquet")) parquetRowCount(files) else -1L
      val m = old.copy(files = entries, totalBytes = entries.map(_.bytes).sum,
        rowCount = rows, schemaHash = schemaHash.getOrElse(old.schemaHash))
      publish(versionDir, m)
      m
    }

  private def publish(versionDir: Path, m: Manifest): Unit =
    publisher.publish(versionDir, ManifestName, Serialization.writePretty(m))

  /** Stamp the supersede time (idempotent — the FIRST supersede wins, so
    * grace always measures from when the version stopped being current).
    */
  def markSuperseded(versionDir: Path): Unit =
    // publishIfAbsent makes the stamp atomic first-writer-wins: two
    // committers racing on the same older version cannot rewrite each
    // other's marker (a plain write would truncate-and-replace, moving
    // the grace window)
    publisher.publishIfAbsent(versionDir, SupersededName,
      System.currentTimeMillis().toString): Unit

  def supersededAt(versionDir: Path): Option[Long] = {
    val marker = versionDir.resolve(SupersededName)
    if (!Files.exists(marker)) None
    else
      try Some(Files.readString(marker).trim.toLong)
      catch { case _: Exception => None }
  }

  /** Retirement decision, shared by the commit path and Vacuum:
    * committed versions retire `graceMs` after their supersede stamp;
    * uncommitted leftovers retire once quiescent for `graceMs` (newest
    * file mtime — an active writer keeps touching files).
    */
  def retirable(versionDir: Path, nowMs: Long, graceMs: Long): Boolean =
    if (isCommitted(versionDir))
      supersededAt(versionDir).exists(at => nowMs - at >= graceMs)
    else nowMs - newestMtime(versionDir) >= graceMs

  /** Non-hidden regular files under the version dir (recursive — partition
    * subdirs included).
    */
  def dataFiles(versionDir: Path): Seq[Path] = {
    if (!Files.exists(versionDir)) return Nil
    val out = Seq.newBuilder[Path]
    val s = Files.walk(versionDir)
    try s.forEach { p =>
      val n = p.getFileName.toString
      if (Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith("."))
        out += p
    } finally s.close()
    out.result().sortBy(_.toString)
  }

  /** Exact row count from parquet footers — metadata-only, no data read. */
  private def parquetRowCount(files: Seq[Path]): Long = {
    val conf = new org.apache.hadoop.conf.Configuration()
    files.map { p =>
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toUri), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      } catch { case _: Exception => return -1L } // not parquet after all
    }.sum
  }

  private def newestMtime(versionDir: Path): Long = {
    if (!Files.exists(versionDir)) return 0L
    val s = Files.walk(versionDir)
    try {
      var newest = 0L
      s.forEach { p =>
        val t = Files.getLastModifiedTime(p).toMillis
        if (t > newest) newest = t
      }
      newest
    } finally s.close()
  }
}
