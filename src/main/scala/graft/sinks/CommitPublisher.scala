package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** The atomic-publish seam under every metadata commit in the versioned-
  * directory table format (manifest files, supersede stamps, the table-root
  * commit log).
  *
  * Locally the implementation is a POSIX rename, which IS atomic. Object
  * stores have no atomic rename — real S3 "rename" is copy+delete, and a
  * reader can observe the half-state — so a deployment against an object
  * store swaps this seam for the store's native atomic primitive and
  * nothing above it changes:
  *
  *   - `publish` → an unconditional PUT of the full object (single-object
  *     PUTs are atomic on S3/GCS: readers see the old or the new body,
  *     never a torn one), or a conditional PUT (`If-Match: <etag>`) when
  *     last-writer-wins is not acceptable;
  *   - `publishIfAbsent` → a conditional PUT with `If-None-Match: *`
  *     (native on S3 since 2024, GCS `ifGenerationMatch=0`), or a DynamoDB/
  *     metastore conditional write where the store lacks one.
  *
  * The reference delegates this exact problem to Iceberg's snapshot chain +
  * Glue/Athena metastore swap (IcebergUtil.scala:28-157); this seam is the
  * standalone equivalent.
  */
trait CommitPublisher {

  /** Atomically make `content` visible as `dir/name`: a reader sees the
    * previous committed content or the new one in full, never a partial or
    * torn file. Replaces an existing object (last writer wins — callers
    * needing first-writer-wins use [[publishIfAbsent]]).
    */
  def publish(dir: Path, name: String, content: String): Unit

  /** Atomically create `dir/name` only if absent — the FIRST writer wins
    * and later attempts change nothing. Returns true iff this call created
    * the object.
    */
  def publishIfAbsent(dir: Path, name: String, content: String): Boolean

  /** How the link-commit family (COW DML, link-append INSERT, metadata-
    * only ALTER, incremental OPTIMIZE) carries a prior version's immutable
    * data files into the next version:
    *
    *   - `false` (POSIX default): hard links — same inode, O(1) metadata
    *     op per file, each version dir physically self-contained;
    *   - `true` (object stores — S3/GCS have no links): manifest-level
    *     file REFERENCES — the new manifest's entries point at the prior
    *     version's objects by table-relative path
    *     ([[TableManifest.FileEntry.ref]]), ZERO bytes moved or copied,
    *     and retention becomes reachability-aware (a version dir retires
    *     only when no surviving manifest references its files) — the
    *     Iceberg manifests-reference-files-across-snapshots discipline,
    *     which is exactly how the reference's Athena Iceberg tables share
    *     data files between snapshots (IcebergUtil.scala:28-157).
    */
  def carryByReference: Boolean = false
}

/** Reference-mode backend for filesystems/stores WITHOUT hard links: the
  * atomic-publish primitives stay POSIX (this container has no real
  * object store; a production S3/GCS backend swaps those for conditional
  * PUTs as documented on [[CommitPublisher]]) while the carry discipline
  * flips to manifest-level file references — letting every reference-mode
  * code path (commit, read resolution, reachability vacuum) run for real.
  */
object ReferenceCommitPublisher extends CommitPublisher {
  def publish(dir: Path, name: String, content: String): Unit =
    PosixCommitPublisher.publish(dir, name, content)
  def publishIfAbsent(dir: Path, name: String, content: String): Boolean =
    PosixCommitPublisher.publishIfAbsent(dir, name, content)
  override def carryByReference: Boolean = true
}

/** POSIX filesystems: write-to-temp + single atomic rename for replace;
  * `CREATE_NEW` (atomic open-exclusive) for first-writer-wins.
  */
object PosixCommitPublisher extends CommitPublisher {

  /** A crashed publisher's orphan temp is retired this long after its
    * last write. Generous vs any plausible write duration, so a LIVE
    * racer's temp (written microseconds ago) is never swept.
    */
  private val TmpGraceMillis = 10L * 60 * 1000

  def publish(dir: Path, name: String, content: String): Unit = {
    // temp name unique PER CALL: two publishers racing on the same key must
    // each rename their own complete body (last writer wins), never splice
    // through a shared temp file
    val tmp = dir.resolve(
      s"$name.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp, content)
    Files.move(tmp, dir.resolve(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
    sweepStaleTemps(dir, name)
  }

  /** Unique-per-call temps fix the shared-temp splice race but, unlike the
    * old fixed name, are not self-healing: a crash between write and move
    * would leak `<name>.tmp-XXXXXXXX` forever (r7 ADVICE). Each successful
    * publish best-effort retires stale siblings past the grace window —
    * commit dirs hold a handful of entries, so the listing is cheap.
    */
  private def sweepStaleTemps(dir: Path, name: String): Unit =
    try {
      val cutoff = System.currentTimeMillis() - TmpGraceMillis
      val s = Files.list(dir)
      try {
        s.iterator().forEachRemaining { p =>
          val fn = p.getFileName.toString
          if (fn.startsWith(s"$name.tmp-") &&
            (try Files.getLastModifiedTime(p).toMillis < cutoff
             catch { case _: java.io.IOException => false }))
            Files.deleteIfExists(p): Unit
        }
      } finally s.close()
    } catch { case _: java.io.IOException => () }

  def publishIfAbsent(dir: Path, name: String, content: String): Boolean =
    try {
      Files.writeString(dir.resolve(name), content,
        StandardOpenOption.CREATE_NEW): Unit
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
}

/** Table-root commit log: the ordered record of committed version numbers,
  * republished atomically (through the [[CommitPublisher]] seam) on every
  * commit and retirement. At object-store scale a directory LISTING is the
  * wrong source of truth for "latest committed version" — listings can be
  * eventually consistent and carry no commit order — so readers resolve
  * versions from the log and use the listing only to pick up legacy
  * pre-log tables (the union can only ADD versions the log predates, never
  * reorder it). Single-writer per table (the sink's table lock), like the
  * manifest protocol itself.
  *
  * [[record]]/[[prune]] are read-modify-write: within one driver the sink's
  * per-table lock serializes them (Vacuum takes it too). Across DRIVERS an
  * object-store deployment must either keep log writers single-writer (the
  * same requirement the manifest protocol already carries) or implement
  * them as a conditional-PUT CAS loop (`If-Match: <etag>` / GCS
  * `ifGenerationMatch`) in its [[CommitPublisher]].
  */
object CommitLog {

  val Name = "_commits.json"

  /** Committed version numbers, ascending; None when the table predates
    * the log (readers fall back to the directory listing).
    */
  def read(tableDir: Path): Option[Seq[Int]] = {
    val f = tableDir.resolve(Name)
    if (!Files.exists(f)) None
    else
      try {
        import org.json4s._
        implicit val formats: Formats = DefaultFormats
        Some(org.json4s.jackson.JsonMethods.parse(Files.readString(f))
          .extract[Seq[Int]].sorted)
      } catch { case _: Exception => None }
  }

  /** Append a committed version (idempotent). */
  def record(tableDir: Path, version: Int): Unit = {
    val versions = (read(tableDir).getOrElse(Nil).toSet + version).toSeq.sorted
    TableManifest.publisher.publish(tableDir, Name,
      versions.mkString("[", ",", "]"))
  }

  /** Drop entries whose version directory no longer holds a committed
    * manifest (called after retirement deletes the dirs). `dirFor` maps a
    * version number to its directory.
    */
  def prune(tableDir: Path, dirFor: Int => Path): Unit =
    read(tableDir).foreach { versions =>
      val live = versions.filter(v => TableManifest.isCommitted(dirFor(v)))
      if (live != versions)
        TableManifest.publisher.publish(tableDir, Name,
          live.mkString("[", ",", "]"))
    }
}

/** `_clones.json` — the incoming-reference registry a SHALLOW CLONE
  * leaves with every table whose files its manifest references: the
  * ABSOLUTE table dirs of the clones. Retention/vacuum of the owner then
  * pins exactly the version dirs those clones' surviving manifests still
  * reference ([[graft.sinks.ObjectStoreSink.unreferencedOnly]]) — O(
  * registered clones), never a lake scan, and the Delta shallow-clone
  * footgun ("vacuum on the source breaks clones") structurally cannot
  * happen. A registered dir that no longer holds any committed manifest
  * (the clone was deleted) pins nothing and is pruned on the next write.
  * Same single-writer-per-table discipline as [[CommitLog]]: mutations
  * run under the OWNER's table lock.
  */
object CloneRegistry {

  val Name = "_clones.json"

  def read(ownerTableDir: Path): Seq[Path] = {
    val f = ownerTableDir.resolve(Name)
    if (!Files.exists(f)) Nil
    else
      try {
        import org.json4s._
        implicit val formats: Formats = DefaultFormats
        org.json4s.jackson.JsonMethods.parse(Files.readString(f))
          .extract[Seq[String]].map(Paths.get(_))
      } catch { case _: Exception => Nil }
  }

  /** Register a clone's table dir with the owner (idempotent). */
  def register(ownerTableDir: Path, cloneTableDir: Path): Unit =
    graft.sinks.ObjectStoreSink.withTableLock(ownerTableDir) {
      val abs = cloneTableDir.toAbsolutePath.normalize.toString
      val all = (read(ownerTableDir).map(_.toString).toSet + abs).toSeq.sorted
      TableManifest.publisher.publish(ownerTableDir, Name,
        org.json4s.jackson.Serialization.write(all)(
          org.json4s.DefaultFormats))
    }

  /** Drop registered clones whose table dir is gone (deleted clone
    * tables). A dir that survives but holds no committed manifest pins
    * nothing anyway. Caller holds the owner's table lock.
    */
  def pruneDead(ownerTableDir: Path): Unit = {
    val cur = read(ownerTableDir)
    val live = cur.filter(Files.isDirectory(_))
    if (live.size != cur.size)
      TableManifest.publisher.publish(ownerTableDir, Name,
        org.json4s.jackson.Serialization.write(
          live.map(_.toString).sorted)(org.json4s.DefaultFormats))
  }
}
