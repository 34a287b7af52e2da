package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Session-scoped scratch space for fixture queries and tools that build
  * on-disk state (temp lakes, streaming index dirs, landing zones).
  *
  * Everything lives under ONE per-JVM root that a shutdown hook removes, so
  * repeated Bench/Verify runs never accumulate orphan `graft-*` trees in
  * the system temp dir. [[fresh]] additionally ROLLS per tag — creating a
  * new dir deletes the previous dir issued for the same tag — because
  * Bench invokes every query warmup+repeats times in one JVM and the
  * stateful fixtures (dedup-index stream, vacuum/compact lakes) would
  * otherwise stack corpus-sized parquet trees within a single session,
  * which is exactly the cross-query FS/GC interference the bench medians
  * are supposed to exclude.
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  private val lastForTag =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  /** A fresh scratch dir for `tag`, deleting the previous dir issued under
    * the same tag. Safe because per-tag callers are sequential and have
    * fully consumed the prior invocation's outputs before asking for a new
    * dir (Bench counts each repeat's result before the next; Verify runs a
    * query once). Callers needing several live dirs at once use distinct
    * tags or [[freshKeep]].
    */
  def fresh(tag: String): String = {
    val d = Files.createTempDirectory(root, s"$tag-")
    Option(lastForTag.put(tag, d)).foreach(deleteTree)
    d.toString
  }

  /** A fresh scratch dir under the session root with NO rolling — for
    * callers that create many live dirs per invocation (archive expansion
    * creates one per archive and unions across them). Removed at JVM exit
    * with the root.
    */
  def freshKeep(tag: String): Path = Files.createTempDirectory(root, s"$tag-")

  /** A scratch dir the DuckDB oracle must still be able to READ after this
    * JVM exits (the driver dumps results, then runs the oracle SQL — which
    * embeds these paths — in a separate process). NOT deleted on exit;
    * instead, roots left by PREVIOUS sessions are swept at first use once
    * older than 6 h, so accumulation stays bounded without racing an
    * external reader that may still be consuming the current session's
    * files.
    */
  def freshOracle(tag: String): Path =
    Files.createTempDirectory(oracleRoot, s"$tag-")

  /** Marker file naming the creating JVM; the sweep below treats a root
    * whose owner pid is still alive as live regardless of age. The root
    * dir's mtime is NOT refreshed by writes deeper in the tree, so age
    * alone would delete the fixtures of a still-running long session
    * mid-compare (r7 ADVICE).
    */
  private val OwnerMarker = ".owner.pid"

  private def ownerAlive(root: Path): Boolean =
    try {
      val pid = Files.readString(root.resolve(OwnerMarker)).trim.toLong
      Files.exists(java.nio.file.Paths.get(s"/proc/$pid"))
    } catch { case _: Throwable => false }

  /** True when a previous-session oracle root is safe to sweep at `now`:
    * owner dead (or markerless legacy root) and older than 6 h, or older
    * than the 7-day pid-reuse backstop regardless.
    */
  private[graft] def oracleSweepable(p: Path, now: Long): Boolean = {
    val cutoff =
      if (ownerAlive(p)) now - 7L * 24 * 3600 * 1000
      else now - 6L * 3600 * 1000
    try Files.getLastModifiedTime(p).toMillis < cutoff
    catch { case _: java.io.IOException => false }
  }

  private lazy val oracleRoot: Path = {
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val now = System.currentTimeMillis()
    val s = Files.list(base)
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("graft-oracle-"))
      .filter(oracleSweepable(_, now))
      .foreach(deleteTree)
    finally s.close()
    val r = Files.createTempDirectory(base, "graft-oracle-")
    Files.writeString(r.resolve(OwnerMarker), ProcessHandle.current().pid().toString)
    r
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f): Unit)
      finally s.close()
    }
}
