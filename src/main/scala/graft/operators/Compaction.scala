package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink

/** Small-file compaction for catalog tables — the maintenance operator any
  * long-running ingest accumulates a need for: streaming micro-batches,
  * partition-scoped CDC rewrites, and per-file pipeline loads each land a
  * few files, and a year of minute-batches turns a scan into millions of
  * tiny reads (open/seek-bound, not bandwidth-bound; at 100 TB the
  * NameNode/liststatus cost alone dominates).
  *
  * `compact` rewrites the table's current image into ~`targetBytes` files
  * and commits via [[ObjectStoreSink.replaceTable]]'s versioned-directory
  * swap — concurrent readers keep the old version until the catalog
  * repoints, the same no-gap guarantee as every other table commit in the
  * engine (the plain-parquet stand-in for an ACID format's rewrite-files
  * action, e.g. Iceberg's RewriteDataFiles).
  *
  * Sizing: the file count is derived from the CURRENT on-disk byte size
  * (post-compression), not row counts — `ceil(bytes / targetBytes)` output
  * files for unpartitioned tables via `repartition(n)` (round-robin, even
  * sizes); partitioned tables repartition by the partition columns so each
  * live partition collapses to one file per populated partition (its
  * writers were the fragmentation source), preserving pruning.
  */
object Compaction {

  /** Bytes currently under the table's live location — from the committed
    * manifest when present (no directory walk, the O(1)-listing path at
    * scale), else a filesystem walk.
    */
  def liveBytes(spark: SparkSession, spec: ObjectStoreSpec): Long = {
    val loc = locationOf(spark, s"${spec.database}.${spec.table}")
    graft.sinks.TableManifest.read(loc).map(_.totalBytes)
      .getOrElse(dataFiles(loc).map(p => Files.size(p)).sum)
  }

  /** Data-file count under the table's live location (manifest-first). */
  def liveFileCount(spark: SparkSession, spec: ObjectStoreSpec): Int = {
    val loc = locationOf(spark, s"${spec.database}.${spec.table}")
    graft.sinks.TableManifest.read(loc).map(_.files.size)
      .getOrElse(dataFiles(loc).size)
  }

  /** Rewrite the table into ~targetBytes files; returns the new file
    * count. No-op (returns current count) when already compact —
    * unpartitioned: at most the byte-derived file count; partitioned: at
    * most one file per populated partition directory.
    */
  def compact(spark: SparkSession, spec: ObjectStoreSpec,
      targetBytes: Long = 128L << 20): Int = {
    val fq = s"${spec.database}.${spec.table}"
    val loc = locationOf(spark, fq)
    // (relative path, bytes) per data file — manifest-first, walk fallback
    val files = graft.sinks.TableManifest.read(loc)
      .map(_.files.map(e => (e.path, e.bytes)))
      .getOrElse(dataFiles(loc).map(p =>
        (loc.relativize(p).toString, Files.size(p))))
    val bytes = files.map(_._2).sum
    val alreadyCompact =
      if (spec.partitionBy.isEmpty) {
        val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        files.size <= nFiles
      } else {
        val parents = files.map { case (rel, _) =>
          val i = rel.lastIndexOf('/'); if (i < 0) "" else rel.substring(0, i)
        }.distinct.size
        files.size <= parents
      }
    if (alreadyCompact) return files.size
    // Pin ONE committed snapshot: content, version number and txn stamp all
    // come from the same immutable version dir. The commit then CAS-es on
    // that version still being latest (`expectVersion`), so a concurrent
    // writer's commit can never be overwritten by a compacted copy of the
    // OLD content (lost update); and the snapshot's TxnStamp rides through
    // UNCHANGED — a streaming MV writer's replay guard (MvRefreshStream)
    // sees compaction as invisible instead of as a foreign single-writer
    // violation, because the stamp's claim ("batches 0..b are applied") is
    // exactly as true of the rewritten files as of the originals.
    val pinned = ObjectStoreSink.snapshots(spec).lastOption
    val (current, stamp, expect) = pinned match {
      case Some(snap) =>
        (ObjectStoreSink.readVersion(spark, spec, Some(snap.version)),
          graft.sinks.TableManifest.read(Paths.get(snap.path)).flatMap(_.txn),
          Some(snap.version))
      case None => // legacy table outside the manifest protocol: best effort
        (spark.table(fq), None, None)
    }
    val packed =
      if (spec.partitionBy.nonEmpty)
        current.repartition(spec.partitionBy.map(col): _*)
      else
        current.repartition(
          math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt))
    try ObjectStoreSink.replaceTable(spark, packed, spec, txn = stamp,
      expectVersion = expect)
    catch {
      // lost the race to a real writer: the table moved on, this rewrite
      // is stale — drop it; the next maintenance sweep re-evaluates
      case _: graft.sinks.ConcurrentCommitException => return files.size
    }
    liveFileCount(spark, spec)
  }

  private def locationOf(spark: SparkSession, fq: String): Path = {
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $fq")
      .filter(col("col_name") === "Location")
      .select("data_type").head().getString(0)
    Paths.get(java.net.URI.create(loc))
  }

  private def dataFiles(dir: Path): Seq[Path] = {
    if (!Files.exists(dir)) return Nil
    val out = Seq.newBuilder[Path]
    val walk = Files.walk(dir)
    try walk.forEach { p =>
      val n = p.getFileName.toString
      if (Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith("."))
        out += p
    } finally walk.close()
    out.result()
  }
}
