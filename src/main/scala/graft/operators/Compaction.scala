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

  /** Bin-pack accounting: the live file count after the pass, how many
    * right-sized files were CARRIED by hard link vs rewritten, and
    * whether a commit happened at all.
    */
  final case class CompactReport(filesAfter: Int, filesLinked: Int,
      filesRewritten: Int, changed: Boolean)

  /** Rewrite the table into ~targetBytes files; returns the new file
    * count. No-op (returns current count) when already compact —
    * unpartitioned: at most the byte-derived file count; partitioned: at
    * most one file per populated partition directory — OR when the
    * fragment tail holds fewer than 2 files: a single straggler under the
    * size envelope has nothing to merge WITH, so the pass stabilizes at
    * `byte-derived count + 1` rather than rewriting a keep-sized neighbor
    * just to absorb it (the rewrite would cost more I/O than the extra
    * file ever does; the incremental-maintenance trade Iceberg's
    * RewriteDataFiles makes with its min-input-files guard).
    */
  def compact(spark: SparkSession, spec: ObjectStoreSpec,
      targetBytes: Long = 128L << 20): Int =
    compactReport(spark, spec, targetBytes).filesAfter

  /** [[compact]] with the copy-on-write accounting. The pass is
    * INCREMENTAL, the Iceberg RewriteDataFiles discipline: files already
    * within the size envelope (unpartitioned: ≥ 3/4 × targetBytes;
    * partitioned: the sole file of a populated partition) hard-link into
    * the next version with their manifest stats carried verbatim — never
    * read — and only the small-file tail is scanned and re-packed. A
    * year of minute-batches onto a 100 TB table compacts at the cost of
    * the fragments, not of the table. Tables without a committed
    * manifest (legacy) or with nothing linkable keep the full-rewrite
    * path; both commit CAS-pinned with the snapshot's txn stamp riding
    * through unchanged (see the concurrency notes inline).
    */
  def compactReport(spark: SparkSession, spec: ObjectStoreSpec,
      targetBytes: Long = 128L << 20): CompactReport = {
    val fq = s"${spec.database}.${spec.table}"
    val loc = locationOf(spark, fq)
    // (relative path, bytes) per data file — manifest-first, walk fallback
    val files = graft.sinks.TableManifest.read(loc)
      .map(_.files.map(e => (e.path, e.bytes)))
      .getOrElse(dataFiles(loc).map(p =>
        (loc.relativize(p).toString, Files.size(p))))
    val bytes = files.map(_._2).sum
    def parentOf(rel: String): String = {
      val i = rel.lastIndexOf('/'); if (i < 0) "" else rel.substring(0, i)
    }
    val alreadyCompact =
      if (spec.partitionBy.isEmpty) {
        val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        files.size <= nFiles
      } else
        files.size <= files.map(f => parentOf(f._1)).distinct.size
    if (alreadyCompact)
      return CompactReport(files.size, 0, 0, changed = false)
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
    val manifest = pinned.flatMap(s =>
      graft.sinks.TableManifest.read(Paths.get(s.path)))
    try {
      (pinned, manifest) match {
        case (Some(snap), Some(m)) =>
          // COW split: the right-sized keep set links; the fragment tail
          // repacks. An empty or single-file tail has nothing to merge —
          // the table is as packed as its file-size floor allows.
          val (keep, frags) =
            if (spec.partitionBy.isEmpty)
              m.files.partition(_.bytes >= targetBytes - targetBytes / 4)
            else {
              val multi = m.files.groupBy(e => parentOf(e.path))
                .filter(_._2.size > 1).values.flatten.map(_.path).toSet
              m.files.partition(e => !multi(e.path))
            }
          if (frags.size < 2)
            return CompactReport(m.files.size, 0, 0, changed = false)
          val stamp = m.txn
          if (keep.isEmpty) {
            // nothing linkable: the classic full rewrite
            val current = ObjectStoreSink.readVersion(spark, spec,
              Some(snap.version))
            val packed =
              if (spec.partitionBy.nonEmpty)
                current.repartition(spec.partitionBy.map(col): _*)
              else current.repartition(
                math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt))
            ObjectStoreSink.replaceTable(spark, packed, spec, txn = stamp,
              expectVersion = Some(snap.version))
            CompactReport(liveFileCount(spark, spec), 0, frags.size,
              changed = true)
          } else {
            val fragDf = ObjectStoreSink.readSubset(spark, snap.path,
              spec.fileFormat, frags, m.files.size)
            val fragBytes = frags.map(_.bytes).sum
            val packed =
              if (spec.partitionBy.nonEmpty)
                fragDf.repartition(spec.partitionBy.map(col): _*)
              else fragDf.repartition(math.max(1,
                math.ceil(fragBytes.toDouble / targetBytes).toInt))
            val rep = ObjectStoreSink.cowVersion(spark, packed, spec,
              keep, fullImage = {
                val current = ObjectStoreSink.readVersion(spark, spec,
                  Some(snap.version))
                if (spec.partitionBy.nonEmpty)
                  current.repartition(spec.partitionBy.map(col): _*)
                else current.repartition(math.max(1,
                  math.ceil(bytes.toDouble / targetBytes).toInt))
              }, expectVersion = Some(snap.version), txn = stamp)
            CompactReport(liveFileCount(spark, spec), rep.filesLinked,
              frags.size, changed = true)
          }
        case _ => // legacy table outside the manifest protocol: best effort
          val current = spark.table(fq)
          val packed =
            if (spec.partitionBy.nonEmpty)
              current.repartition(spec.partitionBy.map(col): _*)
            else current.repartition(
              math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt))
          ObjectStoreSink.replaceTable(spark, packed, spec)
          CompactReport(liveFileCount(spark, spec), 0, files.size,
            changed = true)
      }
    } catch {
      // lost the race to a real writer: the table moved on, this rewrite
      // is stale — drop it; the next maintenance sweep re-evaluates
      case _: graft.sinks.ConcurrentCommitException =>
        CompactReport(files.size, 0, 0, changed = false)
    }
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
