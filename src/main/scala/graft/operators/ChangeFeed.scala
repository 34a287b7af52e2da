package graft.operators

import java.nio.file.{Path, Paths}

import graft.model.{ObjectStoreSpec, PipelineSpecException}
import graft.sinks.{ObjectStoreSink, TableManifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Row-level CHANGE FEED between two committed versions of a versioned
  * table — "what happened to the data between snapshot v(a) and v(b)",
  * as rows tagged `_change_type` (`insert` / `delete`; an update is a
  * delete + insert pair, the granularity a format without persistent row
  * IDs can prove) `_commit_version` (the step that produced them) and
  * `_commit_timestamp_ms` (that commit's instant — the cursor a
  * time-based consumer needs).
  * The Delta CDF / Iceberg changelog-scan capability, derived entirely
  * from the commit protocol's own manifests — nothing extra is written.
  *
  * Scale stance (100 TB): the feed is computed per commit step from the
  * MANIFEST FILE DIFF, never a table scan. A link-commit (COW DML,
  * link-append INSERT) carries untouched files at their own relative
  * paths — identical entry paths on both sides drop out as a set
  * difference on the DRIVER, so only the files the commit actually
  * touched are ever read: a key-selective DELETE on a 100 TB table feeds
  * O(touched files), a metadata-only evolution commit feeds ZERO reads,
  * and rewritten-in-place rows cancel in the row-level bag difference
  * ([[DataFrame.exceptAll]]) whose shuffle is bounded by the touched
  * subset. A full-rewrite commit (CREATE OR REPLACE, evidence-free DML)
  * has no carried paths and honestly degrades to diffing both images.
  * Reference-mode manifests diff identically: a carried entry keeps its
  * logical path (the reference is the storage, not the identity).
  *
  * Schema evolution between the versions is aligned by PHYSICAL column
  * name (the stable namespace [[ObjectStoreSink.renameColumn]] pins):
  * every step's rows are projected onto the TO version's logical shape —
  * renamed columns match through their physical name, widened columns
  * up-cast (lossless by construction), dropped columns vanish, added
  * columns read NULL on pre-evolution rows.
  */
object ChangeFeed {

  /** Change rows for every commit step in `(fromVersion, toVersion]`,
    * in the TO version's logical shape plus `_change_type` and
    * `_commit_version`. `fromVersion == toVersion` is the empty feed;
    * `fromVersion = 0` is the VIRTUAL EMPTY origin (versions start at
    * 1), so a bootstrap read feeds the first snapshot's full image as
    * inserts — the shape an incremental consumer needs to start from
    * nothing ([[graft.streaming.ChangeFeedStream]]).
    */
  def changesBetween(spark: SparkSession, spec: ObjectStoreSpec,
      fromVersion: Int, toVersion: Int): DataFrame = {
    val fq = s"${spec.database}.${spec.table}"
    val snaps = ObjectStoreSink.snapshots(spec)
    def snapOf(v: Int) = snaps.find(_.version == v).getOrElse(
      throw new PipelineSpecException(
        s"TABLE_CHANGES on $fq: version $v does not exist or is not " +
          s"committed (have: ${snaps.map(_.version).mkString(", ")})"))
    if (fromVersion > toVersion) throw new PipelineSpecException(
      s"TABLE_CHANGES on $fq: FROM version $fromVersion is after TO " +
        s"version $toVersion")
    val toSnap = snapOf(toVersion)
    val toShape = shapeOf(spark, spec, toVersion)
    if (fromVersion > 0) snapOf(fromVersion): Unit

    val perStep = ((math.max(fromVersion, 0) + 1) to toVersion).flatMap { v =>
      if (v - 1 == 0 && snaps.forall(_.version != 0)) {
        // bootstrap step: everything in the first snapshot is an insert
        val curSnap = snapOf(v)
        val cm = TableManifest.read(Paths.get(curSnap.path))
        val addedRows = align(cm match {
          case Some(m) => ObjectStoreSink.readSubset(spark, curSnap.path,
            spec.fileFormat, m.files, m.files.size)
          case None => ObjectStoreSink.readVersion(spark, spec, Some(v))
        }, shapeOf(spark, spec, v), toShape)
        Some(step(addedRows, addedRows.where(lit(false)), v,
          curSnap.committedAtMs))
      } else stepOf(spark, spec, v, toShape)
    }

    perStep.reduceOption(_.unionByName(_)).getOrElse {
      // empty feed in the full output shape
      val shape = StructType(toShape.fields.map(f =>
        f.copy(name = f.name)) :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType) :+
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.IntegerType) :+
        org.apache.spark.sql.types.StructField("_commit_timestamp_ms",
          org.apache.spark.sql.types.LongType))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], shape)
    }
  }

  /** One committed-over-committed step's change rows, or None for a
    * metadata-only step (no file added or removed — zero reads).
    */
  private def stepOf(spark: SparkSession, spec: ObjectStoreSpec, v: Int,
      toShape: StructType): Option[DataFrame] = {
    val snaps = ObjectStoreSink.snapshots(spec)
    def snapOf(n: Int): ObjectStoreSink.Snapshot =
      snaps.find(_.version == n).get
    val prevSnap = snapOf(v - 1)
    val curSnap = snapOf(v)
    locally {
      val prevDir = Paths.get(prevSnap.path)
      val curDir = Paths.get(curSnap.path)
      val prevM = TableManifest.read(prevDir)
      val curM = TableManifest.read(curDir)
      (prevM, curM) match {
        case (Some(pm), Some(cm)) =>
          // identity = the entry's logical relative path: carried files
          // (hard links and reference entries alike) keep it verbatim,
          // so untouched files cancel here, on the driver, unread
          val prevPaths = pm.files.map(_.path).toSet
          val curPaths = cm.files.map(_.path).toSet
          val added = cm.files.filter(e => !prevPaths(e.path))
          val removed = pm.files.filter(e => !curPaths(e.path))
          if (added.isEmpty && removed.isEmpty) None // metadata-only step
          else {
            val addedRows = align(
              ObjectStoreSink.readSubset(spark, curSnap.path,
                spec.fileFormat, added, cm.files.size),
              shapeOf(spark, spec, v), toShape)
            val removedRows = align(
              ObjectStoreSink.readSubset(spark, prevSnap.path,
                spec.fileFormat, removed, pm.files.size),
              shapeOf(spark, spec, v - 1), toShape)
            Some(step(addedRows, removedRows, v, curSnap.committedAtMs))
          }
        case _ =>
          // a legacy version without a manifest: no file identity to
          // prove carries — degrade to diffing the full images
          val addedRows = align(
            ObjectStoreSink.readVersion(spark, spec, Some(v)),
            shapeOf(spark, spec, v), toShape)
          val removedRows = align(
            ObjectStoreSink.readVersion(spark, spec, Some(v - 1)),
            shapeOf(spark, spec, v - 1), toShape)
          Some(step(addedRows, removedRows, v, curSnap.committedAtMs))
      }
    }
  }

  /** One commit step's change rows: the bag differences of the touched
    * file sets — rewritten-but-identical rows cancel, a COW update
    * surfaces as its delete + insert pair.
    */
  private def step(addedRows: DataFrame, removedRows: DataFrame,
      v: Int, tsMs: Long): DataFrame = {
    val inserts = addedRows.exceptAll(removedRows)
      .withColumn("_change_type", lit("insert"))
    val deletes = removedRows.exceptAll(addedRows)
      .withColumn("_change_type", lit("delete"))
    inserts.unionByName(deletes).withColumn("_commit_version", lit(v))
      .withColumn("_commit_timestamp_ms", lit(tsMs))
  }

  /** The LOGICAL shape a version's rows read under — its pinned sidecar
    * (physical-name metadata intact) or schema-on-read for never-pinned
    * versions (where physical == logical by construction).
    */
  private def shapeOf(spark: SparkSession, spec: ObjectStoreSpec,
      v: Int): StructType = {
    val dir = Paths.get(ObjectStoreSink.snapshots(spec)
      .find(_.version == v).get.path)
    ObjectStoreSink.sidecarSchema(dir).getOrElse(
      ObjectStoreSink.readVersion(spark, spec, Some(v)).schema)
  }

  /** Project a version's logical rows onto the TO version's logical
    * shape, matching columns by PHYSICAL name (stable across renames):
    * widened types up-cast, dropped columns vanish, later-added columns
    * read NULL.
    */
  private def align(df: DataFrame, from: StructType,
      to: StructType): DataFrame = {
    val byPhys = from.fields.map(f =>
      ObjectStoreSink.physName(f) -> f.name).toMap
    df.select(to.fields.map { nf =>
      byPhys.get(ObjectStoreSink.physName(nf)) match {
        case Some(oldName) => col(oldName).cast(nf.dataType).as(nf.name)
        case None => lit(null).cast(nf.dataType).as(nf.name)
      }
    }.toIndexedSeq: _*)
  }
}
