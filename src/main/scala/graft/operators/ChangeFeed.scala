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
    // ONE snapshot inventory for the whole feed: every step needs the
    // same version list, and snapshots() re-reads every manifest — the
    // former per-step (and per-shapeOf) calls made a V-step feed cost
    // O(V²) manifest parses on the driver
    val snaps = ObjectStoreSink.snapshots(spec)
    def snapOf(v: Int) = snaps.find(_.version == v).getOrElse(
      throw new PipelineSpecException(
        s"TABLE_CHANGES on $fq: version $v does not exist or is not " +
          s"committed (have: ${snaps.map(_.version).mkString(", ")})"))
    if (fromVersion > toVersion) throw new PipelineSpecException(
      s"TABLE_CHANGES on $fq: FROM version $fromVersion is after TO " +
        s"version $toVersion")
    val toSnap = snapOf(toVersion)
    val toShape = shapeOf(spark, spec, toSnap)
    if (fromVersion > 0) snapOf(fromVersion): Unit

    val perStep = ((math.max(fromVersion, 0) + 1) to toVersion).flatMap { v =>
      if (v - 1 == 0 && snaps.forall(_.version != 0)) {
        // bootstrap step: everything in the first snapshot is an insert —
        // there is no removed side to cancel against, so the feed is the
        // snapshot read TAGGED, no aggregation at all (the former
        // exceptAll-pair shape still shuffled the full image twice)
        val curSnap = snapOf(v)
        val cm = TableManifest.read(Paths.get(curSnap.path))
        val addedRows = align(cm match {
          case Some(m) => ObjectStoreSink.readSubset(spark, curSnap.path,
            spec.fileFormat, m.files, m.files.size)
          case None => ObjectStoreSink.readVersion(spark, spec, Some(v))
        }, curSnap, toShape)
        Some(tagOnly(addedRows, insert = true, v, curSnap.committedAtMs))
      } else stepOf(spark, spec, snapOf(v - 1), snapOf(v), toShape)
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
  private def stepOf(spark: SparkSession, spec: ObjectStoreSpec,
      prevSnap: ObjectStoreSink.Snapshot, curSnap: ObjectStoreSink.Snapshot,
      toShape: StructType): Option[DataFrame] = {
    val v = curSnap.version
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
            lazy val addedRows = align(
              ObjectStoreSink.readSubset(spark, curSnap.path,
                spec.fileFormat, added, cm.files.size),
              curSnap, toShape)
            lazy val removedRows = align(
              ObjectStoreSink.readSubset(spark, prevSnap.path,
                spec.fileFormat, removed, pm.files.size),
              prevSnap, toShape)
            // one-sided steps need no cancellation — the tagged read IS
            // the feed, zero shuffles (a link-append INSERT feeds only
            // its fresh files; a file-dropping DELETE only the dropped)
            if (removed.isEmpty)
              Some(tagOnly(addedRows, insert = true, v, curSnap.committedAtMs))
            else if (added.isEmpty)
              Some(tagOnly(removedRows, insert = false, v, curSnap.committedAtMs))
            else Some(step(addedRows, removedRows, v, curSnap.committedAtMs))
          }
        case _ =>
          // a legacy version without a manifest: no file identity to
          // prove carries — degrade to diffing the full images
          val addedRows = align(
            ObjectStoreSink.readVersion(spark, spec, Some(v)),
            curSnap, toShape)
          val removedRows = align(
            ObjectStoreSink.readVersion(spark, spec, Some(v - 1)),
            prevSnap, toShape)
          Some(step(addedRows, removedRows, v, curSnap.committedAtMs))
      }
    }
  }

  /** One commit step's change rows: the bag differences of the touched
    * file sets — rewritten-but-identical rows cancel, a COW update
    * surfaces as its delete + insert pair.
    *
    * ONE signed-count aggregation for both directions (guide §2.3/§2.4):
    * the former `added.exceptAll(removed)` / `removed.exceptAll(added)`
    * pair planned two independent sum-of-±1 aggregates (Spark's own
    * RewriteExceptAll lowering), each rescanning both inputs and paying
    * its own Exchange — the touched files were read twice and the union
    * shuffled twice per step. The fused form tags added +1 / removed −1,
    * aggregates once over every column, and reads the sign: n > 0 ⇒ |n|
    * surplus inserts, n < 0 ⇒ |n| surplus deletes, n = 0 ⇒ the row
    * carried (rewritten-but-identical — cancels, exactly exceptAll's
    * multiset arithmetic, including null-safe and NaN-normalized
    * grouping, which is the same Aggregate machinery exceptAll lowers
    * to). Multiplicity is restored with the same ReplicateRows generator
    * exceptAll uses, so duplicate-heavy keyless tables stream the
    * replicas instead of materializing per-row arrays.
    */
  private def step(addedRows: DataFrame, removedRows: DataFrame,
      v: Int, tsMs: Long): DataFrame = {
    val cols = addedRows.columns.toSeq
    // collision-free working names: withColumn silently REPLACES an existing
    // column, so a user column literally named _graft_w would be overwritten
    // (and grouping by the tag would break add/remove cancellation) — suffix
    // until absent, like the name-agnostic exceptAll path this replaced
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(nm => !cols.contains(nm)).get
    val w = fresh("_graft_w"); val n = fresh("_graft_n")
    val tagged = addedRows.withColumn(w, lit(1L))
      .unionByName(removedRows.withColumn(w, lit(-1L)))
    val counted = tagged.groupBy(cols.map(col): _*)
      .agg(sum(col(w)).as(n))
      .where(col(n) =!= 0L)
      .withColumn("_change_type",
        when(col(n) > 0, lit("insert")).otherwise(lit("delete")))
      .withColumn(w, abs(col(n))).drop(n)
    replicateRows(counted, w)
      .withColumn("_commit_version", lit(v))
      .withColumn("_commit_timestamp_ms", lit(tsMs))
  }

  /** A one-sided step (bootstrap, link-append INSERT, pure file-drop
    * DELETE): no opposite side exists to cancel against, so the feed is
    * the subset read tagged verbatim — no aggregation, no Exchange; the
    * plan is the file scan itself.
    */
  private def tagOnly(rows: DataFrame, insert: Boolean, v: Int,
      tsMs: Long): DataFrame =
    rows.withColumn("_change_type", lit(if (insert) "insert" else "delete"))
      .withColumn("_commit_version", lit(v))
      .withColumn("_commit_timestamp_ms", lit(tsMs))

  /** Replicate each row `timesCol` times (a positive Long column, consumed
    * and dropped) via Spark's own [[ReplicateRows]] generator — the
    * streaming replication exceptAll's RewriteExceptAll lowering uses,
    * rather than an `explode(sequence(...))` that would materialize an
    * n-element array per row.
    */
  private def replicateRows(df: DataFrame, timesCol: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.ReplicateRows
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val analyzed = df.queryExecution.analyzed
    val times = analyzed.output.find(_.name == timesCol).getOrElse(
      throw new IllegalStateException(s"no column '$timesCol' to replicate by"))
    val dataAttrs = analyzed.output.filterNot(_.name == timesCol)
    val gen = Generate(
      ReplicateRows(times +: dataAttrs),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Nil, analyzed)
    val out = GraftSqlBridge.ofRows(df.sparkSession, gen)
    // the analyzer appends the generated replicas AFTER the child's own
    // columns (fresh exprIds, generator-default names) — keep exactly the
    // generated half, re-aliased positionally to the child's column names
    val replicas = out.queryExecution.analyzed.output.drop(analyzed.output.size)
    out.select(replicas.zip(dataAttrs).map { case (a, orig) =>
      GraftSqlBridge.column(a).as(orig.name) }.toIndexedSeq: _*)
  }

  /** The LOGICAL shape a version's rows read under — its pinned sidecar
    * (physical-name metadata intact) or schema-on-read for never-pinned
    * versions (where physical == logical by construction).
    */
  private def shapeOf(spark: SparkSession, spec: ObjectStoreSpec,
      snap: ObjectStoreSink.Snapshot): StructType = {
    val dir = Paths.get(snap.path)
    ObjectStoreSink.sidecarSchema(dir).getOrElse(
      ObjectStoreSink.readVersion(spark, spec, Some(snap.version)).schema)
  }

  /** Project a version's logical rows onto the TO version's logical
    * shape, matching columns by PHYSICAL name (stable across renames):
    * widened types up-cast, dropped columns vanish, later-added columns
    * read NULL.
    */
  private def align(df: DataFrame, snap: ObjectStoreSink.Snapshot,
      to: StructType): DataFrame = {
    // the FROM version's logical shape: its pinned sidecar (physical-name
    // metadata intact) or, when none exists, the subset read's own schema
    // — physical == logical by construction on never-evolved versions,
    // and deriving it from `df` avoids the full-version schema-inference
    // read the former per-step shapeOf fallback paid
    val from: StructType = ObjectStoreSink.sidecarSchema(
      Paths.get(snap.path)).getOrElse(df.schema)
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
