package graft.sinks

import graft.model.{ObjectStoreSpec, PipelineSpecException}
import graft.operators.MergeUpsert
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Data-lake sink (K1/K2/K3/M5): partitioned parquet (or csv/json/orc) under
  * `spec.path/<table>`, registered in the Spark session catalog so the full
  * SQL surface works over what the pipeline lands — the local equivalent of
  * the reference's S3+Glue+Athena triple (ObjectStoreLoader.scala:49-209,
  * transform ObjectStoreUtil.scala:139-209).
  *
  * Semantics:
  *   - `keyFields` empty  → plain append/overwrite `partitionBy` write.
  *   - `keyFields` set    → MERGE upsert: existing table full-outer-merged
  *     with the batch on the keys (IcebergUtil.scala:124-157 semantics),
  *     then the table is atomically swapped via a staging directory — the
  *     plain-parquet stand-in for an ACID table-format commit, per the
  *     reference's `writeToTemporaryLocation` discipline.
  *   - `deleteBeforeWrite` → truncate the table dir first (K1 flag).
  *
  * Scale: the merge is one co-partitioned shuffle on the keys; the swap is a
  * metadata move. Partition pruning works through the catalog (partitionBy
  * columns become directory keys). On a real deployment the staging swap is
  * replaced by an Iceberg/Delta MERGE commit — the plan shape is identical.
  */
object ObjectStoreSink {

  def write(spark: SparkSession, df: DataFrame, spec: ObjectStoreSpec): String = {
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${spec.database}")
    val tableDir = Paths.get(spec.path, spec.database, spec.table)
    Files.createDirectories(tableDir.getParent)

    if (spec.deleteBeforeWrite && Files.exists(tableDir)) {
      spark.sql(s"DROP TABLE IF EXISTS $fq")
      deleteTree(tableDir)
    }

    val exists = spark.catalog.tableExists(fq)
    if (spec.keyFields.nonEmpty && exists) mergeInto(spark, df, spec, fq, tableDir)
    else plainWrite(spark, df, spec, fq, tableDir, exists)
    fq
  }

  private def plainWrite(spark: SparkSession, df: DataFrame, spec: ObjectStoreSpec,
      fq: String, tableDir: Path, exists: Boolean): Unit = {
    val mode = spec.writeMode.toLowerCase match {
      case "overwrite" => SaveMode.Overwrite
      case "append" | "" => SaveMode.Append
      case other => throw new PipelineSpecException(s"unknown writeMode '$other'")
    }
    val w0 = df.write.mode(mode).format(spec.fileFormat)
      .option("path", tableDir.toString)
    val w = if (spec.partitionBy.nonEmpty) w0.partitionBy(spec.partitionBy: _*) else w0
    if (exists) {
      // schema evolution (reference DatasetObjectStoreUtil.scala:71-100):
      // a changed destination schema re-creates the catalog entry — a new
      // "table version" over the same location. Old files stay; parquet
      // schema-on-read surfaces their missing columns as NULL.
      if (schemaChanged(spark, fq, df, spec)) {
        spark.sql(s"DROP TABLE IF EXISTS $fq")
        createExternal(spark, fq, spec, partitionsLast(df, spec))
        repairTable(spark, fq, spec)
      }
      // appending to a known table: insertInto resolves by position against
      // the catalog schema (partition columns last, like the reference's
      // reordered INSERT...SELECT, ObjectStoreLoader.scala:183-201)
      val cat = spark.table(fq).columns
      df.select(cat.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
        .write.mode(mode).insertInto(fq)
    } else w.saveAsTable(fq)
  }

  /** Field names or types differ from the registered table (order-blind on
    * names, partition reorder ignored) → new table version needed.
    */
  private def schemaChanged(spark: SparkSession, fq: String, df: DataFrame,
      spec: ObjectStoreSpec): Boolean = {
    val cat = spark.table(fq).schema
    val incoming = partitionsLast(df, spec).schema
    cat.fields.map(f => (f.name, f.dataType)).toSeq !=
      incoming.fields.map(f => (f.name, f.dataType)).toSeq
  }

  private def partitionsLast(df: DataFrame, spec: ObjectStoreSpec): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (parts, data) = df.columns.partition(spec.partitionBy.contains)
    df.select((data ++ parts).map(col).toIndexedSeq: _*)
  }

  /** MERGE the batch into the existing table, then swap table data via a
    * staging dir (plain parquet has no transactional overwrite-while-read).
    */
  private def mergeInto(spark: SparkSession, batch: DataFrame, spec: ObjectStoreSpec,
      fq: String, tableDir: Path): Unit = {
    val target = spark.table(fq)
    // align batch to the table schema (by name, cast to table types)
    val aligned = batch.select(target.schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    replaceTable(spark, MergeUpsert(target, aligned, spec.keyFields), spec)
  }

  /** Replace a table's contents with `df` (which may READ the same table —
    * e.g. a merge result or a CDC-applied image): materialize to a staging
    * dir first, swap directories, re-register the catalog entry. The
    * plain-parquet stand-in for an ACID table-format commit.
    */
  def replaceTable(spark: SparkSession, df: DataFrame, spec: ObjectStoreSpec): String = {
    val fq = s"${spec.database}.${spec.table}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${spec.database}")
    val tableDir = Paths.get(spec.path, spec.database, spec.table)
    Files.createDirectories(tableDir.getParent)
    val staging = tableDir.resolveSibling(s".${spec.table}-staging-${java.util.UUID.randomUUID}")
    val sw0 = df.write.mode(SaveMode.Overwrite).format(spec.fileFormat)
    val sw = if (spec.partitionBy.nonEmpty) sw0.partitionBy(spec.partitionBy: _*) else sw0
    sw.save(staging.toString) // materialize BEFORE touching the live table
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    deleteTree(tableDir)
    Files.move(staging, tableDir)
    // re-register the catalog entry over the swapped location (saveAsTable
    // would rewrite the data we just moved; CREATE ... LOCATION is pure
    // metadata)
    val reread = spark.read.format(spec.fileFormat).load(tableDir.toString)
    createExternal(spark, fq, spec, reread)
    repairTable(spark, fq, spec)
    fq
  }

  /** CREATE TABLE ... USING fmt LOCATION ... (+ PARTITIONED BY). Datasource
    * tables declare partition columns inside the column list and reference
    * them by NAME in PARTITIONED BY (listing a type there would define a
    * new, duplicate column — Hive syntax, not USING syntax).
    */
  private def createExternal(spark: SparkSession, fq: String, spec: ObjectStoreSpec,
      sample: DataFrame): Unit = {
    val allCols = sample.schema.fields.map(f => s"`${f.name}` ${f.dataType.sql}")
    val partClause =
      if (spec.partitionBy.nonEmpty)
        s"PARTITIONED BY (${spec.partitionBy.map(c => s"`$c`").mkString(", ")})"
      else ""
    val loc = Paths.get(spec.path, spec.database, spec.table).toUri.toString
    spark.sql(
      s"""CREATE TABLE $fq (${allCols.mkString(", ")})
         |USING ${spec.fileFormat} $partClause LOCATION '$loc'""".stripMargin)
  }

  /** MSCK REPAIR equivalent: sync partition directories into the catalog
    * (reference transform ObjectStoreUtil.scala:183-209 repairTable).
    */
  def repairTable(spark: SparkSession, fq: String, spec: ObjectStoreSpec): Unit =
    if (spec.partitionBy.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $fq"): Unit

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
