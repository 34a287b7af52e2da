package graft.model

/** The engine's public API: a per-dataset JSON document declaring source →
  * data-quality → transformation → destination, compiled by
  * [[graft.runtime.Pipeline]] into a DataFrame pipeline.
  *
  * Capability mirror of the reference's `DatasetConfig`
  * (common/.../model/DatasetConfig.scala:21-168), re-expressed as idiomatic
  * Scala: `Option` instead of nulls, `Seq`/`Map` instead of java.util
  * collections, local paths instead of S3 URLs, the Spark session catalog
  * instead of Glue, and a generic JDBC sink instead of the three warehouse
  * loaders. AWS-orchestration fields with no local meaning
  * (destinationBucketOverride, useAthena, useSparkCluster, secrets names)
  * intentionally have no counterpart — the whole engine IS Spark.
  */
final case class PipelineSpec(
    name: String,
    source: SourceSpec,
    dataQuality: Option[DataQualitySpec] = None,
    transformation: Option[TransformSpec] = None,
    destination: DestinationSpec,
    /** Reference-compat: cast decimal(p,s) columns to DOUBLE like the
      * reference does (DataFrameUtil.scala:128-129, precision-lossy)
      * instead of the correct DecimalType. See SchemaMapper.
      */
    decimalCompat: Boolean = false) {

  /** Reference `DatasetValidatorUtil.modify()` (:326-355) equivalent:
    * lowercase every identifier, force the single `_json`/`_xml` column for
    * semi-structured sources, default the destination schema to the source
    * schema. Returns the normalized spec; call [[validated]] after.
    */
  def normalized: PipelineSpec = {
    val src0 = source.copy(schema = source.schema.map(_.normalized))
    // Semi-structured data is exactly one string column named _json/_xml
    // (reference DatasetValidatorUtil.scala:294-323).
    val src = src0.file match {
      case Some(f) if f.json.isDefined =>
        src0.copy(schema = Seq(FieldSpec("_json", "string")))
      case Some(f) if f.xml.isDefined =>
        src0.copy(schema = Seq(FieldSpec("_xml", "string")))
      case _ => src0
    }
    val destSchema0 =
      if (destination.schema.nonEmpty) destination.schema.map(_.normalized)
      else src.schema
    // credential indirection is CHECKED at load time — a dangling ${env:}/
    // ${file:} reference fails HERE, before any data moves — but the
    // resolved secret is DISCARDED: the stored spec keeps the reference
    // (a registered spec is served back over GET /dataset, so plaintext
    // credentials must never enter the document; JdbcPull/JdbcSink
    // resolve again at connection time).
    (src.database.toSeq ++ destination.database.toSeq.map(d =>
      JdbcSourceSpec(url = d.url, user = d.user, password = d.password)))
      .foreach { d =>
        SecretRef.resolve(d.url): Unit
        SecretRef.resolveOpt(d.user): Unit
        SecretRef.resolveOpt(d.password): Unit
      }
    copy(
      name = name.toLowerCase,
      source = src,
      destination = destination.copy(schema = destSchema0,
        objectStore = destination.objectStore.map(o =>
          o.copy(table = o.table.toLowerCase,
            database = o.database.toLowerCase,
            partitionBy = o.partitionBy.map(_.toLowerCase),
            keyFields = o.keyFields.map(_.toLowerCase)))))
  }

  /** Structural validation (reference DatasetValidatorUtil.scala:28-289
    * semantics): every declared type must map to a Spark type; partition and
    * key columns must exist in the destination schema; semi-structured
    * schemas must be the single `_json`/`_xml` column.
    */
  def validated: PipelineSpec = {
    def fail(msg: String) = throw new PipelineSpecException(s"dataset '$name': $msg")
    (source.schema ++ destination.schema).foreach { f =>
      if (!SchemaMapper.isSupported(f.`type`))
        fail(s"unsupported field type '${f.`type`}' for field '${f.name}'")
    }
    val dup = source.schema.groupBy(_.name).collect { case (n, fs) if fs.size > 1 => n }
    if (dup.nonEmpty) fail(s"duplicate source field(s): ${dup.mkString(", ")}")
    // a configured split appends bucket/split AFTER the destination cast,
    // so they are legal partition/key columns for the sink
    val splitNames: Set[String] =
      if (transformation.exists(_.split.isDefined)) Set("bucket", "split")
      else Set.empty
    val destNames = destination.schema.map(_.name).toSet ++ splitNames
    destination.objectStore.foreach { o =>
      o.partitionBy.filterNot(destNames).foreach(c =>
        fail(s"partitionBy column '$c' not in destination schema"))
      o.keyFields.filterNot(destNames).foreach(c =>
        fail(s"keyFields column '$c' not in destination schema"))
    }
    transformation.flatMap(_.split).foreach { sp =>
      if (sp.trainPm < 0 || sp.valPm < 0 || sp.trainPm + sp.valPm > 1000)
        fail(s"split per-mille thresholds must fit in [0, 1000]")
      if (!destination.schema.map(_.name).contains(sp.idField))
        fail(s"split.idField '${sp.idField}' is not a destination column")
    }
    source.file.foreach { f =>
      if (f.json.isDefined || f.xml.isDefined) {
        val expect = if (f.json.isDefined) "_json" else "_xml"
        if (source.schema.map(_.name) != Seq(expect))
          fail(s"semi-structured source schema must be the single column '$expect'")
      }
    }
    this
  }
}

class PipelineSpecException(msg: String) extends RuntimeException(msg)

/** The specific spec failure "this catalog table provably does not follow
  * the versioned-table layout" — the ONLY condition under which the SQL
  * dialect's verbs delegate to the next parser (a co-installed extension
  * may own the table). Every other [[PipelineSpecException]] (legacy
  * manifest with an unrecognizable file format, …) stays OURS and fails
  * loudly at run time instead of surfacing a foreign parse error.
  */
final class TableLayoutException(msg: String) extends PipelineSpecException(msg)

final case class FieldSpec(name: String, `type`: String) {
  def normalized: FieldSpec =
    FieldSpec(name.trim.toLowerCase, `type`.trim.toLowerCase)
}

final case class SourceSpec(
    schema: Seq[FieldSpec] = Nil,
    file: Option[FileSpec] = None,
    database: Option[JdbcSourceSpec] = None)

/** File-source attributes (reference FileAttributes). Exactly one of the
  * format specs should be set; `sparkReadOptions` is the user-passthrough
  * option map applied last (reference DatasetConfig.scala:85).
  */
final case class FileSpec(
    csv: Option[CsvSpec] = None,
    json: Option[SemiStructuredSpec] = None,
    xml: Option[SemiStructuredSpec] = None,
    xlsx: Option[XlsxSpec] = None,
    unstructured: Option[UnstructuredSpec] = None,
    sparkReadOptions: Map[String, String] = Map.empty)

final case class CsvSpec(
    delimiter: String = ",",
    header: Boolean = true,
    encoding: String = "UTF-8")

/** `everyRowContainsObject=true` → one JSON/XML object per line (N rows);
  * false → whole file is one object (1 row). Reference JsonXmlReader.scala:33-60.
  */
final case class SemiStructuredSpec(
    everyRowContainsObject: Boolean = false,
    encoding: String = "UTF-8")

final case class XlsxSpec(worksheet: Int = 0,
    /** Re-evaluate every formula cell instead of trusting cached results
      * (POI-evaluator parity; stale caches in hand-edited files differ). */
    evaluateFormulas: Boolean = false)

final case class UnstructuredSpec(
    fileExtension: String,
    preserveFilename: Boolean = false)

/** JDBC incremental-pull source (reference DatabaseAttributes +
  * DataPuller.scala:36-235): watermarked SELECT on a timestamp column,
  * scheduled by cron expression, with optional full SQL override.
  */
final case class JdbcSourceSpec(
    url: String,
    driver: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None,
    cronExpression: Option[String] = None,
    table: String = "",
    includeFields: Seq[String] = Nil,
    timestampFieldName: String = "",
    sqlOverride: Option[String] = None)

final case class DataQualitySpec(
    validateFileHeader: Boolean = false,
    validationSchema: Option[String] = None,
    rowRules: Seq[RowRuleSpec] = Nil,
    columnRules: Seq[ColumnRuleSpec] = Nil)

/** `function` is the rule engine name — "script" (or the reference's
  * "javascript") is the only engine; parameter 0 is the script path.
  */
final case class RowRuleSpec(
    function: String,
    parameters: Seq[String] = Nil,
    onFailureIsError: Boolean = false)

final case class ColumnRuleSpec(
    columnName: String,
    function: String,
    parameter: String,
    onFailureIsError: Boolean = false,
    description: String = "")

final case class TransformSpec(
    trimColumnWhitespace: Boolean = false,
    deduplicate: Boolean = false,
    rowFunctions: Seq[RowFunctionSpec] = Nil,
    /** Deterministic train/val/test assignment appended AFTER the
      * destination cast (`bucket` + `split` columns; see
      * [[graft.operators.DatasetSplit]]). Combine with
      * `objectStore.partitionBy: ["split"]` to land each split in its own
      * partition directory — downstream readers prune to one split.
      */
    split: Option[SplitSpec] = None)

final case class SplitSpec(
    idField: String,
    trainPm: Int = 900,
    valPm: Int = 50)

final case class RowFunctionSpec(function: String, parameters: Seq[String] = Nil)

final case class DestinationSpec(
    schema: Seq[FieldSpec] = Nil,
    objectStore: Option[ObjectStoreSpec] = None,
    database: Option[JdbcSinkSpec] = None)

/** Data-lake sink: partitioned parquet under `path`, registered in the
  * session catalog as `database.table`. `keyFields` non-empty → MERGE upsert
  * on those keys instead of append/overwrite (reference ObjectStore +
  * IcebergUtil MERGE semantics).
  */
final case class ObjectStoreSpec(
    path: String,
    database: String = "graft",
    table: String,
    partitionBy: Seq[String] = Nil,
    fileFormat: String = "parquet",
    writeMode: String = "append", // append | overwrite
    deleteBeforeWrite: Boolean = false,
    keyFields: Seq[String] = Nil,
    // opt-in per-file Bloom indexes built at commit for point/IN/join-key
    // file skipping on unclustered layouts (graft.sinks.BloomIndex);
    // partition columns are ignored (directory pruning already covers them)
    bloomColumns: Seq[String] = Nil,
    // opt-in exact per-file column sums recorded in the manifest at commit
    // (TableManifest.enrichSums) so SUM/decimal-AVG answer metadata-only
    // (MetaAggRule); integral + decimal columns only — float sums are
    // order-dependent and never recorded. One extra distributed aggregate
    // pass over the just-written files per commit (link-appends enrich
    // only the new files); partition columns need no recording (their
    // single-valued stats already prove the sum)
    sumColumns: Seq[String] = Nil)

/** Warehouse-shaped JDBC sink (reference Snowflake/Redshift/Postgres loaders
  * collapsed to one Spark JDBC writer): create-table-if-absent from the
  * destination schema, optional truncate, append copy, or delete+insert
  * merge on `keyFields` in a transaction.
  *
  * Per-warehouse dialect hooks (the surface the reference spreads across
  * loaders):
  *   - `columnTypes`: verbatim database column types for named columns in
  *     the created table — the `_json` → VARIANT/SUPER/json typed-DDL seam
  *     (SnowflakeLoader.scala:333-346, RedshiftLoader.scala:196-199)
  *   - `preSql`/`postSql`: statements run on the target before/after the
  *     load, `@table` substituted (the sqlOverride/`@stage` surface,
  *     SnowflakeLoader.scala:325-370)
  */
final case class JdbcSinkSpec(
    url: String,
    driver: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None,
    table: String,
    keyFields: Seq[String] = Nil,
    truncateBeforeWrite: Boolean = false,
    columnTypes: Map[String, String] = Map.empty,
    preSql: Seq[String] = Nil,
    postSql: Seq[String] = Nil)
