package graft.sources

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured file readers with the reference's option surface, Spark-first.
  *
  * CSV mirrors transform/.../DataFrameUtil.readData (DataFrameUtil.scala:34-75):
  * header/delimiter/multiline/escape/encoding, declared schema else full-scan
  * inference, then the user's `sparkReadOptions` applied LAST so they can
  * override anything. JSON/XML mirrors JsonXmlReader.scala:33-60: the payload
  * is a single string column `_json`/`_xml`, one row per line or one row per
  * file. All readers accept a file, a directory, or a glob — Spark fans out
  * natively, which is the multi-file union (S2's header-strip concat) for free.
  */
object FileSources {

  /** Read any structured file source per the spec. Dispatches on which
    * format block is present.
    */
  def read(spark: SparkSession, spec: PipelineSpec, path: String): DataFrame = {
    val file = spec.source.file.getOrElse(
      throw new PipelineSpecException(s"dataset '${spec.name}' has no file source"))
    file match {
      case f if f.csv.isDefined  => readCsv(spark, spec, path)
      case f if f.json.isDefined =>
        readSemiStructured(spark, path, "_json", f.json.get)
      case f if f.xml.isDefined  =>
        readSemiStructured(spark, path, "_xml", f.xml.get)
      case f if f.xlsx.isDefined => XlsxSource.read(spark, spec, path)
      case _ => throw new PipelineSpecException(
        s"dataset '${spec.name}': no readable format block in file source")
    }
  }

  /** Multi-file variant (bulk/archive loads): one logical multi-path scan. */
  def readCsv(spark: SparkSession, spec: PipelineSpec, paths: Seq[String]): DataFrame =
    readCsvPaths(spark, spec, paths)

  def readCsv(spark: SparkSession, spec: PipelineSpec, path: String): DataFrame =
    readCsvPaths(spark, spec, Seq(path))

  private def readCsvPaths(spark: SparkSession, spec: PipelineSpec,
      paths: Seq[String]): DataFrame = {
    val csv = spec.source.file.flatMap(_.csv).getOrElse(CsvSpec())
    val trim = spec.transformation.exists(_.trimColumnWhitespace)
    // NOTE: the reference forces multiLine=true (DataFrameUtil.scala:41);
    // we deliberately default to false — multiLine CSV is not splittable in
    // Spark (one task per file, a 100 GB file reads on one core). Datasets
    // with quoted embedded newlines opt in via sparkReadOptions.
    var r = spark.read.format("csv")
      .option("header", csv.header)
      .option("sep", csv.delimiter)
      .option("escape", "\"")
      .option("encoding", csv.encoding)
      // P9: skip blank lines (reference CSVReader setIgnoreEmptyLines)
      .option("mode", "PERMISSIVE")
    if (trim) r = r
      .option("ignoreLeadingWhiteSpace", true)
      .option("ignoreTrailingWhiteSpace", true)
    // Declared schema beats inference; inference scans everything
    // (samplingRatio=1.0) like the reference.
    r = if (spec.source.schema.nonEmpty)
      // Read as all-strings and cast later: a malformed numeric cell must
      // become NULL in the cast step (visible to DQ), not nuke the whole row
      // in the parser.
      r.schema(SchemaMapper.toStructType(spec.source.schema.map(f =>
        FieldSpec(f.name, "string"))))
    else r.option("inferSchema", true).option("samplingRatio", 1.0)
    spec.source.file.foreach(_.sparkReadOptions.foreach { case (k, v) =>
      r = r.option(k, v) })
    lowercaseHeaders(r.load(paths: _*))
  }

  /** JSON/XML → single string column, named `_json`/`_xml`.
    * Line mode: one object per row (`spark.read.text` — splittable, scales).
    * Whole-file mode: one row per file (`wholetext` — the file is the
    * payload; only sane for config-sized documents, as in the reference).
    */
  def readSemiStructured(spark: SparkSession, path: String, colName: String,
      s: SemiStructuredSpec): DataFrame = {
    val base = spark.read
      .option("lineSep", "\n")
      .option("encoding", s.encoding)
    val df =
      if (s.everyRowContainsObject) base.text(path).filter(length(trim(col("value"))) > 0)
      else base.option("wholetext", true).text(path)
    df.withColumnRenamed("value", colName)
  }

  /** P4: headers lowercased at read (reference Transform.scala:104-105). */
  def lowercaseHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)

  /** P2/P3: project + cast to the destination schema, in destination order
    * (reference DataFrameUtil.applyDestinationSchema + reorderColumns).
    * Columns missing from the input become typed nulls; extra input columns
    * are dropped.
    */
  def applyDestinationSchema(df: DataFrame, dest: Seq[FieldSpec],
      decimalCompat: Boolean = false): DataFrame = {
    val have = df.columns.toSet
    df.select(dest.map { f =>
      val dt = SchemaMapper.toDataType(f.`type`, decimalCompat)
      // try_cast, not cast: malformed cells (e.g. the script rebuild's ""
      // for absent values) become typed NULLs — the pre-ANSI semantics the
      // reference's pipeline relies on — instead of failing the job under
      // Spark 4's ANSI default.
      if (have(f.name)) expr(s"try_cast(`${f.name}` AS ${dt.sql})").as(f.name)
      else lit(null).cast(dt).as(f.name)
    }: _*)
  }
}
