package graft.script

import graft.model.FieldSpec
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/** The script row-function operators (SURVEY §2.8): user scripts applied
  * per row via `mapPartitions` — the parsed AST ships to executors once and
  * each task walks it per row, vs the reference's new ScriptEngine per row
  * (Transformation.scala:129, DataQuality.scala:182).
  *
  * Binding semantics mirror RowUtil.getRowAsMap (RowUtil.scala:25-77):
  * column values typed by source-schema prefix (numerics → JS number,
  * everything else string), empty/null bound as-is. `flatMap` keeps
  * filter + transform + add-columns in one pass.
  */
object RowScripts {

  /** Transform row function (Transformation.scala:71-148):
    * script returns null → drop the row; else a HashMap of changed/added
    * column values. The output row is rebuilt in DESTINATION schema order:
    * changed values JS-stringified, unchanged carried from the input,
    * missing → "" — all columns as strings (the cast projection applies the
    * destination types afterwards, same as the reference's Spark job).
    */
  def transform(df: DataFrame, scriptSrc: String, srcFields: Seq[FieldSpec],
      destFields: Seq[FieldSpec], pipelineTimestamp: String): DataFrame = {
    val script = JsInterp.parse(scriptSrc) // parse once, driver-side
    val srcF = srcFields.toArray
    val destNames = destFields.map(_.name).toArray
    val outSchema = StructType(destNames.map(StructField(_, StringType, nullable = true)))
    val inCols = df.columns
    val inIndex: Map[String, Int] = inCols.zipWithIndex.toMap
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val bindings = typedBindings(row, inCols, srcF) +
          ("_pipelinetimestamp" -> pipelineTimestamp)
        script.eval(bindings) match {
          case null => None
          case m: java.util.HashMap[_, _] =>
            val changed = m.asInstanceOf[java.util.HashMap[String, Any]]
            Some(Row.fromSeq(destNames.map { name =>
              val v = changed.get(name)
              if (v != null) JsInterp.jsToString(v)
              else inIndex.get(name) match {
                case Some(i) if !row.isNullAt(i) => String.valueOf(row.get(i))
                case _ => "" // column exists only in the destination schema
              }
            }.toIndexedSeq))
          case other => throw new JsInterp.JsError(
            s"transform script must return null or a HashMap, got: $other")
        }
      }
    }(Encoders.row(outSchema))
  }

  /** DQ row rule (DataQuality.scala:82-127): script returns null → row
    * passes; else the failure description. Returns (row_number, is_error,
    * message) per failing row, with the reference's header+2 numbering
    * (row 0 of the data = line 2 of the file).
    */
  def rowRuleFailures(df: DataFrame, scriptSrc: String, srcFields: Seq[FieldSpec],
      onFailureIsError: Boolean): DataFrame = {
    val script = JsInterp.parse(scriptSrc)
    val srcF = srcFields.toArray
    val inCols = df.columns
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("row_number", LongType, nullable = false),
      StructField("is_error", BooleanType, nullable = false),
      StructField("message", StringType, nullable = false)))
    // zipWithIndex preserves the scan's row order (file order for file
    // sources) so reported row numbers match the incoming file like the
    // reference's List.zipWithIndex.
    val failures = df.rdd.zipWithIndex().flatMap { case (row, idx) =>
      val bindings = typedBindings(row, inCols, srcF)
      script.eval(bindings) match {
        case null => None
        case desc =>
          Some(Row(idx + 2L, onFailureIsError,
            s"Data quality failure, row: ${idx + 2}, description: ${JsInterp.jsToString(desc)}"))
      }
    }
    spark.createDataFrame(failures, outSchema)
  }

  /** RowUtil-typed bindings: numeric source types → Double (JS number),
    * boolean → Boolean, everything else the raw string; null/empty bound
    * as-is so scripts see missing cells.
    */
  private def typedBindings(row: Row, inCols: Array[String],
      srcFields: Array[FieldSpec]): Map[String, Any] = {
    val b = Map.newBuilder[String, Any]
    srcFields.foreach { f =>
      val i = row.fieldIndex(f.name)
      val raw = if (row.isNullAt(i)) null else row.get(i)
      b += f.name -> convert(raw, f.`type`)
    }
    // Columns outside the declared schema (e.g. added upstream) bind raw.
    val declared = srcFields.map(_.name).toSet
    inCols.filterNot(declared).foreach { c =>
      val i = row.fieldIndex(c)
      b += c -> (if (row.isNullAt(i)) null else row.get(i))
    }
    b.result()
  }

  private def convert(raw: Any, typeString: String): Any = raw match {
    case null => null
    case s: String if s.isEmpty => s // reference binds the empty cell as-is
    case v =>
      val t = typeString
      def str = String.valueOf(v)
      if (t.startsWith("boolean")) str.toBoolean
      else if (t.startsWith("tinyint") || t.startsWith("smallint") ||
        t.startsWith("int") || t.startsWith("bigint") ||
        t.startsWith("float") || t.startsWith("double") ||
        t.startsWith("decimal")) str.toDouble
      else str
  }
}
