package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** CSV/text temp sink (K7, reference DataFrameUtil.scala:77-106): delimited
  * dump of a DataFrame for downstream REST/data-API consumption. Distributed
  * by default; `singleFile = true` coalesces to one part file when a caller
  * genuinely needs one artifact (the reference always did — its consumers
  * read one object) at the cost of a single-task write.
  */
object TextSink {

  def writeCsv(df: DataFrame, path: String, header: Boolean = false,
      delimiter: String = ",", singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("header", header)
      .option("sep", delimiter)
      .csv(path)
  }

  /** Semi-structured payload column (`_json`/`_xml`) → text files. */
  def writeText(df: DataFrame, column: String, path: String,
      singleFile: Boolean = false): Unit = {
    val out0 = df.select(df(column).cast("string").as("value"))
    val out = if (singleFile) out0.coalesce(1) else out0
    out.write.mode(SaveMode.Overwrite).text(path)
  }
}
