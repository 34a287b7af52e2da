package graft.script

import graft.SparkSpec
import graft.model.FieldSpec

class RowScriptsSpec extends SparkSpec {

  private val srcFields = Seq("symbol" -> "string", "date" -> "string",
    "open" -> "double", "high" -> "double", "low" -> "double",
    "close" -> "double", "volume" -> "int", "adj_close" -> "double")
    .map { case (n, t) => FieldSpec(n, t) }

  private def stockDf = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      srcFields.map(f => org.apache.spark.sql.types.StructField(
        f.name, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(Seq(
      org.apache.spark.sql.Row("FAX", "2016-12-30", "4.65", "4.70", "4.61", "4.63", "3498900", "4.63"),
      org.apache.spark.sql.Row("IAF", "2016-12-30", "5.44", "5.48", "5.40", "5.42", "103500", "5.42"),
      org.apache.spark.sql.Row("FCO", "2016-12-30", null, "8.01", "7.91", "7.96", "64800", "7.96")
    ).asJava, schema)
  }

  test("transform: drops FAX, bumps adj_close, adds year + mynewcolumn, dest order") {
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/stock_price_transformation.js")), "UTF-8")
    // destination schema ADDS year + mynewcolumn (reference
    // stock_price_object_store_transform dataset in tests-api.sh)
    val dest = srcFields ++ Seq(FieldSpec("year", "string"), FieldSpec("mynewcolumn", "double"))
    val out = RowScripts.transform(stockDf, script, srcFields, dest,
      "2026-08-12 09:00:00.000 UTC")
    out.columns.toSeq shouldBe dest.map(_.name)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    rows.keySet shouldBe Set("IAF", "FCO") // FAX dropped
    val iaf = rows("IAF")
    iaf.getString(iaf.fieldIndex("adj_close")) shouldBe "6.42"      // 5.42 + 1.0
    iaf.getString(iaf.fieldIndex("year")) shouldBe "2026"
    iaf.getString(iaf.fieldIndex("mynewcolumn")) shouldBe "100"     // JS ToString
    iaf.getString(iaf.fieldIndex("volume")) shouldBe "103500"       // carried over
    // FCO's null `open` carries through as "" (reference missing → "")
    rows("FCO").getString(2) shouldBe ""
  }

  test("row rule: AXN rows are flagged with header+2 numbering") {
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/stock_price_data_quality.js")), "UTF-8")
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      srcFields.map(f => org.apache.spark.sql.types.StructField(
        f.name, org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row("IAF", "d", "1", "1", "1", "1", "1", "1"),
      org.apache.spark.sql.Row("AXN", "d", "1", "1", "1", "1", "1", "1"),
      org.apache.spark.sql.Row("BXN", "d", "1", "1", "1", "1", "1", "1")
    ).asJava, schema)
    val fails = RowScripts.rowRuleFailures(df, script, srcFields, onFailureIsError = false)
    val rows = fails.collect()
    rows.length shouldBe 1
    rows.head.getLong(0) shouldBe 3L // second data row = file line 3
    rows.head.getBoolean(1) shouldBe false
    rows.head.getString(2) should include ("AXN")
  }
}
