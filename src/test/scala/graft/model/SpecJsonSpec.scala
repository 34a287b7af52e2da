package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.types._

class SpecJsonSpec extends AnyFunSuite with Matchers {

  private val stockJson =
    """{
      |  "name": "Stock_Price",
      |  "source": {
      |    "schema": [
      |      {"name": "Symbol", "type": "string"},
      |      {"name": "date", "type": "string"},
      |      {"name": "open", "type": "double"},
      |      {"name": "volume", "type": "int"}
      |    ],
      |    "file": {"csv": {"delimiter": ",", "header": true}}
      |  },
      |  "destination": {
      |    "objectStore": {
      |      "path": "/tmp/lake",
      |      "table": "Stock_Price",
      |      "partitionBy": ["date"],
      |      "keyFields": ["Symbol", "date"]
      |    }
      |  }
      |}""".stripMargin

  test("parse + normalize lowercases identifiers and defaults dest schema") {
    val spec = SpecJson.parse(stockJson)
    spec.name shouldBe "stock_price"
    spec.source.schema.map(_.name) shouldBe Seq("symbol", "date", "open", "volume")
    spec.destination.schema shouldBe spec.source.schema
    val os = spec.destination.objectStore.get
    os.table shouldBe "stock_price"
    os.keyFields shouldBe Seq("symbol", "date")
    os.writeMode shouldBe "append" // default applied
    spec.dataQuality shouldBe None
  }

  test("round-trips through write/parse") {
    val spec = SpecJson.parse(stockJson)
    SpecJson.parse(SpecJson.write(spec)) shouldBe spec
  }

  test("json source forces the single _json column") {
    val spec = SpecJson.parse(
      """{"name":"ev","source":{"file":{"json":{"everyRowContainsObject":true}}},
        |"destination":{"objectStore":{"path":"/tmp/l","table":"ev"}}}""".stripMargin)
    spec.source.schema shouldBe Seq(FieldSpec("_json", "string"))
  }

  test("validation rejects bad types and missing partition columns") {
    val bad = stockJson.replace("\"type\": \"double\"", "\"type\": \"complex<foo>\"")
    a[PipelineSpecException] should be thrownBy SpecJson.parse(bad)
    val badPart = stockJson.replace("[\"date\"]", "[\"nope\"]")
    a[PipelineSpecException] should be thrownBy SpecJson.parse(badPart)
  }

  test("SchemaMapper prefix matching and decimal handling") {
    SchemaMapper.toDataType("varchar(64)") shouldBe StringType
    SchemaMapper.toDataType("char(2)") shouldBe StringType
    SchemaMapper.toDataType("decimal(10,2)") shouldBe DecimalType(10, 2)
    SchemaMapper.toDataType("decimal(10,2)", decimalCompat = true) shouldBe DoubleType
    SchemaMapper.toDataType("tinyint") shouldBe IntegerType
    SchemaMapper.toDataType("bigint") shouldBe LongType
    SchemaMapper.toDataType("timestamp") shouldBe TimestampType
    an[IllegalArgumentException] should be thrownBy SchemaMapper.toDataType("uuid")
    SchemaMapper.isSupported("map<string,int>") shouldBe false
  }

  test("toStructType builds the declared schema") {
    SchemaMapper.toStructType(Seq(
      FieldSpec("a", "string"), FieldSpec("b", "int"))) shouldBe
      StructType(Seq(StructField("a", StringType), StructField("b", IntegerType)))
  }
}
