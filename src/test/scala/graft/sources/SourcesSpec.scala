package graft.sources

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

class SourcesSpec extends SparkSpec {

  private val fixtures = "/root/repo/fixtures"

  private def csvSpec(dest: Seq[FieldSpec] = Nil): PipelineSpec = PipelineSpec(
    name = "stock_price",
    source = SourceSpec(
      schema = Seq("symbol" -> "string", "date" -> "string", "open" -> "double",
        "high" -> "double", "low" -> "double", "close" -> "double",
        "volume" -> "int", "adj_close" -> "double")
        .map { case (n, t) => FieldSpec(n, t) },
      file = Some(FileSpec(csv = Some(CsvSpec())))),
    destination = DestinationSpec(schema = dest,
      objectStore = Some(ObjectStoreSpec(path = "/tmp/lake", table = "stock_price")))
  ).normalized.validated

  test("CSV read: declared schema, lowercase headers, empty cell -> null") {
    val df = FileSources.read(spark, csvSpec(),
      s"$fixtures/stock_price.20170102.small.dataset.csv")
    df.columns.toSeq shouldBe Seq("symbol", "date", "open", "high", "low",
      "close", "volume", "adj_close")
    df.count() shouldBe 4
    // FCO row has an empty `open` cell → null (string schema, pre-cast)
    val fco = df.filter(df("symbol") === "FCO").collect().head
    assert(fco.isNullAt(fco.fieldIndex("open")))
  }

  test("applyDestinationSchema casts, reorders, drops, adds typed nulls") {
    val spec = csvSpec(dest = Seq(FieldSpec("symbol", "string"),
      FieldSpec("volume", "bigint"), FieldSpec("extra", "double")))
    val raw = FileSources.read(spark, spec,
      s"$fixtures/stock_price.20170102.small.dataset.csv")
    val out = FileSources.applyDestinationSchema(raw, spec.destination.schema)
    out.schema shouldBe StructType(Seq(
      StructField("symbol", StringType), StructField("volume", LongType),
      StructField("extra", DoubleType)))
    val fax = out.filter(out("symbol") === "FAX").collect().head
    fax.getLong(1) shouldBe 3498900L
    assert(fax.isNullAt(2))
  }

  test("JSON line mode reads one _json row per line; wholetext reads one row") {
    val dir = scratchDir("json").toPath
    val f = dir.resolve("ev.tok.dataset.json")
    Files.writeString(f, """{"a":1}""" + "\n" + """{"a":2}""" + "\n\n")
    val lines = FileSources.readSemiStructured(spark, f.toString, "_json",
      SemiStructuredSpec(everyRowContainsObject = true))
    lines.columns.toSeq shouldBe Seq("_json")
    lines.count() shouldBe 2
    val whole = FileSources.readSemiStructured(spark, f.toString, "_json",
      SemiStructuredSpec(everyRowContainsObject = false))
    whole.count() shouldBe 1
    assert(whole.collect().head.getString(0).contains("\"a\":2"))
  }

  test("archive expansion: zip/tar skip junk entries, gz decompresses") {
    for ((ext, expected) <- Seq("zip" -> 3, "tar" -> 3, "gz" -> 1)) {
      val meta = Intake.resolve(s"$fixtures/stock_price.dataset.$ext")
      meta.dataset shouldBe "stock_price"
      meta.bulkUpload shouldBe true
      withClue(s"$ext:") { meta.paths.size shouldBe expected }
      meta.paths.foreach(p => assert(!Paths.get(p).getFileName.toString.startsWith("._")))
      // the expanded files are readable as one logical CSV load
      val df = FileSources.read(spark, csvSpec(), meta.paths.head)
      assert(df.count() > 0)
    }
  }

  test("filename convention and manifest resolution") {
    val m = Intake.resolve("/data/in/stock_price.tok123.20170102.dataset.csv")
    m.dataset shouldBe "stock_price"
    m.publisherToken shouldBe "tok123"
    m.paths shouldBe Seq("/data/in/stock_price.tok123.20170102.dataset.csv")
    an[Exception] should be thrownBy Intake.resolve("/data/in/random.csv")

    val dir = scratchDir("bulk").toPath
    Files.writeString(dir.resolve("f1.csv"), "a\n1\n")
    Files.writeString(dir.resolve("f2.csv"), "a\n2\n")
    val man = dir.resolve("stock_price.metadata.json")
    Files.writeString(man,
      s"""{"dataset": "stock_price", "dataFilePath": "$dir", "bulkUpload": true}""")
    val bm = Intake.resolve(man.toString)
    bm.dataset shouldBe "stock_price"
    // the manifest itself is metadata, not data — excluded from the load set
    bm.paths.map(p => Paths.get(p).getFileName.toString) shouldBe
      Seq("f1.csv", "f2.csv")
  }

  test("xlsx reader: shared strings, sparse cells, formula cache, types") {
    val dir = scratchDir("xlsx").toPath
    val f = dir.resolve("prices.tok.dataset.xlsx")
    writeTestXlsx(f.toString)
    val spec = PipelineSpec(
      name = "prices",
      source = SourceSpec(
        schema = Seq(FieldSpec("symbol", "string"), FieldSpec("price", "double"),
          FieldSpec("note", "string")),
        file = Some(FileSpec(xlsx = Some(XlsxSpec(worksheet = 0))))),
      destination = DestinationSpec(objectStore =
        Some(ObjectStoreSpec(path = "/tmp/lake", table = "prices")))).normalized
    val df = FileSources.read(spark, spec, f.toString)
    df.columns.toSeq shouldBe Seq("symbol", "price", "note")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    rows(0) shouldBe ("AAA", "1.5", "hello")
    rows(1) shouldBe ("BBB", "3", null)     // sparse row: note cell absent
    rows(2) shouldBe ("CCC", "4.5", "sum")  // formula cell: cached value 4.5
  }

  test("colIndex decodes A1-style refs") {
    XlsxSource.colIndex("A1") shouldBe 0
    XlsxSource.colIndex("Z9") shouldBe 25
    XlsxSource.colIndex("AA12") shouldBe 26
    XlsxSource.colIndex("BC3") shouldBe 54
  }

  /** Hand-built minimal xlsx: exercises shared strings (t="s"), inline
    * numbers, a formula cell with cached result, and a sparse row.
    */
  private def writeTestXlsx(path: String): Unit = {
    val z = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="s1" sheetId="1"/></sheets></workbook>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>symbol</t></si><si><t>price</t></si><si><t>note</t></si><si><t>AAA</t></si><si><t>hello</t></si><si><t>BBB</t></si><si><t>CCC</t></si><si><t>sum</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>1.5</v></c><c r="C2" t="s"><v>4</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>5</v></c><c r="B3"><v>3</v></c></row>
        |<row r="4"><c r="A4" t="s"><v>6</v></c><c r="B4"><f>B2+B3</f><v>4.5</v></c><c r="C4" t="s"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
  }
}
