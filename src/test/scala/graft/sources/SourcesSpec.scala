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

  test("legacy .xls reader: CFB container, SST continue split, RK/MULRK/formula cache") {
    val dir = scratchDir("xls").toPath
    val f = dir.resolve("prices.tok.dataset.xls")
    Files.write(f, buildTestXls())
    val rows = XlsSource.readRows(f.toString, 0)
    rows(0) shouldBe Vector("symbol", "price", "note")
    rows(1) shouldBe Vector("AAA", "400", "hello")          // RK int
    rows(2) shouldBe Vector("BBB", "3.5")                   // NUMBER, sparse note
    rows(3) shouldBe Vector("CCC", "4.5", "sum")            // formula caches: number + string
    rows(4) shouldBe Vector("DDD", "1.23", "45")            // MULRK: div-100 + int
    rows(5) shouldBe Vector("longstring_" + "X" * 20, "true") // SST split mid-string; bool
    // same DataFrame surface as the xlsx path, dispatched on extension
    val spec = PipelineSpec(
      name = "prices",
      source = SourceSpec(
        schema = Seq(FieldSpec("symbol", "string"), FieldSpec("price", "string"),
          FieldSpec("note", "string")),
        file = Some(FileSpec(xlsx = Some(XlsxSpec(worksheet = 0))))),
      destination = DestinationSpec(objectStore =
        Some(ObjectStoreSpec(path = "/tmp/lake", table = "prices")))).normalized
    val df = FileSources.read(spark, spec, f.toString)
    df.columns.toSeq shouldBe Seq("symbol", "price", "note")
    df.count() shouldBe 5
    df.filter(df("symbol") === "BBB").collect().head.isNullAt(2) shouldBe true
  }

  /** Hand-built minimal BIFF8-in-CFB .xls per MS-CFB/MS-XLS: one FAT sector,
    * one directory sector, a 4096-byte Workbook stream (FAT-stored), SST
    * split across a Continue record MID-STRING (the continuation re-declares
    * its encoding byte), LABELSST/NUMBER/RK/MULRK/BOOLERR and FORMULA cells
    * with cached number and cached-string (STRING record) results.
    */
  private def buildTestXls(): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int, bytes: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n.toLong & 0xFFFFFFFFL)
      java.util.Arrays.copyOf(b.array(), bytes)
    }
    def rec(id: Int, body: Array[Byte]): Array[Byte] =
      le(id, 2) ++ le(body.length, 2) ++ body
    def cstr(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

    // ---- SST: 7 simple strings + one split across a Continue ----
    val simple = Seq("symbol", "price", "note", "AAA", "hello", "BBB", "CCC", "DDD")
    val longStr = "longstring_" + "X" * 20
    val sstHead = le(9, 4) ++ le(9, 4) ++
      simple.flatMap(s => le(s.length, 2) ++ Array(0.toByte) ++ cstr(s)).toArray
    val splitAt = 5 // first 5 chars of longStr in the base record
    val sstBody = sstHead ++ le(longStr.length, 2) ++ Array(0.toByte) ++
      cstr(longStr.take(splitAt))
    val contBody = Array(0.toByte) ++ cstr(longStr.drop(splitAt)) // re-declared grbit
    val sstRec = rec(0x00FC, sstBody) ++ rec(0x003C, contBody)

    def bof(tpe: Int): Array[Byte] =
      rec(0x0809, le(0x0600, 2) ++ le(tpe, 2) ++ Array.fill(12)(0.toByte))
    val eof = rec(0x000A, Array.emptyByteArray)

    // ---- sheet substream ----
    def cellHead(r: Int, c: Int): Array[Byte] = le(r, 2) ++ le(c, 2) ++ le(0, 2)
    def labelSst(r: Int, c: Int, i: Int): Array[Byte] = rec(0x00FD, cellHead(r, c) ++ le(i, 4))
    def number(r: Int, c: Int, d: Double): Array[Byte] =
      rec(0x0203, cellHead(r, c) ++
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array())
    def rkInt(v: Int): Int = (v << 2) | 0x02
    val sheet = bof(0x0010) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
      labelSst(1, 0, 3) ++ rec(0x027E, cellHead(1, 1) ++ le(rkInt(400), 4)) ++
      labelSst(1, 2, 4) ++
      labelSst(2, 0, 5) ++ number(2, 1, 3.5) ++
      // row 3: formula with cached NUMBER; formula with cached STRING
      labelSst(3, 0, 6) ++
      rec(0x0006, cellHead(3, 1) ++
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(4.5).array() ++
        le(0, 2) ++ le(0, 4) ++ Array.emptyByteArray) ++
      rec(0x0006, cellHead(3, 2) ++
        Array(0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte,
          0xFF.toByte, 0xFF.toByte) ++ le(0, 2) ++ le(0, 4)) ++
      rec(0x0207, le(3, 2) ++ Array(0.toByte) ++ cstr("sum")) ++
      // row 4: MULRK over cols 1-2 (div-100 int 123 → 1.23; int 45)
      labelSst(4, 0, 7) ++
      rec(0x00BD, le(4, 2) ++ le(1, 2) ++
        le(0, 2) ++ le((123 << 2) | 0x03, 4) ++
        le(0, 2) ++ le(rkInt(45), 4) ++ le(2, 2)) ++
      // row 5: the split SST string + a boolean
      labelSst(5, 0, 8) ++
      rec(0x0205, cellHead(5, 1) ++ Array(1.toByte, 0.toByte)) ++
      eof

    // ---- globals substream (BOUNDSHEET position = globals length) ----
    val boundSheetLen = 4 + (4 + 1 + 1 + 2 + 2) // rec header + body ("s1")
    val globalsLen = (4 + 16) + sstRec.length + boundSheetLen + 4
    val globals = bof(0x0005) ++ sstRec ++
      rec(0x0085, le(globalsLen, 4) ++ Array(0.toByte, 0.toByte) ++
        le(2, 1) ++ le(0, 1) ++ cstr("s1")) ++ eof
    val stream = java.util.Arrays.copyOf(globals ++ sheet, 4096) // zero-padded

    // ---- CFB container: header, FAT @0, directory @1, stream @2-9 ----
    val FREE = 0xFFFFFFFF; val END = 0xFFFFFFFE
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    header.position(24); header.putShort(0x3E.toShort); header.putShort(3.toShort)
    header.putShort(0xFFFE.toShort); header.putShort(9.toShort) // sector shift
    header.putShort(6.toShort) // mini shift
    header.position(44); header.putInt(1) // num FAT sectors
    header.putInt(1) // first directory sector
    header.position(56); header.putInt(4096) // mini cutoff
    header.putInt(END); header.putInt(0) // miniFAT
    header.putInt(END); header.putInt(0) // DIFAT chain
    header.putInt(0) // DIFAT[0] → FAT at sector 0
    (1 until 109).foreach(_ => header.putInt(FREE))

    val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    fat.putInt(0xFFFFFFFD) // sector 0 = FAT itself
    fat.putInt(END)        // sector 1 = directory (single)
    (2 until 9).foreach(s => fat.putInt(s + 1)) // stream chain 2→…→9
    fat.putInt(END)
    (10 until 128).foreach(_ => fat.putInt(FREE))

    def dirEntry(name: String, tpe: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes("UTF-16LE")
      b.put(n); b.position(64); b.putShort((n.length + 2).toShort)
      b.put(tpe.toByte); b.put(1.toByte) // black
      b.putInt(-1); b.putInt(-1); b.putInt(child)
      b.position(116); b.putInt(start); b.putInt(size)
      b.array()
    }
    val dirSector = java.util.Arrays.copyOf(
      dirEntry("Root Entry", 5, 1, END, 0) ++
        dirEntry("Workbook", 2, -1, 2, 4096) ++
        dirEntry("", 0, -1, -1, 0) ++ dirEntry("", 0, -1, -1, 0), 512)

    header.array() ++ fat.array() ++ dirSector ++ stream
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
