package graft.sources

import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class XlsxFormulaSpec extends SparkSpec {

  /** Minimal xlsx whose formula cells have NO cached <v> — the case the
    * cached-value-only reader rendered as empty.
    */
  private def writeFormulaXlsx(path: String, staleCache: Boolean = false): Unit = {
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
      """<?xml version="1.0"?><sst><si><t>a</t></si><si><t>b</t></si><si><t>total</t></si><si><t>tag</t></si></sst>""")
    // B4 has a stale cache of 99 when staleCache=true (else no <v> at all)
    val b4 = if (staleCache) "<f>SUM(A2:B2)</f><v>99</v>" else "<f>SUM(A2:B2)</f>"
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>
         |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>
         |<row r="2"><c r="A2"><v>10</v></c><c r="B2"><v>4</v></c><c r="C2"><f>A2*B2+1</f></c><c r="D2"><f>IF(A2&gt;5, "big", "small")</f></c></row>
         |<row r="3"><c r="A3"><v>2.5</v></c><c r="B3"><f>-A3%</f></c><c r="C3"><f>C2+1</f></c><c r="D3"><f>UPPER("x" &amp; B1)</f></c></row>
         |<row r="4"><c r="A4"><f>ROUND(AVERAGE(A2:A3), 2)</f></c><c r="B4">$b4</c><c r="C4"><f>D4</f></c><c r="D4"><f>C4</f></c></row>
         |</sheetData></worksheet>""".stripMargin)
    z.close()
  }

  test("formula cells without cached values evaluate (arith, refs, ranges, functions)") {
    val f = java.io.File.createTempFile("formulas", ".xlsx")
    writeFormulaXlsx(f.getAbsolutePath)
    val rows = XlsxSource.readRows(f.getAbsolutePath, 0)
    rows(1)(2) shouldBe "41"        // A2*B2+1 = 10*4+1
    rows(1)(3) shouldBe "big"       // IF(A2>5, "big", "small") — 10>5
    rows(2)(1) shouldBe "-0.025"    // -A3% = -(2.5/100)
    rows(2)(2) shouldBe "42"        // C2+1 (formula → formula chain)
    rows(2)(3) shouldBe "XB"        // UPPER("x" & B1)
    rows(3)(0) shouldBe "6.25"      // ROUND(AVERAGE(10, 2.5), 2)
    rows(3)(1) shouldBe "14"        // SUM(A2:B2) — no cache, evaluated
    rows(3)(2) shouldBe ""          // C4↔D4 cycle → empty, no hang
    rows(3)(3) shouldBe ""
  }

  test("single-grid resolve: EVERY sheet-qualified ref is out of scope") {
    // regression: the single-grid wrapper used to register the grid as
    // 'sheet1', so a formula referencing Sheet1!A1 resolved against the
    // grid itself while a sheet's REAL name got Err — doc and behavior
    // disagreed. Sheet-qualified refs must uniformly evaluate to empty.
    import XlsxFormula.Cell
    val grid = Vector(Vector(
      Cell("7", None),
      Cell("", Some("Sheet1!A1")),
      Cell("", Some("A1+1"))))
    val out = XlsxFormula.resolve(grid, evaluateAll = false)
    out(0)(0) shouldBe "7"
    out(0)(1) shouldBe "" // NOT "7": sheet1 must not alias the grid
    out(0)(2) shouldBe "8" // unqualified refs still resolve
  }

  /** Two-sheet workbook exercising cross-sheet refs, with the sheet parts
    * deliberately NOT named sheetN.xml — the reader must follow the OPC
    * r:id → Target indirection in workbook.xml.rels, like a real file.
    */
  private def writeTwoSheetXlsx(path: String): Unit = {
    val z = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="main" sheetId="1" r:id="rId7"/>
        |<sheet name="Rates Q1" sheetId="2" r:id="rId3"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId7" Type="t" Target="worksheets/mainsheet.xml"/>
        |<Relationship Id="rId3" Type="t" Target="worksheets/rates.xml"/>
        |</Relationships>""".stripMargin)
    // main: B1 = rate*qty; C1 = cross-sheet RANGE (case-insensitive name);
    // D1/E1 = unknown-sheet refs → empty; F1 = chain into a cross-sheet
    // formula; G1/H1 = cross-sheet cycle (with rates!D1) → empty
    put("xl/worksheets/mainsheet.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1"><v>5</v></c><c r="B1"><f>'Rates Q1'!B1*A1</f></c><c r="C1"><f>SUM('rates q1'!A1:B1)</f></c><c r="D1"><f>Nope!A1</f></c><c r="E1"><f>rates!A1</f></c><c r="F1"><f>'Rates Q1'!C1</f></c><c r="G1"><f>'Rates Q1'!D1</f></c></row>
        |</sheetData></worksheet>""".stripMargin)
    // rates: C1 is itself a formula (cross-sheet chain target); D1 refs
    // BACK into main!G1 — a cross-sheet cycle
    put("xl/worksheets/rates.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1"><v>2</v></c><c r="B1"><v>3</v></c><c r="C1"><f>A1+B1</f></c><c r="D1"><f>main!G1</f></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
  }

  test("cross-sheet refs: quoted/unquoted names, ranges, chains, cycles, OPC part indirection") {
    val f = java.io.File.createTempFile("twosheet", ".xlsx")
    writeTwoSheetXlsx(f.getAbsolutePath)
    val main = XlsxSource.readRows(f.getAbsolutePath, 0)
    main(0)(0) shouldBe "5"
    main(0)(1) shouldBe "15" // 'Rates Q1'!B1 * A1 = 3*5
    main(0)(2) shouldBe "5"  // SUM over a cross-sheet range, name case-blind
    main(0)(3) shouldBe ""   // unknown sheet → out of subset, empty
    main(0)(4) shouldBe ""   // 'rates' != 'Rates Q1' — no prefix matching
    main(0)(5) shouldBe "5"  // chains into rates!C1 = A1+B1 on THAT sheet
    main(0)(6) shouldBe ""   // cross-sheet cycle main!G1 ↔ rates!D1
    // the sibling sheet reads standalone too (workbook order index 1)
    val rates = XlsxSource.readRows(f.getAbsolutePath, 1)
    rates(0)(2) shouldBe "5"
    rates(0)(3) shouldBe "" // same cycle seen from the other side
  }

  test("cached values win by default; evaluateAll recomputes stale caches") {
    val f = java.io.File.createTempFile("stale", ".xlsx")
    writeFormulaXlsx(f.getAbsolutePath, staleCache = true)
    XlsxSource.readRows(f.getAbsolutePath, 0)(3)(1) shouldBe "99" // trust cache
    XlsxSource.readRows(f.getAbsolutePath, 0, evaluateAll = true)(3)(1) shouldBe "14"
  }
}
