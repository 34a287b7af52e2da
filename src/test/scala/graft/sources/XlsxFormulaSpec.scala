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

  test("cached values win by default; evaluateAll recomputes stale caches") {
    val f = java.io.File.createTempFile("stale", ".xlsx")
    writeFormulaXlsx(f.getAbsolutePath, staleCache = true)
    XlsxSource.readRows(f.getAbsolutePath, 0)(3)(1) shouldBe "99" // trust cache
    XlsxSource.readRows(f.getAbsolutePath, 0, evaluateAll = true)(3)(1) shouldBe "14"
  }
}
