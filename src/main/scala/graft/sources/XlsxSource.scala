package graft.sources

import graft.model._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

/** Minimal XLSX reader (S5) with no POI dependency: an .xlsx file is a zip of
  * XML parts, so `java.util.zip` + StAX cover the reference's Excel intake
  * (ExcelToCsvUtil.scala:36-139) — worksheet select by index, shared-string
  * resolution, formula cells via their cached `<v>` result (what a evaluated
  * workbook stores; matches POI's evaluator output for saved files), rows
  * padded to the max observed width.
  *
  * Unlike the reference we skip the escape-to-temp-CSV hop and build the
  * DataFrame directly. Parsing is driver-side by design: spreadsheets are
  * config-scale inputs (xlsx cannot exceed ~1M rows), not the 100 TB path —
  * the result immediately enters the distributed pipeline.
  */
object XlsxSource {

  def read(spark: SparkSession, spec: PipelineSpec, path: String): DataFrame = {
    val xlsx = spec.source.file.flatMap(_.xlsx)
    val ws = xlsx.map(_.worksheet).getOrElse(0)
    val evalAll = xlsx.exists(_.evaluateFormulas)
    val rows =
      if (path.toLowerCase.endsWith(".xls")) XlsSource.readRows(path, ws)
      else readRows(path, ws, evalAll)
    rowsToDataFrame(spark, spec, rows, ws, path)
  }

  /** Shared sheet-rows → string DataFrame assembly (xlsx + legacy xls). */
  private[sources] def rowsToDataFrame(spark: SparkSession, spec: PipelineSpec,
      rows: Vector[Vector[String]], ws: Int, path: String): DataFrame = {
    if (rows.isEmpty)
      throw new PipelineSpecException(s"dataset '${spec.name}': empty worksheet $ws in $path")
    // First row is the header (reference fixture convention); fall back to
    // the declared source schema names when the sheet has no usable header.
    val header = rows.head.map(_.trim.toLowerCase)
    val width = rows.map(_.length).max
    val names =
      if (header.count(_.nonEmpty) == header.length && header.nonEmpty) header.padTo(width, "")
        .zipWithIndex.map { case (n, i) => if (n.nonEmpty) n else s"_c$i" }
      else spec.source.schema.map(_.name).padTo(width, "").zipWithIndex
        .map { case (n, i) => if (n.nonEmpty) n else s"_c$i" }
    val data = rows.tail.map(r => Row.fromSeq(
      r.padTo(width, "").map(v => if (v.isEmpty) null else v)))
    val schema = StructType(names.take(width).map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
  }

  /** All rows of worksheet `index` (0-based, workbook order) as string
    * cells. Formula cells resolve through [[XlsxFormula]]: cached `<v>`
    * wins unless absent (or `evaluateAll` re-evaluates everything, the
    * POI-evaluator-parity mode). The WHOLE workbook is parsed so
    * cross-sheet refs (`Sheet2!A1`) resolve against sibling sheets by
    * name — spreadsheets are config-scale inputs, so the extra parse is
    * driver-side small.
    */
  private[sources] def readRows(path: String, index: Int,
      evaluateAll: Boolean = false): Vector[Vector[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val inventory = sheetInventory(zip)
      if (index < 0 || index >= inventory.length)
        throw new IllegalArgumentException(
          s"worksheet $index not found in $path (${inventory.length} sheets)")
      val grids = inventory.map { case (name, entry) =>
        name -> parseSheet(zip.getInputStream(entry), shared)
      }
      XlsxFormula.resolveWorkbook(grids, index, evaluateAll)
    } finally zip.close()
  }

  /** (sheet name, zip entry) in workbook order: names from xl/workbook.xml,
    * entry targets through xl/_rels/workbook.xml.rels (the OPC indirection
    * — sheet N's part is NOT guaranteed to be sheetN.xml). Falls back to
    * positional sheet{N}.xml naming when either part is absent.
    */
  private def sheetInventory(zip: ZipFile)
      : Vector[(String, java.util.zip.ZipEntry)] = {
    val declared: Vector[(String, String)] = // (name, r:id)
      Option(zip.getEntry("xl/workbook.xml")).map { e =>
        val r = XMLInputFactory.newInstance().createXMLStreamReader(zip.getInputStream(e))
        val out = ArrayBuffer.empty[(String, String)]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "sheet") {
            val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
            // r:id lives in the relationships namespace; match by local name
            val rid = (0 until r.getAttributeCount)
              .find(a => r.getAttributeLocalName(a) == "id")
              .map(r.getAttributeValue).getOrElse("")
            out += ((name, rid))
          }
        }
        r.close()
        out.toVector
      }.getOrElse(Vector.empty)
    val rels: Map[String, String] = // r:id → part target
      Option(zip.getEntry("xl/_rels/workbook.xml.rels")).map { e =>
        val r = XMLInputFactory.newInstance().createXMLStreamReader(zip.getInputStream(e))
        val out = Map.newBuilder[String, String]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship") {
            (Option(r.getAttributeValue(null, "Id")),
              Option(r.getAttributeValue(null, "Target"))) match {
              case (Some(id), Some(t)) => out += id -> t
              case _ => ()
            }
          }
        }
        r.close()
        out.result()
      }.getOrElse(Map.empty)
    def entryFor(target: String): Option[java.util.zip.ZipEntry] = {
      val p = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      Option(zip.getEntry(p))
    }
    val resolved = declared.zipWithIndex.flatMap { case ((name, rid), pos) =>
      rels.get(rid).flatMap(entryFor)
        .orElse(Option(zip.getEntry(s"xl/worksheets/sheet${pos + 1}.xml")))
        .map(name -> _)
    }
    if (resolved.nonEmpty) resolved
    else // no workbook.xml: positional fallback, synthetic names
      Iterator.from(1)
        .map(n => Option(zip.getEntry(s"xl/worksheets/sheet$n.xml")))
        .takeWhile(_.isDefined)
        .zipWithIndex.map { case (e, i) => (s"sheet${i + 1}", e.get) }
        .toVector
  }

  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += sb.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toVector
  }

  private def parseSheet(in: InputStream,
      shared: Vector[String]): Vector[Vector[XlsxFormula.Cell]] = {
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = ArrayBuffer.empty[Vector[XlsxFormula.Cell]]
    var row: ArrayBuffer[XlsxFormula.Cell] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIs = false
    var inF = false
    val v = new StringBuilder
    val f = new StringBuilder
    val emptyCell = XlsxFormula.Cell("", None)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = ArrayBuffer.empty[XlsxFormula.Cell]
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              v.clear(); f.clear()
            case "v" => inV = true
            case "f" => inF = true
            case "is" => inIs = true
            case "t" if inIs => inV = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inF =>
          if (inF) f.append(r.getText) else v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "f" => inF = false
            case "t" if inIs => inV = false
            case "is" => inIs = false
            case "c" =>
              val raw = v.toString
              val value = cellType match {
                case "s" => shared.lift(raw.trim.toInt).getOrElse("")
                case "b" => if (raw.trim == "1") "true" else "false"
                case _   => raw // n, str (cached formula result), inlineStr
              }
              while (row.length < cellCol) row += emptyCell // sparse cells
              row += XlsxFormula.Cell(value,
                Option(f.toString).filter(_.nonEmpty))
            case "row" => rows += row.toVector
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    // Drop fully-empty trailing rows (Excel often stores phantom rows).
    rows.toVector.reverse
      .dropWhile(_.forall(c => c.value.isEmpty && c.formula.isEmpty)).reverse
  }

  /** "BC12" → 0-based column index (A=0, Z=25, AA=26, ...). */
  private[sources] def colIndex(cellRef: String): Int = {
    val letters = cellRef.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1
  }
}
