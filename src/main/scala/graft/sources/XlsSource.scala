package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Minimal legacy `.xls` (BIFF8-in-CFB) reader with no POI dependency —
  * the second half of the reference's Excel intake
  * (ExcelToCsvUtil.scala:43-49 `WorkbookFactory.create` handles .xls;
  * XlsxSource covers the .xlsx branch). Public formats: MS-CFB (compound
  * file binary) for the container, MS-XLS (BIFF8) for the workbook stream.
  *
  * Covered record surface — the cell types evaluated workbooks store:
  *
  *   - CFB: FAT + miniFAT chains, directory, `Workbook`/`Book` stream
  *   - SST (0x00FC) with Continue (0x003C) splits, including a string broken
  *     MID-CHARACTERS (each continuation re-declares its encoding byte),
  *     compressed-8-bit and UTF-16LE strings, rich/ext runs skipped
  *   - LABELSST (0x00FD), LABEL (0x0204), NUMBER (0x0203), RK (0x027E),
  *     MULRK (0x00BD), BOOLERR (0x0205), FORMULA (0x0006) via its cached
  *     result (number inline; string via the following STRING (0x0207)
  *     record; boolean/error/empty specials) — like the xlsx path, the
  *     CACHED value is read rather than re-evaluating the formula
  *   - BOUNDSHEET8 (0x0085) for worksheet-by-index selection
  *
  * Numbers render whole-valued without a decimal point ("3" not "3.0"),
  * matching how the xlsx path surfaces `<v>` texts; number FORMATS (dates
  * etc.) are not applied — raw values surface, the destination schema cast
  * gives them types. Driver-side by design, like XlsxSource: spreadsheets
  * are config-scale inputs, not the 100 TB path.
  */
object XlsSource {

  final class XlsError(msg: String) extends RuntimeException(msg)

  /** All rows of worksheet `index` (0-based) as string cells. */
  private[sources] def readRows(path: String, index: Int): Vector[Vector[String]] = {
    val file = Files.readAllBytes(Paths.get(path))
    val wb = streamBytes(file, Set("Workbook", "Book"))
    parseWorkbook(wb, index)
  }

  // ------------------------------------------------------------- CFB ----

  private val FREESECT = 0xFFFFFFFF
  private val ENDOFCHAIN = 0xFFFFFFFE

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    ByteBuffer.wrap(b, o, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  /** Extract the named stream from a compound file (FAT or mini-FAT stored). */
  private def streamBytes(file: Array[Byte], names: Set[String]): Array[Byte] = {
    require(file.length > 512 && i32(file, 0) == 0xE011CFD0 && i32(file, 4) == 0xE11AB1A1,
      "not a compound (.xls) file")
    val sectorSize = 1 << u16(file, 30)
    val miniSize = 1 << u16(file, 32)
    val numFat = i32(file, 44)
    val firstDir = i32(file, 48)
    val miniCutoff = i32(file, 56)
    val firstMiniFat = i32(file, 60)
    val firstDifat = i32(file, 68)
    val numDifat = i32(file, 72)

    def sector(n: Int): Array[Byte] = {
      val off = 512 + n * sectorSize
      java.util.Arrays.copyOfRange(file, off, math.min(off + sectorSize, file.length))
    }

    // FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    val fatSectors = ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109 && fatSectors.length < numFat) {
      val v = i32(file, 76 + i * 4)
      if (v != FREESECT) fatSectors += v
      i += 1
    }
    var difat = firstDifat
    var difatLeft = numDifat
    while (difatLeft > 0 && difat != ENDOFCHAIN && difat != FREESECT) {
      val s = sector(difat)
      val per = sectorSize / 4 - 1
      (0 until per).foreach { j =>
        val v = i32(s, j * 4)
        if (v != FREESECT && fatSectors.length < numFat) fatSectors += v
      }
      difat = i32(s, sectorSize - 4)
      difatLeft -= 1
    }
    val fat = fatSectors.toArray.flatMap(n =>
      (0 until sectorSize / 4).map(j => i32(sector(n), j * 4)))

    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != ENDOFCHAIN && s != FREESECT && s >= 0) {
        out.write(sector(s))
        s = if (s < fat.length) fat(s) else ENDOFCHAIN
        guard += 1
        if (guard > file.length / sectorSize + 2)
          throw new XlsError("corrupt FAT chain")
      }
      out.toByteArray
    }

    // directory: 128-byte entries in the directory chain
    val dir = chain(firstDir)
    final case class Entry(name: String, entryType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { e =>
      val o = e * 128
      val nameLen = u16(dir, o + 64) // bytes incl. terminator
      val name = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, "UTF-16LE") else ""
      Entry(name, dir(o + 66) & 0xFF, i32(dir, o + 116),
        i32(dir, o + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.entryType == 5).getOrElse(
      throw new XlsError("no root storage"))
    val target = entries.find(e => e.entryType == 2 && names(e.name)).getOrElse(
      throw new XlsError(s"no ${names.mkString("/")} stream; found: " +
        entries.filter(_.entryType == 2).map(_.name).mkString(", ")))

    if (target.size >= miniCutoff) chain(target.start).take(target.size.toInt)
    else {
      // mini-stream: 64-byte sectors inside the root entry's stream,
      // chained through the miniFAT
      val miniStream = chain(root.start)
      val miniFatBytes = chain(firstMiniFat)
      def miniFat(n: Int): Int =
        if ((n + 1) * 4 <= miniFatBytes.length) i32(miniFatBytes, n * 4) else ENDOFCHAIN
      val out = new java.io.ByteArrayOutputStream()
      var s = target.start
      var guard = 0
      while (s != ENDOFCHAIN && s != FREESECT && s >= 0) {
        val off = s * miniSize
        out.write(java.util.Arrays.copyOfRange(miniStream, off,
          math.min(off + miniSize, miniStream.length)))
        s = miniFat(s)
        guard += 1
        if (guard > miniStream.length / miniSize + 2)
          throw new XlsError("corrupt miniFAT chain")
      }
      out.toByteArray.take(target.size.toInt)
    }
  }

  // ------------------------------------------------------------ BIFF8 ----

  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecSst = 0x00FC
  private val RecContinue = 0x003C
  private val RecBoundSheet = 0x0085
  private val RecLabelSst = 0x00FD
  private val RecLabel = 0x0204
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecBoolErr = 0x0205
  private val RecFormula = 0x0006
  private val RecString = 0x0207

  private final case class Rec(id: Int, data: Array[Byte], offset: Int)

  private def records(wb: Array[Byte]): Vector[Rec] = {
    val out = Vector.newBuilder[Rec]
    var o = 0
    var ok = true
    while (ok && o + 4 <= wb.length) {
      val id = u16(wb, o)
      val len = u16(wb, o + 2)
      if (id == 0) ok = false // zero padding after the final EOF
      else {
        out += Rec(id, java.util.Arrays.copyOfRange(wb, o + 4, o + 4 + len), o)
        o += 4 + len
      }
    }
    out.result()
  }

  /** Cursor over an SST record's data parts (base + Continue records).
    * Strings may split across parts mid-characters; every continuation
    * re-declares the encoding byte for its remainder (MS-XLS 2.5.293).
    */
  private final class PartsCursor(parts: Vector[Array[Byte]]) {
    private var p = 0
    private var o = 0
    private def ensure(): Unit = {
      while (p < parts.length && o >= parts(p).length) { p += 1; o = 0 }
      if (p >= parts.length) throw new XlsError("SST truncated")
    }
    /** Index of the part the NEXT byte will come from. */
    private def effPart: Int = {
      var pp = p; var oo = o
      while (pp < parts.length && oo >= parts(pp).length) { pp += 1; oo = 0 }
      pp
    }
    def u8(): Int = { ensure(); val v = parts(p)(o) & 0xFF; o += 1; v }
    def u16le(): Int = u8() | (u8() << 8)
    def i32le(): Int = u16le() | (u16le() << 16)
    def skip(n: Int): Unit = (0 until n).foreach(_ => u8(): Unit)

    /** XLUnicodeRichExtendedString. */
    def readString(): String = {
      val cch = u16le()
      var grbit = u8()
      val cRun = if ((grbit & 0x08) != 0) u16le() else 0
      val cbExt = if ((grbit & 0x04) != 0) i32le() else 0
      val sb = new StringBuilder
      var remaining = cch
      var part = effPart
      while (remaining > 0) {
        // character data continuing into a new Continue record re-declares
        // its encoding byte at the start of that record (MS-XLS 2.5.293)
        if (effPart != part) { grbit = u8(); part = effPart }
        if ((grbit & 0x01) != 0) { // UTF-16LE
          sb.append(u16le().toChar)
        } else sb.append((u8() & 0xFF).toChar) // compressed: low bytes of UTF-16
        remaining -= 1
      }
      skip(cRun * 4)
      skip(cbExt)
      sb.toString
    }
  }

  private def parseSst(recs: Vector[Rec], at: Int): Vector[String] = {
    val parts = Vector.newBuilder[Array[Byte]]
    parts += recs(at).data
    var j = at + 1
    while (j < recs.length && recs(j).id == RecContinue) {
      parts += recs(j).data; j += 1
    }
    val cur = new PartsCursor(parts.result())
    cur.skip(4) // total refs
    val unique = cur.i32le()
    (0 until unique).map(_ => cur.readString()).toVector
  }

  /** Short XLUnicodeString (STRING / LABEL records; no rich/ext runs). */
  private def inlineString(b: Array[Byte], o: Int): String = {
    val cch = u16(b, o)
    val grbit = b(o + 2) & 0xFF
    if ((grbit & 0x01) != 0)
      new String(b, o + 3, cch * 2, "UTF-16LE")
    else new String(b, o + 3, cch, "ISO-8859-1")
  }

  /** RK-encoded number (MS-XLS 2.5.276): 30-bit value + int/div100 flags. */
  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 0x01) != 0
    val isInt = (rk & 0x02) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (div100) v / 100.0 else v
  }

  private def renderNum(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def parseWorkbook(wb: Array[Byte], sheetIndex: Int): Vector[Vector[String]] = {
    val recs = records(wb)
    require(recs.nonEmpty && recs.head.id == RecBof, "not a BIFF stream")

    var sst = Vector.empty[String]
    val sheetOffsets = ArrayBuffer.empty[Int]
    // globals substream: SST + BoundSheet8 positions, up to its EOF
    var i = 0
    var depth = 0
    var globalsOpen = true
    while (i < recs.length && globalsOpen) {
      recs(i).id match {
        case RecBof => depth += 1
        case RecEof => depth -= 1; if (depth == 0) globalsOpen = false
        case RecSst => sst = parseSst(recs, i)
        case RecBoundSheet => sheetOffsets += i32(recs(i).data, 0)
        case _ =>
      }
      i += 1
    }
    if (sheetIndex >= sheetOffsets.length)
      throw new XlsError(s"worksheet $sheetIndex not found (${sheetOffsets.length} sheets)")

    // sheet substream: from its BOF to the matching EOF
    val startOff = sheetOffsets(sheetIndex)
    val start = recs.indexWhere(_.offset == startOff)
    require(start >= 0 && recs(start).id == RecBof, "bad BOUNDSHEET offset")
    val cells = mutable.Map.empty[(Int, Int), String] // (row, col) → value
    var j = start + 1
    var open = 1
    while (j < recs.length && open > 0) {
      val r = recs(j)
      val d = r.data
      r.id match {
        case RecBof => open += 1
        case RecEof => open -= 1
        case RecLabelSst =>
          cells((u16(d, 0), u16(d, 2))) = sst.lift(i32(d, 6)).getOrElse("")
        case RecLabel =>
          cells((u16(d, 0), u16(d, 2))) = inlineString(d, 6)
        case RecNumber =>
          cells((u16(d, 0), u16(d, 2))) = renderNum(
            ByteBuffer.wrap(d, 6, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble)
        case RecRk =>
          cells((u16(d, 0), u16(d, 2))) = renderNum(rkValue(i32(d, 6)))
        case RecMulRk =>
          val row = u16(d, 0)
          val colFirst = u16(d, 2)
          val n = (d.length - 6) / 6
          (0 until n).foreach { k =>
            cells((row, colFirst + k)) = renderNum(rkValue(i32(d, 4 + k * 6 + 2)))
          }
        case RecBoolErr =>
          val isErr = (d(7) & 0xFF) == 1
          cells((u16(d, 0), u16(d, 2))) =
            if (isErr) "" else if (d(6) != 0) "true" else "false"
        case RecFormula =>
          val key = (u16(d, 0), u16(d, 2))
          if (u16(d, 12) == 0xFFFF) (d(6) & 0xFF) match {
            case 0 => // cached string in the following STRING record
              val next = recs.indexWhere(rr => rr.id == RecString, j + 1)
              cells(key) = if (next >= 0) inlineString(recs(next).data, 0) else ""
            case 1 => cells(key) = if (d(8) != 0) "true" else "false"
            case 3 => cells(key) = ""
            case _ => cells(key) = "" // error cached
          } else cells(key) = renderNum(
            ByteBuffer.wrap(d, 6, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble)
        case _ =>
      }
      j += 1
    }

    if (cells.isEmpty) Vector.empty
    else {
      val maxRow = cells.keys.map(_._1).max
      (0 to maxRow).map { r =>
        val rowCells = cells.collect { case ((`r`, c), v) => (c, v) }
        if (rowCells.isEmpty) Vector.empty[String]
        else {
          val width = rowCells.keys.max + 1
          (0 until width).map(c => rowCells.getOrElse(c, "")).toVector
        }
      }.toVector.reverse.dropWhile(_.forall(_.isEmpty)).reverse
    }
  }
}
