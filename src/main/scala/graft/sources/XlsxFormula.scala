package graft.sources

import scala.collection.mutable

/** Bounded Excel formula evaluator for the XLSX reader (S5) — closes the
  * fidelity gap vs the reference's POI `FormulaEvaluator`
  * (ExcelToCsvUtil.scala:87-96): a formula cell whose cached `<v>` is
  * absent (file written by a library that skips evaluation) or stale
  * (`evaluateFormulas` re-evaluation opt-in) gets computed here instead of
  * silently reading as empty.
  *
  * Supported subset (the spreadsheet-as-config reality this intake serves):
  * numeric/string/boolean literals, A1-style refs (absolute `$` accepted),
  * CROSS-SHEET refs (`Sheet2!A1`, `'My Sheet'!A1:B3` — names
  * case-insensitive, quoted names with `''` escapes), ranges as function
  * arguments, operators `+ - * / ^ & %` and comparisons `= <> < <= > >=`,
  * functions SUM AVERAGE MIN MAX COUNT COUNTA IF ROUND ABS
  * CONCAT/CONCATENATE LEN UPPER LOWER. Formula→formula references are
  * memoized (workbook-globally, so cross-sheet formula chains and cycles
  * are handled like same-sheet ones); cycles and anything outside the
  * subset (defined names, volatile functions) evaluate to the empty
  * string — deterministic, never a crash mid-ingest.
  */
object XlsxFormula {

  private sealed trait V
  private final case class Num(d: Double) extends V
  private final case class Str(s: String) extends V
  private final case class Bool(b: Boolean) extends V
  private case object Blank extends V
  private case object Err extends V
  private final case class Range(vs: Vector[V]) extends V // function args only

  /** One parsed sheet cell: the cached/literal value plus the formula text
    * when the cell carried an `<f>` element.
    */
  final case class Cell(value: String, formula: Option[String])

  /** Resolve a single parsed grid to final strings: formula cells evaluate
    * when their cached value is empty, or always under `evaluateAll`.
    * Cross-sheet refs evaluate to empty (no sibling sheets in scope) —
    * use [[resolveWorkbook]] when the full workbook is available. The grid
    * registers under the empty name, which no `Sheet!A1` ref can produce,
    * so EVERY sheet-qualified ref is out of scope here — including one that
    * happens to name the sheet the grid came from.
    */
  def resolve(grid: Vector[Vector[Cell]], evaluateAll: Boolean): Vector[Vector[String]] =
    resolveWorkbook(Vector("" -> grid), 0, evaluateAll)

  /** Resolve one sheet of a WORKBOOK to final strings: same-sheet refs
    * resolve within `sheets(target)`, `Sheet2!A1`-style refs resolve
    * against the sibling grids (names case-insensitive). Memoization and
    * cycle detection are workbook-global, so a formula chain that hops
    * sheets (or a cross-sheet cycle) behaves exactly like its same-sheet
    * counterpart.
    */
  def resolveWorkbook(sheets: Vector[(String, Vector[Vector[Cell]])],
      target: Int, evaluateAll: Boolean): Vector[Vector[String]] = {
    require(target >= 0 && target < sheets.length,
      s"sheet index $target out of range (${sheets.length} sheets)")
    val byName = sheets.zipWithIndex
      .map { case ((n, _), i) => n.toLowerCase -> i }.toMap
    val memo = mutable.Map.empty[(Int, Int, Int), V]
    val inFlight = mutable.Set.empty[(Int, Int, Int)]

    def cellValue(si: Int)(sheet: Option[String], r: Int, c: Int): V = {
      val si2 = sheet match {
        case None => si
        case Some(n) => byName.get(n.toLowerCase) match {
          case Some(i) => i
          case None => return Err // unknown sheet name → out of subset
        }
      }
      val grid = sheets(si2)._2
      if (r < 0 || r >= grid.length) return Blank
      val row = grid(r)
      if (c < 0 || c >= row.length) return Blank
      val cell = row(c)
      cell.formula match {
        case Some(f) if evaluateAll || cell.value.isEmpty =>
          memo.getOrElseUpdate((si2, r, c), {
            if (!inFlight.add((si2, r, c))) Err // cycle (cross-sheet too)
            else
              try evalFormula(f, cellValue(si2))
              finally inFlight.remove((si2, r, c)): Unit
          })
        case _ => literal(cell.value)
      }
    }

    val grid = sheets(target)._2
    grid.indices.toVector.map { r =>
      grid(r).indices.toVector.map { c =>
        val cell = grid(r)(c)
        cell.formula match {
          // only EVALUATED cells render through the numeric formatter;
          // literal/cached text passes through byte-identical ("4.70"
          // must stay "4.70" — the typed view exists only for lookups)
          case Some(_) if evaluateAll || cell.value.isEmpty =>
            render(cellValue(target)(None, r, c))
          case _ => cell.value
        }
      }
    }
  }

  private def literal(s: String): V =
    if (s.isEmpty) Blank
    else if (s == "true") Bool(true)
    else if (s == "false") Bool(false)
    else parseNum(s).map(Num).getOrElse(Str(s))

  private def parseNum(s: String): Option[Double] =
    try Some(java.lang.Double.parseDouble(s.trim)) catch { case _: NumberFormatException => None }

  private def render(v: V): String = v match {
    case Num(d) =>
      if (d.isNaN || d.isInfinite) ""
      else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case Str(s) => s
    case Bool(b) => if (b) "true" else "false"
    case Blank | Err | Range(_) => ""
  }

  // ---- recursive-descent parser/evaluator ---------------------------------

  private final class P(input: String, lookup: (Option[String], Int, Int) => V) {
    private var i = 0
    private def peek: Char = if (i < input.length) input.charAt(i) else '\u0000'
    private def ws(): Unit = while (i < input.length && input.charAt(i).isWhitespace) i += 1
    private def eat(c: Char): Boolean = { ws(); if (peek == c) { i += 1; true } else false }

    def parse(): V = {
      val v = cmp()
      ws()
      if (i < input.length) Err else v // trailing junk → unsupported
    }

    private def cmp(): V = {
      var l = concat()
      var done = false
      while (!done) {
        ws()
        val op =
          if (i + 1 < input.length && input.substring(i, i + 2) == "<>") { i += 2; "<>" }
          else if (i + 1 < input.length && input.substring(i, i + 2) == "<=") { i += 2; "<=" }
          else if (i + 1 < input.length && input.substring(i, i + 2) == ">=") { i += 2; ">=" }
          else if (peek == '=') { i += 1; "=" }
          else if (peek == '<') { i += 1; "<" }
          else if (peek == '>') { i += 1; ">" }
          else { done = true; "" }
        if (!done) l = compare(op, l, concat())
      }
      l
    }

    private def compare(op: String, l: V, r: V): V = {
      if (l == Err || r == Err) return Err
      val c: Option[Int] = (asNumOpt(l), asNumOpt(r)) match {
        case (Some(a), Some(b)) => Some(java.lang.Double.compare(a, b))
        case _ => Some(asStr(l).compareToIgnoreCase(asStr(r)))
      }
      c.map { n =>
        Bool(op match {
          case "=" => n == 0
          case "<>" => n != 0
          case "<" => n < 0
          case "<=" => n <= 0
          case ">" => n > 0
          case ">=" => n >= 0
        })
      }.getOrElse(Err)
    }

    private def concat(): V = {
      var l = add()
      while (eat('&')) {
        val r = add()
        l = if (l == Err || r == Err) Err else Str(asStr(l) + asStr(r))
      }
      l
    }

    private def add(): V = {
      var l = mul()
      var done = false
      while (!done) {
        ws()
        if (peek == '+') { i += 1; l = num2(l, mul())(_ + _) }
        else if (peek == '-') { i += 1; l = num2(l, mul())(_ - _) }
        else done = true
      }
      l
    }

    private def mul(): V = {
      var l = pow()
      var done = false
      while (!done) {
        ws()
        if (peek == '*') { i += 1; l = num2(l, pow())(_ * _) }
        else if (peek == '/') { i += 1; l = num2(l, pow())(_ / _) }
        else done = true
      }
      l
    }

    private def pow(): V = {
      var l = unary()
      while (eat('^')) l = num2(l, unary())(math.pow)
      l
    }

    private def unary(): V = {
      ws()
      if (peek == '-') { i += 1; num1(unary())(d => -d) }
      else if (peek == '+') { i += 1; unary() }
      else postfix()
    }

    private def postfix(): V = {
      var v = atom()
      while (eat('%')) v = num1(v)(_ / 100.0)
      v
    }

    private def atom(): V = {
      ws()
      val c = peek
      if (c == '(') { i += 1; val v = cmp(); if (!eat(')')) Err else v }
      else if (c == '"') stringLit()
      else if (c == '\'') quotedSheetRef()
      else if (c.isDigit || c == '.') numberLit()
      else if (c.isLetter || c == '$' || c == '_') identOrRefOrCall()
      else Err
    }

    /** `'Sheet Name'!A1[:B3]` — quoted sheet names may hold spaces and
      * escape embedded quotes by doubling, like string literals.
      */
    private def quotedSheetRef(): V = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (i < input.length) {
        val ch = input.charAt(i)
        if (ch == '\'') {
          if (i + 1 < input.length && input.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
          else {
            i += 1
            if (peek != '!') return Err
            i += 1
            return sheetQualifiedRef(sb.toString)
          }
        } else { sb += ch; i += 1 }
      }
      Err // unterminated
    }

    /** The `A1[:B3]` part after `Sheet!`. */
    private def sheetQualifiedRef(sheet: String): V = {
      val s2 = i
      while (i < input.length && (input.charAt(i).isLetterOrDigit ||
        input.charAt(i) == '$')) i += 1
      input.substring(s2, i) match {
        case ref @ RefPat(_, _) => cellOrRange(Some(sheet), ref)
        case _ => Err
      }
    }

    private def stringLit(): V = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (i < input.length) {
        val c = input.charAt(i)
        if (c == '"') {
          if (i + 1 < input.length && input.charAt(i + 1) == '"') { sb += '"'; i += 2 }
          else { i += 1; return Str(sb.toString) }
        } else { sb += c; i += 1 }
      }
      Err // unterminated
    }

    private def numberLit(): V = {
      val start = i
      while (i < input.length && (input.charAt(i).isDigit || input.charAt(i) == '.')) i += 1
      if (i < input.length && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
        i += 1
        if (i < input.length && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
        while (i < input.length && input.charAt(i).isDigit) i += 1
      }
      parseNum(input.substring(start, i)).map(Num).getOrElse(Err)
    }

    private val RefPat = "^\\$?([A-Za-z]{1,3})\\$?([0-9]+)$".r

    private def identOrRefOrCall(): V = {
      val start = i
      while (i < input.length && (input.charAt(i).isLetterOrDigit ||
        "$_.".indexOf(input.charAt(i)) >= 0)) i += 1
      val word = input.substring(start, i)
      ws()
      if (peek == '(') { i += 1; call(word.toUpperCase) }
      else if (peek == '!') { i += 1; sheetQualifiedRef(word) } // Sheet2!A1
      else word.toUpperCase match {
        case "TRUE" => Bool(true)
        case "FALSE" => Bool(false)
        case _ =>
          word match {
            case RefPat(_, _) => cellOrRange(None, word)
            case _ => Err // unsupported name (defined names...)
          }
      }
    }

    /** A cell ref, optionally the left side of a range (`A1:B3`), on the
      * current sheet (`sheet = None`) or a named sibling.
      */
    private def cellOrRange(sheet: Option[String], first: String): V = {
      val (r, c) = refToRowCol(first)
      ws()
      if (peek == ':') {
        i += 1
        ws()
        val s2 = i
        while (i < input.length && (input.charAt(i).isLetterOrDigit ||
          input.charAt(i) == '$')) i += 1
        input.substring(s2, i) match {
          case ref2 @ RefPat(_, _) =>
            val (r2, c2) = refToRowCol(ref2)
            // cell-count cap: an absurd span (A1:A99999999) is out
            // of subset — Err, not a 100M-element materialization
            val cells = (math.max(r, r2) - math.min(r, r2) + 1L) *
              (math.max(c, c2) - math.min(c, c2) + 1L)
            if (cells > 4000000L) Err
            else Range((for {
              rr <- math.min(r, r2) to math.max(r, r2)
              cc <- math.min(c, c2) to math.max(c, c2)
            } yield lookup(sheet, rr, cc)).toVector)
          case _ => Err
        }
      } else lookup(sheet, r, c)
    }

    /** A1-ref → (row, col), 0-based. Row numbers beyond the xlsx maximum
      * (1,048,576 — 7 digits) are out of subset: map to an out-of-grid
      * coordinate (→ Blank lookup) instead of letting `toInt` overflow
      * into an uncaught NumberFormatException mid-ingest.
      */
    private def refToRowCol(ref: String): (Int, Int) = {
      val clean = ref.replace("$", "")
      val letters = clean.takeWhile(_.isLetter)
      val digits = clean.drop(letters.length)
      val row = if (digits.length > 7) Int.MaxValue else digits.toInt
      (row - 1,
        letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1)
    }

    private def call(name: String): V = {
      val args = mutable.ArrayBuffer.empty[V]
      ws()
      if (peek == ')') i += 1
      else {
        var more = true
        while (more) {
          args += cmp()
          ws()
          if (peek == ',') i += 1
          else if (peek == ')') { i += 1; more = false }
          else return Err
        }
      }
      if (args.contains(Err)) return Err
      def flat = args.toVector.flatMap {
        case Range(vs) => vs
        case v => Vector(v)
      }
      def nums = flat.collect { case Num(d) => d
        case Str(s) if parseNum(s).isDefined => parseNum(s).get }
      name match {
        case "SUM" => Num(nums.sum)
        case "AVERAGE" => if (nums.isEmpty) Err else Num(nums.sum / nums.size)
        case "MIN" => if (nums.isEmpty) Num(0) else Num(nums.min)
        case "MAX" => if (nums.isEmpty) Num(0) else Num(nums.max)
        case "COUNT" => Num(nums.size)
        case "COUNTA" => Num(flat.count(_ != Blank))
        case "ABS" => args.headOption.map(num1(_)(math.abs)).getOrElse(Err)
        case "ROUND" =>
          (args.lift(0), args.lift(1)) match {
            case (Some(x), Some(p)) =>
              (asNumOpt(x), asNumOpt(p)) match {
                case (Some(xd), Some(pd)) =>
                  val f = math.pow(10, pd.toInt)
                  Num(math.round(xd * f).toDouble / f)
                case _ => Err
              }
            case _ => Err
          }
        case "IF" =>
          args.headOption.getOrElse(Err) match {
            case Bool(b) => if (b) args.lift(1).getOrElse(Bool(true))
              else args.lift(2).getOrElse(Bool(false))
            case Num(d) => if (d != 0) args.lift(1).getOrElse(Bool(true))
              else args.lift(2).getOrElse(Bool(false))
            case _ => Err
          }
        case "CONCAT" | "CONCATENATE" => Str(flat.map(asStr).mkString)
        case "LEN" => args.headOption.map(v => Num(asStr(v).length.toDouble)).getOrElse(Err)
        case "UPPER" => args.headOption.map(v => Str(asStr(v).toUpperCase)).getOrElse(Err)
        case "LOWER" => args.headOption.map(v => Str(asStr(v).toLowerCase)).getOrElse(Err)
        case _ => Err // unsupported function → empty, never a crash
      }
    }

    private def num1(v: V)(f: Double => Double): V =
      asNumOpt(v).map(d => Num(f(d))).getOrElse(Err)
    private def num2(l: V, r: V)(f: (Double, Double) => Double): V =
      (asNumOpt(l), asNumOpt(r)) match {
        case (Some(a), Some(b)) => Num(f(a, b))
        case _ => Err
      }
    private def asNumOpt(v: V): Option[Double] = v match {
      case Num(d) => Some(d)
      case Bool(b) => Some(if (b) 1.0 else 0.0)
      case Blank => Some(0.0)
      case Str(s) => parseNum(s)
      case _ => None
    }
    private def asStr(v: V): String = render(v)
  }

  private def evalFormula(formula: String,
      lookup: (Option[String], Int, Int) => V): V = {
    val body = formula.stripPrefix("=").trim
    if (body.isEmpty) Blank
    else try new P(body, lookup).parse() catch { case _: StackOverflowError => Err }
  }
}
