package graft.script

import scala.collection.mutable

/** Interpreter for the JavaScript subset used by pipeline row scripts.
  *
  * The reference executes user scripts on Nashorn
  * (`ScriptEngineManager.getEngineByName("JavaScript")`,
  * Transformation.scala:129-148, DataQuality.scala:182-188). Nashorn is gone
  * from JDK 15+, and this environment is offline (no GraalJS jar), so the
  * engine ships its own interpreter covering the dialect real row scripts
  * use:
  *
  *   - `var` declarations, assignment (incl. `+= -= *= /= %=`, `++`/`--`),
  *     `if`/`else`, `while`, `for(;;)`, `break`/`continue`, blocks, comments
  *   - `function` declarations and anonymous function expressions, `return`,
  *     closures over the defining scope (function-scoped `var`, like JS)
  *   - numbers (all double, JS-style), strings, booleans, `null`
  *   - array literals `[..]` + indexing/index assignment, `.length`,
  *     `push`/`pop`/`join`/`indexOf`; object literals `{k: v}` + dot/bracket
  *     property access and assignment
  *   - `+ - * / %`, string concatenation, `== != === !== < <= > >=`,
  *     `&& || !`, ternary `?:`
  *   - `Java.type('java.util.HashMap')` + `new HashMap()` + `map.put(k, v)`
  *   - `new Date(str)` / `date.getFullYear()` etc., `String(x)`, `Number(x)`
  *   - regex literals `/pat/gim` + `new RegExp(s, flags)`: `test`/`exec`,
  *     `str.replace/split/match/search` with JS `$&`/`$n` replacement refs.
  *     STATELESS subset: `lastIndex` is not tracked (a `g` regex never
  *     remembers position between calls — `test` always probes from 0;
  *     `match` with `g` returns all matches, the common safe semantics)
  *   - completion-value semantics: the script's result is the value of the
  *     last evaluated expression statement (how Nashorn `eval` returns)
  *
  * Constructor functions ARE supported: `new F(args)` builds an instance
  * chained to `F.prototype`, `F.prototype.method = ...` mutation is
  * visible to existing instances (the real delegation rule, not a copy),
  * `this` binds to the receiver in constructors and method calls, and an
  * explicit object return from a constructor overrides the instance (the
  * JS [[Construct]] rule). Prototype chains compose (a prototype may
  * itself be a `new`-built instance).
  *
  * OUT OF SCOPE (documented boundary, not a gap): whole-`prototype`
  * REPLACEMENT (`F.prototype = {...}` — mutate its properties instead),
  * getters/setters, `Function.prototype.call/apply/bind`, `try`/`catch`,
  * generators, and ES6+ syntax (arrow functions, `let`/`const`,
  * classes, template literals). Every row script shipped with the
  * reference (DQ rule and transform fixtures) parses and runs
  * byte-identically in this subset, and `JsInterpSpec` keeps a
  * parse-failure test naming the boundary so a future fixture that needs
  * it fails loudly at config-validation time, not silently mid-pipeline.
  *
  * The AST is immutable case classes, so a parsed [[Script]] is Serializable
  * and ships to executors once; evaluation allocates only a per-row
  * environment chain. That is the engine-per-partition design SURVEY §2.8
  * calls for — vs the reference's engine-per-ROW, its largest inefficiency.
  * Loops carry a 10M-iteration guard so a runaway user script fails loudly
  * instead of wedging an executor core.
  */
object JsInterp {

  // ---------------------------------------------------------------- AST ----
  sealed trait Stmt extends Serializable
  final case class VarDecl(name: String, init: Option[Expr]) extends Stmt
  final case class ExprStmt(e: Expr) extends Stmt
  final case class If(cond: Expr, thenS: Stmt, elseS: Option[Stmt]) extends Stmt
  final case class Block(stmts: List[Stmt]) extends Stmt
  final case class While(cond: Expr, body: Stmt) extends Stmt
  final case class For(init: Option[Stmt], cond: Option[Expr],
      update: Option[Expr], body: Stmt) extends Stmt
  final case class FuncDecl(name: String, params: List[String], body: Block) extends Stmt
  final case class Return(e: Option[Expr]) extends Stmt
  case object BreakStmt extends Stmt
  case object ContinueStmt extends Stmt

  sealed trait Expr extends Serializable
  final case class Num(v: Double) extends Expr
  final case class Str(v: String) extends Expr
  final case class Bool(v: Boolean) extends Expr
  case object NullLit extends Expr
  final case class Ident(name: String) extends Expr
  final case class Assign(target: Expr, e: Expr) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class Member(obj: Expr, name: String) extends Expr
  final case class Index(obj: Expr, idx: Expr) extends Expr
  final case class Call(callee: Expr, args: List[Expr]) extends Expr
  final case class New(callee: Expr, args: List[Expr]) extends Expr
  final case class ArrLit(items: List[Expr]) extends Expr
  final case class ObjLit(entries: List[(String, Expr)]) extends Expr
  final case class FuncLit(params: List[String], body: Block) extends Expr
  final case class RegexLit(pattern: String, flags: String) extends Expr
  final case class Ternary(cond: Expr, t: Expr, f: Expr) extends Expr
  /** `++x`/`x--` etc.; postfix returns the pre-update value like JS. */
  final case class Update(op: String, target: Expr, prefix: Boolean) extends Expr

  final case class Script(stmts: List[Stmt]) extends Serializable {
    /** Evaluate with the given variable bindings; returns the completion
      * value (null / String / Double / Boolean / java.util.HashMap / ...).
      */
    def eval(bindings: Map[String, Any]): Any =
      try JsInterp.run(this, bindings)
      catch { case _: StackOverflowError =>
        throw new JsError("evaluation nesting too deep (runaway recursion?)")
      }
  }

  final class JsError(msg: String) extends RuntimeException(msg)

  // -------------------------------------------------------------- lexer ----
  private final case class Tok(kind: String, text: String, pos: Int)

  private val keywords = Set("var", "new", "if", "else", "null", "true", "false",
    "function", "return", "while", "for", "break", "continue")
  private val twoChar = Set("==", "!=", "<=", ">=", "&&", "||",
    "+=", "-=", "*=", "/=", "%=", "++", "--")
  private val threeChar = Set("===", "!==")

  /** True when a `/` at this point starts a regex literal, not division:
    * division needs a completed operand on its left (JS engines feed parser
    * state back to the lexer; this is the standard last-token heuristic).
    */
  private def regexAllowed(prev: Tok): Boolean = prev == null || (prev.kind match {
    case "num" | "str" | "regex" | "ident" | "null" | "true" | "false" => false
    case "op" => !Set(")", "]", "++", "--").contains(prev.text)
    case _ => true // keywords: return /x/, if (...), etc.
  })

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var prev: Tok = null
    def emit(t: Tok): Unit = { prev = t; out += t }
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src(i) == '*' && src(i + 1) == '/')) i += 1
        i += 2
      } else if (c == '/' && regexAllowed(prev)) {
        val start = i
        i += 1
        val sb = new StringBuilder
        var inClass = false
        var closed = false
        while (i < n && !closed) {
          val ch = src(i)
          if (ch == '\\' && i + 1 < n) { sb.append(ch).append(src(i + 1)); i += 2 }
          else if (ch == '\n') throw new JsError(s"unterminated regex at $start")
          else if (ch == '[') { inClass = true; sb.append(ch); i += 1 }
          else if (ch == ']') { inClass = false; sb.append(ch); i += 1 }
          else if (ch == '/' && !inClass) { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!closed) throw new JsError(s"unterminated regex at $start")
        val fstart = i
        while (i < n && src(i).isLetter) i += 1
        val flags = src.substring(fstart, i)
        flags.find(f => !"gim".contains(f)).foreach(f =>
          throw new JsError(s"unsupported regex flag '$f' at $start (g/i/m)"))
        emit(Tok("regex", sb.toString + "\u0000" + flags, start))
      } else if (c.isDigit || (c == '.' && i + 1 < n && src(i + 1).isDigit)) {
        val start = i
        while (i < n && (src(i).isDigit || src(i) == '.')) i += 1
        emit(Tok("num", src.substring(start, i), start))
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        val start = i
        i += 1
        while (i < n && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < n) {
            i += 1
            sb.append(src(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
          } else sb.append(src(i))
          i += 1
        }
        if (i >= n) throw new JsError(s"unterminated string at $start")
        i += 1
        emit(Tok("str", sb.toString, start))
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_' || src(i) == '$')) i += 1
        val w = src.substring(start, i)
        emit(Tok(if (keywords(w)) w else "ident", w, start))
      } else if (i + 2 < n && threeChar(src.substring(i, i + 3))) {
        emit(Tok("op", src.substring(i, i + 3), i)); i += 3
      } else if (i + 1 < n && twoChar(src.substring(i, i + 2))) {
        emit(Tok("op", src.substring(i, i + 2), i)); i += 2
      } else if ("+-*/%<>=!(){}[],;.:?".indexOf(c) >= 0) {
        emit(Tok("op", c.toString, i)); i += 1
      } else throw new JsError(s"unexpected character '$c' at $i")
    }
    emit(Tok("eof", "", n))
    out.result()
  }

  // ------------------------------------------------------------- parser ----
  def parse(src: String): Script =
    try new Parser(lex(src)).parseProgram()
    catch { case _: StackOverflowError =>
      // parser recursion is input-depth-bounded; absurd nesting in an
      // operator-authored script is a config error, not a JVM crash
      throw new JsError("expression nesting too deep to parse")
    }

  private final class Parser(toks: Vector[Tok]) {
    private var p = 0
    private def peek: Tok = toks(p)
    private def at(kind: String, text: String = null): Boolean =
      peek.kind == kind && (text == null || peek.text == text)
    private def eat(): Tok = { val t = toks(p); p += 1; t }
    private def expect(kind: String, text: String = null): Tok = {
      if (!at(kind, text))
        throw new JsError(s"expected ${Option(text).getOrElse(kind)} " +
          s"but found '${peek.text}' at ${peek.pos}")
      eat()
    }

    def parseProgram(): Script = {
      val stmts = List.newBuilder[Stmt]
      while (!at("eof")) stmts += parseStmt()
      Script(stmts.result())
    }

    private def parseStmt(): Stmt = {
      val s =
        if (at("var")) { eat()
          val name = expect("ident").text
          val init = if (at("op", "=")) { eat(); Some(parseExpr()) } else None
          VarDecl(name, init)
        } else if (at("if")) parseIf()
        else if (at("while")) parseWhile()
        else if (at("for")) parseFor()
        else if (at("function")) parseFuncDecl()
        else if (at("return")) { eat()
          val e = if (at("op", ";") || at("op", "}") || at("eof")) None
            else Some(parseExpr())
          Return(e)
        }
        else if (at("break")) { eat(); BreakStmt }
        else if (at("continue")) { eat(); ContinueStmt }
        else if (at("op", "{")) parseBlock()
        else ExprStmt(parseExpr())
      while (at("op", ";")) eat()
      s
    }

    private def parseIf(): Stmt = {
      expect("if"); expect("op", "(")
      val cond = parseExpr()
      expect("op", ")")
      val thenS = parseStmt()
      val elseS = if (at("else")) { eat(); Some(parseStmt()) } else None
      If(cond, thenS, elseS)
    }

    private def parseWhile(): Stmt = {
      expect("while"); expect("op", "(")
      val cond = parseExpr()
      expect("op", ")")
      While(cond, parseStmt())
    }

    private def parseFor(): Stmt = {
      expect("for"); expect("op", "(")
      val init =
        if (at("op", ";")) None
        else if (at("var")) { eat()
          val name = expect("ident").text
          val i0 = if (at("op", "=")) { eat(); Some(parseExpr()) } else None
          Some(VarDecl(name, i0))
        } else Some(ExprStmt(parseExpr()))
      expect("op", ";")
      val cond = if (at("op", ";")) None else Some(parseExpr())
      expect("op", ";")
      val update = if (at("op", ")")) None else Some(parseExpr())
      expect("op", ")")
      For(init, cond, update, parseStmt())
    }

    private def parseFuncDecl(): Stmt = {
      expect("function")
      val name = expect("ident").text
      val params = parseParams()
      FuncDecl(name, params, parseBlock())
    }

    private def parseParams(): List[String] = {
      expect("op", "(")
      val ps = List.newBuilder[String]
      if (!at("op", ")")) {
        ps += expect("ident").text
        while (at("op", ",")) { eat(); ps += expect("ident").text }
      }
      expect("op", ")")
      ps.result()
    }

    private def parseBlock(): Block = {
      expect("op", "{")
      val stmts = List.newBuilder[Stmt]
      while (!at("op", "}")) stmts += parseStmt()
      expect("op", "}")
      Block(stmts.result())
    }

    // assignment (lowest, right-assoc) → ternary → || → && → equality →
    // relational → additive → multiplicative → unary → postfix → primary
    private def parseExpr(): Expr = parseAssign()

    private val compound = Set("+=", "-=", "*=", "/=", "%=")

    private def parseAssign(): Expr = {
      val l = parseTernary()
      if (at("op", "=")) l match {
        case Ident(_) | Member(_, _) | Index(_, _) => eat(); Assign(l, parseAssign())
        case _ => throw new JsError(s"invalid assignment target at ${peek.pos}")
      } else if (at("op") && compound(peek.text)) l match {
        case Ident(_) | Member(_, _) | Index(_, _) =>
          val op = eat().text.substring(0, 1)
          Assign(l, Bin(op, l, parseAssign()))
        case _ => throw new JsError(s"invalid assignment target at ${peek.pos}")
      } else l
    }

    private def parseTernary(): Expr = {
      val c = parseOr()
      if (at("op", "?")) { eat()
        val t = parseAssign()
        expect("op", ":")
        Ternary(c, t, parseAssign())
      } else c
    }

    private def binL(next: () => Expr, ops: Set[String]): Expr = {
      var l = next()
      while (at("op") && ops(peek.text)) {
        val op = eat().text
        l = Bin(op, l, next())
      }
      l
    }

    private def parseOr(): Expr = binL(() => parseAnd(), Set("||"))
    private def parseAnd(): Expr = binL(() => parseEq(), Set("&&"))
    private def parseEq(): Expr = binL(() => parseRel(), Set("==", "!=", "===", "!=="))
    private def parseRel(): Expr = binL(() => parseAdd(), Set("<", "<=", ">", ">="))
    private def parseAdd(): Expr = binL(() => parseMul(), Set("+", "-"))
    private def parseMul(): Expr = binL(() => parseUnary(), Set("*", "/", "%"))

    private def parseUnary(): Expr =
      if (at("op", "!")) { eat(); Un("!", parseUnary()) }
      else if (at("op", "-")) { eat(); Un("-", parseUnary()) }
      else if (at("op", "+")) { eat(); Un("+", parseUnary()) }
      else if (at("op", "++") || at("op", "--")) {
        val op = eat().text
        Update(op, parseUnary(), prefix = true)
      }
      else if (at("new")) { eat()
        val callee = parsePostfix(parsePrimary(), callsAllowed = false)
        val args = if (at("op", "(")) parseArgs() else Nil
        // member/call chains continue after the constructor:
        // new Date(ts).getFullYear()
        parsePostfix(New(callee, args), callsAllowed = true)
      }
      else parsePostfix(parsePrimary(), callsAllowed = true)

    private def parsePostfix(base: Expr, callsAllowed: Boolean): Expr = {
      var e = base
      var done = false
      while (!done) {
        if (at("op", ".")) { eat(); e = Member(e, expect("ident").text) }
        else if (at("op", "[")) { eat(); val i = parseExpr(); expect("op", "]"); e = Index(e, i) }
        else if (callsAllowed && at("op", "(")) e = Call(e, parseArgs())
        else if (at("op", "++") || at("op", "--")) {
          e match {
            case Ident(_) | Member(_, _) | Index(_, _) =>
              e = Update(eat().text, e, prefix = false)
            case _ => done = true
          }
        }
        else done = true
      }
      e
    }

    private def parseArgs(): List[Expr] = {
      expect("op", "(")
      val args = List.newBuilder[Expr]
      if (!at("op", ")")) {
        args += parseExpr()
        while (at("op", ",")) { eat(); args += parseExpr() }
      }
      expect("op", ")")
      args.result()
    }

    private def parsePrimary(): Expr = {
      if (at("num")) Num(eat().text.toDouble)
      else if (at("regex")) {
        val t = eat().text
        val sep = t.indexOf('\u0000')
        RegexLit(t.substring(0, sep), t.substring(sep + 1))
      }
      else if (at("str")) Str(eat().text)
      else if (at("true")) { eat(); Bool(true) }
      else if (at("false")) { eat(); Bool(false) }
      else if (at("null")) { eat(); NullLit }
      else if (at("function")) { eat()
        val params = parseParams()
        FuncLit(params, parseBlock())
      }
      else if (at("ident")) Ident(eat().text)
      else if (at("op", "[")) { eat()
        val items = List.newBuilder[Expr]
        if (!at("op", "]")) {
          items += parseExpr()
          while (at("op", ",")) { eat(); items += parseExpr() }
        }
        expect("op", "]")
        ArrLit(items.result())
      }
      else if (at("op", "{")) { eat()
        val entries = List.newBuilder[(String, Expr)]
        if (!at("op", "}")) {
          entries += parseObjEntry()
          while (at("op", ",")) { eat(); entries += parseObjEntry() }
        }
        expect("op", "}")
        ObjLit(entries.result())
      }
      else if (at("op", "(")) { eat(); val e = parseExpr(); expect("op", ")"); e }
      else throw new JsError(s"unexpected token '${peek.text}' at ${peek.pos}")
    }

    private def parseObjEntry(): (String, Expr) = {
      val key =
        if (at("str")) eat().text
        else if (at("num")) jsToString(eat().text.toDouble)
        else expect("ident").text
      expect("op", ":")
      key -> parseExpr()
    }
  }

  // -------------------------------------------------------- interpreter ----

  /** Host constructor tokens resolvable via `Java.type(...)` / globals. */
  private sealed trait Ctor
  private case object HashMapCtor extends Ctor
  private case object ArrayListCtor extends Ctor
  private case object DateCtor extends Ctor
  private case object RegExpCtor extends Ctor

  /** A regex value (`/pat/flags` or `new RegExp`). Stateless — `lastIndex`
    * is not tracked (see the dialect notes). The compiled pattern is
    * per-(pattern, flags) cached so literals inside loops compile once.
    */
  private final case class JsRegex(pattern: String, flags: String) {
    val p: java.util.regex.Pattern = {
      var f = 0
      if (flags.contains('i')) f |= java.util.regex.Pattern.CASE_INSENSITIVE
      if (flags.contains('m')) f |= java.util.regex.Pattern.MULTILINE
      try java.util.regex.Pattern.compile(pattern, f)
      catch { case e: java.util.regex.PatternSyntaxException =>
        throw new JsError(s"invalid regex /$pattern/: ${e.getMessage}")
      }
    }
    def global: Boolean = flags.contains('g')
    override def toString: String = s"/$pattern/$flags"
  }

  private val regexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), JsRegex]()
  private def regexOf(pattern: String, flags: String): JsRegex = {
    flags.find(f => !"gim".contains(f)).foreach(f =>
      throw new JsError(s"unsupported regex flag '$f' (g/i/m)"))
    if (regexCache.size > 1000) JsRegex(pattern, flags) // dynamic-pattern cap
    else regexCache.computeIfAbsent((pattern, flags),
      { case (p, f) => JsRegex(p, f) })
  }

  /** `Java` namespace host object. */
  private case object JavaNs

  /** `Math` host object (the subset row scripts use). */
  private case object MathNs

  /** Function-scoped environment chain (JS `var` semantics): lookups walk
    * outward; assignment targets the scope that declared the name (root if
    * undeclared, like sloppy-mode JS); `var` declares in the current scope.
    */
  private final class Env(val parent: Env) {
    private val vars = mutable.Map[String, Any]()
    def declare(n: String, v: Any): Unit = vars(n) = v
    def lookup(n: String): Any = {
      var e: Env = this
      while (e != null) {
        if (e.vars.contains(n)) return e.vars(n)
        e = e.parent
      }
      throw new JsError(s"'$n' is not defined")
    }
    def set(n: String, v: Any): Unit = {
      var e: Env = this
      while (e != null) {
        if (e.vars.contains(n)) { e.vars(n) = v; return }
        e = e.parent
      }
      var root: Env = this
      while (root.parent != null) root = root.parent
      root.vars(n) = v
    }
  }

  /** A user function value: AST + defining scope (a closure). Runtime-only —
    * never serialized; each row evaluation builds its own. `protoProps` is
    * the function's `.prototype` object — mutated by
    * `F.prototype.m = ...`, consulted by `new F()` instances through the
    * prototype chain.
    */
  private final case class JsFunction(params: List[String], body: Block, closure: Env) {
    val protoProps: java.util.Map[String, Any] =
      new java.util.LinkedHashMap[String, Any]()
  }

  /** An object created by `new F()`: own properties in the map itself,
    * inherited lookups walk `jsProto` (the constructor's `.prototype`,
    * which may itself be a JsObject — chains compose).
    */
  private final class JsObject(val jsProto: java.util.Map[String, Any])
    extends java.util.LinkedHashMap[String, Any]

  /** Own property, else walk the prototype chain; null when absent —
    * exactly the read path `member`/method dispatch use for maps.
    */
  @annotation.tailrec
  private def protoLookup(m: java.util.Map[String, Any], name: String): Any =
    if (m.containsKey(name)) m.get(name)
    else m match {
      case o: JsObject if o.jsProto != null => protoLookup(o.jsProto, name)
      case _ => null
    }

  // lightweight control-flow signals (no stack traces — these are not errors)
  private final class ReturnSignal(val value: Any)
      extends RuntimeException(null, null, false, false)
  private final class BreakSignal extends RuntimeException(null, null, false, false)
  private final class ContinueSignal extends RuntimeException(null, null, false, false)

  private val MaxLoopIters = 10000000L

  private val UTC = java.util.TimeZone.getTimeZone("UTC")

  private def run(script: Script, bindings: Map[String, Any]): Any = {
    val env = new Env(null)
    bindings.foreach { case (k, v) => env.declare(k, normalize(v)) }
    env.declare("Java", JavaNs)
    env.declare("Date", DateCtor)
    env.declare("RegExp", RegExpCtor)
    env.declare("Math", MathNs)
    hoistFunctions(script.stmts, env)
    var completion: Any = null
    script.stmts.foreach(s => evalStmt(s, env).foreach(completion = _))
    completion
  }

  /** JS hoists function declarations to the top of their scope. */
  private def hoistFunctions(stmts: List[Stmt], env: Env): Unit =
    stmts.foreach {
      case FuncDecl(name, params, body) =>
        env.declare(name, JsFunction(params, body, env))
      case _ =>
    }

  /** Java/Scala values → JS runtime values (numbers are all double). */
  private def normalize(v: Any): Any = v match {
    case i: Int     => i.toDouble
    case l: Long    => l.toDouble
    case s: Short   => s.toDouble
    case b: Byte    => b.toDouble
    case f: Float   => f.toDouble
    case d: java.math.BigDecimal => d.doubleValue
    case other      => other
  }

  private def evalStmt(s: Stmt, env: Env): Option[Any] = s match {
    case VarDecl(n, init) =>
      env.declare(n, init.map(evalExpr(_, env)).orNull)
      None
    case FuncDecl(_, _, _) => None // bound during hoisting
    case ExprStmt(e) => Some(evalExpr(e, env))
    case If(c, t, e) =>
      if (truthy(evalExpr(c, env))) evalStmt(t, env)
      else e.flatMap(evalStmt(_, env))
    case Block(stmts) =>
      hoistFunctions(stmts, env)
      var last: Option[Any] = None
      stmts.foreach(st => evalStmt(st, env).foreach(v => last = Some(v)))
      last
    case While(cond, body) =>
      var iters = 0L
      try while (truthy(evalExpr(cond, env))) {
        iters += 1
        if (iters > MaxLoopIters) throw new JsError("loop iteration limit exceeded")
        try evalStmt(body, env): Unit
        catch { case _: ContinueSignal => }
      } catch { case _: BreakSignal => }
      None
    case For(init, cond, update, body) =>
      init.foreach(evalStmt(_, env))
      var iters = 0L
      try while (cond.forall(c => truthy(evalExpr(c, env)))) {
        iters += 1
        if (iters > MaxLoopIters) throw new JsError("loop iteration limit exceeded")
        try evalStmt(body, env): Unit
        catch { case _: ContinueSignal => }
        update.foreach(evalExpr(_, env))
      } catch { case _: BreakSignal => }
      None
    case Return(e) => throw new ReturnSignal(e.map(evalExpr(_, env)).orNull)
    case BreakStmt => throw new BreakSignal
    case ContinueStmt => throw new ContinueSignal
  }

  private def evalExpr(e: Expr, env: Env): Any = e match {
    case Num(v)  => v
    case Str(v)  => v
    case Bool(v) => v
    case NullLit => null
    case Ident(n) => env.lookup(n)
    case Assign(target, v) =>
      val value = evalExpr(v, env)
      assignTo(target, value, env)
      value
    case Update(op, target, prefix) =>
      val old = toNumber(evalExpr(target, env))
      val neu = if (op == "++") old + 1 else old - 1
      assignTo(target, neu, env)
      if (prefix) neu else old
    case Ternary(c, t, f) =>
      if (truthy(evalExpr(c, env))) evalExpr(t, env) else evalExpr(f, env)
    case Un("!", x) => !truthy(evalExpr(x, env))
    case Un("-", x) => -toNumber(evalExpr(x, env))
    case Un("+", x) => toNumber(evalExpr(x, env))
    case Un(op, _)  => throw new JsError(s"unsupported unary $op")
    case Bin("&&", l, r) =>
      val lv = evalExpr(l, env); if (!truthy(lv)) lv else evalExpr(r, env)
    case Bin("||", l, r) =>
      val lv = evalExpr(l, env); if (truthy(lv)) lv else evalExpr(r, env)
    case Bin(op, l, r) => binOp(op, evalExpr(l, env), evalExpr(r, env))
    case Member(obj, name) => member(evalExpr(obj, env), name)
    case Index(obj, idx) => indexGet(evalExpr(obj, env), evalExpr(idx, env))
    case ArrLit(items) =>
      val l = new java.util.ArrayList[Any]()
      items.foreach(i => l.add(evalExpr(i, env)))
      l
    case ObjLit(entries) =>
      val m = new java.util.LinkedHashMap[String, Any]()
      entries.foreach { case (k, v) => m.put(k, evalExpr(v, env)) }
      m
    case FuncLit(params, body) => JsFunction(params, body, env)
    case Call(Member(objE, name), args) =>
      val obj = evalExpr(objE, env)
      val argv = args.map(evalExpr(_, env))
      obj match {
        case m: java.util.Map[_, _] =>
          // object "methods": a stored (own or prototype-inherited)
          // function property wins over host map methods only if one
          // exists under that name; the receiver binds as `this`
          protoLookup(m.asInstanceOf[java.util.Map[String, Any]], name) match {
            case f: JsFunction => invoke(f, argv, thisVal = m)
            case _ => callMethod(obj, name, argv)
          }
        case _ => callMethod(obj, name, argv)
      }
    case Call(Ident("String"), args) => jsToString(args.map(evalExpr(_, env)).headOption.orNull)
    case Call(Ident("Number"), args) => toNumber(args.map(evalExpr(_, env)).headOption.orNull)
    case Call(Ident("parseInt"), args) =>
      math.floor(toNumber(args.map(evalExpr(_, env)).headOption.orNull))
    case Call(Ident("parseFloat"), args) => toNumber(args.map(evalExpr(_, env)).headOption.orNull)
    case Call(callee, args) =>
      evalExpr(callee, env) match {
        case f: JsFunction => invoke(f, args.map(evalExpr(_, env)))
        case other => throw new JsError(s"cannot call $other")
      }
    case RegexLit(p, f) => regexOf(p, f)
    case New(callee, args) =>
      evalExpr(callee, env) match {
        case HashMapCtor   => new java.util.HashMap[String, Any]()
        case ArrayListCtor => new java.util.ArrayList[Any]()
        case DateCtor      => newDate(args.map(evalExpr(_, env)))
        case RegExpCtor =>
          val a = args.map(evalExpr(_, env))
          regexOf(jsToString(a.headOption.getOrElse("")),
            a.lift(1).map(jsToString).getOrElse(""))
        case f: JsFunction => // user constructor: new instance chained to
          // f.prototype, body runs with `this` = the instance; an explicit
          // object return overrides (the JS [[Construct]] rule)
          val inst = new JsObject(f.protoProps)
          invoke(f, args.map(evalExpr(_, env)), thisVal = inst) match {
            case m: java.util.Map[_, _] => m
            case _ => inst
          }
        case other         => throw new JsError(s"not a constructor: $other")
      }
  }

  /** Call-depth budget: runaway recursion in an operator-authored script
    * must surface as a catchable [[JsError]] (one bad row/script), never a
    * raw StackOverflowError that can kill the executor thread mid-task.
    * Thread-local — partitions evaluate scripts concurrently.
    */
  private val MaxCallDepth = 128
  private val callDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  private def invoke(f: JsFunction, args: List[Any], thisVal: Any = null): Any = {
    val d = callDepth.get()
    if (d >= MaxCallDepth)
      throw new JsError(s"call depth limit exceeded ($MaxCallDepth — runaway recursion?)")
    callDepth.set(d + 1)
    try {
      val local = new Env(f.closure)
      if (thisVal != null) local.declare("this", thisVal)
      f.params.zipWithIndex.foreach { case (p, i) =>
        local.declare(p, if (i < args.size) args(i) else null)
      }
      try { evalStmt(f.body, local); null }
      catch { case r: ReturnSignal => r.value }
    } finally callDepth.set(d)
  }

  private def assignTo(target: Expr, value: Any, env: Env): Unit = target match {
    case Ident(n) => env.set(n, value)
    case Member(objE, name) =>
      evalExpr(objE, env) match {
        case m: java.util.Map[_, _] =>
          m.asInstanceOf[java.util.Map[String, Any]].put(name, value): Unit
        case other => throw new JsError(
          s"cannot set property '$name' on ${Option(other).map(_.getClass.getName).orNull}")
      }
    case Index(objE, idxE) =>
      val idx = evalExpr(idxE, env)
      evalExpr(objE, env) match {
        case l: java.util.ArrayList[Any @unchecked] =>
          val i = toNumber(idx).toInt
          if (i < 0) throw new JsError(s"negative array index $i")
          while (l.size < i) l.add(null) // JS arrays auto-extend
          if (i == l.size) l.add(value) else l.set(i, value): Unit
        case m: java.util.Map[_, _] =>
          m.asInstanceOf[java.util.Map[String, Any]].put(jsToString(idx), value): Unit
        case other => throw new JsError(
          s"cannot index-assign on ${Option(other).map(_.getClass.getName).orNull}")
      }
    case _ => throw new JsError("invalid assignment target")
  }

  private def indexGet(obj: Any, idx: Any): Any = obj match {
    case l: java.util.ArrayList[_] =>
      val i = toNumber(idx).toInt
      if (i < 0 || i >= l.size) null else l.get(i)
    case m: java.util.Map[_, _] =>
      m.asInstanceOf[java.util.Map[String, Any]].get(jsToString(idx))
    case s: String =>
      val i = toNumber(idx).toInt
      if (i < 0 || i >= s.length) null else s.substring(i, i + 1)
    case null => throw new JsError("cannot index null")
    case other => throw new JsError(s"cannot index ${other.getClass.getName}")
  }

  private def member(obj: Any, name: String): Any = (obj, name) match {
    case (null, _) => throw new JsError(s"cannot read '$name' of null")
    case (s: String, "length") => s.length.toDouble
    case (l: java.util.ArrayList[_], "length") => l.size.toDouble
    case (r: JsRegex, "source") => r.pattern
    case (r: JsRegex, "flags") => r.flags
    case (r: JsRegex, "global") => r.global
    case (MathNs, "PI") => math.Pi
    case (MathNs, "E") => math.E
    case (JavaNs, "type") => JavaNs // resolved at the call site
    case (f: JsFunction, "prototype") => f.protoProps
    case (m: java.util.Map[_, _], _) =>
      protoLookup(m.asInstanceOf[java.util.Map[String, Any]], name)
    case (other, _) => other // method resolution happens in callMethod
  }

  private def callMethod(obj: Any, name: String, args: List[Any]): Any = (obj, name) match {
    case (JavaNs, "type") => args.headOption match {
      case Some("java.util.HashMap")   => HashMapCtor
      case Some("java.util.ArrayList") => ArrayListCtor
      case Some(other) => throw new JsError(s"Java.type('$other') is not allowlisted " +
        "(row scripts may use java.util.HashMap / java.util.ArrayList)")
      case None => throw new JsError("Java.type requires a class name")
    }
    case (MathNs, f) =>
      def n(i: Int) = toNumber(args.lift(i).orNull)
      f match {
        case "floor" => math.floor(n(0))
        case "ceil" => math.ceil(n(0))
        case "abs" => math.abs(n(0))
        case "round" => math.floor(n(0) + 0.5) // JS rounds half UP, incl. negatives
        case "sqrt" => math.sqrt(n(0))
        case "pow" => math.pow(n(0), n(1))
        case "max" => if (args.isEmpty) Double.NegativeInfinity
          else args.map(toNumber).max
        case "min" => if (args.isEmpty) Double.PositiveInfinity
          else args.map(toNumber).min
        case "trunc" => if (n(0) < 0) math.ceil(n(0)) else math.floor(n(0))
        case "log" => math.log(n(0))
        case "exp" => math.exp(n(0))
        case other => throw new JsError(s"Math.$other is not supported")
      }
    case (m: java.util.Map[String @unchecked, Any @unchecked], "put") =>
      m.put(jsToString(args.head), args(1))
    case (m: java.util.Map[String @unchecked, Any @unchecked], "get") =>
      m.get(jsToString(args.head))
    case (m: java.util.Map[String @unchecked, Any @unchecked], "containsKey") =>
      m.containsKey(jsToString(args.head))
    case (m: java.util.Map[String @unchecked, Any @unchecked], "remove") =>
      m.remove(jsToString(args.head))
    case (m: java.util.Map[_, _], "size") => m.size.toDouble
    case (m: java.util.Map[_, _], "isEmpty") => m.isEmpty
    case (l: java.util.ArrayList[Any @unchecked], "add") => l.add(args.head)
    case (l: java.util.ArrayList[Any @unchecked], "push") =>
      l.add(args.head); l.size.toDouble
    case (l: java.util.ArrayList[Any @unchecked], "pop") =>
      if (l.isEmpty) null else l.remove(l.size - 1)
    case (l: java.util.ArrayList[_], "size") => l.size.toDouble
    case (l: java.util.ArrayList[_], "get") => indexGet(l, args.head)
    case (l: java.util.ArrayList[_], "indexOf") =>
      (0 until l.size).find(i => looseEq(l.get(i), args.head))
        .getOrElse(-1).toDouble
    case (l: java.util.ArrayList[_], "join") =>
      val sep = args.headOption.map(jsToString).getOrElse(",")
      (0 until l.size).map(i => jsToString(l.get(i))).mkString(sep)
    case (d: java.util.Calendar, "getFullYear") => d.get(java.util.Calendar.YEAR).toDouble
    case (d: java.util.Calendar, "getMonth") => d.get(java.util.Calendar.MONTH).toDouble
    case (d: java.util.Calendar, "getDate") => d.get(java.util.Calendar.DAY_OF_MONTH).toDouble
    case (d: java.util.Calendar, "getTime") => d.getTimeInMillis.toDouble
    case (s: String, "toString") => s
    case (s: String, "toLowerCase") => s.toLowerCase
    case (s: String, "toUpperCase") => s.toUpperCase
    case (s: String, "trim") => s.trim
    case (s: String, "substring") =>
      val from = toNumber(args.head).toInt
      if (args.size > 1) s.substring(from, toNumber(args(1)).toInt) else s.substring(from)
    case (s: String, "charAt") => indexGet(s, args.head)
    case (s: String, "indexOf") => s.indexOf(jsToString(args.head)).toDouble
    // regex-first overloads (JS String dispatches on the argument type)
    case (s: String, "replace") if args.headOption.exists(_.isInstanceOf[JsRegex]) =>
      val r = args.head.asInstanceOf[JsRegex]
      jsReplace(s, r, jsToString(args(1)), all = r.global)
    case (s: String, "split") if args.headOption.exists(_.isInstanceOf[JsRegex]) =>
      val l = new java.util.ArrayList[Any]()
      // limit -1: JS split keeps trailing empty fields
      args.head.asInstanceOf[JsRegex].p.split(s, -1).foreach(l.add)
      l
    case (s: String, "match") if args.headOption.exists(_.isInstanceOf[JsRegex]) =>
      val r = args.head.asInstanceOf[JsRegex]
      val m = r.p.matcher(s)
      if (r.global) {
        val l = new java.util.ArrayList[Any]()
        var idx = 0
        while (idx <= s.length && m.find(idx)) {
          l.add(m.group())
          idx = if (m.end() == m.start()) m.end() + 1 else m.end()
        }
        if (l.isEmpty) null else l
      } else if (m.find()) execResult(m)
      else null
    case (s: String, "search") if args.headOption.exists(_.isInstanceOf[JsRegex]) =>
      val m = args.head.asInstanceOf[JsRegex].p.matcher(s)
      (if (m.find()) m.start() else -1).toDouble
    case (s: String, "replace") => s.replace(jsToString(args.head), jsToString(args(1)))
    case (s: String, "split") => {
      val l = new java.util.ArrayList[Any]()
      s.split(java.util.regex.Pattern.quote(jsToString(args.head))).foreach(l.add)
      l
    }
    case (r: JsRegex, "test") => r.p.matcher(jsToString(args.head)).find()
    case (r: JsRegex, "exec") =>
      val m = r.p.matcher(jsToString(args.head))
      if (m.find()) execResult(m) else null
    case (r: JsRegex, "toString") => r.toString
    case (d: Double, "toString") => jsToString(d)
    case (d: Double, "toFixed") =>
      String.format(java.util.Locale.ROOT,
        s"%.${args.headOption.map(a => toNumber(a).toInt).getOrElse(0)}f",
        Double.box(d))
    case (other, m) =>
      throw new JsError(s"no method '$m' on ${Option(other).map(_.getClass.getName).orNull}")
  }

  /** `new Date(x)`: accepts the `_pipelinetimestamp` format
    * "yyyy-MM-dd HH:mm:ss.SSS z" (reference Transformation.scala:142-145),
    * ISO dates, and epoch millis. Represented as a UTC Calendar.
    */
  private def newDate(args: List[Any]): java.util.Calendar = {
    val cal = java.util.Calendar.getInstance(UTC)
    args.headOption match {
      case None =>
      case Some(d: Double) => cal.setTimeInMillis(d.toLong)
      case Some(s: String) =>
        val patterns = Seq("yyyy-MM-dd HH:mm:ss.SSS z", "yyyy-MM-dd HH:mm:ss.SSS",
          "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd")
        val parsed = patterns.view.flatMap { p =>
          try {
            val f = new java.text.SimpleDateFormat(p)
            f.setTimeZone(UTC)
            f.setLenient(false)
            Some(f.parse(s))
          } catch { case _: java.text.ParseException => None }
        }.headOption.getOrElse(throw new JsError(s"unparseable date: '$s'"))
        cal.setTime(parsed)
      case Some(other) => throw new JsError(s"new Date($other) unsupported")
    }
    cal
  }

  /** JS exec/match result: [fullMatch, group1, ...] (unmatched groups null). */
  private def execResult(m: java.util.regex.Matcher): java.util.ArrayList[Any] = {
    val l = new java.util.ArrayList[Any]()
    l.add(m.group())
    (1 to m.groupCount()).foreach(g => l.add(m.group(g)))
    l
  }

  /** JS String.replace with a regex: first match (or all with `g`), with
    * `$$` / `$&` / `$1`..`$99` replacement references expanded manually —
    * JS treats an out-of-range `$n` as literal text where Java throws, so
    * Matcher.appendReplacement cannot be used directly.
    */
  private def jsReplace(s: String, r: JsRegex, repl: String, all: Boolean): String = {
    val m = r.p.matcher(s)
    // java.lang.StringBuilder: the 3-arg append(CharSequence, from, to)
    // overload (Scala's StringBuilder would box the args into a tuple)
    val out = new java.lang.StringBuilder
    var idx = 0
    var more = true
    while (more && idx <= s.length && m.find(idx)) {
      out.append(s, idx, m.start()).append(expandRepl(repl, m))
      idx =
        if (m.end() == m.start()) { // empty match: consume one char, advance
          if (m.start() < s.length) out.append(s.charAt(m.start()))
          m.end() + 1
        } else m.end()
      more = all
    }
    if (idx < s.length) out.append(s, idx, s.length)
    out.toString
  }

  private def expandRepl(repl: String, m: java.util.regex.Matcher): String = {
    val out = new StringBuilder
    var i = 0
    while (i < repl.length) {
      val c = repl(i)
      if (c == '$' && i + 1 < repl.length) {
        repl(i + 1) match {
          case '$' => out.append('$'); i += 2
          case '&' => out.append(m.group()); i += 2
          case d if d.isDigit =>
            // longest valid group number wins (JS semantics), max 2 digits
            val two = if (i + 2 < repl.length && repl(i + 2).isDigit)
              (d.asDigit * 10 + repl(i + 2).asDigit) else -1
            if (two >= 1 && two <= m.groupCount()) {
              out.append(Option(m.group(two)).getOrElse("")); i += 3
            } else if (d.asDigit >= 1 && d.asDigit <= m.groupCount()) {
              out.append(Option(m.group(d.asDigit)).getOrElse("")); i += 2
            } else { out.append(c); i += 1 } // out of range: literal, like JS
          case _ => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case d: Double => d != 0.0 && !d.isNaN
    case s: String => s.nonEmpty
    case _ => true
  }

  private def toNumber(v: Any): Double = v match {
    case null => 0.0
    case d: Double => d
    case b: Boolean => if (b) 1.0 else 0.0
    case s: String =>
      val t = s.trim
      if (t.isEmpty) 0.0
      else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
    case _ => Double.NaN
  }

  /** JS ToString: whole doubles render without a decimal point. */
  def jsToString(v: Any): String = v match {
    case null => "null"
    case d: Double =>
      if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case b: Boolean => b.toString
    case s: String => s
    case other => other.toString
  }

  private def binOp(op: String, l: Any, r: Any): Any = op match {
    case "+" => (l, r) match {
      case (ls: String, _) => ls + jsToString(r)
      case (_, rs: String) => jsToString(l) + rs
      case _ => toNumber(l) + toNumber(r)
    }
    case "-" => toNumber(l) - toNumber(r)
    case "*" => toNumber(l) * toNumber(r)
    case "/" => toNumber(l) / toNumber(r)
    case "%" => toNumber(l) % toNumber(r)
    case "<" | "<=" | ">" | ">=" =>
      (l, r) match {
        case (ls: String, rs: String) =>
          val c = ls.compareTo(rs)
          op match {
            case "<" => c < 0; case "<=" => c <= 0
            case ">" => c > 0; case ">=" => c >= 0
          }
        case _ =>
          val (ln, rn) = (toNumber(l), toNumber(r))
          op match {
            case "<" => ln < rn; case "<=" => ln <= rn
            case ">" => ln > rn; case ">=" => ln >= rn
          }
      }
    case "==" => looseEq(l, r)
    case "!=" => !looseEq(l, r)
    case "===" => strictEq(l, r)
    case "!==" => !strictEq(l, r)
    case other => throw new JsError(s"unsupported operator $other")
  }

  private def strictEq(l: Any, r: Any): Boolean = (l, r) match {
    case (null, null) => true
    case (ld: Double, rd: Double) => ld == rd
    case (ls: String, rs: String) => ls == rs
    case (lb: Boolean, rb: Boolean) => lb == rb
    case _ => l != null && (l.asInstanceOf[AnyRef] eq r.asInstanceOf[AnyRef])
  }

  private def looseEq(l: Any, r: Any): Boolean = (l, r) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (ld: Double, rs: String) => ld == toNumber(rs)
    case (ls: String, rd: Double) => toNumber(ls) == rd
    case (lb: Boolean, _) => looseEq(if (lb) 1.0 else 0.0, r)
    case (_, rb: Boolean) => looseEq(l, if (rb) 1.0 else 0.0)
    case _ => strictEq(l, r)
  }
}
