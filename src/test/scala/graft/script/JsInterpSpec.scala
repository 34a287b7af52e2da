package graft.script

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class JsInterpSpec extends AnyFunSuite with Matchers {

  private def eval(src: String, bindings: Map[String, Any] = Map.empty): Any =
    JsInterp.parse(src).eval(bindings)

  test("completion value is the last evaluated expression statement") {
    eval("var ret = null; ret;").asInstanceOf[AnyRef] shouldBe null
    eval("1 + 2; 'done';") shouldBe "done"
    eval("var x = 5;").asInstanceOf[AnyRef] shouldBe null // var decl produces no completion
  }

  test("the reference DQ fixture script behaves as specced") {
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/stock_price_data_quality.js")), "UTF-8")
    eval(script, Map("symbol" -> "AXN")).asInstanceOf[String] should include ("AXN")
    eval(script, Map("symbol" -> "FAX")).asInstanceOf[AnyRef] shouldBe null
  }

  test("the reference transform fixture script behaves as specced") {
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/stock_price_transformation.js")), "UTF-8")
    val out = eval(script, Map(
      "symbol" -> "IAF", "adj_close" -> 5.42,
      "_pipelinetimestamp" -> "2026-08-12 09:00:00.000 UTC"))
    val m = out.asInstanceOf[java.util.HashMap[String, Any]]
    m.get("mynewcolumn") shouldBe 100.0
    m.get("adj_close") shouldBe 6.42
    m.get("year") shouldBe "2026"
    // FAX rows are dropped
    eval(script, Map("symbol" -> "FAX", "adj_close" -> 4.63,
      "_pipelinetimestamp" -> "2026-08-12 09:00:00.000 UTC")).asInstanceOf[AnyRef] shouldBe null
  }

  test("do-nothing fixture returns an empty map except for FAX") {
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/stock_price_transformation_do_nothing.js")), "UTF-8")
    eval(script, Map("symbol" -> "IAF"))
      .asInstanceOf[java.util.HashMap[String, Any]].isEmpty shouldBe true
    eval(script, Map("symbol" -> "FAX")).asInstanceOf[AnyRef] shouldBe null
  }

  test("arithmetic, string concat, JS number formatting") {
    eval("1 + 2 * 3;") shouldBe 7.0
    eval("10 % 3;") shouldBe 1.0
    eval("'a' + 1;") shouldBe "a1"
    eval("1.5 + 'a';") shouldBe "1.5a"
    eval("String(2026.0);") shouldBe "2026"
    eval("String(2026.5);") shouldBe "2026.5"
    eval("(2.0).toFixed(2);") shouldBe "2.00"
  }

  test("equality: loose vs strict") {
    eval("1 == '1';") shouldBe true
    eval("1 === 1;") shouldBe true
    eval("null == null;") shouldBe true
    eval("'a' != 'b';") shouldBe true
    eval("1 !== 2;") shouldBe true
  }

  test("if/else, &&, ||, truthiness") {
    eval("var x = 3; if (x > 2 && x < 10) 'mid'; else 'out';") shouldBe "mid"
    eval("if ('') 'yes'; else 'no';") shouldBe "no"
    eval("null || 'fallback';") shouldBe "fallback"
  }

  test("string methods") {
    eval("'  pad '.trim();") shouldBe "pad"
    eval("'Hello'.toLowerCase();") shouldBe "hello"
    eval("'abcdef'.substring(1, 3);") shouldBe "bc"
    eval("'a,b'.indexOf(',');") shouldBe 1.0
    eval("'x'.length;") shouldBe 1.0
  }

  test("Date parsing covers the pipeline timestamp format") {
    eval("new Date('2024-03-05 10:20:30.400 UTC').getFullYear();") shouldBe 2024.0
    eval("new Date('2024-03-05').getMonth();") shouldBe 2.0 // zero-based like JS
  }

  test("Java.type allowlist and HashMap surface") {
    eval("""var HashMap = Java.type('java.util.HashMap');
           |var m = new HashMap(); m.put('k', 1 + 1); m.get('k');""".stripMargin) shouldBe 2.0
    a[JsInterp.JsError] should be thrownBy
      eval("Java.type('java.lang.Runtime');")
  }

  test("typed bindings normalize to JS numbers") {
    eval("v + 1;", Map("v" -> 41)) shouldBe 42.0
    eval("v + 1;", Map("v" -> 41L)) shouldBe 42.0
    eval("v + 0.5;", Map("v" -> 1.5f)) shouldBe 2.0
  }

  test("parse errors and undefined variables fail loudly") {
    a[JsInterp.JsError] should be thrownBy eval("var = ;")
    a[JsInterp.JsError] should be thrownBy eval("missing + 1;")
    a[JsInterp.JsError] should be thrownBy eval("'unterminated")
  }

  test("constructor functions: new + prototype chain + this binding") {
    // instance state via this, behavior via the prototype
    eval("""function Counter(start) { this.n = start; }
           |Counter.prototype.bump = function(k) { this.n = this.n + k; return this.n; };
           |var c = new Counter(10);
           |c.bump(5); c.bump(2);""".stripMargin) shouldBe 17.0
    // prototype mutation is DELEGATION, not a copy: existing instances see
    // methods added after construction
    eval("""function A() {}
           |var a = new A();
           |A.prototype.late = function() { return 42; };
           |a.late();""".stripMargin) shouldBe 42.0
    // own property shadows the prototype's
    eval("""function B() {}
           |B.prototype.v = function() { return 1; };
           |var b = new B();
           |b.v = function() { return 2; };
           |b.v();""".stripMargin) shouldBe 2.0
    // chains compose: a prototype that is itself a new-built instance
    eval("""function Base() {}
           |Base.prototype.who = function() { return 'base'; };
           |function Derived() {}
           |Derived.prototype.child = new Base();
           |Derived.prototype.child.who();""".stripMargin) shouldBe "base"
    // explicit object return overrides the instance ([[Construct]] rule)
    eval("""function F() { this.x = 1; return {x: 9}; }
           |new F().x;""".stripMargin) shouldBe 9.0
    // object-literal methods get a this binding too
    eval("""var o = {n: 3, double: function() { return this.n * 2; }};
           |o.double();""".stripMargin) shouldBe 6.0
  }

  test("documented dialect boundary: prototype replacement / builtins / ES6 fail loudly") {
    // whole-prototype REPLACEMENT stays out (mutate properties instead)
    a[JsInterp.JsError] should be thrownBy
      eval("function C() {}; C.prototype = {m: function() { return 1; }}; new C().m();")
    // builtin prototypes (String etc.) are not extensible
    a[JsInterp.JsError] should be thrownBy
      eval("String.prototype.shout = function() { return this + '!'; }; 'x'.shout();")
    // ES6 syntax is likewise out of scope
    a[JsInterp.JsError] should be thrownBy eval("let x = 1; x;")
    a[JsInterp.JsError] should be thrownBy eval("var f = (a) => a + 1; f(1);")
    a[JsInterp.JsError] should be thrownBy eval("class A {}; new A();")
  }

  test("function declarations, returns, recursion, hoisting") {
    eval("""function add(a, b) { return a + b; }
           |add(2, 3);""".stripMargin) shouldBe 5.0
    // recursion + early return
    eval("""function fact(n) { if (n <= 1) return 1; return n * fact(n - 1); }
           |fact(5);""".stripMargin) shouldBe 120.0
    // hoisting: callable before its declaration in source order
    eval("""var r = twice(4);
           |function twice(x) { return x * 2; }
           |r;""".stripMargin) shouldBe 8.0
    // missing args are null; return with no value is null
    eval("""function f(a, b) { if (b == null) return; return 1; }
           |f(1) == null;""".stripMargin) shouldBe true
  }

  test("anonymous function expressions close over their scope") {
    eval("""var base = 10;
           |var addBase = function(x) { return base + x; };
           |base = 20;
           |addBase(5);""".stripMargin) shouldBe 25.0
  }

  test("while and for loops with break/continue") {
    eval("""var s = 0; var i = 0;
           |while (i < 10) { i = i + 1; if (i % 2 == 0) continue; s = s + i; }
           |s;""".stripMargin) shouldBe 25.0 // 1+3+5+7+9
    eval("""var s = 0;
           |for (var i = 0; i < 100; i++) { if (i == 5) break; s += i; }
           |s;""".stripMargin) shouldBe 10.0 // 0+1+2+3+4
    eval("""var n = 0; for (;;) { n++; if (n >= 3) break; } n;""") shouldBe 3.0
    // runaway loops fail loudly instead of hanging the executor
    a[JsInterp.JsError] should be thrownBy eval("while (true) { 1; }")
  }

  test("compound assignment and increment/decrement") {
    eval("var x = 10; x += 5; x -= 3; x *= 2; x /= 4; x;") shouldBe 6.0
    eval("var i = 5; var a = i++; a + '/' + i;") shouldBe "5/6"
    eval("var i = 5; var b = --i; b + '/' + i;") shouldBe "4/4"
  }

  test("array literals, indexing, growth, methods") {
    eval("var a = [1, 2, 3]; a[0] + a[2];") shouldBe 4.0
    eval("var a = [1]; a[1] = 5; a.length;") shouldBe 2.0
    eval("var a = []; a.push('x'); a.push('y'); a.join('-');") shouldBe "x-y"
    eval("var a = [1, 2, 3]; a.indexOf(2);") shouldBe 1.0
    eval("var a = [1, 2]; a.pop(); a.length;") shouldBe 1.0
    eval("var a = [7]; a[99] == null;") shouldBe true // OOB read is null
    // iterate + mutate, the shape a real cleanup script takes
    eval("""var xs = ['a', 'b', 'c']; var out = [];
           |for (var i = 0; i < xs.length; i++) out.push(xs[i].toUpperCase());
           |out.join('');""".stripMargin) shouldBe "ABC"
  }

  test("object literals, dot/bracket access and assignment") {
    eval("var o = {a: 1, 'b c': 2}; o.a + o['b c'];") shouldBe 3.0
    eval("var o = {}; o.x = 5; o['y'] = 6; o.x + o.y;") shouldBe 11.0
    eval("var o = {n: 1}; o.n += 2; o.n;") shouldBe 3.0
    eval("var o = {a: {b: 4}}; o.a.b;") shouldBe 4.0
    eval("var o = {missing: null}; o.missing == null;") shouldBe true
    // object literals interop with the HashMap surface scripts already use
    eval("var o = {k: 'v'}; o.get('k');") shouldBe "v"
    eval("var o = {}; o.put('k', 9); o.k;") shouldBe 9.0
  }

  test("Math object: functions, constants, JS half-up rounding") {
    eval("Math.floor(3.7) + Math.ceil(3.2);") shouldBe 7.0
    eval("Math.abs(-5) + Math.sqrt(16);") shouldBe 9.0
    eval("Math.round(2.5);") shouldBe 3.0
    eval("Math.round(-2.5);") shouldBe -2.0 // JS half-up, not half-away
    eval("Math.max(1, 9, 4) - Math.min(1, 9, 4);") shouldBe 8.0
    eval("Math.pow(2, 10);") shouldBe 1024.0
    eval("Math.trunc(-3.9);") shouldBe -3.0
    eval("Math.PI > 3.14 && Math.PI < 3.15;") shouldBe true
    a[JsInterp.JsError] should be thrownBy eval("Math.random();") // nondeterministic → rejected
  }

  test("ternary expressions") {
    eval("var x = 5; x > 3 ? 'big' : 'small';") shouldBe "big"
    eval("(0 ? 1 : 2) + (1 ? 10 : 20);") shouldBe 12.0
  }

  test("functions + arrays + objects compose (word-count shape)") {
    eval("""function countWords(s) {
           |  var parts = s.split(' ');
           |  var m = {};
           |  for (var i = 0; i < parts.length; i++) {
           |    var w = parts[i];
           |    if (w == '') continue;
           |    m[w] = (m[w] == null ? 0 : m[w]) + 1;
           |  }
           |  return m;
           |}
           |var m = countWords('a b a c a b');
           |m['a'] + '/' + m['b'] + '/' + m['c'];""".stripMargin) shouldBe "3/2/1"
  }

  test("regex literals: test/exec, flags, division disambiguation") {
    eval("/ab+c/.test('xxabbbc')") shouldBe true
    eval("/ab+c/.test('xyz')") shouldBe false
    eval("/ABC/i.test('xabcx')") shouldBe true
    eval("var r = /a(b)(c)?/; var m = r.exec('zab'); m[0] + ':' + m[1] + ':' + m[2]") shouldBe "ab:b:null"
    eval("/a(b)/.exec('xyz')").asInstanceOf[AnyRef] shouldBe null
    // '/' after an operand is division, after an operator a regex
    eval("var a = 10; var b = 2; a / b") shouldBe 5.0
    eval("var n = 6 / 2 / 3; n") shouldBe 1.0
    eval("true ? /x/.test('x') : false") shouldBe true
    // character class containing '/' does not terminate the literal
    eval("/[/]/.test('a/b')") shouldBe true
    // unsupported flag fails loudly
    an[JsInterp.JsError] should be thrownBy eval("/x/y")
  }

  test("regex String methods: replace ($n/$&), split, match, search") {
    eval("'a1b2c3'.replace(/[0-9]/, '#')") shouldBe "a#b2c3"
    eval("'a1b2c3'.replace(/[0-9]/g, '#')") shouldBe "a#b#c#"
    eval("'john smith'.replace(/(\\w+) (\\w+)/, '$2 $1')") shouldBe "smith john"
    eval("'abc'.replace(/b/, '[$&]')") shouldBe "a[b]c"
    eval("'price: 5'.replace(/(\\d)/, '$1$9')") shouldBe "price: 5$9" // OOR group literal
    eval("'a,b;c'.split(/[,;]/).join('|')") shouldBe "a|b|c"
    eval("'a,b,'.split(/,/).length") shouldBe 3.0 // trailing empty kept
    eval("'x1y22z'.match(/\\d+/g).join('-')") shouldBe "1-22"
    eval("'x1y22z'.match(/q/g)").asInstanceOf[AnyRef] shouldBe null
    eval("var m = 'ab12'.match(/([a-z]+)(\\d+)/); m[1] + '/' + m[2]") shouldBe "ab/12"
    eval("'hello world'.search(/world/)") shouldBe 6.0
    eval("'hello'.search(/z/)") shouldBe -1.0
  }

  test("new RegExp and regex properties") {
    eval("new RegExp('a.c').test('abc')") shouldBe true
    eval("new RegExp('A', 'i').test('xax')") shouldBe true
    eval("var r = new RegExp('x', 'gi'); r.source + ':' + r.flags + ':' + r.global") shouldBe "x:gi:true"
    an[JsInterp.JsError] should be thrownBy eval("new RegExp('x', 'u')")
    an[JsInterp.JsError] should be thrownBy eval("new RegExp('[')")
  }

  test("regex in loops and functions (cache path, empty-match advance)") {
    eval("""
      var n = 0;
      for (var i = 0; i < 100; i++) { if (/ab/.test('xaby')) n++; }
      n""") shouldBe 100.0
    // empty-match global replace terminates and behaves like JS
    eval("'abc'.replace(/x*/g, '-')") shouldBe "-a-b-c-"
    eval("""
      function clean(s) { return s.replace(/[^a-z]+/g, ' ').trim(); }
      clean('a1b%%c  d!')""") shouldBe "a b c d"
  }
}
