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
}
