package graft.script

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Adversarial-input hardening for the row-script interpreter: whatever an
  * operator puts in a script file, parse/eval must terminate and fail only
  * with the interpreter's own [[JsInterp.JsError]] — never a hang, a raw
  * StackOverflowError, or an executor-killing throwable. Functional
  * behavior is pinned by JsInterpSpec; this is the containment guarantee.
  * Deterministic seeds — no flaky reruns.
  */
class JsInterpPropSpec extends AnyFunSuite with Matchers {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def tryScript(src: String): Unit = {
    val script =
      try JsInterp.parse(src)
      catch { case _: JsInterp.JsError => return } // rejection is fine
    try script.eval(Map("value" -> "x", "n" -> 3)): Unit
    catch { case _: JsInterp.JsError => () } // runtime rejection is fine
  }

  test("junk sources parse-or-JsError and evaluate-or-JsError, never anything else") {
    val junk = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("var ", "x", "=", "1", "+", "(", ")", "{", "}",
        "[", "]", ";", "function", " f", "if", "while", "for", "return",
        "'s'", "\"t\"", ".", ",", "!", "?", ":", "&&", "||", "value",
        "new ", "Date", "Math.floor", "++", "--")).map(_.mkString))
    samples(junk, 800).foreach { src =>
      withClue(s"script <${src.take(80)}>: ") {
        noException should be thrownBy tryScript(src)
      }
    }
  }

  test("runaway recursion fails as JsError, not StackOverflowError") {
    val script = JsInterp.parse("function f(i) { return f(i + 1); } f(0);")
    val e = intercept[JsInterp.JsError] { script.eval(Map.empty) }
    e.getMessage should include ("call depth")
  }

  test("mutual recursion is bounded too") {
    val script = JsInterp.parse(
      "function a(i) { return b(i + 1); } function b(i) { return a(i + 1); } a(0);")
    an[JsInterp.JsError] should be thrownBy script.eval(Map.empty)
  }

  test("absurd expression nesting parses-or-rejects without a JVM crash") {
    val deep = "var x = " + "(" * 20000 + "1" + ")" * 20000 + ";"
    noException should be thrownBy {
      try JsInterp.parse(deep) catch { case _: JsInterp.JsError => () }
    }
  }

  test("legitimate bounded recursion still works under the depth budget") {
    val script = JsInterp.parse(
      "function fact(i) { return i <= 1 ? 1 : i * fact(i - 1); } fact(20);")
    script.eval(Map.empty) shouldBe 2.43290200817664e18
  }
}
