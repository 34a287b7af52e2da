package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property hardening for the hand-written formula parser: whatever bytes a
  * workbook carries in an `<f>` element, resolution must terminate and
  * return strings — never throw, never hang. (The functional results are
  * pinned by XlsxFormulaSpec; this is the adversarial-input guarantee an
  * ingest path needs.) Deterministic seeds — no flaky reruns.
  */
class XlsxFormulaPropSpec extends AnyFunSuite with Matchers {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def gridWith(formula: String): Vector[Vector[XlsxFormula.Cell]] =
    Vector(
      Vector(XlsxFormula.Cell("10", None), XlsxFormula.Cell("x", None)),
      Vector(XlsxFormula.Cell("", Some(formula)), XlsxFormula.Cell("2.5", None)))

  test("arbitrary formula strings never throw and always terminate") {
    val junk = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("SUM(", "A1", ":", ",", ")", "(", "+", "-", "*",
        "/", "^", "&", "%", "\"", "IF(", "1.5", "e", "$", "<", ">", "=",
        "B2", "ZZ99", "TRUE", "..", " ")).map(_.mkString))
    samples(junk, 500).foreach { f =>
      withClue(s"formula <$f>: ") {
        noException should be thrownBy
          XlsxFormula.resolve(gridWith(f), evaluateAll = false)
      }
    }
  }

  test("well-formed arithmetic over random operands matches direct computation") {
    samples(Gen.zip(Gen.chooseNum(-1000, 1000), Gen.chooseNum(-1000, 1000)), 200)
      .foreach { case (a, b) =>
        val grid = Vector(Vector(
          XlsxFormula.Cell(a.toString, None),
          XlsxFormula.Cell(b.toString, None),
          XlsxFormula.Cell("", Some("A1+B1*2"))))
        XlsxFormula.resolve(grid, evaluateAll = false)(0)(2) shouldBe
          (a + b * 2L).toString
      }
  }

  test("deep nesting terminates without stack overflow escaping") {
    val deep = "(" * 2000 + "1" + ")" * 2000
    noException should be thrownBy
      XlsxFormula.resolve(gridWith(deep), evaluateAll = false)
  }

  test("self-reference and long reference chains terminate as empty") {
    // A1 -> A2 -> ... -> A50 -> A1 (a 50-cell cycle)
    val grid = (1 to 50).toVector.map { r =>
      Vector(XlsxFormula.Cell("", Some(if (r == 50) "A1" else s"A${r + 1}")))
    }
    XlsxFormula.resolve(grid, evaluateAll = false)
      .flatten.foreach(_ shouldBe "")
  }
}
