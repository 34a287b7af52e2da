package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Keeps the documented spec count honest: discovers every Suite on the
  * test classpath, sums the RUNTIME test counts (parameterized suites
  * register more tests than they have `test(...)` call sites), and asserts
  * the numbers claimed in README.md / OPERATORS.md match — so the docs can
  * never drift from `sbt test` again without a red build.
  */
class SpecCountSpec extends AnyFunSuite with Matchers {

  private def suiteClasses(root: Path): Seq[String] = {
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith("Spec.class") && !p.toString.contains("$"))
      .map(p => root.relativize(p).toString.stripSuffix(".class").replace('/', '.'))
      .toList
    finally s.close()
  }

  test("README/OPERATORS spec counts match the discovered suite total") {
    val root = Paths.get("target/scala-2.13/test-classes")
    val total = suiteClasses(root).flatMap { name =>
      Try {
        val c = Class.forName(name)
        if (classOf[org.scalatest.Suite].isAssignableFrom(c) &&
          !java.lang.reflect.Modifier.isAbstract(c.getModifiers))
          Some(c.getDeclaredConstructor().newInstance()
            .asInstanceOf[org.scalatest.Suite]
            .expectedTestCount(org.scalatest.Filter.default))
        else None
      }.toOption.flatten
    }.sum
    total should be > 300
    val claims = Seq(
      "README.md" -> """(\d+) unit/e2e tests""".r,
      "OPERATORS.md" -> """ScalaTest \((\d+) green\)""".r)
    for ((doc, pat) <- claims) {
      val text = Files.readString(Paths.get(doc))
      val found = pat.findAllMatchIn(text).map(_.group(1).toInt).toList
      withClue(s"$doc must state the spec count with '${pat.regex}':") {
        found should not be empty
      }
      withClue(s"$doc claims vs discovered runtime test count:") {
        found.foreach(_ shouldBe total)
      }
    }
  }
}
