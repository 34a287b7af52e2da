package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Guards the bench-tooling invocation shape (VERDICT r7 #1/#2).
  *
  * The round-7 defect: timeq.sh's env-var prefix ended in a
  * backslash-continuation that spliced into a comment line, so every
  * assignment bound to nothing — the triage tool benched the full suite
  * at the default SF and overwrote BENCH.json. These assertions make
  * that shape (and the clobber-by-default output path) unrepresentable
  * without a test failure.
  */
class BenchToolingSpec extends AnyFunSuite {
  private def lines(p: String): Vector[String] =
    Files.readAllLines(Paths.get(p)).asScala.toVector

  test("timeq.sh has no backslash-continuation into a comment line") {
    val ls = lines("tools/timeq.sh")
    val bad = ls.zip(ls.drop(1)).filter { case (a, b) =>
      a.trim.endsWith("\\") && b.trim.startsWith("#")
    }
    assert(bad.isEmpty, s"continuation-into-comment splices the command: $bad")
  }

  test("timeq.sh passes env vars on the same simple command as java") {
    val src = lines("tools/timeq.sh").mkString("\n")
    // `env VAR=... \` continuations terminating in the java invocation —
    // assignments ride the command, they can't silently bind to nothing.
    assert(src.contains("env SPARK_GRAFT_SF_DIR="), "env prefix must carry SF dir")
    assert(src.contains("SPARK_GRAFT_ONLY="), "env prefix must carry query selection")
    assert(src.contains("SPARK_GRAFT_BENCH_OUT="), "output must be redirected off-tree")
    // the env prefix and java must be one command: between `env ` and
    // `java ` every line break is escaped
    val envIdx = src.indexOf("env SPARK_GRAFT_SF_DIR=")
    val javaIdx = src.indexOf("java ", envIdx)
    assert(javaIdx > envIdx, "java invocation must follow the env prefix")
    val between = src.substring(envIdx, javaIdx)
    between.split("\n").dropRight(1).foreach { l =>
      assert(l.trim.endsWith("\\"), s"unescaped break inside env+java command: '$l'")
      assert(!l.trim.startsWith("#"), s"comment inside env+java command: '$l'")
    }
  }

  test("timeq.sh writes bench output to a temp file, never the repo tree") {
    val src = lines("tools/timeq.sh").mkString("\n")
    assert(src.contains("mktemp"), "output must go to a mktemp path")
    assert(!src.contains("SPARK_GRAFT_BENCH_OUT=BENCH.json"),
      "triage tool must not target the committed BENCH.json")
  }

  test("timeq.sh passes bash -n syntax check") {
    val p = new ProcessBuilder("bash", "-n", "tools/timeq.sh").start()
    assert(p.waitFor() == 0, "bash -n rejected tools/timeq.sh")
  }

  test("Bench defaults its output outside the repo tree") {
    val src = lines("src/main/scala/graft/Bench.scala").mkString("\n")
    assert(src.contains("""getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")"""),
      "Bench must default SPARK_GRAFT_BENCH_OUT to target/, not BENCH.json")
  }

  test("Bench carries a calibrated host-steal canary") {
    assert(graft.Bench.CanaryRef > 0.0, "CanaryRef must be calibrated (>0)")
    // The canary must be cheap enough to run twice per bench (<15s even
    // on a badly stolen host) and expensive enough to measure (>0.1s).
    val t = graft.Bench.canarySec()
    assert(t > 0.1 && t < 15.0, s"canary wall time out of range: $t")
  }
}
