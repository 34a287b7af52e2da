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

  test("stealPctOf attributes window steal from the sample timeline") {
    import graft.Bench.{StatSample, stealPctOf}
    def ns(ms: Long) = ms * 1_000_000L
    // 10 samples 250 ms apart; steal runs at 0 for the first half and
    // 40% of the 100-jiffie/sample machine rate for the second half
    val samples = (0 to 9).map { i =>
      val steal = if (i <= 5) 0L else (i - 5) * 40L
      StatSample(ns(i * 250), i * 100L, steal, 0L)
    }.toVector
    // quiet window: samples 0-4
    assert(stealPctOf(samples, ns(0), ns(1000)) == 0.0)
    // stolen window: samples 6-9 → 120 steal over 300 jiffies = 40%
    assert(math.abs(stealPctOf(samples, ns(1600), ns(2250)) - 40.0) < 1e-9)
    // sub-period window resolves via the 400 ms grace
    assert(stealPctOf(samples, ns(1100), ns(1200)) >= 0.0)
    // no samples → unknown, not zero
    assert(stealPctOf(Vector.empty, 0L, ns(1000)) == -1.0)
    // counter going backwards (proc restart) → unknown
    val broken = Vector(StatSample(ns(0), 100L, 0L, 0L), StatSample(ns(250), 50L, 0L, 0L))
    assert(stealPctOf(broken, ns(0), ns(250)) == -1.0)
  }

  test("StealSampler reads /proc/stat and accumulates ordered samples") {
    val s = new graft.Bench.StealSampler
    s.start()
    Thread.sleep(700)
    s.stop()
    val all = s.all
    assert(all.size >= 3, s"expected >=3 samples, got ${all.size}")
    assert(all == all.sortBy(_.t))
    assert(all.last.total > all.head.total, "total jiffies must advance")
    assert(all.forall(x => x.steal >= 0 && x.idle >= 0))
  }
}
