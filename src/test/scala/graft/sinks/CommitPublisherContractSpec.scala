package graft.sinks

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec
import graft.model.ObjectStoreSpec

/** Contract tests for the [[CommitPublisher]] seam, run against BOTH the
  * POSIX implementation and [[FakeObjectStorePublisher]] — a simulated
  * object store with no atomic rename and CAS-based conditional PUT. The
  * versioned-table protocol's whole ACID story off-POSIX rides on this
  * seam, so the full table lifecycle must hold with the fake installed,
  * and readers racing a TORN store (non-atomic metadata writes) must
  * degrade to the previous committed state, never to a wrong file set.
  */
class CommitPublisherContractSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def publishers: Seq[(String, () => CommitPublisher)] = Seq(
    "posix" -> (() => PosixCommitPublisher),
    "fake-store" -> (() => new FakeObjectStorePublisher()))

  for ((label, mk) <- publishers) {

    test(s"[$label] publishIfAbsent: exactly one of 16 concurrent writers wins") {
      val pub = mk()
      val dir = scratchDir(s"cpifabsent-$label").toPath
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(16)
      try {
        val attempts = (0 until 16).map { i =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              start.await()
              pub.publishIfAbsent(dir, "_superseded", s"writer-$i")
            }
          })
        }
        start.countDown()
        val wins = attempts.map(_.get(30, TimeUnit.SECONDS))
        wins.count(identity) shouldBe 1
        val winner = wins.indexOf(true)
        Files.readString(dir.resolve("_superseded")) shouldBe s"writer-$winner"
      } finally pool.shutdownNow(): Unit
    }

    test(s"[$label] publishIfAbsent after a publish does not overwrite") {
      val pub = mk()
      val dir = scratchDir(s"cpnoover-$label").toPath
      pub.publish(dir, "m", "committed")
      pub.publishIfAbsent(dir, "m", "late") shouldBe false
      Files.readString(dir.resolve("m")) shouldBe "committed"
    }

    test(s"[$label] concurrent publish is last-writer-wins with a FULL body") {
      val pub = mk()
      val dir = scratchDir(s"cplww-$label").toPath
      val bodies = (0 until 4).map(i => s"body-$i-" + (s"x$i" * 2000))
      val pool = Executors.newFixedThreadPool(4)
      try {
        val fs = bodies.map(b => pool.submit(new Runnable {
          def run(): Unit = for (_ <- 0 until 10) pub.publish(dir, "m", b)
        }))
        fs.foreach(_.get(60, TimeUnit.SECONDS))
        // whatever interleaving happened, the surviving object is ONE
        // complete published body — never a splice of two
        bodies should contain(Files.readString(dir.resolve("m")))
      } finally pool.shutdownNow(): Unit
    }
  }

  test("full versioned-table lifecycle on a store without atomic rename") {
    // every metadata commit (manifests, supersede stamps, commit log) goes
    // through the fake store: versioning, time travel, append refresh,
    // retirement and log pruning must behave exactly as on POSIX
    val pub = new FakeObjectStorePublisher()
    val prev = TableManifest.publisher
    TableManifest.publisher = pub
    val root = scratchDir("cplife").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_cp1", table = "t")
    val tableDir = Paths.get(root, "graft_cp1", "t")
    try {
      ObjectStoreSink.write(spark, Seq((1, "a")).toDF("id", "s"), spec)
      ObjectStoreSink.replaceTable(spark,
        Seq((1, "a2"), (2, "b")).toDF("id", "s"), spec)
      // snapshots + time travel resolve through fake-published metadata
      val snaps = ObjectStoreSink.snapshots(spec)
      snaps.map(_.version) shouldBe Seq(1, 2)
      snaps.map(_.rowCount) shouldBe Seq(1, 2)
      ObjectStoreSink.readVersion(spark, spec, Some(1))
        .as[(Int, String)].collect().toSeq shouldBe Seq((1, "a"))
      CommitLog.read(tableDir) shouldBe Some(Seq(1, 2))
      // in-place append republishes the manifest through the seam
      ObjectStoreSink.write(spark, Seq((3, "c")).toDF("id", "s"), spec)
      val live = tableDir.resolve(f"v-${2}%06d")
      TableManifest.read(live).get.rowCount shouldBe 3
      // zero-grace retirement prunes the log through the seam too
      val g = ObjectStoreSink.retireGraceMs
      ObjectStoreSink.retireGraceMs = 0L
      try ObjectStoreSink.replaceTable(spark,
        Seq((9, "z")).toDF("id", "s"), spec)
      finally ObjectStoreSink.retireGraceMs = g
      CommitLog.read(tableDir) shouldBe Some(Seq(2, 3))
      // recovery from metadata the fake store published
      spark.sql("DROP TABLE graft_cp1.t")
      ObjectStoreSink.recoverTable(spark, spec) shouldBe true
      spark.table("graft_cp1.t").count() shouldBe 1
      pub.puts.get() should be > 0
      pub.conditionalPuts.get() should be > 0
    } finally TableManifest.publisher = prev
  }

  test("mid-commit readers on a TORN store see a committed state, never garbage") {
    // tornWindowMs exposes half-written metadata bodies to racing readers —
    // the copy-phase of a store without atomic writes. The protocol's
    // defense is defensive parsing: a torn manifest/commit-log read
    // degrades to "not committed"/"no log" (old state), never to a wrong
    // file set or a thrown error.
    val prev = TableManifest.publisher
    TableManifest.publisher = new FakeObjectStorePublisher(tornWindowMs = 20L)
    val root = scratchDir("cptorn").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_cp2", table = "t")
    try {
      ObjectStoreSink.write(spark, Seq((0, "v1")).toDF("id", "s"), spec)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val reader = new Thread(() => {
        while (!stop.get()) {
          try {
            val snaps = ObjectStoreSink.snapshots(spec)
            // legal observation: a non-empty ascending run of committed
            // versions, each with the exact one-row accounting it was
            // committed with — a torn read may HIDE a version, never
            // corrupt one
            if (snaps.isEmpty) bad.add("empty snapshot set"): Unit
            if (snaps.map(_.version) != snaps.map(_.version).sorted)
              bad.add(s"unsorted: ${snaps.map(_.version)}"): Unit
            snaps.filter(_.rowCount != 1).foreach(s =>
              bad.add(s"v${s.version} rowCount=${s.rowCount}"): Unit)
          } catch {
            case e: Exception => bad.add(s"threw: $e"): Unit
          }
        }
      })
      reader.start()
      try
        for (i <- 1 to 6)
          ObjectStoreSink.replaceTable(spark,
            Seq((i, s"v${i + 1}")).toDF("id", "s"), spec)
      finally {
        stop.set(true)
        reader.join(30000)
      }
      import scala.jdk.CollectionConverters._
      withClue(s"reader observed: ${bad.asScala.toList}") {
        bad.isEmpty shouldBe true
      }
      // and the end state is fully committed despite every publish tearing
      ObjectStoreSink.snapshots(spec).last.version shouldBe 7
      ObjectStoreSink.readVersion(spark, spec)
        .as[(Int, String)].collect().toSeq shouldBe Seq((6, "v7"))
    } finally TableManifest.publisher = prev
  }
}
