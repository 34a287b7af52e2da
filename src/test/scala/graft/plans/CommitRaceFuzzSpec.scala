package graft.plans

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.{ObjectStoreSink, TableManifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Paths
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-writer race fuzz for the SQL DML surface: every verb is
  * CAS-pinned on the snapshot it read, and a loser RE-EXECUTES against
  * the winner's snapshot (GraftSqlParser.withCommitRetry — the bounded
  * optimistic retry). The properties under interleaving:
  *
  *   1. NO LOST UPDATES — disjoint-range writers all land (the Iceberg
  *      disjoint-commit-retry demand), and OVERLAPPING writers serialize
  *      (k concurrent increments of one row sum to k — the re-execution
  *      guarantee a read-set/write-set abort could only fail);
  *   2. NO ORPHANS — every surviving version dir is manifest-committed
  *      and the commit log matches the directory truth;
  *   3. REPORTS stay truthful — each statement's row accounting reflects
  *      the snapshot it finally committed against.
  *
  * Threads set the active session explicitly (the parser's table probe is
  * thread-local by Spark's design — any multi-threaded driver does this).
  */
class CommitRaceFuzzSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def concurrently[T](bodies: Seq[() => T]): Seq[T] = {
    val pool = Executors.newFixedThreadPool(bodies.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = bodies.map(b => Future {
        SparkSession.setActiveSession(spark)
        b()
      })
      Await.result(Future.sequence(fs), 300.seconds)
    } finally pool.shutdown()
  }

  private def auditCommitted(spec: ObjectStoreSpec): Unit = {
    val tableDir = Paths.get(spec.path, spec.database, spec.table)
    val snaps = ObjectStoreSink.snapshots(spec)
    snaps should not be empty
    // contiguity of the surviving chain and log/dir agreement
    val logged = graft.sinks.CommitLog.read(tableDir).getOrElse(Nil)
    snaps.map(_.version).foreach(v => logged should contain(v))
    snaps.foreach(s =>
      TableManifest.isCommitted(Paths.get(s.path)) shouldBe true)
  }

  test("disjoint-range DML from 3 concurrent writers all lands — no " +
      "lost updates, no orphan versions") {
    val spec = ObjectStoreSpec(path = scratchDir("race1").toString,
      database = "graft_race", table = "t_disjoint")
    val df = (0L until 3000L).map(i => (i, i % 7, s"s$i")).toDF("id", "v", "s")
    ObjectStoreSink.replaceTable(spark,
      df.repartitionByRange(6, col("id")), spec)
    val fq = s"${spec.database}.${spec.table}"
    // each writer owns ids [i*1000, i*1000+999]: DELETE a slice, UPDATE a
    // slice, INSERT a unique row — all pairwise disjoint, so the final
    // image is order-independent and exactly computable
    val writers = (0 until 3).map { i => () => {
      val lo = i * 1000L
      spark.sql(s"DELETE FROM $fq WHERE id >= $lo AND id < ${lo + 200}")
        .collect()
      spark.sql(s"UPDATE $fq SET v = v + 100 WHERE id >= ${lo + 200} " +
        s"AND id < ${lo + 400}").collect()
      spark.sql(s"INSERT INTO $fq VALUES (${900000 + i}, $i, 'w$i')")
        .collect()
      ()
    }}
    concurrently(writers)
    val expected = (0L until 3000L).filterNot(i => i % 1000 < 200)
      .map(i => (i, if (i % 1000 >= 200 && i % 1000 < 400) i % 7 + 100
                    else i % 7, s"s$i")) ++
      (0 until 3).map(i => (900000L + i, i.toLong, s"w$i"))
    val got = spark.table(fq).select("id", "v", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      .sortBy(_._1)
    got shouldBe expected.sortBy(_._1)
    auditCommitted(spec)
  }

  test("overlapping writers serialize: k concurrent increments of one " +
      "row sum to k") {
    val spec = ObjectStoreSpec(path = scratchDir("race2").toString,
      database = "graft_race", table = "t_counter")
    ObjectStoreSink.replaceTable(spark,
      Seq((1L, 0L)).toDF("id", "n"), spec)
    val fq = s"${spec.database}.${spec.table}"
    val k = 4
    concurrently((0 until k).map(_ => () =>
      spark.sql(s"UPDATE $fq SET n = n + 1 WHERE id = 1").collect(): Unit))
    spark.table(fq).select("n").head.getLong(0) shouldBe k.toLong
    auditCommitted(spec)
  }

  test("concurrent link-appends both land (the disjoint-append case the " +
      "r14 CAS abort failed)") {
    val spec = ObjectStoreSpec(path = scratchDir("race3").toString,
      database = "graft_race", table = "t_append")
    ObjectStoreSink.replaceTable(spark,
      (0L until 100L).map(i => (i, s"s$i")).toDF("id", "s"), spec)
    val fq = s"${spec.database}.${spec.table}"
    val k = 4
    concurrently((0 until k).map(i => () =>
      spark.sql(s"INSERT INTO $fq VALUES (${1000 + i}, 'a$i')")
        .collect(): Unit))
    spark.table(fq).count() shouldBe (100 + k).toLong
    (0 until k).foreach(i =>
      spark.table(fq).where(s"id = ${1000 + i}").count() shouldBe 1L)
    auditCommitted(spec)
  }

  test("maintenance still ABORTS instead of retrying: a compaction racing " +
      "a real writer drops its stale rewrite") {
    val spec = ObjectStoreSpec(path = scratchDir("race4").toString,
      database = "graft_race", table = "t_maint")
    ObjectStoreSink.replaceTable(spark,
      (0L until 500L).map(i => (i, s"s$i")).toDF("id", "s")
        .repartition(8), spec)
    val fq = s"${spec.database}.${spec.table}"
    // interleave: pin the snapshot, let a writer commit, then compact on
    // the stale pin — compactReport must return changed=false, content
    // must be the writer's
    val snap = ObjectStoreSink.snapshots(spec).last
    spark.sql(s"DELETE FROM $fq WHERE id < 100").collect()
    val packed = ObjectStoreSink.readVersion(spark, spec, Some(snap.version))
      .repartition(1)
    intercept[graft.sinks.ConcurrentCommitException] {
      ObjectStoreSink.replaceTable(spark, packed, spec,
        expectVersion = Some(snap.version))
    }
    spark.table(fq).count() shouldBe 400L
    auditCommitted(spec)
  }
}
