package graft.plans

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.{CommitPublisher, FakeObjectStorePublisher, ObjectStoreSink, TableManifest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** Differential fuzz for REFERENCE-MODE copy-on-write DML — the
  * object-store twin of [[CowFuzzSpec]], with the carry discipline
  * flipped to manifest-level file references and the publisher swapped
  * for the SIMULATED OBJECT STORE (per-key serialized full-object PUTs,
  * no atomic rename — the [[FakeObjectStorePublisher]] contract rig), so
  * every axis is proven on the backend reference mode exists for:
  *
  *   1. CONTENT: the post-statement table equals the image computed
  *      independently on the pre-DF — whatever the evidence decided;
  *   2. REPORT: rows_deleted / rows_updated exact (UPDATE's count
  *      observed on the write scan);
  *   3. COMMIT SHAPE: every carried entry is a FLAT reference that
  *      resolves to a real file, is physically ABSENT from the live dir
  *      (zero bytes moved), and files_linked matches the manifest's
  *      reference count;
  *   4. TIME TRAVEL: the pre-statement snapshot reads in full through
  *      its own references.
  *
  * Layouts and predicate shapes rotate exactly like the link-mode fuzz;
  * seeds pinned.
  */
class RefCowFuzzSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  /** Object-store semantics AND reference carries in one backend. */
  private object RefStorePublisher extends CommitPublisher {
    private val inner = new FakeObjectStorePublisher()
    def publish(dir: Path, name: String, content: String): Unit =
      inner.publish(dir, name, content)
    def publishIfAbsent(dir: Path, name: String, content: String): Boolean =
      inner.publishIfAbsent(dir, name, content)
    override def carryByReference: Boolean = true
  }

  private def inRefStore[T](body: => T): T = {
    val prev = TableManifest.publisher
    TableManifest.publisher = RefStorePublisher
    try body finally TableManifest.publisher = prev
  }

  private def buildTable(tag: String, rnd: scala.util.Random)
      : (ObjectStoreSpec, DataFrame) = {
    val n = 1200 + rnd.nextInt(1200)
    val layout = rnd.nextInt(3)
    val rows = (0L until n.toLong).map { i =>
      val s = s"${('a' + (i % 7).toInt).toChar}word$i"
      val v: java.lang.Long =
        if (i % 11 == 0) null else java.lang.Long.valueOf(i % 97)
      (i, v, s, (i % 5).toInt)
    }
    val df = rows.toDF("id", "v", "s", "p")
    val spec = ObjectStoreSpec(path = scratchDir(tag).toString,
      database = "graft_reffuzz", table = s"t_$tag",
      partitionBy = if (layout == 2) Seq("p") else Nil,
      bloomColumns = if (rnd.nextBoolean()) Seq("id") else Nil)
    val shaped = layout match {
      case 0 => df.repartitionByRange(4, col("id"))
      case 1 => df.repartition(4)
      case _ => df
    }
    ObjectStoreSink.replaceTable(spark, shaped, spec)
    (spec, df)
  }

  private def predicates(rnd: scala.util.Random, n: Int): String = {
    val a = rnd.nextInt(n); val b = a + rnd.nextInt(n / 2 + 1)
    rnd.nextInt(10) match {
      case 0 => s"id BETWEEN $a AND $b"
      case 1 => s"id = $a"
      case 2 => s"id IN ($a, ${a + 7}, ${b})"
      case 3 => s"v > ${rnd.nextInt(97)}"
      case 4 => s"pmod(id, ${2 + rnd.nextInt(9)}) = 0" // opaque: full rewrite
      case 5 => s"s LIKE '${('a' + rnd.nextInt(7)).toChar}%'"
      case 6 => s"id < $a OR id > ${math.max(b, n - 50)}"
      case 7 => s"p = ${rnd.nextInt(5)}"
      case 8 => s"p IN (${rnd.nextInt(5)}, ${rnd.nextInt(5)}) AND id <= $b"
      case _ => "v IS NULL"
    }
  }

  /** Axis 3: the reference-commit shape audit. Returns the live
    * manifest's reference count after asserting flatness, resolvability
    * and physical absence for every reference entry.
    */
  private def auditRefs(spec: ObjectStoreSpec): Int = {
    val live = Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    val m = TableManifest.read(live).get
    m.files.filter(_.ref.nonEmpty).map { e =>
      withClue(s"entry ${e.path} -> ${e.ref}: ") {
        e.ref.count(_ == '/') shouldBe e.path.count(_ == '/') + 1 // flat
        Files.isRegularFile(TableManifest.resolved(live, e)) shouldBe true
        Files.exists(live.resolve(e.path)) shouldBe false // zero bytes moved
      }
      e
    }.size
  }

  private def collectSorted(df: DataFrame): Seq[(Long, Any, String, Int)] =
    df.select("id", "v", "s", "p").collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2), r.getInt(3))).toSeq.sortBy(_._1)

  for (seed <- 1 to 5)
    test(s"reference-mode COW DELETE equals the independent image on " +
      s"every axis — seed $seed") {
      val rnd = new scala.util.Random(seed * 6007)
      val (spec, pre) = buildTable(s"rdel$seed", rnd)
      val fq = s"${spec.database}.${spec.table}"
      val n = pre.count().toInt
      val w = predicates(rnd, n)
      val expected = collectSorted(pre.where(!coalesce(expr(w), lit(false))))
      val before = ObjectStoreSink.snapshots(spec).last
      inRefStore {
        val r = spark.sql(s"DELETE FROM $fq WHERE $w").collect().head
        withClue(s"predicate: $w\n") {
          collectSorted(spark.table(fq)) shouldBe expected
          r.getLong(1) shouldBe (n - expected.size).toLong
          auditRefs(spec) shouldBe r.getInt(3)
          ObjectStoreSink.readVersion(spark, spec, Some(before.version))
            .count() shouldBe n.toLong
        }
      }
    }

  for (seed <- 1 to 5)
    test(s"reference-mode COW UPDATE equals the independent image, " +
      s"observed count exact — seed $seed") {
      val rnd = new scala.util.Random(seed * 30011)
      val (spec, pre) = buildTable(s"rupd$seed", rnd)
      val fq = s"${spec.database}.${spec.table}"
      val n = pre.count().toInt
      val w = predicates(rnd, n)
      val cond = coalesce(expr(w), lit(false))
      val expected = collectSorted(pre.select(col("id"),
        when(cond, coalesce(col("v"), lit(0L)) + 1000L)
          .otherwise(col("v")).as("v"),
        when(cond, concat(col("s"), lit("!"))).otherwise(col("s")).as("s"),
        col("p")))
      val expectedMatched = pre.where(cond).count()
      val before = ObjectStoreSink.snapshots(spec).last
      inRefStore {
        val r = spark.sql(
          s"""UPDATE $fq SET v = coalesce(v, 0) + 1000, s = concat(s, '!')
             |WHERE $w""".stripMargin).collect().head
        withClue(s"predicate: $w\n") {
          collectSorted(spark.table(fq)) shouldBe expected
          r.getLong(1) shouldBe expectedMatched
          auditRefs(spec) shouldBe r.getInt(3)
          ObjectStoreSink.readVersion(spark, spec, Some(before.version))
            .count() shouldBe n.toLong
        }
      }
    }

  test("a second statement on a reference table carries references of " +
    "references FLAT, through the object-store publisher") {
    val rnd = new scala.util.Random(424243)
    val (spec, pre) = buildTable("rchain", rnd)
    val fq = s"${spec.database}.${spec.table}"
    inRefStore {
      spark.sql(s"DELETE FROM $fq WHERE id < 100").collect()
      spark.sql(s"UPDATE $fq SET v = 7 WHERE id >= 1000").collect()
      spark.sql(s"INSERT INTO $fq VALUES (90001, 1, 'tail', 2)").collect()
      auditRefs(spec) should be >= 1
      val expected = collectSorted(pre.where("id >= 100")
        .select(col("id"),
          when(col("id") >= 1000, 7L).otherwise(col("v")).as("v"),
          col("s"), col("p"))) :+ ((90001L, 1L: Any, "tail", 2))
      collectSorted(spark.table(fq)) shouldBe expected.sortBy(_._1)
    }
  }
}
