package graft.sinks

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Reference-mode (object-store) commits, end to end: with
  * [[CommitPublisher.carryByReference]] the link-commit family — COW DML,
  * link-append INSERT, metadata-only ALTER, incremental OPTIMIZE — must
  * carry prior files as MANIFEST REFERENCES (zero bytes linked, copied or
  * moved), every read path must resolve them (catalog SQL through
  * [[graft.plans.RefResolveRule]], versioned reads, time travel, zone-map
  * pruning), and retention must become reachability-aware (a version dir
  * survives while any surviving manifest references its files). The
  * differential tests pin reference mode to byte-identical CONTENT with
  * hard-link mode across the same statement sequence.
  */
class RefModeSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def inRefMode[T](body: => T): T = {
    val prev = TableManifest.publisher
    TableManifest.publisher = ReferenceCommitPublisher
    try body finally TableManifest.publisher = prev
  }

  private def seedRows(n: Int): DataFrame =
    (0L until n.toLong).map { i =>
      val v: java.lang.Long =
        if (i % 13 == 0) null else java.lang.Long.valueOf(i % 89)
      (i, v, s"w${i % 7}_$i", (i % 4).toInt)
    }.toDF("id", "v", "s", "p")

  private def build(tag: String, partitioned: Boolean): ObjectStoreSpec = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).toString,
      database = "graft_refmode", table = s"t_$tag",
      partitionBy = if (partitioned) Seq("p") else Nil)
    ObjectStoreSink.replaceTable(spark,
      seedRows(2000).repartitionByRange(4, col("id")), spec)
    spec
  }

  private def liveManifest(spec: ObjectStoreSpec): TableManifest.Manifest =
    TableManifest.read(Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)).get

  /** Physical data bytes present INSIDE the live version dir — the "zero
    * copied bytes" REQUIRE: a reference-mode commit's dir holds only the
    * freshly-written files.
    */
  private def physicalBytes(spec: ObjectStoreSpec): Long = {
    val live = Paths.get(ObjectStoreSink.snapshots(spec).last.path)
    TableManifest.dataFiles(live).map(Files.size).sum
  }

  private def content(df: DataFrame): Seq[(Long, Any, String, Int)] =
    df.select("id", "v", "s", "p").collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2), r.getInt(3))).toSeq.sortBy(_._1)

  test("link-append INSERT carries by reference: zero copied bytes, " +
      "catalog + time travel + pruning all resolve") {
    val spec = build("insref", partitioned = false)
    val fq = s"${spec.database}.${spec.table}"
    val expected = content(spark.table(fq)) ++
      Seq((9001L, 7L: Any, "fresh", 9))
    val before = ObjectStoreSink.snapshots(spec).last
    val prevBytes = before.totalBytes
    inRefMode {
      val r = spark.sql(
        s"INSERT INTO $fq VALUES (9001, 7, 'fresh', 9)").collect().head
      r.getInt(1) shouldBe 4 // all 4 prior files carried
      val m = liveManifest(spec)
      m.files.count(_.ref.nonEmpty) shouldBe 4
      // references are FLAT: they name the prior version dir directly
      m.files.filter(_.ref.nonEmpty).foreach(e =>
        e.ref should startWith(
          Paths.get(before.path).getFileName.toString + "/"))
      // zero bytes of carried data copied into the new dir
      physicalBytes(spec) should be < prevBytes / 2
      // the catalog read resolves references (RefResolveRule)
      content(spark.table(fq)) shouldBe expected
      content(spark.sql(s"SELECT * FROM $fq")) shouldBe expected
      // versioned read + time travel
      content(ObjectStoreSink.readVersion(spark, spec)) shouldBe expected
      ObjectStoreSink.readVersion(spark, spec, Some(before.version))
        .count() shouldBe 2000L
      // zone-map pruning composes: the filtered read is exact AND the
      // plan provably SKIPS reference-resolved files (ManifestEvidence
      // matches by physical identity through the resolved listing)
      val banded = spark.sql(
        s"SELECT id, v FROM $fq WHERE id BETWEEN 100 AND 199")
      val reports = banded.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location match {
                case z: graft.plans.ZoneMapPrunedIndex => Seq(z.report)
                case _ => Nil
              }
            case _ => Nil
          }
      }.flatten
      withClue("a band filter on a reference-mode table must zone-map-prune: ") {
        reports should not be empty
        reports.head.filesKept should be < reports.head.filesTotal
      }
      banded.count() shouldBe 100L
      spark.sql(s"SELECT count(*) AS c FROM $fq WHERE id BETWEEN 100 AND 199")
        .head.getLong(0) shouldBe 100L
      // metadata aggregate totality still proves through references
      spark.sql(s"SELECT count(*) AS c FROM $fq").head.getLong(0) shouldBe
        expected.size.toLong
    }
  }

  test("COW DELETE carries untouched files by reference; content exact; " +
      "a second reference commit stays flat") {
    val spec = build("cowref", partitioned = false)
    val fq = s"${spec.database}.${spec.table}"
    val pre = content(spark.table(fq))
    inRefMode {
      // well inside the FIRST range file's window (repartitionByRange
      // samples its boundaries, so a quarter-point predicate could
      // legitimately touch two files)
      val r = spark.sql(s"DELETE FROM $fq WHERE id < 250").collect().head
      r.getInt(3) shouldBe 3 // 3 of 4 range-clustered files untouched
      liveManifest(spec).files.count(_.ref.nonEmpty) shouldBe 3
      content(spark.table(fq)) shouldBe pre.filter(_._1 >= 250L)
      // second selective DELETE: carried refs stay FLAT (one hop to the
      // version dir that physically WROTE each file — v1 for the original
      // survivors, v2 for the file the first DELETE rewrote)
      spark.sql(s"DELETE FROM $fq WHERE id >= 1900").collect()
      val live = Paths.get(ObjectStoreSink.snapshots(spec).last.path)
      val m = liveManifest(spec)
      m.files.filter(_.ref.nonEmpty).foreach { e =>
        withClue(s"ref ${e.ref} must be flat and resolvable: ") {
          e.ref.count(_ == '/') shouldBe e.path.count(_ == '/') + 1
          Files.isRegularFile(TableManifest.resolved(live, e)) shouldBe true
        }
      }
      m.files.count(_.ref.startsWith("v-000001/")) shouldBe 2
      m.files.count(_.ref.startsWith("v-000002/")) shouldBe 1
      content(spark.table(fq)) shouldBe
        pre.filter(t => t._1 >= 250L && t._1 < 1900L)
    }
  }

  test("metadata-only ALTER ADD COLUMNS in reference mode writes ZERO " +
      "data files; partitioned catalog reads resolve references") {
    val spec = build("evoref", partitioned = true)
    val fq = s"${spec.database}.${spec.table}"
    val pre = content(spark.table(fq))
    inRefMode {
      val r = spark.sql(s"ALTER TABLE $fq ADD COLUMNS (score DOUBLE)")
        .collect().head
      r.getInt(1) shouldBe liveManifest(spec).files.size
      physicalBytes(spec) shouldBe 0L // nothing written, nothing copied
      spark.table(fq).where("score IS NOT NULL").count() shouldBe 0L
      content(spark.table(fq).drop("score")) shouldBe pre
      // partition-pruned catalog scan over reference entries stays exact
      spark.sql(s"SELECT count(*) AS c FROM $fq WHERE p = 2")
        .head.getLong(0) shouldBe pre.count(_._4 == 2).toLong
      // widened arity is live for a reference-carried INSERT
      spark.sql(s"INSERT INTO $fq VALUES (9001, 7, 'fresh', 0.5, 2)")
        .collect()
      spark.table(fq).where("score IS NOT NULL").count() shouldBe 1L
    }
  }

  test("differential: the same DML sequence in reference mode equals " +
      "hard-link mode, content and reports") {
    def run(tag: String, ref: Boolean): (Seq[(Long, Any, String, Int)],
        Seq[Long]) = {
      val body = () => {
        val spec = build(tag, partitioned = tag.hashCode % 2 == 0)
        val fq = s"${spec.database}.${spec.table}"
        val reports = Seq.newBuilder[Long]
        reports += spark.sql(s"DELETE FROM $fq WHERE id BETWEEN 600 AND 899")
          .collect().head.getLong(1)
        reports += spark.sql(
          s"UPDATE $fq SET v = v + 1000 WHERE id >= 1500").collect()
          .head.getLong(1)
        Seq((100L, "one"), (1700L, "two")).toDF("id", "nm")
          .createOrReplaceTempView(s"src_$tag")
        spark.sql(
          s"""MERGE INTO $fq t USING src_$tag s ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET s = s.nm
             |WHEN NOT MATCHED THEN INSERT (id, s, p) VALUES (s.id, s.nm, 1)
             |""".stripMargin).collect()
        spark.sql(s"INSERT INTO $fq VALUES (5000, 1, 'tail', 3)").collect()
        (content(spark.table(fq)), reports.result())
      }
      if (ref) inRefMode(body()) else body()
    }
    val (linkContent, linkReports) = run("dla", ref = false)
    val (refContent, refReports) = run("drb", ref = true)
    refContent shouldBe linkContent
    refReports shouldBe linkReports
  }

  test("vacuum is reachability-aware: a referenced version dir survives " +
      "past grace until unreferenced, then retires") {
    val spec = build("vacref", partitioned = false)
    val fq = s"${spec.database}.${spec.table}"
    val tableDir = Paths.get(spec.path, spec.database, spec.table)
    val prevGrace = ObjectStoreSink.retireGraceMs
    ObjectStoreSink.retireGraceMs = 0L
    try inRefMode {
      spark.sql(s"DELETE FROM $fq WHERE id < 500").collect()    // v2: refs v1
      spark.sql(s"INSERT INTO $fq VALUES (8000, 1, 'x', 0)").collect() // v3
      val v1 = Paths.get(ObjectStoreSink.snapshots(spec).head.path)
      liveManifest(spec).files.count(_.ref.nonEmpty) should be >= 3
      val expected = content(spark.table(fq))
      // keep=1 would retire v1 and v2 by age — but the LIVE manifest
      // still references v1's files, and v2 owns nothing referenced...
      graft.operators.Vacuum.vacuumTable(tableDir, keep = 1, graceMs = 0L)
      withClue("a referenced version dir must survive vacuum: ") {
        Files.exists(v1) shouldBe true
      }
      content(spark.table(fq)) shouldBe expected // nothing torn
      // a full rewrite drops every reference; v1 becomes unreachable
      spark.sql(s"INSERT OVERWRITE $fq SELECT * FROM $fq").collect()
      liveManifest(spec).files.count(_.ref.nonEmpty) shouldBe 0
      graft.operators.Vacuum.vacuumTable(tableDir, keep = 1, graceMs = 0L)
      withClue("an unreferenced superseded dir must retire: ") {
        Files.exists(v1) shouldBe false
      }
      content(spark.table(fq)) shouldBe expected
    } finally ObjectStoreSink.retireGraceMs = prevGrace
  }

  test("incremental OPTIMIZE carries the right-sized keep set by " +
      "reference") {
    val spec = ObjectStoreSpec(path = scratchDir("optref").toString,
      database = "graft_refmode", table = "t_optref")
    // one big file + a fragment tail
    ObjectStoreSink.replaceTable(spark,
      seedRows(4000).repartition(1), spec)
    inRefMode {
      ObjectStoreSink.appendVersion(spark, seedRows(40).repartition(4)
        .withColumn("id", col("id") + 10000L), spec)
      val fq = s"${spec.database}.${spec.table}"
      val pre = content(spark.table(fq))
      val bigBytes = liveManifest(spec).files.map(_.bytes).max
      val r = graft.operators.Compaction.compactReport(spark, spec,
        targetBytes = bigBytes) // the big file is keep-sized; tail packs
      r.changed shouldBe true
      r.filesLinked should be >= 1
      liveManifest(spec).files.count(_.ref.nonEmpty) should be >= 1
      content(spark.table(fq)) shouldBe pre
    }
  }
}
