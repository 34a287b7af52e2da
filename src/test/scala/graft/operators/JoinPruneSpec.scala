package graft.operators

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.sinks.{ObjectStoreSink, TableManifest, ZoneMap}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dim-driven join file pruning: the key-set probe must beat the range
  * relaxation exactly where runtime filters matter (bimodal key sets),
  * every refusal path must keep files, and the pruned fact must be
  * inner-join-identical to the full snapshot.
  */
class JoinPruneSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def commit(tag: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): ObjectStoreSpec = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = "graft_jp", table = s"t_$tag", partitionBy = partitionBy)
    ObjectStoreSink.replaceTable(spark, df, spec)
    spec
  }

  private def liveManifest(spec: ObjectStoreSpec): TableManifest.Manifest =
    TableManifest.read(java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)).get

  // range-clustered fact: 8 files, ids 0..799, each file a contiguous band
  private def clusteredFact(tag: String): ObjectStoreSpec = commit(tag,
    (0L until 800L).map(i => (i, s"r$i")).toDF("id", "payload")
      .repartitionByRange(8, col("id")))

  test("bimodal dim key set prunes the middle files the range relaxation " +
    "cannot; inner join over the pruned fact is identical") {
    val spec = clusteredFact("bimodal")
    val dim = Seq(3L, 17L, 55L, 760L, 781L, 799L).toDF("k")
    val (fact, rep) = JoinPrune.factForEquiJoin(spark, spec, dim, "id", "k")
    rep.keySetUsed shouldBe true
    // [3, 799] spans every band → range proves nothing
    rep.range.filesSkipped shouldBe 0
    // only the first and last bands hold keys → 6 middle files dropped
    rep.set.get.filesSkipped should be >= 5
    rep.result shouldBe rep.set.get
    val full = ObjectStoreSink.readVersion(spark, spec)
    val expect = full.join(dim, full("id") === dim("k")).select("id", "payload")
      .collect().map(_.toSeq).sortBy(_.toString)
    fact.join(dim, fact("id") === dim("k")).select("id", "payload")
      .collect().map(_.toSeq).sortBy(_.toString) shouldBe expect
  }

  test("empty / all-null dim proves every file partner-free; schema survives") {
    val spec = clusteredFact("emptydim")
    val dim = Seq[Option[Long]](None, None).toDF("k")
    val (fact, rep) = JoinPrune.factForEquiJoin(spark, spec, dim, "id", "k")
    rep.keySetUsed shouldBe true
    rep.result.filesKept shouldBe 0
    fact.columns.toSeq shouldBe Seq("id", "payload")
    fact.count() shouldBe 0
  }

  test("key-set overflow falls back to the range prune (keySetUsed=false), " +
    "still sound") {
    val spec = clusteredFact("overflow")
    val dim = (0L until 120L).map(i => i % 100L).toDF("k") // 100 distinct
    val (fact, rep) = JoinPrune.factForEquiJoin(spark, spec, dim, "id", "k",
      maxKeySet = 50)
    rep.keySetUsed shouldBe false
    rep.dimKeys shouldBe -1L
    rep.set shouldBe None
    // dim ⊆ [0, 99] → the upper bands are range-provably partner-free
    rep.range.filesSkipped should be > 0
    fact.join(dim.distinct(), fact("id") === col("k")).count() shouldBe 100
  }

  test("domain mismatch refuses: double dim keys never prune long stats") {
    val spec = clusteredFact("mismatch")
    val dim = Seq(3.5, 17.25).toDF("k")
    val m = liveManifest(spec)
    val (_, rep) = ZoneMap.pruneInSet(m, "id", Seq(3.5, 17.25)).get
    rep.filesSkipped shouldBe 0 // lossy compare carries no proof
    // NaN keys refuse wholesale (Spark: NaN = NaN is true; stats omit NaN)
    ZoneMap.pruneInSet(m, "id", Seq(1.0, Double.NaN)) shouldBe None
    // mixed-type key sets refuse wholesale
    ZoneMap.pruneInSet(m, "id", Seq(1L, "x")) shouldBe None
    val (fact, r2) = JoinPrune.factForEquiJoin(spark, spec, dim, "id", "k")
    r2.result.filesKept shouldBe r2.result.filesTotal
    fact.count() shouldBe 800
  }

  test("±0.0 keys and bounds are SQL-equal: -0.0 key keeps the +0.0 file " +
    "and vice versa") {
    val m = TableManifest.Manifest(files = Seq(
      TableManifest.FileEntry("a.parquet", 10L, Some(Map(
        "v" -> TableManifest.ColStats("double", "0.0", "0.0", 0)))),
      TableManifest.FileEntry("b.parquet", 10L, Some(Map(
        "v" -> TableManifest.ColStats("double", "-0.0", "-0.0", 0)))),
      TableManifest.FileEntry("c.parquet", 10L, Some(Map(
        "v" -> TableManifest.ColStats("double", "5.0", "6.0", 0))))),
      totalBytes = 30L, rowCount = 3L, schemaHash = "h", committedAtMs = 1L)
    val (kept, rep) = ZoneMap.pruneInSet(m, "v", Seq(-0.0)).get
    kept.map(_.path) shouldBe Seq("a.parquet", "b.parquet")
    rep.filesSkipped shouldBe 1
  }

  test("string, date and timestamp key domains probe exactly; all-null " +
    "file columns drop; no-stats files keep") {
    val m = TableManifest.Manifest(files = Seq(
      TableManifest.FileEntry("s1", 1L, Some(Map(
        "s" -> TableManifest.ColStats("string", "apple", "cherry", 0),
        "d" -> TableManifest.ColStats("date", "100", "200", 0),
        "t" -> TableManifest.ColStats("tsms", "1000", "2000", 0)))),
      TableManifest.FileEntry("s2", 1L, Some(Map(
        "s" -> TableManifest.ColStats("string", "melon", "peach", 0),
        "d" -> TableManifest.ColStats("date", "300", "400", 0),
        "t" -> TableManifest.ColStats("tsus", "9000000", "9999999", 0)))),
      TableManifest.FileEntry("s3", 1L, Some(Map(
        "s" -> TableManifest.ColStats("null", "", "", 5)))),
      TableManifest.FileEntry("s4", 1L, None)),
      totalBytes = 4L, rowCount = 20L, schemaHash = "h", committedAtMs = 1L)
    // "banana" ∈ [apple, cherry] only; s3 all-null drops; s4 no stats keeps
    ZoneMap.pruneInSet(m, "s", Seq("banana")).get._1.map(_.path) shouldBe
      Seq("s1", "s4")
    // epoch-day 350 hits only s2's [300, 400]
    ZoneMap.pruneInSet(m, "d",
      Seq(java.time.LocalDate.ofEpochDay(350))).get._1.map(_.path) shouldBe
      Seq("s2", "s3", "s4") // s3 has no 'd' entry → keep
    // 1.5 s = 1_500_000 µs hits s1's tsms [1000, 2000] ms window only
    ZoneMap.pruneInSet(m, "t",
      Seq(java.time.Instant.ofEpochMilli(1500))).get._1.map(_.path) shouldBe
      Seq("s1", "s3", "s4")
  }

  test("version pinning: the prune answers against the pinned snapshot " +
    "while the live table has moved on") {
    val spec = clusteredFact("travel")
    val v1 = ObjectStoreSink.snapshots(spec).last.version
    // rewrite live: ids shifted out of the dim's reach
    ObjectStoreSink.replaceTable(spark,
      (10000L until 10800L).map(i => (i, s"r$i")).toDF("id", "payload")
        .repartitionByRange(8, col("id")), spec)
    val dim = Seq(3L, 799L).toDF("k")
    val (fact, rep) = JoinPrune.factForEquiJoin(spark, spec, dim, "id", "k",
      version = Some(v1))
    rep.version shouldBe v1
    rep.result.filesKept should be > 0
    fact.join(dim, fact("id") === dim("k")).count() shouldBe 2
    // the live read sees the rewrite: nothing joins
    val (liveFact, liveRep) = JoinPrune.factForEquiJoin(
      spark, spec, dim, "id", "k")
    liveRep.result.filesKept shouldBe 0
    liveFact.count() shouldBe 0
  }

  test("partitioned fact: key-set prune composes with the partition " +
    "layout and partition columns stay resolvable") {
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "par")
      .repartitionByRange(4, col("id"))
    val spec = commit("partcompose", df, partitionBy = Seq("par"))
    val dim = Seq(2L, 4L, 398L).toDF("k")
    val (fact, rep) = JoinPrune.factForEquiJoin(spark, spec, dim, "id", "k")
    rep.keySetUsed shouldBe true
    rep.result.filesSkipped should be > 0
    val joined = fact.join(dim, fact("id") === dim("k"))
    joined.count() shouldBe 3
    joined.select("par").distinct().as[String].collect().sorted shouldBe
      Seq("even")
  }
}
