package graft.sinks

import java.nio.file.Paths

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone-map data skipping: the manifest's footer-lifted per-file column
  * ranges, the driver-side prune decision, and the exactness guarantee
  * (pruned read ≡ full-scan filter, whatever the stats say).
  */
class ZoneMapSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def liveDir(spec: ObjectStoreSpec) =
    Paths.get(spec.path, spec.database, spec.table).toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-"))
      .sortBy(_.getName).last.toPath

  /** 0..399 clustered into 8 range-disjoint files on `id`. */
  private def rangedTable(tag: String): (ObjectStoreSpec, DataFrame) = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_zm_$tag", table = "t")
    val df = ss.range(0, 400).toDF("id")
      .withColumn("v", col("id").cast("double") / 4.0)
      .withColumn("name", concat(lit("row-"), format_string("%04d", col("id"))))
      .repartitionByRange(8, col("id"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    (spec, df)
  }

  private def canon(df: DataFrame) = df.orderBy("id").collect().toSeq

  test("commit records per-file long/double/string ranges from the footers") {
    val (spec, _) = rangedTable("zmstats")
    val m = TableManifest.read(liveDir(spec)).get
    m.files should have size 8
    m.files.foreach { fe =>
      val st = fe.stats.get
      st("id").typ shouldBe "long"
      st("v").typ shouldBe "double"
      st("name").typ shouldBe "string"
      st("id").min.toLong should be <= st("id").max.toLong
    }
    // range-clustered layout → the 8 recorded id-ranges are disjoint
    val ranges = m.files.map(_.stats.get("id"))
      .map(cs => (cs.min.toLong, cs.max.toLong)).sortBy(_._1)
    ranges.sliding(2).foreach { case Seq((_, aMax), (bMin, _)) =>
      aMax should be < bMin
    }
    ranges.map(_._1).min shouldBe 0L
    ranges.map(_._2).max shouldBe 399L
  }

  test("pruned read skips provably-disjoint files and still returns the " +
    "exact filter result (long, double, and string predicates)") {
    val (spec, df) = rangedTable("zmprune")
    // long: a narrow band must touch ~1-2 of the 8 range files
    val (longDf, longRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("id", lower = Some(100L), upper = Some(130L))))
    longRep.filesTotal shouldBe 8
    longRep.filesKept should be < 8
    longRep.bytesKept should be < longRep.bytesTotal
    canon(longDf) shouldBe canon(df.where(col("id").between(100, 130)))
    // double predicate against the double column
    val (dblDf, dblRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("v", lower = Some(80.0), upper = Some(90.0))))
    dblRep.filesKept should be < 8
    canon(dblDf) shouldBe canon(df.where(col("v").between(80.0, 90.0)))
    // string range on the zero-padded name column (clustered with id)
    val (strDf, strRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("name", lower = Some("row-0350"))))
    strRep.filesKept should be < 8
    canon(strDf) shouldBe canon(df.where(col("name") >= "row-0350"))
    // conjunction of bounds prunes at least as hard as either alone
    val (bothDf, bothRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("id", Some(100L), Some(130L)),
        ZoneMap.Bound("v", Some(80.0), Some(90.0))))
    bothRep.filesKept should be <= math.min(longRep.filesKept, dblRep.filesKept)
    canon(bothDf) shouldBe canon(
      df.where(col("id").between(100, 130) && col("v").between(80.0, 90.0)))
  }

  test("a range outside every file reads zero files yet keeps the schema") {
    val (spec, df) = rangedTable("zmempty")
    val (empty, rep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("id", lower = Some(1000L))))
    rep.filesKept shouldBe 0
    empty.count() shouldBe 0
    empty.schema shouldBe spark.read.parquet(liveDir(spec).toString).schema
  }

  test("soundness: no-stats columns, mixed-domain bounds, and non-ASCII " +
    "ranges never prune; all-null columns always prune") {
    import TableManifest.{ColStats, FileEntry, Manifest}
    def m(fe: FileEntry*) = Manifest(fe, fe.map(_.bytes).sum, -1, "h", 0L)
    val longFile = FileEntry("a.parquet", 10,
      Some(Map("id" -> ColStats("long", "0", "9", 0))))
    // a column the manifest has no entry for → kept
    ZoneMap.prune(m(longFile), Seq(ZoneMap.Bound("other", Some(1L))))
      ._1 should have size 1
    // fractional bound vs integral stats: lossless compare impossible → kept
    ZoneMap.prune(m(longFile), Seq(ZoneMap.Bound("id", Some(9.5))))
      ._1 should have size 1
    // integral bound vs integral stats, provably above the max → dropped
    ZoneMap.prune(m(longFile), Seq(ZoneMap.Bound("id", Some(10L))))
      ._1 shouldBe empty
    // a long bound beyond 2^53 cannot prove disjointness vs double stats
    val dblFile = FileEntry("b.parquet", 10,
      Some(Map("v" -> ColStats("double", "0.0", "1.0", 0))))
    ZoneMap.prune(m(dblFile), Seq(ZoneMap.Bound("v", Some(Long.MaxValue))))
      ._1 should have size 1
    ZoneMap.prune(m(dblFile), Seq(ZoneMap.Bound("v", Some(2.0))))
      ._1 shouldBe empty
    // all-null file column: any bounded predicate is disjoint, an
    // unbounded one is vacuous
    val nullFile = FileEntry("c.parquet", 10,
      Some(Map("x" -> ColStats("null", "", "", 5))))
    ZoneMap.prune(m(nullFile), Seq(ZoneMap.Bound("x", Some(0L))))
      ._1 shouldBe empty
    ZoneMap.prune(m(nullFile), Seq(ZoneMap.Bound("x")))._1 should have size 1
  }

  test("non-ASCII string values suppress the column's stats entry at " +
    "commit; ASCII files still prune") {
    val spec = ObjectStoreSpec(path = scratchDir("zmuni").getAbsolutePath,
      database = "graft_zm_uni", table = "t")
    // one file holding both values, so its recorded max would be non-ASCII
    val df = Seq((1L, "café"), (2L, "zebra")).toDF("id", "s").coalesce(1)
    ObjectStoreSink.replaceTable(spark, df, spec)
    val st = TableManifest.read(liveDir(spec)).get.files.head.stats.get
    st.get("s") shouldBe None // non-ASCII max → order proof unavailable
    st("id").typ shouldBe "long" // sibling column unaffected
    // and the read path treats the missing entry as unprunable, not empty
    val (out, rep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("s", lower = Some("zz"))))
    rep.filesKept shouldBe rep.filesTotal
    out.count() shouldBe 0 // residual filter still exact
  }

  test("refreshManifest after an in-place append re-lifts stats for the " +
    "new files") {
    val spec = ObjectStoreSpec(path = scratchDir("zmappend").getAbsolutePath,
      database = "graft_zm_app", table = "t", writeMode = "append")
    ObjectStoreSink.write(spark, ss.range(0, 10).toDF("id"), spec)
    ObjectStoreSink.write(spark, ss.range(500, 510).toDF("id"), spec)
    val m = TableManifest.read(liveDir(spec)).get
    m.files.size should be >= 2
    m.files.foreach(_.stats.get("id").typ shouldBe "long")
    val hi = m.files.map(_.stats.get("id").max.toLong).max
    hi shouldBe 509L
    // pruning sees through the appended layout
    val (out, rep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("id", lower = Some(500L))))
    rep.filesKept should be < rep.filesTotal
    out.count() shouldBe 10
  }

  test("metadata aggregates are exact: COUNT/COUNT(col)/MIN/MAX from the " +
    "manifest equal the relational answers, nulls included") {
    val spec = ObjectStoreSpec(path = scratchDir("zmmeta").getAbsolutePath,
      database = "graft_zm_meta", table = "t")
    val df = ss.range(0, 100).toDF("id")
      .withColumn("v", when(col("id") % 4 =!= 0, col("id").cast("double")))
      .withColumn("s", concat(lit("k"), format_string("%03d", col("id"))))
      .repartitionByRange(5, col("id"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    val m = TableManifest.read(liveDir(spec)).get
    ZoneMap.metaCount(m) shouldBe Some(100L)
    ZoneMap.metaNonNullCount(m, "v") shouldBe Some(75L) // 25 nulls
    ZoneMap.metaNonNullCount(m, "id") shouldBe Some(100L)
    val vr = ZoneMap.metaRange(m, "v").get
    (vr.min.toDouble, vr.max.toDouble) shouldBe (1.0, 99.0)
    val sr = ZoneMap.metaRange(m, "s").get
    (sr.min, sr.max) shouldBe ("k000", "k099")
    // a column the stats don't cover answers None, never a guess
    ZoneMap.metaNonNullCount(m, "absent") shouldBe None
    ZoneMap.metaRange(m, "absent") shouldBe None
  }

  test("metadata MIN/MAX stay exact for long string values (no footer " +
    "truncation under the Spark writer)") {
    val spec = ObjectStoreSpec(path = scratchDir("zmlong").getAbsolutePath,
      database = "graft_zm_long", table = "t")
    // 400-char values: if the writer truncated chunk-level min/max, the
    // manifest range would diverge from the relational answer and
    // metadata answering for strings would have to be disabled
    val df = Seq((1L, "a" * 399 + "b"), (2L, "z" * 399 + "y"))
      .toDF("id", "s").coalesce(1)
    ObjectStoreSink.replaceTable(spark, df, spec)
    val m = TableManifest.read(liveDir(spec)).get
    val sr = ZoneMap.metaRange(m, "s").get
    sr.min shouldBe "a" * 399 + "b"
    sr.max shouldBe "z" * 399 + "y"
  }

  test("an all-null column counts as zero non-null but yields no MIN/MAX") {
    val spec = ObjectStoreSpec(path = scratchDir("zmnulls").getAbsolutePath,
      database = "graft_zm_nulls", table = "t")
    val df = ss.range(0, 10).toDF("id")
      .withColumn("dead", lit(null).cast("long"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    val m = TableManifest.read(liveDir(spec)).get
    ZoneMap.metaNonNullCount(m, "dead") shouldBe Some(0L)
    ZoneMap.metaRange(m, "dead") shouldBe None // SQL MIN over all-null = NULL
    // and such a column still PRUNES under any bounded predicate
    val (_, rep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("dead", lower = Some(0L))))
    rep.filesKept shouldBe 0
  }

  test("unknown provenance propagates: a file without stats or an unknown " +
    "null count makes every metadata answer None") {
    import TableManifest.{ColStats, FileEntry, Manifest}
    val withStats = FileEntry("a.parquet", 10,
      Some(Map("x" -> ColStats("long", "0", "9", 2))))
    val noStats = FileEntry("b.parquet", 10, None)
    val unknownNulls = FileEntry("c.parquet", 10,
      Some(Map("x" -> ColStats("long", "1", "5", -1))))
    val mixed = Manifest(Seq(withStats, noStats), 20, 100, "h", 0L)
    ZoneMap.metaNonNullCount(mixed, "x") shouldBe None
    ZoneMap.metaRange(mixed, "x") shouldBe None
    val unk = Manifest(Seq(withStats, unknownNulls), 20, 100, "h", 0L)
    ZoneMap.metaNonNullCount(unk, "x") shouldBe None // null count unknowable
    ZoneMap.metaRange(unk, "x").get.min shouldBe "0" // range still provable
    ZoneMap.metaRange(unk, "x").get.nulls shouldBe -1L
    // rowCount -1 (non-parquet commit): even COUNT(*) refuses
    val noRows = Manifest(Seq(withStats), 10, -1, "h", 0L)
    ZoneMap.metaCount(noRows) shouldBe None
    ZoneMap.metaNonNullCount(noRows, "x") shouldBe None
  }

  test("partitioned tables: explicit file-subset reads keep the partition " +
    "column resolvable and prune on data columns") {
    val spec = ObjectStoreSpec(path = scratchDir("zmpart").getAbsolutePath,
      database = "graft_zm_part", table = "t", partitionBy = Seq("grp"))
    val df = ss.range(0, 200).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("string"))
      .repartitionByRange(4, col("id"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    val (out, rep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("id", Some(0L), Some(40L))))
    rep.filesKept should be < rep.filesTotal
    out.columns should contain("grp") // basePath recovers the dir column
    out.count() shouldBe 41
    out.where(col("grp").isNull).count() shouldBe 0
  }
}
