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
    // non-ASCII max → order proof unavailable → no RANGE, but the null
    // accounting is still provable ("opaque" never prunes, still counts)
    st("s").typ shouldBe "opaque"
    st("s").nulls shouldBe 0L
    ZoneMap.metaNonNullCount(TableManifest.read(liveDir(spec)).get, "s") shouldBe Some(2L)
    ZoneMap.metaRange(TableManifest.read(liveDir(spec)).get, "s") shouldBe None
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
    // an explicit IS NOT NULL requirement prunes it too, and the read
    // path applies the same residual (exactness holds on mixed tables)
    val (nnDf, nnRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("dead", nonNull = true)))
    nnRep.filesKept shouldBe 0
    nnDf.count() shouldBe 0
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

  test("partition-directory values become per-file stats: bounds on a " +
    "partition column prune whole dirs, composing with data-column bounds") {
    val spec = ObjectStoreSpec(path = scratchDir("zmpstats").getAbsolutePath,
      database = "graft_zm_pst", table = "t", partitionBy = Seq("lang"))
    val df = ss.range(0, 300).toDF("id")
      .withColumn("lang", element_at(
        array(lit("de"), lit("en"), lit("fr"), lit("zh")),
        (col("id") % 4 + 1).cast("int")))
      .repartitionByRange(5, col("id"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    val m = TableManifest.read(liveDir(spec)).get
    // every file carries min = max = its dir value with a zero null count
    m.files.foreach { fe =>
      val st = fe.stats.get("lang")
      st.typ shouldBe "string"
      st.min shouldBe st.max
      st.nulls shouldBe 0L
      fe.path should include(s"lang=${st.min}")
    }
    // partition-only bound prunes dirs
    val (langDf, langRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("lang", Some("de"), Some("en"))))
    langRep.filesKept should be < langRep.filesTotal
    canon(langDf) shouldBe canon(df.where(col("lang").between("de", "en")))
    // ...and composes with a data-column zone map: strictly fewer files
    val (bothDf, bothRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("lang", Some("de"), Some("en")),
        ZoneMap.Bound("id", Some(0L), Some(50L))))
    bothRep.filesKept should be < langRep.filesKept
    canon(bothDf) shouldBe canon(
      df.where(col("lang").between("de", "en") && col("id").between(0, 50)))
    // metadata MIN/MAX over the partition column answers from the dirs
    val lr = ZoneMap.metaRange(m, "lang").get
    (lr.min, lr.max, lr.nulls) shouldBe ("de", "zh", 0L)
  }

  test("numeric-looking partition values are recorded in the long domain " +
    "(matching Spark's read-back type inference) and prune exactly") {
    val spec = ObjectStoreSpec(path = scratchDir("zmpnum").getAbsolutePath,
      database = "graft_zm_pnum", table = "t", partitionBy = Seq("bucket"))
    val df = ss.range(0, 120).toDF("id")
      .withColumn("bucket", (col("id") % 4).cast("string"))
      .repartitionByRange(3, col("id"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    val m = TableManifest.read(liveDir(spec)).get
    m.files.foreach(_.stats.get("bucket").typ shouldBe "long")
    val (out, rep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("bucket", Some(2L), Some(3L))))
    rep.filesKept should be < rep.filesTotal
    // bucket reads back as an inferred integral type — compare counts
    out.count() shouldBe 60
  }

  test("partition-value stats: escapes decode, ambiguous renderings and " +
    "temporal-looking values get no entry, the Hive null dir is typ null") {
    TableManifest.partitionStats("lang=en/part-0.parquet") shouldBe
      Map("lang" -> TableManifest.ColStats("string", "en", "en", 0L))
    TableManifest.partitionStats("b=42/part-0.parquet") shouldBe
      Map("b" -> TableManifest.ColStats("long", "42", "42", 0L))
    TableManifest.partitionStats("b=-7/x=a b/part-0.parquet").keySet shouldBe
      Set("b", "x")
    // %3A unescapes to ':' (ASCII) — value recorded
    TableManifest.partitionStats("k=a%3Ab/p.parquet")("k").min shouldBe "a:b"
    // multi-byte escape → order unprovable → no entry
    TableManifest.partitionStats("k=caf%C3%A9/p.parquet") shouldBe empty
    // "0123" renders back as 123 (inference ambiguity) → no entry;
    // doubles and dates likewise (inference changes the comparison domain)
    TableManifest.partitionStats("k=0123/p.parquet") shouldBe empty
    TableManifest.partitionStats("k=1.5/p.parquet") shouldBe empty
    TableManifest.partitionStats("k=2024-01-01/p.parquet") shouldBe empty
    TableManifest.partitionStats(
      "k=__HIVE_DEFAULT_PARTITION__/p.parquet")("k").typ shouldBe "null"
    // non-partition paths contribute nothing
    TableManifest.partitionStats("part-00000.parquet") shouldBe empty
  }

  test("date and timestamp columns get their own stats domains and prune " +
    "under Date/LocalDate/Timestamp/Instant bounds, pre-1970 included") {
    val spec = ObjectStoreSpec(path = scratchDir("zmtempo").getAbsolutePath,
      database = "graft_zm_tmp", table = "t")
    val df = ss.range(0, 400).toDF("id")
      .withColumn("d", expr("date_add(DATE'1965-01-01', CAST(id * 31 AS INT))"))
      .withColumn("ts", expr("timestamp_micros(-86400000000 + id * 9876543210)"))
      .repartitionByRange(8, col("id"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    val m = TableManifest.read(liveDir(spec)).get
    m.files.foreach { fe =>
      fe.stats.get("d").typ shouldBe "date"
      fe.stats.get("ts").typ shouldBe "tsus"
    }
    // java.sql.Date bounds (pre-1970 → negative epoch days)
    val dLo = java.sql.Date.valueOf("1966-01-01")
    val dHi = java.sql.Date.valueOf("1967-06-01")
    val (dDf, dRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("d", Some(dLo), Some(dHi))))
    dRep.filesKept should be < dRep.filesTotal
    canon(dDf) shouldBe canon(df.where(col("d").between(dLo, dHi)))
    // LocalDate spelling of the same bound prunes identically
    val (dDf2, dRep2) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("d", Some(dLo.toLocalDate), Some(dHi.toLocalDate))))
    dRep2.filesKept shouldBe dRep.filesKept
    canon(dDf2) shouldBe canon(dDf)
    // timestamp bounds as Timestamp and Instant
    val tLo = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(500000))
    val (tDf, tRep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("ts", Some(tLo))))
    tRep.filesKept should be < tRep.filesTotal
    canon(tDf) shouldBe canon(df.where(col("ts") >= lit(tLo)))
    val (tDf2, tRep2) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("ts", Some(tLo.toInstant))))
    tRep2.filesKept shouldBe tRep.filesKept
    canon(tDf2) shouldBe canon(tDf)
    // cross-domain bounds never prune: a long against date stats
    ZoneMap.prune(m, Seq(ZoneMap.Bound("d", Some(0L))))._1.size shouldBe
      m.files.size
    // metadata MIN/MAX flow through the temporal domains exactly
    val dr = ZoneMap.metaRange(m, "d").get
    dr.typ shouldBe "date"
    dr.min.toLong shouldBe df.agg(min("d")).head.getDate(0)
      .toLocalDate.toEpochDay
    val tr = ZoneMap.metaRange(m, "ts").get
    tr.typ shouldBe "tsus"
    tr.min.toLong shouldBe -86400000000L
  }

  test("decimal stats record the (unscaled, scale) 'dec' domain: exact-" +
    "decimal bounds prune, integral/double bounds never compare (the " +
    "unscaled-aliasing hazard the r12 opaque fallback guarded against)") {
    val spec = ObjectStoreSpec(path = scratchDir("zmdec").getAbsolutePath,
      database = "graft_zm_dec", table = "t")
    val df = ss.range(0, 40).toDF("id")
      .withColumn("amt", when(col("id") % 5 =!= 0,
        (col("id") - 20).cast("decimal(10,2)") / 4))
      .repartitionByRange(2, col("id"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    val m = TableManifest.read(liveDir(spec)).get
    m.files.foreach { fe =>
      fe.stats.get("amt").typ shouldBe "dec"
      fe.stats.get("amt").scale should be > 0
    }
    // an INTEGRAL bound still never compares against "dec" stats — the
    // unscaled footer value of -50.00 is -5000, which a naive compare
    // against -100 would "prove" disjoint while the row matches
    ZoneMap.prune(m, Seq(ZoneMap.Bound("amt", Some(-100L))))._1.size shouldBe
      m.files.size
    // an exact decimal bound prunes: amt = (id-20)/4 is range-clustered,
    // so amt >= 3.00 (ids 32+) is provably disjoint from the low file
    val hi = new java.math.BigDecimal("3.00")
    ZoneMap.prune(m, Seq(ZoneMap.Bound("amt", Some(hi))))
      ._2.filesSkipped should be > 0
    // and a double bound (binary, not decimal) never compares
    ZoneMap.prune(m, Seq(ZoneMap.Bound("amt", Some(3.0d))))._1.size shouldBe
      m.files.size
    // metadata MIN/MAX flow through the domain exactly; null accounting
    val r = ZoneMap.metaRange(m, "amt").get
    r.typ shouldBe "dec"
    BigDecimal(BigInt(r.min.toLong), r.scale) shouldBe
      BigDecimal(df.agg(min("amt")).head.getDecimal(0))
    ZoneMap.metaNonNullCount(m, "amt") shouldBe Some(32L)
    // join key-set pruning in the decimal domain: two high keys skip the
    // low file; a DOUBLE key set is a foreign domain and keeps everything
    ZoneMap.pruneInSet(m, "amt",
      Seq(new java.math.BigDecimal("3.75"), new java.math.BigDecimal("4.00")))
      .get._2.filesSkipped should be > 0
    ZoneMap.pruneInSet(m, "amt", Seq(3.75d)).get._1.size shouldBe m.files.size
  }

  test("tsms stats merge with tsus into an exact micros range; millis " +
    "overflow refuses instead of wrapping") {
    import TableManifest.{ColStats, FileEntry, Manifest}
    val us = FileEntry("a.parquet", 1,
      Some(Map("ts" -> ColStats("tsus", "-5000000", "1000000", 0))))
    val ms = FileEntry("b.parquet", 1,
      Some(Map("ts" -> ColStats("tsms", "-10000", "2000", 0))))
    val merged = ZoneMap.metaRange(Manifest(Seq(us, ms), 2, 10, "h", 0L), "ts").get
    merged.typ shouldBe "tsus"
    merged.min.toLong shouldBe -10000000L // -10000 ms → micros, below -5000000
    merged.max.toLong shouldBe 2000000L
    val huge = FileEntry("c.parquet", 1,
      Some(Map("ts" -> ColStats("tsms", "0", Long.MaxValue.toString, 0))))
    ZoneMap.metaRange(Manifest(Seq(huge), 1, 10, "h", 0L), "ts") shouldBe None
    // pruning against overflowing millis stats also refuses (keeps)
    ZoneMap.prune(Manifest(Seq(huge), 1, 10, "h", 0L),
      Seq(ZoneMap.Bound("ts", None, Some(java.time.Instant.EPOCH))))
      ._1 should have size 1
  }

  test("zone maps compose with version pinning: a pruned read of an old " +
    "version is blind to the live table's rewrite") {
    val spec = ObjectStoreSpec(path = scratchDir("zmpin").getAbsolutePath,
      database = "graft_zm_pin", table = "t")
    val v1df = ss.range(0, 200).toDF("id").repartitionByRange(4, col("id"))
    ObjectStoreSink.replaceTable(spark, v1df, spec)
    val v1 = ObjectStoreSink.snapshots(spec).last.version
    ObjectStoreSink.replaceTable(spark,
      ss.range(1000, 1200).toDF("id").repartitionByRange(4, col("id")), spec)
    val (pinned, rep) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("id", Some(0L), Some(60L))), version = Some(v1))
    rep.filesKept should be < rep.filesTotal
    canon(pinned) shouldBe canon(v1df.where(col("id") <= 60))
    // the live read sees only the rewrite
    val (live, _) = ObjectStoreSink.readVersionPruned(spark, spec,
      Seq(ZoneMap.Bound("id", Some(0L), Some(60L))))
    live.count() shouldBe 0
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
