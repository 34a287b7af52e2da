package graft.plans

import graft.{GraftExtensions, SparkSpec}
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** The metadata-aggregate planner seam: plain SQL COUNT/MIN/MAX over a
  * manifest-committed versioned table must collapse to a LocalRelation
  * (zero scan tasks) with EXACTLY the relational answers — and must refuse
  * (leave the scan in place, still answer correctly) whenever the manifest
  * cannot prove the result.
  */
class MetaAggRuleSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  GraftExtensions.register(spark)

  private def commitTable(tag: String, df: DataFrame): String = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_mar_$tag", table = "t")
    ObjectStoreSink.replaceTable(spark, df, spec)
  }

  private def scansOf(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case r: LogicalRelation => r }

  private def localsOf(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case l: LocalRelation => l }

  private def assertMetaOnly(df: DataFrame): Unit = {
    withClue(s"plan:\n${df.queryExecution.optimizedPlan}\n") {
      scansOf(df) shouldBe empty
      localsOf(df) should not be empty
    }
  }

  private def assertScans(df: DataFrame): Unit =
    withClue(s"plan:\n${df.queryExecution.optimizedPlan}\n") {
      scansOf(df) should not be empty
    }

  test("COUNT(*)/COUNT(col)/MIN/MAX over long, double, and string columns " +
    "collapse to a LocalRelation with the exact relational answers") {
    val df = ss.range(0, 100).toDF("id")
      .withColumn("v", when(col("id") % 4 =!= 0, col("id").cast("double") / 2))
      .withColumn("s", concat(lit("k"), format_string("%03d", col("id"))))
      .repartitionByRange(5, col("id"))
    val fq = commitTable("sql", df)
    val q = spark.sql(s"SELECT count(*) AS n, count(v) AS nv, min(id) AS mn, " +
      s"max(id) AS mx, min(v) AS vmn, max(v) AS vmx, min(s) AS smn, " +
      s"max(s) AS smx FROM $fq")
    assertMetaOnly(q)
    // relational answers computed over the ORIGINAL frame (range-backed —
    // the rule can't touch it), never through the rewritten scan
    q.collect().toSeq shouldBe
      df.agg(count(lit(1)), count(col("v")), min("id"), max("id"),
        min("v"), max("v"), min("s"), max("s")).collect().toSeq
  }

  test("date and timestamp MIN/MAX are answered from the manifest in their " +
    "own stats domains, pre-1970 values included") {
    val df = ss.range(0, 50).toDF("id")
      .withColumn("d", expr("date_add(DATE'1965-06-01', CAST(id * 37 AS INT))"))
      .withColumn("ts", expr("timestamp_micros(-5000000000 + id * 987654321)"))
      .repartitionByRange(4, col("id"))
    val fq = commitTable("tempo", df)
    val q = spark.sql(
      s"SELECT min(d) AS dmn, max(d) AS dmx, min(ts) AS tmn, max(ts) AS tmx FROM $fq")
    assertMetaOnly(q)
    q.collect().toSeq shouldBe
      df.agg(min("d"), max("d"), min("ts"), max("ts")).collect().toSeq
  }

  test("a WHERE clause on a multi-valued column, grouping by expression, " +
    "DISTINCT, or an unanswerable aggregate refuses the rewrite — the scan " +
    "stays and answers stay correct") {
    val fq = commitTable("refuse",
      ss.range(0, 60).toDF("id").repartitionByRange(3, col("id")))
    // id is range-clustered (multi-valued in every file): the predicate is
    // not decidable from per-file constants, so the rewrite must refuse
    val filtered = spark.sql(s"SELECT count(*) AS n FROM $fq WHERE id > 10")
    assertScans(filtered)
    filtered.head.getLong(0) shouldBe 49L
    val grouped = spark.sql(s"SELECT id % 2 AS g, count(*) FROM $fq GROUP BY 1")
    assertScans(grouped)
    val distinct = spark.sql(s"SELECT count(DISTINCT id) FROM $fq")
    assertScans(distinct)
    distinct.head.getLong(0) shouldBe 60L
    val avg = spark.sql(s"SELECT avg(id) FROM $fq")
    assertScans(avg)
    avg.head.getDouble(0) shouldBe 29.5
  }

  test("a file the manifest does not cover breaks the evidence identity: " +
    "the rewrite refuses and the scan sees the foreign file") {
    val fq = commitTable("foreign",
      ss.range(0, 30).toDF("id").repartitionByRange(3, col("id")))
    // answered from metadata while the file set matches
    assertMetaOnly(spark.sql(s"SELECT count(*) AS n FROM $fq"))
    // drop a foreign parquet file into the committed version dir,
    // bypassing the manifest protocol entirely
    val vdir = java.nio.file.Paths.get(new java.net.URI(
      spark.table(fq).inputFiles.head)).getParent
    Seq(999L).toDF("id").coalesce(1).write.mode("append").parquet(vdir.toString)
    spark.catalog.refreshTable(fq)
    val q = spark.sql(s"SELECT count(*) AS n, max(id) AS mx FROM $fq")
    assertScans(q)
    q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) shouldBe
      Seq((31L, 999L))
  }

  test("decimal MIN/MAX answer from the manifest's (unscaled, scale) " +
    "domain exactly — negatives and division included (r13: money columns " +
    "were stats-dark in r12)") {
    val df = ss.range(0, 40).toDF("id")
      .withColumn("amt", (col("id") - 20).cast("decimal(10,2)") / 4)
      .repartitionByRange(3, col("id"))
    val fq = commitTable("dec", df)
    val q = spark.sql(s"SELECT min(amt) AS mn, max(amt) AS mx, " +
      s"count(amt) AS n FROM $fq")
    assertMetaOnly(q)
    q.collect().toSeq shouldBe
      df.agg(min("amt"), max("amt"), count(col("amt"))).collect().toSeq
    // a filter CUT on the decimal column decides per file through the
    // same domain (range-clustered on id ⇒ amt is too: amt = (id-20)/4)
    val qf = spark.sql(
      s"SELECT count(*) AS n FROM $fq WHERE amt > 99.0")
    assertMetaOnly(qf)
    qf.head.getLong(0) shouldBe 0L
  }

  test("GROUP BY a partition column answers per-group COUNT(*)/COUNT(col)/" +
    "MIN/MAX from the manifest — NULL partition group included") {
    val spec = graft.model.ObjectStoreSpec(
      path = scratchDir("grp").getAbsolutePath,
      database = "graft_mar_grp", table = "t", partitionBy = Seq("grp"))
    val df = ss.range(0, 240).toDF("id")
      .withColumn("grp", when(col("id") % 4 =!= 3,
        concat(lit("g"), (col("id") % 4).cast("string"))))
      .withColumn("v", when(col("id") % 5 =!= 0, col("id").cast("double")))
      .repartitionByRange(3, col("id"))
    val fq = ObjectStoreSink.replaceTable(spark, df, spec)
    val q = spark.sql(s"SELECT grp, count(*) AS n, count(v) AS nv, " +
      s"min(id) AS mn, max(id) AS mx FROM $fq GROUP BY grp ORDER BY grp")
    assertMetaOnly(q)
    q.collect().toSeq shouldBe
      df.groupBy("grp").agg(count(lit(1)), count(col("v")), min("id"), max("id"))
        .orderBy("grp").collect().toSeq
    // count of the grouping column itself: the NULL-dir group is all null
    val q2 = spark.sql(s"SELECT grp, count(grp) AS ng FROM $fq GROUP BY grp")
    assertMetaOnly(q2)
    q2.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap shouldBe
      Map(Some("g0") -> 60L, Some("g1") -> 60L, Some("g2") -> 60L, None -> 0L)
  }

  test("a file whose grouping column is constant but carries nulls is NOT " +
    "single-valued: the rewrite refuses — null rows are their own group") {
    val fq = commitTable("grpnull", ss.range(0, 50).toDF("id")
      .withColumn("c", when(col("id") % 5 =!= 0, lit("x")))
      .coalesce(1)) // one file: min = max = "x" BUT 10 null rows
    val q = spark.sql(s"SELECT c, count(*) AS n FROM $fq GROUP BY c ORDER BY c")
    assertScans(q)
    q.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toSeq shouldBe
      Seq(None -> 10L, Some("x") -> 40L)
  }

  test("zero-valued grouping keys refuse: parquet widens zero stats to " +
    "[-0.0, 0.0], so a constant-zero file is never provably single-valued " +
    "— and -0.0 vs 0.0 can therefore never split a group") {
    val df = ss.range(0, 10).toDF("id")
      .withColumn("z", when(col("id") < 5, lit(-0.0)).otherwise(lit(0.0)))
      .repartitionByRange(2, col("id")) // file A all -0.0, file B all 0.0
    val fq = commitTable("zeros", df)
    val q = spark.sql(s"SELECT z, count(*) AS n FROM $fq GROUP BY z")
    assertScans(q) // refusal is the sound outcome here
    q.collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq shouldBe
      Seq((0.0, 10L)) // Spark folds the zeros into ONE group
    // a nonzero constant double per file DOES qualify
    val fq2 = commitTable("dkeys", ss.range(0, 12).toDF("id")
      .withColumn("z", when(col("id") < 6, lit(1.5)).otherwise(lit(-2.5)))
      .repartitionByRange(2, col("id")))
    val q2 = spark.sql(s"SELECT z, count(*) AS n FROM $fq2 GROUP BY z ORDER BY z")
    assertMetaOnly(q2)
    q2.collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq shouldBe
      Seq((-2.5, 6L), (1.5, 6L))
  }

  test("grouped rewrite refuses multi-valued grouping columns and " +
    "expression groupings — the scan stays and answers stay correct") {
    val fq = commitTable("grpref", ss.range(0, 100).toDF("id")
      .withColumn("k", col("id") % 10) // multi-valued in every file
      .repartitionByRange(4, col("id")))
    val multi = spark.sql(s"SELECT k, count(*) AS n FROM $fq GROUP BY k")
    assertScans(multi)
    multi.count() shouldBe 10
    val exprGrp = spark.sql(s"SELECT id % 2 AS e, count(*) FROM $fq GROUP BY 1")
    assertScans(exprGrp)
    exprGrp.count() shouldBe 2
  }

  test("a Filter on single-valued (partition) columns composes: global and " +
    "grouped aggregates answer from the qualifying sub-manifest, NULL " +
    "partition and NULL-eval semantics exact") {
    val spec = graft.model.ObjectStoreSpec(
      path = scratchDir("fil").getAbsolutePath,
      database = "graft_mar_fil", table = "t", partitionBy = Seq("grp"))
    val df = ss.range(0, 240).toDF("id")
      .withColumn("grp", when(col("id") % 4 =!= 3,
        concat(lit("g"), (col("id") % 4).cast("string"))))
      .withColumn("v", when(col("id") % 5 =!= 0, col("id").cast("double")))
      .repartitionByRange(3, col("id"))
    val fq = ObjectStoreSink.replaceTable(spark, df, spec)
    // equality on the partition column: the null partition's rows eval the
    // predicate to NULL and drop — exact SQL semantics, zero scans
    val eq = spark.sql(s"SELECT count(*) AS n, count(v) AS nv, " +
      s"min(id) AS mn, max(id) AS mx FROM $fq WHERE grp = 'g1'")
    assertMetaOnly(eq)
    eq.collect().toSeq shouldBe
      df.where(col("grp") === "g1")
        .agg(count(lit(1)), count(col("v")), min("id"), max("id"))
        .collect().toSeq
    // IS NULL keeps exactly the Hive null partition
    val nul = spark.sql(s"SELECT count(*) AS n FROM $fq WHERE grp IS NULL")
    assertMetaOnly(nul)
    nul.head.getLong(0) shouldBe 60L
    // range + inequality conjuncts compose; grouped + filtered composes
    val grouped = spark.sql(s"SELECT grp, count(*) AS n, max(id) AS mx " +
      s"FROM $fq WHERE grp >= 'g1' AND grp <> 'g2' GROUP BY grp ORDER BY grp")
    assertMetaOnly(grouped)
    grouped.collect().toSeq shouldBe
      df.where(col("grp") >= "g1" && col("grp") =!= "g2")
        .groupBy("grp").agg(count(lit(1)), max("id"))
        .orderBy("grp").collect().toSeq
    // a predicate satisfied by NO partition: zero groups / count(*) = 0
    val none = spark.sql(s"SELECT grp, count(*) AS n FROM $fq " +
      s"WHERE grp = 'zzz' GROUP BY grp")
    assertMetaOnly(none)
    none.collect() shouldBe empty
    val zero = spark.sql(s"SELECT count(*) AS n FROM $fq WHERE grp = 'zzz'")
    assertMetaOnly(zero)
    zero.head.getLong(0) shouldBe 0L
  }

  test("interval evidence decides range conjuncts on MULTI-valued columns " +
    "(all-true / all-false per file); a cut that straddles any file " +
    "refuses wholesale (partial proof is no proof)") {
    val spec = graft.model.ObjectStoreSpec(
      path = scratchDir("filref").getAbsolutePath,
      database = "graft_mar_filref", table = "t", partitionBy = Seq("grp"))
    val df = ss.range(0, 120).toDF("id")
      .withColumn("grp", concat(lit("g"), (col("id") % 3).cast("string")))
      .repartitionByRange(2, col("id"))
    val fq = ObjectStoreSink.replaceTable(spark, df, spec)
    // id is multi-valued per file, but every file's window sits under the
    // cut → each file is provably ALL-TRUE: the manifest answers (r13 —
    // the r12 rule refused exactly this shape)
    val q = spark.sql(
      s"SELECT count(*) AS n FROM $fq WHERE grp = 'g1' AND id < 999")
    assertMetaOnly(q)
    q.head.getLong(0) shouldBe 40L
    // a cut STRICTLY INSIDE some file's window straddles it: no partial
    // answer — the whole rewrite refuses and the scan runs (cut derived
    // from the manifest so it can never coincide with a file boundary)
    val live = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    val m = graft.sinks.TableManifest.read(live).get
    val w = m.files.flatMap(_.stats.flatMap(_.get("id")))
      .map(cs => (cs.min.toLong, cs.max.toLong)).minBy(_._1)
    val mid = (w._1 + w._2) / 2 // inside the lowest file's window
    val qs = spark.sql(
      s"SELECT count(*) AS n FROM $fq WHERE grp = 'g1' AND id < $mid")
    assertScans(qs)
    qs.head.getLong(0) shouldBe
      spark.table(fq).where(s"grp = 'g1' AND id < $mid").count()
    // every file provably ALL-FALSE: the answer is the empty sub-manifest
    val qf = spark.sql(s"SELECT count(*) AS n FROM $fq WHERE id < 0")
    assertMetaOnly(qf)
    qf.head.getLong(0) shouldBe 0L
    // closed-range containment on exactly ONE group-file's window: the
    // other g0 file is all-false, the g1/g2 files drop on the grp
    // conjunct — every file decidable, zero scans
    val wg = m.files
      .filter(_.stats.exists(_.get("grp").exists(_.min == "g0")))
      .flatMap(_.stats.flatMap(_.get("id")))
      .map(cs => (cs.min.toLong, cs.max.toLong)).minBy(_._1)
    val qStrict = spark.sql(s"SELECT count(*) AS n FROM $fq " +
      s"WHERE grp = 'g0' AND id >= ${wg._1} AND id <= ${wg._2}")
    assertMetaOnly(qStrict)
    qStrict.head.getLong(0) shouldBe spark.table(fq)
      .where(s"grp = 'g0' AND id >= ${wg._1} AND id <= ${wg._2}").count()
    // a file that is CONSTANT but carries nulls is not single-valued
    // either: {v, null} can't prove the predicate's value for every row
    val fq2 = commitTable("filnul", ss.range(0, 50).toDF("id")
      .withColumn("c", when(col("id") % 5 =!= 0, lit("x")))
      .coalesce(1))
    val q2 = spark.sql(s"SELECT count(*) AS n FROM $fq2 WHERE c = 'x'")
    assertScans(q2)
    q2.head.getLong(0) shouldBe 40L
    // nondeterministic predicates never qualify (0.5 keeps the optimizer
    // from range-folding the rand() away — see the rule-refusal test note)
    val q3 = spark.sql(
      s"SELECT count(*) AS n FROM $fq WHERE grp = 'g1' AND rand(7) >= 0.5")
    assertScans(q3)
  }

  test("a non-versioned plain parquet directory (no manifest) is never " +
    "rewritten") {
    val dir = scratchDir("plain").getAbsolutePath + "/plain.parquet"
    ss.range(0, 10).toDF("id").write.mode("overwrite").parquet(dir)
    assertScans(spark.read.parquet(dir).agg(count(lit(1))))
  }

  test("spark.graft.metaAgg.enabled=false disables the seam (answers stay " +
    "correct through the scan) and re-enabling restores it") {
    val fq = commitTable("kill",
      ss.range(0, 30).toDF("id").repartitionByRange(3, col("id")))
    spark.conf.set("spark.graft.metaAgg.enabled", "false")
    try {
      val q = spark.sql(s"SELECT count(*) AS n FROM $fq")
      assertScans(q)
      q.head.getLong(0) shouldBe 30L
    } finally spark.conf.unset("spark.graft.metaAgg.enabled")
    assertMetaOnly(spark.sql(s"SELECT count(*) AS n FROM $fq"))
  }

  private def commitSums(tag: String, df: DataFrame,
      sums: Seq[String], parts: Seq[String] = Nil): (String, ObjectStoreSpec) = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_mar_$tag", table = "t",
      partitionBy = parts, sumColumns = sums)
    (ObjectStoreSink.replaceTable(spark, df, spec), spec)
  }

  test("SUM over long and decimal columns answers from recorded per-file " +
    "sums (zero scans, exact values incl. NULL handling); scalar trees " +
    "over the aggregates evaluate on the answered literals") {
    val df = ss.range(0, 90).toDF("id")
      .withColumn("amt", when(col("id") % 4 =!= 0,
        (col("id") * 7).cast("decimal(12,2)")))
      .repartitionByRange(4, col("id"))
    val (fq, _) = commitSums("sum", df, Seq("id", "amt"))
    val q = spark.sql(s"SELECT sum(id) AS si, sum(amt) AS sa, " +
      s"CAST(sum(amt) AS DOUBLE) AS sad, sum(id) * 2 + 1 AS twice FROM $fq")
    assertMetaOnly(q)
    val r = q.head
    r.getLong(0) shouldBe (0L until 90L).sum
    val expAmt = (0L until 90L).filter(_ % 4 != 0).map(_ * 7).sum
    r.getDecimal(1) shouldBe new java.math.BigDecimal(expAmt).setScale(2)
    r.getDouble(2) shouldBe expAmt.toDouble
    r.getLong(3) shouldBe (0L until 90L).sum * 2 + 1
  }

  test("decimal AVG answers exact-sum/exact-count at the result scale and " +
    "BIT-MATCHES execution (incl. the rounding mode, pinned by an exact " +
    ".5 tie); integral and double AVG refuse (their division runs in " +
    "DOUBLE with order-dependent low bits)") {
    // 0.01 / 32 = 0.0003125: a tie at the result scale 6, so the answered
    // value only matches execution if the rounding MODE matches too
    val df = ss.range(0, 32).toDF("id")
      .withColumn("amt", when(col("id") === 0, lit("0.01"))
        .otherwise(lit("0.00")).cast("decimal(12,2)"))
      .withColumn("dbl", col("id") * 0.5)
      .repartitionByRange(4, col("id"))
    val (fq, _) = commitSums("avg", df, Seq("id", "amt"))
    val q = spark.sql(s"SELECT avg(amt) AS a FROM $fq")
    assertMetaOnly(q)
    spark.conf.set("spark.graft.metaAgg.enabled", "false")
    val off =
      try spark.sql(s"SELECT avg(amt) AS a FROM $fq").head
      finally spark.conf.unset("spark.graft.metaAgg.enabled")
    q.head shouldBe off
    // the answered value comes from Average's OWN finish expression, so
    // it tracks the session's decimal config too: under
    // allowPrecisionLoss=false the answer must STILL equal execution
    // (r13 advice — a hand-rounded quotient could diverge here)
    spark.conf.set("spark.sql.decimalOperations.allowPrecisionLoss", "false")
    try {
      val qStrict = spark.sql(s"SELECT avg(amt) AS a FROM $fq")
      assertMetaOnly(qStrict)
      spark.conf.set("spark.graft.metaAgg.enabled", "false")
      val offStrict =
        try spark.sql(s"SELECT avg(amt) AS a FROM $fq").head
        finally spark.conf.unset("spark.graft.metaAgg.enabled")
      qStrict.head shouldBe offStrict
    } finally
      spark.conf.unset("spark.sql.decimalOperations.allowPrecisionLoss")
    assertScans(spark.sql(s"SELECT avg(id) AS a FROM $fq"))
    assertScans(spark.sql(s"SELECT avg(dbl) AS a FROM $fq"))
    assertScans(spark.sql(s"SELECT sum(dbl) AS s FROM $fq"))
  }

  test("SUM edge evidence: an all-null column sums to SQL NULL from " +
    "metadata; a single-valued column (no recorded sum) answers value x " +
    "rows; a table without recorded sums refuses multi-valued SUM") {
    val df = ss.range(0, 40).toDF("id")
      .withColumn("dead", lit(null).cast("long"))
      .withColumn("grp", lit(5L))
      .repartitionByRange(2, col("id"))
    val (fq, _) = commitSums("edge", df, Nil) // NO recorded sums at all
    val qNull = spark.sql(s"SELECT sum(dead) AS s FROM $fq")
    assertMetaOnly(qNull)
    qNull.head.isNullAt(0) shouldBe true
    val qConst = spark.sql(s"SELECT sum(grp) AS s FROM $fq")
    assertMetaOnly(qConst)
    qConst.head.getLong(0) shouldBe 200L
    assertScans(spark.sql(s"SELECT sum(id) AS s FROM $fq")) // multi-valued
  }

  test("SUM composes with interval-filtered and grouped paths, link-append " +
    "commits carry sums and enrich only the new files, and specFor keeps " +
    "DML commits sum-maintained") {
    val df = ss.range(0, 80).toDF("id")
      .withColumn("band", (col("id") / 20).cast("long"))
      .withColumn("amt", (col("id") * 3).cast("decimal(12,2)"))
    val (fq, spec0) = commitSums("comp", df.repartitionByRange(4, col("id")),
      Seq("id", "amt"), parts = Seq("band"))
    val q = spark.sql(s"SELECT CAST(band AS BIGINT) AS band, sum(amt) AS sa " +
      s"FROM $fq WHERE id < 40 GROUP BY band ORDER BY band")
    assertMetaOnly(q)
    q.collect().map(r => (r.getLong(0), r.getDecimal(1).longValueExact()))
      .toSeq shouldBe Seq(
        (0L, (0L until 20L).map(_ * 3).sum), (1L, (20L until 40L).map(_ * 3).sum))
    // SQL INSERT (link-append): carried files keep sums verbatim, new
    // files get enriched, the metadata answer reflects the union
    spark.sql(s"INSERT INTO $fq (id, band, amt) VALUES (1000, 0, 9.50)")
      .collect()
    val spec = ObjectStoreSink.specFor(spark, spec0.database, spec0.table)
    spec.sumColumns should contain allOf ("amt", "id")
    val q2 = spark.sql(s"SELECT sum(amt) AS sa, sum(id) AS si FROM $fq")
    assertMetaOnly(q2)
    q2.head.getDecimal(0).doubleValue() shouldBe
      ((0L until 80L).map(_ * 3).sum.toDouble + 9.5)
    q2.head.getLong(1) shouldBe (0L until 80L).sum + 1000L
  }

  test("DISTINCT aggregates: COUNT(DISTINCT) answers over single-valued " +
    "files with NULL excluded and same-constant files deduped; MIN/MAX " +
    "DISTINCT equal their plain forms; SUM DISTINCT and multi-valued " +
    "COUNT DISTINCT refuse") {
    val df = ss.range(0, 40).toDF("id")
      .withColumn("grp", when(col("id") % 10 === 0, lit(null))
        .otherwise(concat(lit("g"), (col("id") % 4).cast("string"))))
    val spec = ObjectStoreSpec(path = scratchDir("dist").getAbsolutePath,
      database = "graft_mar_dist", table = "t", partitionBy = Seq("grp"))
    val fq = ObjectStoreSink.replaceTable(spark,
      df.repartition(8, col("id")), spec)
    val q = spark.sql(s"SELECT count(distinct grp) AS ng, " +
      s"min(distinct id) AS mn, max(distinct id) AS mx FROM $fq")
    assertMetaOnly(q)
    // 4 non-null groups (g0..g3); the NULL partition dir never counts
    q.head.getLong(0) shouldBe 4L
    q.head.getLong(1) shouldBe 0L
    q.head.getLong(2) shouldBe 39L
    // id is multi-valued within files; sum distinct changes the result
    assertScans(spark.sql(s"SELECT count(distinct id) AS n FROM $fq"))
    assertScans(spark.sql(s"SELECT sum(distinct id) AS s FROM $fq"))
  }

  test("doctored sum evidence refuses rather than guesses: a long SUM out " +
    "of range and a garbage sum string both leave the scan in place") {
    val df = ss.range(0, 20).toDF("id").repartitionByRange(2, col("id"))
    val (fq, spec) = commitSums("bad", df, Seq("id"))
    val vdir = java.nio.file.Paths.get(
      ObjectStoreSink.snapshots(spec).last.path)
    val m = graft.sinks.TableManifest.read(vdir).get
    def doctor(sum: String): Unit = {
      val d = m.copy(files = m.files.map(fe => fe.copy(stats = fe.stats.map(
        _.map { case (c, cs) =>
          c -> (if (c == "id") cs.copy(sum = sum) else cs) }))))
      graft.sinks.TableManifest.publisher.publish(vdir,
        graft.sinks.TableManifest.ManifestName,
        org.json4s.jackson.Serialization.writePretty(d)(
          org.json4s.DefaultFormats))
      spark.catalog.refreshTable(fq) // drop any cached listing
    }
    doctor("99999999999999999999") // 1e20 > Long.Max: must refuse
    assertScans(spark.sql(s"SELECT sum(id) AS s FROM $fq"))
    doctor("not-a-number")
    assertScans(spark.sql(s"SELECT sum(id) AS s FROM $fq"))
  }
}
