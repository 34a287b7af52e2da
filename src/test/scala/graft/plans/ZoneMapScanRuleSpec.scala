package graft.plans

import graft.{GraftExtensions, SparkSpec}
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** The zone-map planner seam: SQL/DataFrame range predicates over a
  * manifest-committed versioned table must swap the scan's FileIndex for a
  * pruned view (files provably disjoint are never listed), keep results
  * exact (the Filter stays), and refuse whenever the evidence or the
  * predicate shape doesn't support a proof.
  */
class ZoneMapScanRuleSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  GraftExtensions.register(spark)

  /** 0..399 clustered into 8 range-disjoint files on `id`. */
  private def ranged(tag: String): (String, DataFrame) = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_zsr_$tag", table = "t")
    val df = ss.range(0, 400).toDF("id")
      .withColumn("v", col("id").cast("double") / 4.0)
      .withColumn("name", concat(lit("row-"), format_string("%04d", col("id"))))
      .repartitionByRange(8, col("id"))
    (ObjectStoreSink.replaceTable(spark, df, spec), df)
  }

  private def pruneReports(df: DataFrame): Seq[graft.sinks.ZoneMap.PruneReport] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case z: ZoneMapPrunedIndex => Seq(z.report)
          case _ => Nil
        }
        case _ => Nil
      }
    }.flatten

  private def canon(df: DataFrame) = df.orderBy("id").collect().toSeq

  test("a SQL WHERE band prunes the scan's file listing and stays exact; " +
    "the executed scan reads only surviving files") {
    val (fq, df) = ranged("band")
    val q = spark.sql(s"SELECT id, v, name FROM $fq WHERE id BETWEEN 100 AND 130")
    val reps = pruneReports(q)
    reps should have size 1
    reps.head.filesTotal shouldBe 8
    reps.head.filesKept should be < 8
    canon(q) shouldBe canon(df.where(col("id").between(100, 130))
      .select("id", "v", "name"))
    // the physical scan's input files reflect the pruned listing
    q.inputFiles.length shouldBe reps.head.filesKept
  }

  test("equality and strict comparisons prune (strict relaxes to closed — " +
    "a sound superset) and mixed convertible/unconvertible conjuncts keep " +
    "the convertible bounds") {
    val (fq, df) = ranged("shapes")
    val eq = spark.sql(s"SELECT id FROM $fq WHERE id = 250")
    pruneReports(eq).head.filesKept should be < 8
    eq.collect().map(_.getLong(0)).toSeq shouldBe Seq(250L)
    val strict = spark.sql(s"SELECT id FROM $fq WHERE id > 350 AND v < 95.5")
    pruneReports(strict).head.filesKept should be < 8
    canon(strict) shouldBe canon(
      df.where(col("id") > 350 && col("v") < 95.5).select("id"))
    // an unconvertible conjunct (expression over the column) rides along:
    // only the literal band prunes, the whole predicate still applies
    val mixed = spark.sql(
      s"SELECT id FROM $fq WHERE id >= 380 AND (id % 7) = 3")
    pruneReports(mixed).head.filesKept should be < 8
    canon(mixed) shouldBe canon(
      df.where(col("id") >= 380 && col("id") % 7 === 3).select("id"))
  }

  test("refusals: foreign files break evidence, non-manifest dirs never " +
    "rewrite — results stay correct") {
    val (fq, df) = ranged("refuse")
    // foreign file: evidence identity breaks, no prune, rows visible
    val vdir = java.nio.file.Paths.get(new java.net.URI(
      spark.table(fq).inputFiles.head)).getParent
    Seq(9999L).toDF("id").coalesce(1).write.mode("append").parquet(vdir.toString)
    spark.catalog.refreshTable(fq)
    val after = spark.sql(s"SELECT id FROM $fq WHERE id >= 9000")
    pruneReports(after) shouldBe empty
    after.collect().map(_.getLong(0)).toSeq shouldBe Seq(9999L)
    // plain parquet dir without a manifest
    val plain = scratchDir("zsrplain").getAbsolutePath + "/p.parquet"
    df.write.mode("overwrite").parquet(plain)
    val pq = spark.read.parquet(plain).where(col("id") < 5)
    pruneReports(pq) shouldBe empty
    pq.count() shouldBe 5
  }

  test("partition-dir stats and data-column zone maps compose through the " +
    "rule on a path read: an equality on the partition column plus a data " +
    "band prunes both ways") {
    val spec = ObjectStoreSpec(path = scratchDir("zsrpart").getAbsolutePath,
      database = "graft_zsr_part", table = "t", partitionBy = Seq("lang"))
    val df = ss.range(0, 300).toDF("id")
      .withColumn("lang", element_at(
        array(lit("de"), lit("en"), lit("fr")), (col("id") % 3 + 1).cast("int")))
      .repartitionByRange(5, col("id"))
    ObjectStoreSink.replaceTable(spark, df, spec)
    val vdir = java.nio.file.Paths.get(spec.path, spec.database, spec.table)
      .toFile.listFiles().filter(_.getName.startsWith("v-"))
      .sortBy(_.getName).last.getAbsolutePath
    val q = spark.read.parquet(vdir)
      .where(col("lang") === "en" && col("id").between(0, 60))
    val reps = pruneReports(q)
    reps should have size 1
    // strictly harder than either axis alone could manage with 15 files
    // (5 range buckets × 3 lang dirs): only en-dirs intersecting the band
    val keptLang = graft.sinks.ZoneMap.prune(
      graft.sinks.TableManifest.read(java.nio.file.Paths.get(vdir)).get,
      Seq(graft.sinks.ZoneMap.Bound("lang", Some("en"), Some("en"))))._2
    reps.head.filesKept should be < keptLang.filesKept
    q.select("id", "lang").orderBy("id").collect().toSeq shouldBe
      df.where(col("lang") === "en" && col("id").between(0, 60))
        .select("id", "lang").orderBy("id").collect().toSeq
  }

  test("IN-lists (and their InSet form), null-safe equality, and IS NOT " +
    "NULL all prune: IN relaxes to [min, max], IS NOT NULL drops all-null " +
    "file columns") {
    val (fq, df) = ranged("inset")
    val in = spark.sql(s"SELECT id FROM $fq WHERE id IN (371, 385)")
    pruneReports(in).head.filesKept should be < 8
    in.collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(371L, 385L)
    // 15 values > the default InSet conversion threshold (10)
    val vals = (360 to 374).mkString(", ")
    val inset = spark.sql(s"SELECT id FROM $fq WHERE id IN ($vals)")
    pruneReports(inset).head.filesKept should be < 8
    inset.count() shouldBe 15
    val nullSafe = spark.sql(s"SELECT id FROM $fq WHERE id <=> 250")
    pruneReports(nullSafe).head.filesKept should be < 8
    nullSafe.collect().map(_.getLong(0)).toSeq shouldBe Seq(250L)
    // a file whose `v` is ALL null prunes under a bare IS NOT NULL
    val spec = ObjectStoreSpec(path = scratchDir("zsrnn").getAbsolutePath,
      database = "graft_zsr_nn", table = "t")
    val nn = ss.range(0, 200).toDF("id")
      .withColumn("v", when(col("id") >= 100, col("id")))
      .repartitionByRange(2, col("id")) // file A: v all null, file B: set
    val nfq = ObjectStoreSink.replaceTable(spark, nn, spec)
    val q = spark.sql(s"SELECT id FROM $nfq WHERE v IS NOT NULL")
    val rep = pruneReports(q)
    rep.head.filesKept should be < rep.head.filesTotal
    q.count() shouldBe 100
  }

  test("catalog partition pruning composes: the covering (subset) evidence " +
    "gate lets zone maps prune inside the partitions Spark already kept") {
    val spec = ObjectStoreSpec(path = scratchDir("zsrcat").getAbsolutePath,
      database = "graft_zsr_cat", table = "t", partitionBy = Seq("lang"))
    val df = ss.range(0, 300).toDF("id")
      .withColumn("lang", element_at(
        array(lit("de"), lit("en"), lit("fr")), (col("id") % 3 + 1).cast("int")))
      .repartitionByRange(5, col("id"))
    val fq = ObjectStoreSink.replaceTable(spark, df, spec)
    // partition filter + data band THROUGH THE CATALOG: Spark's own
    // PruneFileSourcePartitions narrows the index to the en dir first,
    // then the covering gate still vouches for the survivors
    val q = spark.table(fq).where(col("lang") === "en" && col("id") <= 60)
    val reps = pruneReports(q)
    withClue(s"plan:\n${q.queryExecution.optimizedPlan}\n") {
      reps should have size 1
      // the en dir holds 5 range files; the band keeps ~2
      reps.head.filesKept should be < reps.head.filesTotal
    }
    q.select("id", "lang").orderBy("id").collect().toSeq shouldBe
      df.where(col("lang") === "en" && col("id") <= 60)
        .select("id", "lang").orderBy("id").collect().toSeq
  }

  test("the rewrite is stable: re-planning the same query neither stacks " +
    "pruned indexes nor changes the report") {
    val (fq, _) = ranged("stable")
    def reps = pruneReports(
      spark.sql(s"SELECT id FROM $fq WHERE id BETWEEN 0 AND 40"))
    val first = reps
    val second = reps
    first should have size 1
    second should have size 1
    first.head shouldBe second.head
  }

  test("bloom sidecar probes prune equality/IN lookups on an UNCLUSTERED " +
    "layout where zone-map windows prove nothing; without the sidecar " +
    "the same query refuses") {
    // hash-distributed ids: every file's [min, max] spans ~the full range
    val mk = (tag: String, blooms: Seq[String]) => {
      val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
        database = s"graft_zsr_$tag", table = "t", bloomColumns = blooms)
      val df = ss.range(0, 800).toDF("id")
        .withColumn("name", concat(lit("n"), col("id")))
        .repartition(8, col("id"))
      (ObjectStoreSink.replaceTable(spark, df, spec), df)
    }
    val (fq, df) = mk("bloomsql", Seq("id", "name"))
    val q = spark.sql(s"SELECT id, name FROM $fq WHERE id IN (3, 400, 797)")
    val reps = pruneReports(q)
    reps should have size 1
    reps.head.filesKept should be < reps.head.filesTotal
    canon(q) shouldBe canon(
      df.where(col("id").isin(3L, 400L, 797L)).select("id", "name"))
    // string equality probes its own sidecar
    val qs = spark.sql(s"SELECT id, name FROM $fq WHERE name = 'n400'")
    pruneReports(qs).head.filesKept should be <
      pruneReports(qs).head.filesTotal
    qs.select("id").as[Long].collect() shouldBe Array(400L)
    // conjunct composition: each key set refines independently
    val qb = spark.sql(
      s"SELECT id FROM $fq WHERE id = 400 AND name = 'n400'")
    pruneReports(qb).head.filesKept should be >= 1
    qb.as[Long].collect() shouldBe Array(400L)
    // no sidecar → equality over the unclustered layout proves nothing
    val (fq2, _) = mk("nobloomsql", Nil)
    pruneReports(
      spark.sql(s"SELECT id FROM $fq2 WHERE id = 400")) shouldBe empty
  }

  test("disjunctions prune through per-file may-match trees: a two-band " +
    "OR drops the middle files; an unprovable branch keeps everything; " +
    "nested AND-inside-OR composes") {
    val (fq, df) = ranged("ortree")
    // two narrow bands at opposite ends: neither conjunct path nor an
    // IN-list rewrite covers this shape — only the Or tree can skip the
    // middle six files
    val or = spark.sql(
      s"SELECT id FROM $fq WHERE id < 10 OR id > 390")
    val rep = pruneReports(or).head
    rep.filesTotal shouldBe 8
    rep.filesKept should be <= 2
    or.as[Long].collect().sorted shouldBe
      ((0L until 10L) ++ (391L until 400L)).toArray
    // cross-column OR with a provable second branch
    val cross = spark.sql(
      s"SELECT id FROM $fq WHERE (id < 10 AND v >= 0.0) OR id > 390")
    pruneReports(cross).head.filesKept should be <= 2
    canon(cross) shouldBe canon(
      df.where((col("id") < 10 && col("v") >= 0.0) || col("id") > 390)
        .select("id"))
    // an Or with an unprovable branch can never prove a skip: no rewrite
    val unprovable = spark.sql(
      s"SELECT id FROM $fq WHERE id < 10 OR (id % 7) = 3")
    pruneReports(unprovable) shouldBe empty
    canon(unprovable) shouldBe canon(
      df.where(col("id") < 10 || col("id") % 7 === 3).select("id"))
  }

  test("key-set leaves INSIDE disjunctions resolve against the bloom " +
    "sidecar: OR-of-points prunes an unclustered layout, cross-column and " +
    "IN-inside-OR compose, an unindexed branch refuses") {
    val spec = ObjectStoreSpec(path = scratchDir("orbloom").getAbsolutePath,
      database = "graft_zsr_orbloom", table = "t",
      bloomColumns = Seq("id", "name"))
    val df = ss.range(0, 800).toDF("id")
      .withColumn("name", concat(lit("n"), col("id")))
      .withColumn("v", col("id").cast("double"))
      .repartition(8, col("id"))
    val fq = ObjectStoreSink.replaceTable(spark, df, spec)
    // pure OR-of-points on one column: each branch's [k, k] window spans
    // every file, so any skip is bloom evidence through the tree
    val or2 = spark.sql(s"SELECT id FROM $fq WHERE id = 3 OR id = 400")
    val rep = pruneReports(or2).head
    rep.filesKept should be < rep.filesTotal
    or2.as[Long].collect().sorted shouldBe Array(3L, 400L)
    // cross-column OR: a file survives iff EITHER probe may-match
    val cross = spark.sql(
      s"SELECT id FROM $fq WHERE id = 400 OR name = 'n3'")
    pruneReports(cross).head.filesKept should be <
      pruneReports(cross).head.filesTotal
    cross.as[Long].collect().sorted shouldBe Array(3L, 400L)
    // IN-list inside a branch keeps its exact key set
    val inOr = spark.sql(
      s"SELECT id FROM $fq WHERE id IN (3, 4) OR name = 'n400'")
    pruneReports(inOr).head.filesKept should be <
      pruneReports(inOr).head.filesTotal
    inOr.as[Long].collect().sorted shouldBe Array(3L, 4L, 400L)
    // ABSENT keys on every branch: the probes prune EVERY file (zero
    // scan tasks — the strongest possible skip) and the answer stays
    // exact; under an aggregate Spark collapses the empty listing to a
    // constant-empty plan outright
    val none = spark.sql(s"SELECT id FROM $fq WHERE id = 5000 OR id = 9000")
    pruneReports(none).head.filesKept shouldBe 0
    none.count() shouldBe 0L
    val noneAgg = spark.sql(
      s"SELECT id, count(*) AS c FROM $fq WHERE id = 5000 OR id = 9000 GROUP BY id")
    noneAgg.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l } shouldBe empty
    noneAgg.count() shouldBe 0L
    // a branch with NO skipping evidence (modulo arithmetic: neither a
    // bound nor a key set) poisons the Or — nothing provable, no rewrite
    val unprovable = spark.sql(
      s"SELECT id FROM $fq WHERE id = 400 OR (id % 7) = 3")
    pruneReports(unprovable) shouldBe empty
    // a DOUBLE-typed point branch still range-proves through the window
    // (bloom refuses doubles at build; bounds don't) — composition keeps
    // the result exact either way
    val dbl = spark.sql(s"SELECT id FROM $fq WHERE id = 400 OR v = 3.0")
    dbl.as[Long].collect().sorted shouldBe Array(3L, 400L)
  }

  test("IS NULL prunes provably null-free files (zero recorded nulls); " +
    "LIKE 'prefix%' relaxes to the sound [prefix, bumped) range; non-ASCII " +
    "prefixes refuse") {
    val spec = ObjectStoreSpec(path = scratchDir("isnull").getAbsolutePath,
      database = "graft_zsr_isnull", table = "t")
    // nulls concentrate in the LOW id band; clustering on id makes most
    // files provably null-free (nulls == 0 in their footers)
    val df = ss.range(0, 400).toDF("id")
      .withColumn("nv", when(col("id") < 50, lit(null).cast("string"))
        .otherwise(concat(lit("k"), col("id"))))
      .withColumn("name", concat(lit("row-"), format_string("%04d", col("id"))))
      .repartitionByRange(8, col("id"))
    val fq = ObjectStoreSink.replaceTable(spark, df, spec)
    val qn = spark.sql(s"SELECT id FROM $fq WHERE nv IS NULL")
    val rep = pruneReports(qn).head
    rep.filesKept should be < rep.filesTotal
    qn.as[Long].collect().sorted shouldBe (0L until 50L).toArray
    // prefix scan over the co-clustered name column
    val qp = spark.sql(s"SELECT id FROM $fq WHERE name LIKE 'row-01%'")
    pruneReports(qp).head.filesKept should be <
      pruneReports(qp).head.filesTotal
    qp.as[Long].collect().sorted shouldBe (100L until 200L).toArray
    // a prefix ABOVE every recorded max: the lower bound alone proves
    // every file disjoint (the '~' last char takes the no-upper path)
    val qh = spark.sql(s"SELECT id FROM $fq WHERE name LIKE 'row~%'")
    pruneReports(qh).head.filesKept shouldBe 0
    qh.collect() shouldBe empty
    // non-ASCII prefix: no sound compare against ASCII-only stats — the
    // conjunct carries no bound and the scan stays unpruned
    pruneReports(spark.sql(
      s"SELECT id FROM $fq WHERE name LIKE 'ré%'")) shouldBe empty
  }

  test("spark.graft.zoneMapScan.enabled=false disables the seam (answers " +
    "stay correct through the full listing) and re-enabling restores it") {
    val (fq, df) = ranged("kill")
    spark.conf.set("spark.graft.zoneMapScan.enabled", "false")
    try {
      val q = spark.sql(s"SELECT id FROM $fq WHERE id BETWEEN 100 AND 130")
      pruneReports(q) shouldBe empty
      canon(q) shouldBe canon(
        df.where(col("id").between(100, 130)).select("id"))
    } finally spark.conf.unset("spark.graft.zoneMapScan.enabled")
    pruneReports(spark.sql(
      s"SELECT id FROM $fq WHERE id BETWEEN 100 AND 130")) should have size 1
  }
}
