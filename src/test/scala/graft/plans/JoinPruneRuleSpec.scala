package graft.plans

import graft.{GraftExtensions, SparkSpec}
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** The join-prune planner seam: an equi-join between a manifest-committed
  * fact scan and a small build side must have the fact's file LISTING
  * pruned by the build side's key set, stay result-identical, respect the
  * join-type soundness table, and refuse on every unstable or unprovable
  * shape.
  */
class JoinPruneRuleSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private val ss = spark
  import ss.implicits._

  GraftExtensions.register(spark)

  // the production default refuses tiny facts (the planning-time key
  // collection wouldn't pay for itself); these fixtures ARE tiny, so the
  // suite runs with the gate open and restores the default after
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.graft.joinPrune.minFactBytes", "0")
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.joinPrune.minFactBytes")
    super.afterAll()
  }

  /** ids 0..799 clustered into 8 range-disjoint files on `id`. */
  private def fact(tag: String): (DataFrame, DataFrame) = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_jpr_$tag", table = "f")
    val df = ss.range(0, 800).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("string"))
      .withColumn("v", col("id").cast("double") / 8.0)
      .repartitionByRange(8, col("id"))
    val fq = ObjectStoreSink.replaceTable(spark, df, spec)
    (spark.table(fq), df)
  }

  private def reports(df: DataFrame): Seq[graft.sinks.ZoneMap.PruneReport] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case z: ZoneMapPrunedIndex => Seq(z.report)
          case _ => Nil
        }
        case _ => Nil
      }
    }.flatten

  private def canon(df: DataFrame): Seq[String] = {
    val cs = df.columns.sorted
    df.select(cs.head, cs.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  /** Run `q` with the rule disabled — the unpruned twin for exactness. */
  private def disabled[T](body: => T): T = {
    spark.conf.set("spark.graft.joinPrune.enabled", "false")
    try body finally spark.conf.set("spark.graft.joinPrune.enabled", "true")
  }

  test("bimodal build side prunes the middle fact files a range proof " +
    "cannot; inner-join result identical to the unpruned plan") {
    val (f, _) = fact("bimodal")
    val dim = Seq(3L, 17L, 760L, 799L).toDF("k")
    val q = f.join(dim, f("id") === dim("k"))
    val reps = reports(q)
    reps should have size 1
    reps.head.filesTotal shouldBe 8
    // [3, 799] spans every band — only a key-set proof can drop the middle
    reps.head.filesSkipped should be >= 5
    canon(q) shouldBe disabled(canon(f.join(dim, f("id") === dim("k"))))
    q.count() shouldBe 4
  }

  test("left-semi prunes the left fact; left-outer prunes only the " +
    "preserved side's partner (right), never the preserved fact itself") {
    val (f, _) = fact("semiouter")
    val dim = Seq(5L, 790L).toDF("k")
    val semi = f.join(dim, f("id") === dim("k"), "left_semi")
    reports(semi).head.filesSkipped should be >= 5
    semi.select("id").as[Long].collect().sorted shouldBe Seq(5L, 790L)
    // fact preserved on the LEFT of a left-outer: pruning it would drop
    // unmatched fact rows — must refuse
    val outerLeft = f.join(dim, f("id") === dim("k"), "left_outer")
    reports(outerLeft) shouldBe empty
    outerLeft.count() shouldBe 800
    // fact on the RIGHT of a left-outer is the non-preserved side: prune
    val outerRight = dim.join(f, f("id") === dim("k"), "left_outer")
    reports(outerRight).head.filesSkipped should be >= 5
    canon(outerRight) shouldBe disabled(
      canon(dim.join(f, f("id") === dim("k"), "left_outer")))
  }

  test("left-anti prunes the right side (a right row matching no left key " +
    "never flips match-existence) and stays exact") {
    val (f, _) = fact("anti")
    val probe = Seq(1L, 2L, 3L, 777L).toDF("k")
    val q = probe.join(f, probe("k") === f("id"), "left_anti")
    reports(q).head.filesSkipped should be >= 5
    q.count() shouldBe 0 // every probe key exists in the fact
    val probe2 = Seq(1L, 9999L).toDF("k")
    val q2 = probe2.join(f, probe2("k") === f("id"), "left_anti")
    q2.as[Long].collect() shouldBe Seq(9999L)
  }

  test("refusals: non-deterministic build side, limit in the build side, " +
    "oversized build side, rule disabled") {
    val (f, _) = fact("refuse")
    val dim = Seq(5L, 6L).toDF("k")
    // the rand must SURVIVE to our batch to test the refusal: over a
    // local relation ConvertToLocalRelation pre-evaluates it into a fixed
    // row set (result-stable — firing is then correct), and a range-
    // foldable predicate like rand >= 0.0 is simplified away entirely,
    // so: file-scan dim + a genuinely undecidable rand threshold
    val dimSpec = ObjectStoreSpec(
      path = scratchDir("refusedim").getAbsolutePath,
      database = "graft_jpr_refuse", table = "d")
    val dimT = spark.table(ObjectStoreSink.replaceTable(spark, dim, dimSpec))
    reports(f.join(dimT.where(rand(7) >= 0.5), f("id") === dimT("k"))) shouldBe
      empty
    // same survival requirement for Limit: over local rows it's
    // pre-evaluated to a fixed LocalRelation; over a scan it reaches us
    reports(f.join(dimT.limit(1), f("id") === dimT("k"))) shouldBe empty
    spark.conf.set("spark.graft.joinPrune.maxDimBytes", "1")
    try reports(f.join(dim, f("id") === dim("k"))) shouldBe empty
    finally spark.conf.unset("spark.graft.joinPrune.maxDimBytes")
    disabled(reports(f.join(dim, f("id") === dim("k")))) shouldBe empty
    // full outer preserves both sides: neither may be pruned
    reports(f.join(dim, f("id") === dim("k"), "full_outer")) shouldBe empty
  }

  test("key-set overflow degrades to the min/max range proof — still " +
    "prunes a clustered fact, still exact") {
    val (f, _) = fact("overflow")
    val dim = (0L until 60L).toDF("k") // 60 distinct keys, low band
    spark.conf.set("spark.graft.joinPrune.maxKeys", "10")
    try {
      val q = f.join(dim, f("id") === dim("k"))
      val rep = reports(q).head
      rep.filesSkipped should be > 0 // [0, 59] range-drops the upper bands
      q.count() shouldBe 60
    } finally spark.conf.unset("spark.graft.joinPrune.maxKeys")
  }

  test("the key must reach the scan through value-preserving nodes: an " +
    "aggregate grouping BY the key prunes; a window between scan and " +
    "join refuses") {
    val (f, _) = fact("walk")
    val dim = Seq(3L, 799L).toDF("k")
    val agg = f.groupBy("id").agg(sum("v").as("sv"))
    val qa = agg.join(dim, agg("id") === dim("k"))
    reports(qa).head.filesSkipped should be >= 5
    canon(qa) shouldBe disabled(
      canon(agg.join(dim, agg("id") === dim("k"))))
    // a window's values depend on rows in dropped files — refuse
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("id")
    val win = f.withColumn("rn", row_number().over(w))
    val qw = win.join(dim, win("id") === dim("k"))
    reports(qw) shouldBe empty
    canon(qw) shouldBe disabled(canon(win.join(dim, win("id") === dim("k"))))
  }

  test("an empty or all-null build side: Spark's own empty-relation " +
    "propagation collapses the join before our batch — no fact scan " +
    "remains at all (strictly better than listing zero files)") {
    val (f, _) = fact("emptydim")
    val dim = Seq.empty[Long].toDF("k")
    val q = f.join(dim, f("id") === dim("k"))
    q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l } shouldBe empty
    q.count() shouldBe 0
    q.columns should contain allOf ("id", "grp", "v")
    // all-null local dim: the inferred IsNotNull filter is evaluated over
    // the local rows → empty → same collapse
    val nulls = Seq[Option[Long]](None, None).toDF("k")
    val qn = f.join(nulls, f("id") === nulls("k"))
    qn.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l } shouldBe empty
    qn.count() shouldBe 0
  }

  test("multi-key composition: pruning fires on the SECOND equi-conjunct " +
    "when the first proves nothing, and two proving keys refine each other") {
    val (f, _) = fact("multikey")
    // first key (grp) is multi-valued in every file — its probe keeps all;
    // second key (id) is the clustered one that actually prunes
    val dim = Seq(("1", 3L), ("3", 799L)).toDF("g", "k")
    val q = f.join(dim, f("grp") === dim("g") && f("id") === dim("k"))
    val rep = reports(q).head
    rep.filesSkipped should be >= 5
    canon(q) shouldBe disabled(canon(
      f.join(dim, f("grp") === dim("g") && f("id") === dim("k"))))
    // two proving keys compose conjunctively: id2 mirrors the clustering,
    // its band keeps only the LOW file, so the composed kept set must be
    // strictly smaller than the id-only prune that keeps low + high
    val f2spec = ObjectStoreSpec(path = scratchDir("mk2").getAbsolutePath,
      database = "graft_jpr_mk2", table = "f")
    val df2 = ss.range(0, 800).toDF("id")
      .withColumn("id2", col("id"))
      .repartitionByRange(8, col("id"))
    val f2 = spark.table(ObjectStoreSink.replaceTable(spark, df2, f2spec))
    val dim2 = Seq((3L, 3L), (799L, 50L)).toDF("k1", "k2")
    val single = f2.join(dim2, f2("id") === dim2("k1"))
    val both = f2.join(dim2,
      f2("id") === dim2("k1") && f2("id2") === dim2("k2"))
    reports(both).head.filesKept should be < reports(single).head.filesKept
    canon(both) shouldBe disabled(canon(f2.join(dim2,
      f2("id") === dim2("k1") && f2("id2") === dim2("k2"))))
  }

  test("both sides of an inner join between two manifest-backed tables " +
    "prune — each by the other's keys — and the result stays exact") {
    val (a, _) = fact("bothA") // ids 0..799, 8 files
    val bspec = ObjectStoreSpec(path = scratchDir("bothB").getAbsolutePath,
      database = "graft_jpr_bothb", table = "f")
    // ids 100..150 ∪ 900..950: the low band overlaps A, the high band is
    // provably partner-free against A's [0, 799]
    val bdf = (ss.range(100, 151).toDF("bid") unionAll
      ss.range(900, 951).toDF("bid")).repartitionByRange(4, col("bid"))
    val b = spark.table(ObjectStoreSink.replaceTable(spark, bdf, bspec))
    val q = a.join(b, a("id") === b("bid"))
    val reps = reports(q)
    reps should have size 2 // BOTH listings pruned
    reps.foreach(_.filesSkipped should be > 0)
    canon(q) shouldBe disabled(canon(a.join(b, a("id") === b("bid"))))
    q.count() shouldBe 51
  }

  test("a mutable relation leaf (JDBC) in the build side refuses: its two " +
    "executions could see different keys, so no file may be dropped") {
    val (f, _) = fact("jdbcdim")
    val url = s"jdbc:derby:${scratchDir("jpderby").getAbsolutePath}/db;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE dim (k BIGINT)")
      st.execute("INSERT INTO dim VALUES (5), (790)")
      st.close()
    } finally c.close()
    val dim = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "dim").load()
    val q = f.join(dim, f("id") === dim("K"))
    reports(q) shouldBe empty // JDBCRelation is not a snapshot source
    q.count() shouldBe 2
  }

  test("SQL surface: a star-shape SELECT over the catalog table prunes " +
    "the fact listing and hash-matches the unpruned answer") {
    val spec = ObjectStoreSpec(path = scratchDir("sqlstar").getAbsolutePath,
      database = "graft_jpr_sql", table = "f")
    val df = ss.range(0, 800).toDF("id")
      .withColumn("v", col("id").cast("double"))
      .repartitionByRange(8, col("id"))
    val fq = ObjectStoreSink.replaceTable(spark, df, spec)
    Seq(2L, 795L).toDF("k").createOrReplaceTempView("jpr_dim")
    val sql = s"SELECT f.id, f.v FROM $fq f JOIN jpr_dim d ON f.id = d.k"
    val q = spark.sql(sql)
    reports(q).head.filesSkipped should be >= 5
    canon(q) shouldBe disabled(canon(spark.sql(sql)))
  }
}
