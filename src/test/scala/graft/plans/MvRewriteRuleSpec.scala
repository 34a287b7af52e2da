package graft.plans

import graft.{GraftExtensions, SparkSpec}
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** MV query rewrite: a registered snapshot answers a result-identical
  * query with ZERO base-table scans, refuses the moment any base table
  * moves past the pinned version, and never substitutes across shape or
  * semantic differences.
  */
class MvRewriteRuleSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  GraftExtensions.register(spark)

  // parts = 1 packs all rows into ONE multi-valued file, which keeps the
  // r13 metadata SUM answering (MetaAggRule) from pre-empting the MV
  // rewrite on these tiny fixtures — single-valued-per-file bases would
  // collapse the whole aggregate to a LocalRelation (a better plan, but
  // this suite exercises the MV machinery specifically)
  private def commitBase(tag: String, rows: Seq[(String, Long)],
      parts: Int = 4): (ObjectStoreSpec, String) = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_mvr_$tag", table = "base")
    val fq = ObjectStoreSink.replaceTable(spark,
      rows.toDF("k", "v").repartition(parts), spec)
    (spec, fq)
  }

  /** One-shot refresh: recompute the defining query, commit the snapshot,
    * re-register — the manual twin of what an IncrementalAgg/streaming
    * refresh would do after folding a delta.
    */
  private def refreshAndRegister(name: String, baseSpec: ObjectStoreSpec,
      fq: String, mvSpec: ObjectStoreSpec): String = {
    val defining = spark.sql(defSql(fq))
    val mvFq = ObjectStoreSink.replaceTable(spark, defining, mvSpec)
    MvRewriteRule.register(name, spark.sql(defSql(fq)),
      () => spark.table(mvFq), Seq(baseSpec))
    mvFq
  }

  private def defSql(fq: String) =
    s"SELECT k, sum(v) AS sv, count(*) AS cnt FROM $fq GROUP BY k"

  private def scans(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq("<non-fs>")
      }
    }.flatten

  private def canon(df: DataFrame): Seq[String] = {
    val cs = df.columns.sorted
    df.select(cs.head, cs.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private def disabled[T](body: => T): T = {
    spark.conf.set("spark.graft.mvRewrite.enabled", "false")
    try body finally spark.conf.set("spark.graft.mvRewrite.enabled", "true")
  }

  test("a result-identical query is answered from the snapshot: zero base " +
    "scans, hash-identical to the unrewritten answer; ORDER BY above the " +
    "matched subtree still rewrites") {
    val (baseSpec, fq) = commitBase("hit",
      Seq(("a", 1L), ("a", 2L), ("b", 5L), (null, 7L)))
    val mvSpec = ObjectStoreSpec(path = scratchDir("hitmv").getAbsolutePath,
      database = "graft_mvr_hit", table = "mv")
    refreshAndRegister("mv_hit", baseSpec, fq, mvSpec)
    try {
      val q = spark.sql(defSql(fq) + " ORDER BY k")
      val roots = scans(q)
      roots should have size 1
      roots.head should include("/mv/")
      canon(q) shouldBe disabled(canon(spark.sql(defSql(fq) + " ORDER BY k")))
      q.count() shouldBe 3
    } finally MvRewriteRule.deregister("mv_hit")
  }

  test("staleness: the instant a base table commits past the pinned " +
    "version the rewrite refuses; a refresh + re-register re-arms it") {
    val (baseSpec, fq) = commitBase("stale", Seq(("a", 1L), ("b", 2L)))
    val mvSpec = ObjectStoreSpec(path = scratchDir("stalemv").getAbsolutePath,
      database = "graft_mvr_stale", table = "mv")
    refreshAndRegister("mv_stale", baseSpec, fq, mvSpec)
    try {
      scans(spark.sql(defSql(fq))).head should include("/mv/")
      // base moves: snapshot is now provably stale
      ObjectStoreSink.replaceTable(spark,
        Seq(("a", 10L), ("c", 30L)).toDF("k", "v").repartition(2), baseSpec)
      val q = spark.sql(defSql(fq))
      scans(q).head should include("/base/")
      // the refusal is what keeps the answer CURRENT (cols sorted:
      // cnt|k|sv)
      canon(q) shouldBe Seq("1|a|10", "1|c|30")
      // recompute through the protocol and re-arm
      refreshAndRegister("mv_stale", baseSpec, fq, mvSpec)
      val q2 = spark.sql(defSql(fq))
      scans(q2).head should include("/mv/")
      canon(q2) shouldBe disabled(canon(spark.sql(defSql(fq))))
    } finally MvRewriteRule.deregister("mv_stale")
  }

  test("an in-place append keeps the version NUMBER — the pinned file-set " +
    "signature still catches it and the rewrite refuses") {
    val (baseSpec, fq) = commitBase("append", Seq(("a", 1L), ("b", 2L)))
    val mvSpec = ObjectStoreSpec(
      path = scratchDir("appendmv").getAbsolutePath,
      database = "graft_mvr_append", table = "mv")
    refreshAndRegister("mv_append", baseSpec, fq, mvSpec)
    try {
      scans(spark.sql(defSql(fq))).head should include("/mv/")
      val v0 = ObjectStoreSink.snapshots(baseSpec).last.version
      Seq(("a", 100L)).toDF("k", "v").repartition(1)
        .write.mode("append").insertInto(fq)
      ObjectStoreSink.refreshManifest(spark, fq, baseSpec)
      // same version number, different content
      ObjectStoreSink.snapshots(baseSpec).last.version shouldBe v0
      val q = spark.sql(defSql(fq))
      scans(q).head should include("/base/")
      canon(q) shouldBe Seq("1|b|2", "2|a|101")
    } finally MvRewriteRule.deregister("mv_append")
  }

  test("refreshed{} re-arms the rewrite with NO manual re-register: stale " +
    "refusal in between, snapshot answers again after, exactness " +
    "throughout") {
    val (baseSpec, fq) = commitBase("rearm", Seq(("a", 1L), ("b", 2L)))
    val mvSpec = ObjectStoreSpec(path = scratchDir("rearmmv").getAbsolutePath,
      database = "graft_mvr_rearm", table = "mv")
    val mvFq = ObjectStoreSink.replaceTable(spark,
      spark.sql(defSql(fq)), mvSpec)
    // thunk registration: the canonical plan can be re-derived per refresh
    MvRewriteRule.register("mv_rearm", () => spark.sql(defSql(fq)),
      () => spark.table(mvFq), Seq(baseSpec))
    try {
      scans(spark.sql(defSql(fq))).head should include("/mv/")
      // base moves on: the rewrite must refuse until a refresh lands
      ObjectStoreSink.replaceTable(spark,
        Seq(("a", 10L), ("c", 30L)).toDF("k", "v").repartition(2), baseSpec)
      scans(spark.sql(defSql(fq))).head should include("/base/")
      // the refresh path re-arms by itself — no register call anywhere
      MvRewriteRule.refreshed("mv_rearm") {
        ObjectStoreSink.replaceTable(spark, spark.sql(defSql(fq)), mvSpec)
      }
      val q = spark.sql(defSql(fq))
      scans(q).head should include("/mv/")
      canon(q) shouldBe disabled(canon(spark.sql(defSql(fq))))
      canon(q) shouldBe Seq("1|a|10", "1|c|30")
    } finally MvRewriteRule.deregister("mv_rearm")
  }

  test("a base append racing the refresh leaves the re-armed pin BEHIND " +
    "the current version — conservative refusal, and the next refreshed{} " +
    "recovers") {
    val (baseSpec, fq) = commitBase("race", Seq(("a", 1L)))
    val mvSpec = ObjectStoreSpec(path = scratchDir("racemv").getAbsolutePath,
      database = "graft_mvr_race", table = "mv")
    val mvFq = ObjectStoreSink.replaceTable(spark,
      spark.sql(defSql(fq)), mvSpec)
    MvRewriteRule.register("mv_race", () => spark.sql(defSql(fq)),
      () => spark.table(mvFq), Seq(baseSpec))
    try {
      // the watermark is captured FIRST; an append that lands before the
      // refresh body reads is included in the snapshot but NOT in the pin
      // — the re-armed rewrite refuses (conservative), never serves a pin
      // it can't prove
      val pin = MvRewriteRule.beginRefresh("mv_race")
      ObjectStoreSink.replaceTable(spark,
        Seq(("a", 1L), ("z", 9L)).toDF("k", "v").repartition(1), baseSpec)
      ObjectStoreSink.replaceTable(spark, spark.sql(defSql(fq)), mvSpec)
      MvRewriteRule.completeRefresh("mv_race", pin)
      val q = spark.sql(defSql(fq))
      scans(q).head should include("/base/")
      canon(q) shouldBe Seq("1|a|1", "1|z|9")
      // a clean refresh cycle re-arms fully
      MvRewriteRule.refreshed("mv_race") {
        ObjectStoreSink.replaceTable(spark, spark.sql(defSql(fq)), mvSpec)
      }
      scans(spark.sql(defSql(fq))).head should include("/mv/")
    } finally MvRewriteRule.deregister("mv_race")
  }

  test("containment breadth: key IN-lists, inequalities, and NULL-key " +
    "semantics all slice the snapshot exactly; staleness refuses the " +
    "contained shape too") {
    val (baseSpec, fq) = commitBase("contain",
      Seq(("a", 1L), ("a", 2L), ("b", 5L), ("c", 9L), (null, 7L)), parts = 1)
    val mvSpec = ObjectStoreSpec(
      path = scratchDir("containmv").getAbsolutePath,
      database = "graft_mvr_contain", table = "mv")
    refreshAndRegister("mv_contain", baseSpec, fq, mvSpec)
    try {
      def filtered(where: String) = spark.sql(
        s"SELECT k, sum(v) AS sv, count(*) AS cnt FROM $fq " +
          s"WHERE $where GROUP BY k ORDER BY k")
      for (w <- Seq("k IN ('a', 'c')", "k <> 'b'", "k IS NULL",
        "k IS NOT NULL", "k >= 'b'")) {
        val q = filtered(w)
        withClue(s"WHERE $w:\n${q.queryExecution.optimizedPlan}\n") {
          scans(q).foreach(_ should include("/mv/"))
          canon(q) shouldBe disabled(canon(filtered(w)))
        }
      }
      // base moves on → the CONTAINED shape refuses exactly like the
      // direct one (same freshness pin)
      ObjectStoreSink.replaceTable(spark,
        Seq(("a", 1L), ("d", 4L)).toDF("k", "v").repartition(1), baseSpec)
      scans(filtered("k = 'a'")).head should include("/base/")
      canon(filtered("k = 'a'")) shouldBe Seq("1|a|1")
    } finally MvRewriteRule.deregister("mv_contain")
  }

  test("rollup: a query grouping by a SUBSET of the MV keys re-aggregates " +
    "the snapshot (COUNT→SUM, SUM→SUM, MIN/MAX→MIN/MAX); distinct, " +
    "member filters, and global rollups refuse") {
    val spec = ObjectStoreSpec(path = scratchDir("roll").getAbsolutePath,
      database = "graft_mvr_roll", table = "base")
    val fq = ObjectStoreSink.replaceTable(spark,
      Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 5L), ("b", "y", 7L),
        ("b", "y", 11L), (null, "x", 13L))
        .toDF("k", "s", "v").repartition(4), spec)
    val mvDef = s"SELECT k, s, count(*) AS cnt, sum(v) AS sv, " +
      s"min(v) AS mn, max(v) AS mx FROM $fq GROUP BY k, s"
    val mvSpec = ObjectStoreSpec(path = scratchDir("rollmv").getAbsolutePath,
      database = "graft_mvr_roll", table = "mv")
    val mvFq = ObjectStoreSink.replaceTable(spark, spark.sql(mvDef), mvSpec)
    MvRewriteRule.register("mv_roll", () => spark.sql(mvDef),
      () => spark.table(mvFq), Seq(spec))
    try {
      // roll up to k: counts sum, sums sum, extrema min/max
      val q = spark.sql(s"SELECT k, count(*) AS cnt, sum(v) AS sv, " +
        s"min(v) AS mn, max(v) AS mx FROM $fq GROUP BY k ORDER BY k")
      withClue(q.queryExecution.optimizedPlan.toString) {
        scans(q).foreach(_ should include("/mv/"))
      }
      canon(q) shouldBe disabled(canon(spark.sql(
        s"SELECT k, count(*) AS cnt, sum(v) AS sv, min(v) AS mn, " +
          s"max(v) AS mx FROM $fq GROUP BY k ORDER BY k")))
      // roll up to the OTHER key too
      val q2 = spark.sql(
        s"SELECT s, count(*) AS cnt FROM $fq GROUP BY s ORDER BY s")
      scans(q2).foreach(_ should include("/mv/"))
      canon(q2) shouldBe disabled(canon(spark.sql(
        s"SELECT s, count(*) AS cnt FROM $fq GROUP BY s ORDER BY s")))
      // refusals: distinct can't combine partials; an aggregate the MV
      // never stored; a GLOBAL rollup (empty-snapshot hazard)
      scans(spark.sql(s"SELECT k, count(DISTINCT v) AS d FROM $fq " +
        "GROUP BY k")).head should include("/base/")
      scans(spark.sql(s"SELECT k, avg(v) AS a FROM $fq GROUP BY k"))
        .head should include("/base/")
      // a GLOBAL rollup refuses HERE (empty-snapshot hazard) — the zero
      // scans are MetaAggRule answering count(*) from the manifest, a
      // different and sound engine path; the point is: never from the MV
      scans(spark.sql(s"SELECT count(*) AS c FROM $fq"))
        .foreach(_ should not include "/mv/")
      // staleness governs rollups identically (the replaced base is tiny
      // enough for MetaAggRule to answer zero-scan — never from the MV)
      ObjectStoreSink.replaceTable(spark,
        Seq(("a", "x", 100L)).toDF("k", "s", "v"), spec)
      val stale = spark.sql(s"SELECT k, count(*) AS c FROM $fq GROUP BY k")
      scans(stale).foreach(_ should not include "/mv/")
      stale.collect().map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("a", 1L))
    } finally MvRewriteRule.deregister("mv_roll")
  }

  test("refusals: a semantically different query (extra WHERE), a " +
    "shape-mismatched snapshot reader, a deregistered name, the kill " +
    "switch") {
    val (baseSpec, fq) = commitBase("refuse", Seq(("a", 1L), ("b", 2L)))
    val mvSpec = ObjectStoreSpec(
      path = scratchDir("refusemv").getAbsolutePath,
      database = "graft_mvr_refuse", table = "mv")
    val mvFq = refreshAndRegister("mv_refuse", baseSpec, fq, mvSpec)
    try {
      // a GROUP-KEY filter is the scoped containment rewrite (r13): the
      // predicate commutes with grouping, so it answers snapshot-only
      // with the filter re-applied on the MV read
      val keyFiltered = spark.sql(
        s"SELECT k, sum(v) AS sv, count(*) AS cnt FROM $fq " +
          "WHERE k = 'a' GROUP BY k")
      scans(keyFiltered).foreach(_ should include("/mv/"))
      keyFiltered.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
        Seq(("a", 1L, 1L))
      // a MEMBER-column filter changes group contents: never rewritten
      scans(spark.sql(
        s"SELECT k, sum(v) AS sv, count(*) AS cnt FROM $fq " +
          "WHERE v > 1 GROUP BY k")).head should include("/base/")
      // kill switch
      disabled(scans(spark.sql(defSql(fq))).head) should include("/base/")
      // shape mismatch: a reader with renamed-but-retyped columns refuses
      MvRewriteRule.register("mv_refuse", spark.sql(defSql(fq)),
        () => spark.table(mvFq).select(col("k"), col("sv").cast("int"),
          col("cnt")), Seq(baseSpec))
      scans(spark.sql(defSql(fq))).head should include("/base/")
      // deregistered name stops matching
      MvRewriteRule.deregister("mv_refuse")
      scans(spark.sql(defSql(fq))).head should include("/base/")
    } finally MvRewriteRule.deregister("mv_refuse")
  }
}
