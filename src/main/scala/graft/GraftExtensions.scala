package graft

import graft.functions.{CmsSketch, DotProduct, KmvDistinct, MinHashSig, SimHashSig, TopKByScore, WinnowFingerprint}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension registering the engine's custom Catalyst kernels as
  * SQL functions, so `spark.sql` users get them without touching the Scala
  * API — the idiomatic way a Spark library ships new expressions:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * // or, on an already-built session:
  * GraftExtensions.register(spark)
  * ...
  * spark.sql("SELECT dot_product(a, b), minhash_sig(tokens, 16), " +
  *           "simhash_sig(tokens), winnow_fingerprint(tokens, 4)")
  * }}}
  *
  * All four are codegen'd expressions (WholeStageCodegen-resident), not
  * UDFs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // manifest-backed planner seams over versioned tables: zero-scan
    // COUNT/MIN/MAX answering, automatic zone-map file skipping,
    // dim-driven join file pruning, and materialized-view rewrite — see
    // graft.plans.MetaAggRule / ZoneMapScanRule / JoinPruneRule /
    // MvRewriteRule
    // RefResolveRule runs FIRST: reference-mode manifests must resolve to
    // their physical file set before the per-file evidence seams look
    ext.injectOptimizerRule(_ => graft.plans.RefResolveRule)
    ext.injectOptimizerRule(_ => graft.plans.MetaAggRule)
    ext.injectOptimizerRule(_ => graft.plans.ZoneMapScanRule)
    ext.injectOptimizerRule(_ => graft.plans.JoinPruneRule)
    ext.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
    // SQL maintenance verbs (OPTIMIZE / VACUUM / SHOW SNAPSHOTS) in front
    // of Spark's parser — additive only, everything else delegates.
    // Parser injection is builder-time only (spark.sql.extensions=
    // graft.GraftExtensions); register() below cannot retrofit it onto a
    // live session.
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}

object GraftExtensions {

  /** Register the same functions AND the metadata-aggregate optimizer rule
    * on an ALREADY-BUILT session (builder-time extensions can't reach it).
    * Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, ident, info, builder)
    }
    val rules = Seq(graft.plans.RefResolveRule, graft.plans.MetaAggRule,
      graft.plans.ZoneMapScanRule, graft.plans.JoinPruneRule,
      graft.plans.MvRewriteRule)
    val extra = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      extra ++ rules.filterNot(extra.contains)
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b)")
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(tokens, numHashes)")
        MinHashSig(args(0), intArg(args(1), "minhash_sig"))
      }),
    (FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_sig(tokens)")
        SimHashSig(args(0))
      }),
    (FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "winnow_fingerprint(tokens, window)")
        WinnowFingerprint(args(0), intArg(args(1), "winnow_fingerprint"))
      }),
    (FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "topk_by_score(score, id, k)")
        TopKByScore(args(0), args(1), intArg(args(2), "topk_by_score"))
          .toAggregateExpression()
      }),
    (FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_sketch(hash, k)")
        KmvDistinct(args(0), intArg(args(1), "kmv_sketch"))
          .toAggregateExpression()
      }),
    (FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketch].getName, "cms_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "cms_sketch(slots, width, depth)")
        CmsSketch(args(0), intArg(args(1), "cms_sketch"),
          intArg(args(2), "cms_sketch")).toAggregateExpression()
      }),
    // Spark's OWN bloom-filter expressions, exposed as SQL functions: the
    // engine uses them for two-phase decontamination (Bloom prune + exact
    // verify), but Spark registers them only for internal runtime-filter
    // rewrites — the classes are public catalyst expressions, the SQL
    // names are not. Surfacing them is registration, not reimplementation.
    (FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "bloom_filter_agg(xxhash64(col), estimatedItems, numBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2)).toAggregateExpression()
      }),
    (FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "might_contain(bloom, xxhash64(col))")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))
      }))
}
