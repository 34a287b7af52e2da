package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame

/** Randomized differential SQL testing (VERDICT r7 #3), in-JVM half: each
  * seeded [[FuzzSql]] sample renders one AST through TWO independent
  * frontends — the DataFrame API and `spark.sql` over the SAME SQL text
  * the DuckDB oracle gets — and the results must match as sorted
  * multisets. The cross-ENGINE half of the same samples rides the
  * `q_fuzz_*` entries through the driver's DuckDB gate (tools/check.py
  * locally).
  *
  * On failure the assertion prints the seed, the SQL text, and both
  * result heads — a sample IS the minimal reproducer (every sample is a
  * single small query; re-run with `FuzzSql.sample(<seed>)`).
  */
class DifferentialSqlSpec extends SparkSpec {

  private val Samples = sys.props.get("fuzzSamples").map(_.toInt).getOrElse(220)

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map {
        case null => "∅"
        case d: Double => f"$d%.9e" // same bits both paths; fixed rendering
        case x => x.toString
      }.mkString("|"))
      .sorted.toSeq
  }

  private def differential(gen: Long => FuzzSql.Fuzzed): Unit = {
    Tables.registerAll(spark, sfDir)
    var nonEmpty = 0
    for (seed <- 1 to Samples) {
      val smp = gen(seed.toLong)
      withClue(s"seed=$seed\nSQL:\n${smp.sql}\n") {
        val viaDf = canon(smp.df(spark, sfDir))
        val viaSql = canon(spark.sql(smp.sql))
        if (viaDf.nonEmpty) nonEmpty += 1
        if (viaDf != viaSql) {
          val d1 = viaDf.diff(viaSql).take(3)
          val d2 = viaSql.diff(viaDf).take(3)
          fail(s"rows ${viaDf.size} vs ${viaSql.size}; df-only=$d1 sql-only=$d2")
        }
      }
    }
    // the generator must not be degenerate: most samples return data
    withClue(s"only $nonEmpty/$Samples samples returned rows:") {
      nonEmpty should be > (Samples / 2)
    }
  }

  test(s"$Samples random v1 plans: DataFrame API ≡ spark.sql on the oracle text") {
    differential(FuzzSql.sample)
  }

  test(s"$Samples random v2 plans (HAVING/ExprSum/band/set-op/left+pred)") {
    differential(FuzzSql.sampleV2)
  }

  test(s"$Samples random v3 plans (OR/BETWEEN/str-fns/count-distinct/window-agg)") {
    differential(FuzzSql.sampleV3)
  }

  test(s"$Samples random v4 plans (star joins/EXISTS/IN/scalar subqueries)") {
    differential(FuzzSql.sampleV4)
  }

  test(s"$Samples random v5 plans (FULL OUTER/framed windows/null ordering)") {
    differential(FuzzSql.sampleV5)
  }

  test(s"$Samples random v6 plans (calendar buckets/INTERVAL shift/extracts/ts ranges)") {
    differential(FuzzSql.sampleV6)
  }

  test(s"$Samples random v7 plans (nested agg/CASE-in-agg/HAVING/NULLIF ratio)") {
    differential(FuzzSql.sampleV7)
  }

  test(s"$Samples random v8 plans (LAG/LEAD/RANK/NTILE/RANGE frames)") {
    differential(FuzzSql.sampleV8)
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("gate seeds are stable and all shapes are exercised") {
    // q_fuzz_* results are committed via the driver's correctness gate —
    // the seeds' ASTs must never drift. Pin the rendered SQL's hash.
    // If either fails, the GENERATOR changed under fixed seeds: renumber
    // into NEW queries (q_fuzz_21+) instead of re-pointing old names.
    val v1 = FuzzSql.gateSeeds.map(s => FuzzSql.sample(s).sql).mkString("\n---\n")
    md5(v1) shouldBe renderedHash
    val v2 = FuzzSql.gateSeedsV2.map(s => FuzzSql.sampleV2(s).sql).mkString("\n---\n")
    md5(v2) shouldBe renderedHashV2
    val v3 = FuzzSql.gateSeedsV3.map(s => FuzzSql.sampleV3(s).sql).mkString("\n---\n")
    md5(v3) shouldBe renderedHashV3
    val v4 = FuzzSql.gateSeedsV4.map(s => FuzzSql.sampleV4(s).sql).mkString("\n---\n")
    md5(v4) shouldBe renderedHashV4
    val v5 = FuzzSql.gateSeedsV5.map(s => FuzzSql.sampleV5(s).sql).mkString("\n---\n")
    md5(v5) shouldBe renderedHashV5
    val v6 = FuzzSql.gateSeedsV6.map(s => FuzzSql.sampleV6(s).sql).mkString("\n---\n")
    md5(v6) shouldBe renderedHashV6
    val shapes = FuzzSql.gateSeeds.map(s => FuzzSql.sample(s).shape.getClass.getSimpleName).toSet
    shapes should contain allOf ("AggShape", "ProjectShape", "WindowShape", "TopKShape")
    val shapesV2 = FuzzSql.gateSeedsV2.map(s => FuzzSql.sampleV2(s).shape.getClass.getSimpleName).toSet
    shapesV2 should contain allOf ("AggShape2", "BandProject", "SetOpShape")
    val v3s = FuzzSql.gateSeedsV3.map(FuzzSql.sampleV3)
    v3s.map(_.shape.getClass.getSimpleName).toSet should contain allOf
      ("AggShape", "StrFnProject", "WinAggShape")
    // both window flavors (decimal + bigint), both new pred kinds, and a
    // LEFT join must stay represented
    v3s.map(_.shape).collect { case FuzzSql.WinAggShape(_, _, dec) => dec }
      .toSet shouldBe Set(true, false)
    val predKinds = v3s.flatMap(_.preds.map(_.getClass.getSimpleName)).toSet
    predKinds should contain allOf ("OrPred", "BetweenP")
    v3s.exists(_.leftJoin) shouldBe true
    // v4: all four membership kinds, a scalar threshold, a multi-branch
    // star, and both shapes must stay represented
    val v4s = FuzzSql.gateSeedsV4.map(FuzzSql.sampleV4)
      .collect { case s: FuzzSql.StarSample => s }
    v4s should have size FuzzSql.gateSeedsV4.size
    val subKinds = v4s.flatMap(_.sub).map(s => (s.neg, s.asIn)).toSet
    subKinds shouldBe Set((false, false), (false, true), (true, false), (true, true))
    v4s.flatMap(_.scal) should not be empty
    v4s.map(_.branches.size).max should be >= 3
    v4s.map(_.shape.getClass.getSimpleName).toSet shouldBe
      Set("AggShape", "ProjectShape")
    // v5: all three full-outer shapes, both null placements, both framed-
    // window flavors (running decimal SUM + running COUNT), both bounded
    // and unbounded frames, and filters on each side must stay represented
    val v5s = FuzzSql.gateSeedsV5.map(FuzzSql.sampleV5)
      .collect { case s: FuzzSql.FoSample => s }
    v5s should have size FuzzSql.gateSeedsV5.size
    v5s.map(_.shape.getClass.getSimpleName).toSet shouldBe
      Set("FoAgg", "FoProject", "FoWin")
    v5s.map(_.nullsFirst).toSet shouldBe Set(true, false)
    val wins = v5s.map(_.shape).collect { case w: FuzzSql.FoWin => w }
    wins.map(_.valCol.isDefined).toSet shouldBe Set(true, false)
    wins.map(_.nPrec.isDefined).toSet shouldBe Set(true, false)
    v5s.exists(_.lPreds.nonEmpty) shouldBe true
    v5s.exists(_.rPreds.nonEmpty) shouldBe true
    // v6: all four calendar units, the INTERVAL shift, the fact-fact join,
    // timestamp BETWEEN, date min/max aggregates, and both shapes over
    // both date columns must stay represented
    val v6s = FuzzSql.gateSeedsV6.map(FuzzSql.sampleV6)
      .collect { case s: FuzzSql.DtSample => s }
    v6s should have size FuzzSql.gateSeedsV6.size
    val units = v6s.map(_.shape).collect { case FuzzSql.DtAgg(u, _, _, _) => u }.toSet
    units shouldBe Set("year", "quarter", "month", "week")
    v6s.map(_.shape).collect { case FuzzSql.DtAgg(_, s, _, _) => s }
      .exists(_ > 0) shouldBe true
    v6s.exists(_.joinOrders) shouldBe true
    v6s.flatMap(_.dPreds).exists(_.hi.isDefined) shouldBe true
    v6s.map(_.shape.getClass.getSimpleName).toSet shouldBe
      Set("DtAgg", "DtProject")
    v6s.map(_.dcol).toSet shouldBe Set("o_orderdate", "l_shipdate")
    // v7: both regroup keys, both fact tables, HAVING, the NULLIF ratio,
    // the bare-count Q13 shape, and all four level-1 aggregate kinds must
    // stay represented
    val v7 = FuzzSql.gateSeedsV7.map(s => FuzzSql.sampleV7(s).sql).mkString("\n---\n")
    md5(v7) shouldBe renderedHashV7
    val v7s = FuzzSql.gateSeedsV7.map(FuzzSql.sampleV7)
      .collect { case s: FuzzSql.NestSample => s }
    v7s should have size FuzzSql.gateSeedsV7.size
    v7s.map(_.key.getClass.getSimpleName).toSet shouldBe Set("CntBand", "CntMod")
    v7s.map(_.fact.name).toSet shouldBe Set("orders", "lineitem")
    v7s.exists(_.havingMin.isDefined) shouldBe true
    v7s.exists(_.ratio) shouldBe true
    v7s.exists(_.l1Aggs.isEmpty) shouldBe true
    v7s.flatMap(_.l1Aggs).map(_.getClass.getSimpleName).toSet should contain allOf
      ("CondCnt", "CondDSum", "DSum", "SumInt")
    v7s.flatMap(_.mm) should not be empty
    // v8: all three analytic shapes, all three fact tables, the non-unique
    // lineitem order (the tie shape), and a filtered sample of each frame
    // kind must stay represented
    val v8 = FuzzSql.gateSeedsV8.map(s => FuzzSql.sampleV8(s).sql).mkString("\n---\n")
    md5(v8) shouldBe renderedHashV8
    val v8s = FuzzSql.gateSeedsV8.map(FuzzSql.sampleV8)
      .collect { case s: FuzzSql.WfSample => s }
    v8s should have size FuzzSql.gateSeedsV8.size
    v8s.map(_.shape.getClass.getSimpleName).toSet shouldBe
      Set("WfLagLead", "WfRankTile", "WfRangeSum")
    v8s.map(_.fact.name).toSet shouldBe Set("orders", "lineitem", "customer")
    v8s.exists(s => s.fact.name == "lineitem" &&
      s.shape.isInstanceOf[FuzzSql.WfLagLead]) shouldBe true
    v8s.exists(_.preds.nonEmpty) shouldBe true
  }

  private val renderedHash = "f311226110f29eaec8de91ab823b3479"
  private val renderedHashV2 = "ee07a321394301d8ae6fe9f7ba9044f8"
  private val renderedHashV3 = "3a335f5da1508a31dea1ad613429b651"
  private val renderedHashV4 = "7aa5591572634e7158ed337bf323229e"
  private val renderedHashV5 = "fbe6bf34e0014aa22d9302c659fe94ca"
  private val renderedHashV6 = "74ded63ace9c8d263d09a5eca0d37005"
  private val renderedHashV7 = "bb58e10217ea0520c4737a1c66cc4500"
  private val renderedHashV8 = "6504b3965428dc5a731d8fe31792f574"
}
