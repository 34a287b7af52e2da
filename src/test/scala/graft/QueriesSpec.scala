package graft

/** Every SparkEntry query must run on sf0.001 and return rows. The DuckDB
  * value-level gate lives driver-side (tools/check.py replica); this spec is
  * the fast in-repo regression net: plans build, execute, and are non-empty.
  */
class QueriesSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented reason") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Non-SQL-expressible ops get the driver's weaker rows-only check; keep
    // this list explicit so a missing oracle is a decision, not an accident.
    // q_multimodal_features: byte-level media synthesis/statistics aren't
    // SQL-expressible; values pinned by MultimodalSpec instead.
    val allowed = Set("q_multimodal_features")
    assert(noOracle.subsetOf(allowed), s"queries missing oracle: $noOracle")
    // ...and the allowlist itself must not go stale: every allowed name must
    // be a real query, so a rename/removal fails loudly here.
    assert(allowed.subsetOf(SparkEntry.queries.keySet),
      s"stale allowlist entries: ${allowed -- SparkEntry.queries.keySet}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0)
    }
  }
}
