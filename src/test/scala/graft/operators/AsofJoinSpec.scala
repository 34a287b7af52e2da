package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("matches latest prior-or-equal right row per key; no prior -> null") {
    val trades = Seq((1, 10L, "t1"), (1, 20L, "t2"), (2, 15L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1, 5L, 1.0), (1, 18L, 2.0), (1, 20L, 3.0), (2, 99L, 9.0))
      .toDF("k", "qts", "px")
    val out = AsofJoin(trades, quotes, Seq("k"), "ts", "qts")
      .orderBy("k", "ts")
      .select("k", "ts", "trade", "asof_qts", "asof_px")
      .collect()
    // t1@10: latest quote <= 10 is qts=5
    out(0).getLong(3) shouldBe 5L
    out(0).getDouble(4) shouldBe 1.0
    // t2@20: quote at EXACTLY 20 matches (>= tie)
    out(1).getLong(3) shouldBe 20L
    out(1).getDouble(4) shouldBe 3.0
    // t3@15 on key 2: only quote is at 99 (future) -> null match
    assert(out(2).isNullAt(3))
    assert(out(2).isNullAt(4))
  }

  test("forward direction matches earliest at-or-after right row; tolerance bounds the lead") {
    val trades = Seq((1, 10L, "t1"), (1, 20L, "t2"), (2, 15L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1, 5L, 1.0), (1, 18L, 2.0), (1, 20L, 3.0), (2, 99L, 9.0))
      .toDF("k", "qts", "px")
    val out = AsofJoin(trades, quotes, Seq("k"), "ts", "qts",
      direction = "forward")
      .orderBy("k", "ts")
      .select("k", "ts", "asof_qts", "asof_px").collect()
    out(0).getLong(2) shouldBe 18L // t1@10: earliest quote >= 10
    out(1).getLong(2) shouldBe 20L // t2@20: exact tie matches
    out(2).getLong(2) shouldBe 99L // t3@15 on key 2: the future quote
    val bounded = AsofJoin(trades, quotes, Seq("k"), "ts", "qts",
      direction = "forward", tolerance = Some(10L))
      .orderBy("k", "ts")
      .select("k", "ts", "asof_qts").collect()
    bounded(0).getLong(2) shouldBe 18L // lead 8 <= 10 survives
    assert(bounded(2).isNullAt(2))     // lead 84 > 10 degrades to no-match
    an[IllegalArgumentException] should be thrownBy
      AsofJoin(trades, quotes, Seq("k"), "ts", "qts", direction = "sideways")
  }

  test("left rows and columns all survive; right prefix applied") {
    val l = Seq((1, 10L, "x", 42)).toDF("k", "ts", "payload", "extra")
    val r = Seq((1, 1L, "q")).toDF("k", "rts", "rv")
    val out = AsofJoin(l, r, Seq("k"), "ts", "rts", rightPrefix = "m_")
    out.columns.toSeq shouldBe Seq("k", "ts", "payload", "extra", "m_rts", "m_rv")
    out.count() shouldBe 1
  }

  test("one shuffle: plan has a single exchange on the key") {
    val l = Seq((1, 10L, "x")).toDF("k", "ts", "p")
    val r = Seq((1, 1L, "q")).toDF("k", "rts", "rv")
    val plan = AsofJoin(l, r, Seq("k"), "ts", "rts")
      .queryExecution.executedPlan.toString
    // union feeds ONE window sort; no join operator at all
    plan should not include ("Join")
    (plan.split("Exchange").length - 1) should be <= 2 // hash + local-data parallelize quirks
  }
}
