package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

class IncrementalAggSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private val spec = IncrementalAgg.Spec(
    keys = Seq("k"), sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("advance over any split equals one-shot aggregation") {
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", -1.0), ("c", 7.5))
      .toDF("k", "v")
    val oneShot = IncrementalAgg.aggregate(base, spec)
    for (cut <- Seq("a", "b")) {
      val snap = IncrementalAgg.aggregate(base.filter(col("k") <= cut), spec)
      val delta = base.filter(col("k") > cut)
      canon(IncrementalAgg.advance(snap, delta, spec)) shouldBe canon(oneShot)
    }
  }

  test("multi-batch refresh is associative: (s+d1)+d2 == aggregate(all)") {
    val d0 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val d1 = Seq(("a", 5.0), ("c", 1.5)).toDF("k", "v")
    val d2 = Seq(("b", -3.0), ("c", 0.5), ("d", 9.0)).toDF("k", "v")
    val s0 = IncrementalAgg.aggregate(d0, spec)
    val s2 = IncrementalAgg.advance(IncrementalAgg.advance(s0, d1, spec), d2, spec)
    canon(s2) shouldBe canon(IncrementalAgg.aggregate(d0.union(d1).union(d2), spec))
  }

  test("delta-only keys appear; empty delta is a no-op; mins/maxes survive one-sided merges") {
    val s0 = IncrementalAgg.aggregate(Seq(("a", 4.0)).toDF("k", "v"), spec)
    val grown = IncrementalAgg.advance(s0, Seq(("z", -2.0)).toDF("k", "v"), spec)
    val rows = grown.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getAs[java.math.BigDecimal](2).doubleValue())).toMap
    rows("a")._1 shouldBe 1L
    rows("z") shouldBe ((1L, -2.0))
    val unchanged = IncrementalAgg.advance(grown,
      Seq.empty[(String, Double)].toDF("k", "v"), spec)
    canon(unchanged) shouldBe canon(grown)
  }

  test("NULL group keys merge null-safely: advance == one-shot with NULL groups") {
    // groupBy treats NULL as a real group; a null-unsafe merge join would
    // carry a duplicate NULL-key row forever instead of folding the states
    val base = Seq(("a", 1.0), (null, 2.0), ("b", 3.0), (null, 5.0), ("a", 0.5))
      .toDF("k", "v")
    val snap = IncrementalAgg.aggregate(base.filter(col("v") < 2.5), spec)
    val delta = base.filter(col("v") >= 2.5)
    val advanced = IncrementalAgg.advance(snap, delta, spec)
    advanced.count() shouldBe 3L // a, b, NULL — exactly one row per group
    canon(advanced) shouldBe canon(IncrementalAgg.aggregate(base, spec))
  }

  test("CMS state column: incremental advance equals the one-shot sketch bit-exactly") {
    import graft.functions.CmsSketch
    val (w, dep) = (32, 3)
    val cspec = IncrementalAgg.Spec(keys = Seq("k"), sumCols = Nil,
      cmsCols = Seq(IncrementalAgg.CmsCol("slots", w, dep)))
    val rows = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("a", "x"),
      ("b", "z"), ("c", "q")).toDF("k", "item")
      .withColumn("slots", CmsSketch.slotsFor(col("item"), w, dep))
    val oneShot = IncrementalAgg.aggregate(rows, cspec)
    // split so group c is delta-only and group b is snapshot-only heavy
    val snap = IncrementalAgg.aggregate(rows.filter(col("item") =!= "q"), cspec)
    val delta = rows.filter(col("item") === "q")
    canon(IncrementalAgg.advance(snap, delta, cspec)) shouldBe canon(oneShot)
    // the merged sketch still answers point estimates: row sums == group cnt
    val sk = oneShot.filter(col("k") === "a").head().getSeq[Long](2)
    for (j <- 0 until dep) sk.slice(j * w, (j + 1) * w).sum shouldBe 3L
  }

  test("KMV state column: incremental advance equals the one-shot sketch bit-exactly") {
    val k = 4
    val kspec = IncrementalAgg.Spec(keys = Seq("k"), sumCols = Nil,
      kmvCols = Seq(IncrementalAgg.KmvCol("h", k)))
    // hashes drawn with collisions across the split (distinct-union) and
    // more than k per group (bounded truncation), plus a delta-only group
    val rows = Seq(("a", 9L), ("a", 3L), ("a", 7L), ("b", 5L), ("a", 1L),
      ("a", 3L), ("b", 8L), ("a", 12L), ("a", 2L), ("c", 4L))
      .zipWithIndex.map { case ((g, h), i) => (g, h, i.toLong) }
      .toDF("k", "h", "i")
    val oneShot = IncrementalAgg.aggregate(rows, kspec)
    for (cut <- Seq(3, 6, 9)) {
      val snap = IncrementalAgg.aggregate(rows.filter(col("i") < cut), kspec)
      val delta = rows.filter(col("i") >= cut)
      canon(IncrementalAgg.advance(snap, delta, kspec)) shouldBe canon(oneShot)
    }
    // the sketch itself: group a has 7 distinct hashes, keeps the 4 smallest
    oneShot.filter(col("k") === "a").head().getSeq[Long](2) shouldBe
      Seq(1L, 2L, 3L, 7L)
  }

  test("sample state column: incremental advance equals the one-shot " +
    "bottom-k sample bit-exactly") {
    val k = 3
    val sspec = IncrementalAgg.Spec(keys = Seq("k"), sumCols = Nil,
      sampleCols = Seq(IncrementalAgg.SampleCol("h", "v", k)))
    // duplicate (h, v) pairs across the split (distinct-union), same hash
    // with different payloads (lexicographic tie-break), > k per group
    // (bounded truncation), a NULL payload (skipped), a delta-only group
    val rows = Seq(
      ("a", 9L, Some(1.5)), ("a", 3L, Some(2.0)), ("a", 7L, Some(0.5)),
      ("b", 5L, Some(4.0)), ("a", 1L, None), ("a", 3L, Some(2.0)),
      ("a", 3L, Some(1.0)), ("b", 8L, Some(6.0)), ("a", 12L, Some(9.0)),
      ("c", 4L, Some(7.0)))
      .zipWithIndex.map { case ((g, h, v), i) => (g, h, v, i.toLong) }
      .toDF("k", "h", "v", "i")
    val oneShot = IncrementalAgg.aggregate(rows, sspec)
    for (cut <- Seq(3, 6, 9)) {
      val snap = IncrementalAgg.aggregate(rows.filter(col("i") < cut), sspec)
      val delta = rows.filter(col("i") >= cut)
      canon(IncrementalAgg.advance(snap, delta, sspec)) shouldBe canon(oneShot)
    }
    // group a: null payload at h=1 skipped; distinct pairs sorted (h, v)
    // are (3,1.0),(3,2.0),(7,0.5),(9,1.5),(12,9.0) → bottom-3 kept
    oneShot.filter(col("k") === "a").head().getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getLong(0), r.getDouble(1))) shouldBe
      Seq((3L, 1.0), (3L, 2.0), (7L, 0.5))
  }

  test("merge rejects a state relation whose schema doesn't match the spec") {
    val good = IncrementalAgg.aggregate(Seq(("a", 1.0)).toDF("k", "v"), spec)
    val bad = good.withColumnRenamed("cnt", "n")
    an[IllegalArgumentException] should be thrownBy
      IncrementalAgg.merge(good, bad, spec)
  }

  // ------------------------------------------------ merge-order invariance

  private val MergeOrderCases =
    sys.props.get("incAggMergeOrder").map(_.toInt).getOrElse(200)

  test(s"$MergeOrderCases scalacheck cases: folding merge over ANY k-way " +
    "split in ANY association/commutation order is bit-identical to the " +
    "one-shot aggregate (sum+min+max+cms+kmv+sample states, NULL keys " +
    "and inputs)") {
    // the commutative+associative claim at IncrementalAgg.merge — with CMS
    // and KMV sketch states in the snapshot (VERDICT r9 #6), order
    // invariance is what makes "advance == aggregate(base ∪ delta)" hold
    // for EVERY refresh history, not just the one split the equivalence
    // tests fix. scalacheck generators, deterministic seeds — no flaky
    // reruns.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.functions.{conv, md5, substring}

    val pspec = IncrementalAgg.Spec(keys = Seq("k"), sumCols = Seq("v"),
      minCols = Seq("v"), maxCols = Seq("v"),
      cmsCols = Seq(IncrementalAgg.CmsCol("slots", 16, 2)),
      kmvCols = Seq(IncrementalAgg.KmvCol("h", 4)),
      sampleCols = Seq(IncrementalAgg.SampleCol("h", "v", 4)))
    def withStates(df: DataFrame): DataFrame = df
      .withColumn("slots", graft.functions.CmsSketch.slotsFor(col("item"), 16, 2))
      .withColumn("h", conv(substring(md5(col("item")), 1, 15), 16, 10).cast("long"))
      .drop("item")

    val genRow: Gen[(Option[String], Option[Double], Option[String])] = for {
      k <- Gen.oneOf(Some("a"), Some("b"), Some("c"), None)
      v <- Gen.frequency(4 -> Gen.chooseNum(-400, 400).map(n => Some(n / 4.0)),
        1 -> Gen.const(None))
      item <- Gen.frequency(7 -> Gen.chooseNum(0, 9).map(i => Some(s"t$i")),
        1 -> Gen.const(None))
    } yield (k, v, item)
    val genCase = for {
      rows <- Gen.chooseNum(4, 24).flatMap(n => Gen.listOfN(n, genRow))
      m <- Gen.chooseNum(2, 5) // k-way split
      assign <- Gen.listOfN(rows.size, Gen.chooseNum(0, m - 1))
      picks <- Gen.infiniteLazyList(Gen.chooseNum(0, 1000)) // fold order draws
    } yield (rows, m, assign, picks.take(2 * m).toList)

    def foldTree(chunks: Seq[DataFrame], picks: Seq[Int]): DataFrame = {
      // repeatedly merge two drawn elements — random association AND
      // argument order (commutation) in one walk
      var pool = chunks.toVector
      var i = 0
      while (pool.size > 1) {
        val a = picks(i % picks.size) % pool.size
        val bRaw = picks((i + 1) % picks.size) % (pool.size - 1)
        val b = if (bRaw >= a) bRaw + 1 else bRaw
        val merged = IncrementalAgg.merge(pool(a), pool(b), pspec)
        pool = pool.zipWithIndex.collect {
          case (df, j) if j != a && j != b => df
        } :+ merged
        i += 2
      }
      pool.head
    }

    for (case_ <- 0 until MergeOrderCases) {
      val (rows, m, assign, picks) =
        genCase.apply(Gen.Parameters.default, Seed(case_.toLong))
          .getOrElse(fail(s"generator gave up at case $case_"))
      val df = withStates(rows.toDF("k", "v", "item"))
      val oneShot = canon(IncrementalAgg.aggregate(df, pspec))
      val chunks = (0 until m).map { c =>
        val ids = assign.zipWithIndex.collect { case (`c`, i) => i }.toSet
        val part = rows.zipWithIndex.collect { case (r, i) if ids(i) => r }
        IncrementalAgg.aggregate(withStates(part.toDF("k", "v", "item")), pspec)
      }
      // two different association/commutation orders over the same chunks
      val order1 = canon(foldTree(chunks, picks))
      val order2 = canon(foldTree(chunks, picks.reverse))
      withClue(s"case=$case_ m=$m rows=$rows assign=$assign picks=$picks\n") {
        order1 shouldBe oneShot
        order2 shouldBe oneShot
      }
    }
  }
}
