package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("chain needs multi-hop propagation; separate components stay separate") {
    // 1-2-3-4-5 chain (diameter 4 → several rounds) + a 10-11 pair
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (11L, 10L))
      .toDF("id_a", "id_b")
    val comps = ConnectedComponents.components(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    comps shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L)
  }

  test("string ids, self-loops, and duplicate edges are handled") {
    val edges = Seq(("b", "a"), ("b", "a"), ("c", "c"), ("c", "b"))
      .toDF("x", "y")
    val comps = ConnectedComponents.components(edges, "x", "y")
      .as[(String, String)].collect().toMap
    comps shouldBe Map("a" -> "a", "b" -> "a", "c" -> "a")
  }

  test("iterative fallback (localBound=0) agrees with the single-task path") {
    // chains + stars + isolated pair, enough to need real propagation
    val edges = ((1L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 200L), (100L, 300L), (100L, 400L), (500L, 501L)))
      .toDF("id_a", "id_b")
    val fast = ConnectedComponents.components(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val iter = ConnectedComponents
      .components(edges, "id_a", "id_b", localBound = 0)
      .as[(Long, Long)].collect().toMap
    iter shouldBe fast
    fast.filter(_._1 <= 40L).values.toSet shouldBe Set(1L)
    fast(400L) shouldBe 100L
    fast(501L) shouldBe 500L
  }

  test("randomized graphs: both paths match a local union-find reference") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 300
      val edges = Seq.fill(400)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val df = edges.toDF("id_a", "id_b")

      // in-memory reference: textbook union-find with min representative
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val ref = parent.keys.map(k => k -> find(k)).toMap

      val fast = ConnectedComponents.components(df, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val iter = ConnectedComponents
        .components(df, "id_a", "id_b", localBound = 0)
        .as[(Long, Long)].collect().toMap
      withClue(s"seed=$seed fast: ") { fast shouldBe ref }
      withClue(s"seed=$seed iter: ") { iter shouldBe ref }
    }
  }

  test("non-convergence within maxIters fails loudly (iterative path)") {
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    an[IllegalStateException] should be thrownBy
      ConnectedComponents.components(chain, "id_a", "id_b", maxIters = 2,
        localBound = 0)
    // enough rounds → converges
    ConnectedComponents.components(chain, "id_a", "id_b", localBound = 0)
      .as[(Long, Long)].collect().toMap.values.toSet shouldBe Set(1L)
  }
}
