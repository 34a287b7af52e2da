package graft.streaming

import graft.SparkSpec
import graft.model.ObjectStoreSpec
import graft.operators.IncrementalAgg
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

class MvRefreshStreamSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private val aspec = IncrementalAgg.Spec(
    keys = Seq("k"), sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))

  private def freshSpec(tag: String) = ObjectStoreSpec(
    path = graft.Scratch.fresh(s"graft-mvrs-$tag"),
    database = "graft_tmp", table = s"mvrs_${tag}_${System.nanoTime()}")

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private def drain(srcDir: String, spec: ObjectStoreSpec, ckpt: String): Unit = {
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = MvRefreshStream.start(spark, src, spec, aspec, ckpt,
      Trigger.AvailableNow())
    q.awaitTermination()
  }

  test("streamed refresh equals one-shot aggregation; one version per batch") {
    val srcDir = graft.Scratch.fresh("graft-mvrs-src")
    val all = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0), ("c", -4.0),
      ("b", 0.5), ("c", 9.0)).toDF("k", "v")
    all.repartition(3).write.mode("overwrite").parquet(srcDir)
    val spec = freshSpec("eq")
    drain(srcDir, spec, graft.Scratch.fresh("graft-mvrs") + "/ckpt")
    ObjectStoreSink.snapshots(spec).size shouldBe 3
    canon(ObjectStoreSink.readVersion(spark, spec, None)) shouldBe
      canon(IncrementalAgg.aggregate(all, aspec))
  }

  test("replayed batch is a no-op; out-of-order batch is rejected") {
    val srcDir = graft.Scratch.fresh("graft-mvrs-src2")
    Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
      .repartition(2).write.mode("overwrite").parquet(srcDir)
    val spec = freshSpec("replay")
    val ckpt = graft.Scratch.fresh("graft-mvrs2") + "/ckpt"
    drain(srcDir, spec, ckpt) // appId defaults to the checkpoint path
    ObjectStoreSink.snapshots(spec).size shouldBe 2
    val before = canon(ObjectStoreSink.readVersion(spark, spec, None))
    // crash-replay of the IN-FLIGHT batch (the only legitimate replay):
    // the txn stamp says batch 1 already committed → skip
    MvRefreshStream.applyBatch(spark,
      Seq(("a", 99.0)).toDF("k", "v"), 1, spec, aspec, ckpt)
    ObjectStoreSink.snapshots(spec).size shouldBe 2
    canon(ObjectStoreSink.readVersion(spark, spec, None)) shouldBe before
    // a regressed batch id (checkpoint deleted while the table was kept)
    // is NOT a replay — refuse loudly instead of silently dropping data
    an[IllegalArgumentException] should be thrownBy
      MvRefreshStream.applyBatch(spark,
        Seq(("a", 1.0)).toDF("k", "v"), 0, spec, aspec, ckpt)
    // a batch id from the future means lost state — refuse, don't corrupt
    an[IllegalArgumentException] should be thrownBy
      MvRefreshStream.applyBatch(spark,
        Seq(("a", 1.0)).toDF("k", "v"), 7, spec, aspec, ckpt)
  }

  test("foreign commit on the single-writer table fails loudly, not silently") {
    val srcDir = graft.Scratch.fresh("graft-mvrs-src4")
    Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
      .repartition(2).write.mode("overwrite").parquet(srcDir)
    val spec = freshSpec("foreign")
    val ckpt = graft.Scratch.fresh("graft-mvrs4") + "/ckpt"
    drain(srcDir, spec, ckpt)
    ObjectStoreSink.snapshots(spec).size shouldBe 2
    // a compaction/manual fix-up replaces the table WITHOUT our stamp —
    // before the txn guard this bumped the version count and the next
    // legitimate batch was silently skipped as a phantom replay
    ObjectStoreSink.replaceTable(spark,
      ObjectStoreSink.readVersion(spark, spec, None), spec)
    val ex = the[IllegalStateException] thrownBy
      MvRefreshStream.applyBatch(spark,
        Seq(("c", 3.0)).toDF("k", "v"), 2, spec, aspec, ckpt)
    ex.getMessage should include("single-writer violation")
    // ...and a commit stamped by a DIFFERENT writer id is equally foreign
    ObjectStoreSink.replaceTable(spark,
      ObjectStoreSink.readVersion(spark, spec, None), spec,
      Some(graft.sinks.TableManifest.TxnStamp("other-writer", 2)))
    an[IllegalStateException] should be thrownBy
      MvRefreshStream.applyBatch(spark,
        Seq(("c", 3.0)).toDF("k", "v"), 2, spec, aspec, ckpt)
  }

  test("compaction is invisible to the replay guard: the TxnStamp rides " +
    "through and the next batch applies normally") {
    val srcDir = graft.Scratch.fresh("graft-mvrs-src6")
    val d1 = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0)).toDF("k", "v")
    d1.repartition(2).write.mode("overwrite").parquet(srcDir)
    val spec = freshSpec("compact")
    val ckpt = graft.Scratch.fresh("graft-mvrs6") + "/ckpt"
    drain(srcDir, spec, ckpt) // batches 0 and 1 committed, stamped (ckpt, 1)
    ObjectStoreSink.snapshots(spec).size shouldBe 2
    // maintenance rewrite: content-preserving, carries the stamp through
    graft.operators.Compaction.compact(spark, spec): Unit
    val snaps = ObjectStoreSink.snapshots(spec)
    val stamp = graft.sinks.TableManifest
      .read(java.nio.file.Paths.get(snaps.last.path)).flatMap(_.txn)
    stamp shouldBe Some(graft.sinks.TableManifest.TxnStamp(ckpt, 1L))
    // the next batch applies with NO violation and NO silent skip
    val d2 = Seq(("b", 7.0)).toDF("k", "v")
    MvRefreshStream.applyBatch(spark, d2, 2, spec, aspec, ckpt)
    canon(ObjectStoreSink.readVersion(spark, spec, None)) shouldBe
      canon(IncrementalAgg.aggregate(d1.union(d2), aspec))
  }

  test("adopt() re-arms a bricked stream: explicit recovery from a foreign " +
    "commit without rebuilding the MV or checkpoint") {
    val srcDir = graft.Scratch.fresh("graft-mvrs-src7")
    val d1 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    d1.repartition(2).write.mode("overwrite").parquet(srcDir)
    val spec = freshSpec("adopt")
    val ckpt = graft.Scratch.fresh("graft-mvrs7") + "/ckpt"
    drain(srcDir, spec, ckpt)
    // a manual fix-up commits without our stamp → the stream is bricked
    ObjectStoreSink.replaceTable(spark,
      ObjectStoreSink.readVersion(spark, spec, None), spec)
    an[IllegalStateException] should be thrownBy
      MvRefreshStream.applyBatch(spark,
        Seq(("c", 3.0)).toDF("k", "v"), 2, spec, aspec, ckpt)
    // the operator inspects the table, decides the content is the correct
    // through-batch-1 state, and adopts it — the guard re-arms
    MvRefreshStream.adopt(spark, spec, ckpt, batchId = 1L)
    MvRefreshStream.applyBatch(spark,
      Seq(("c", 3.0)).toDF("k", "v"), 2, spec, aspec, ckpt)
    canon(ObjectStoreSink.readVersion(spark, spec, None)) shouldBe
      canon(IncrementalAgg.aggregate(
        d1.union(Seq(("c", 3.0)).toDF("k", "v")), aspec))
    // adoption is NOT a blanket bypass: a fresh foreign commit bricks again
    ObjectStoreSink.replaceTable(spark,
      ObjectStoreSink.readVersion(spark, spec, None), spec)
    an[IllegalStateException] should be thrownBy
      MvRefreshStream.applyBatch(spark,
        Seq(("d", 4.0)).toDF("k", "v"), 3, spec, aspec, ckpt)
  }

  test("refreshAndRearm: an AvailableNow drain re-arms the MV rewrite seam " +
    "— stale refusal after an in-place base append, snapshot answering " +
    "again after the drain, no manual re-register") {
    graft.GraftExtensions.register(spark)
    // the base versioned table IS the stream source: the file stream reads
    // its live version dir, in-place appends surface as new source files
    val baseSpec = freshSpec("rearmbase")
    val fq = ObjectStoreSink.replaceTable(spark,
      Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v").repartition(2), baseSpec)
    val liveDir = ObjectStoreSink.snapshots(baseSpec).last.path
    def src = spark.readStream
      .schema(spark.read.parquet(liveDir).schema).parquet(liveDir)
    val mvSpec = freshSpec("rearmmv")
    val ckpt = graft.Scratch.fresh("graft-mvrs8") + "/ckpt"
    // first drain builds the snapshot; registration then pins the bases
    val q0 = MvRefreshStream.start(spark, src, mvSpec, aspec, ckpt)
    q0.awaitTermination()
    val defSql = s"SELECT k, CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) " +
      s"AS sv, count(*) AS cnt FROM $fq GROUP BY k"
    graft.plans.MvRewriteRule.register("mv_stream_rearm",
      () => spark.sql(defSql),
      () => ObjectStoreSink.readVersion(spark, mvSpec, None)
        .select(col("k"), col("s_v").cast("double").as("sv"), col("cnt")),
      Seq(baseSpec))
    def roots = spark.sql(defSql).queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq("<non-fs>")
        }
    }.flatten
    try {
      roots.head should include(mvSpec.table)
      // in-place append: same version NUMBER, new files — the file-set
      // signature pin refuses until the stream drains the delta
      Seq(("a", 10.0)).toDF("k", "v").repartition(1)
        .write.mode("append").insertInto(fq)
      ObjectStoreSink.refreshManifest(spark, fq, baseSpec)
      roots.head should include(baseSpec.table)
      // the drain re-arms by itself
      MvRefreshStream.refreshAndRearm(spark, src, mvSpec, aspec, ckpt,
        "mv_stream_rearm")
      roots.head should include(mvSpec.table)
      // exactness: the snapshot-answered query equals the recomputed
      // aggregate over the appended base (cols sorted: cnt|k|sv)
      canon(spark.sql(defSql)) shouldBe Seq("1|b|2.0", "2|a|11.0")
    } finally graft.plans.MvRewriteRule.deregister("mv_stream_rearm")
  }

  test("CMS snapshot column refreshes through the stream: streamed ≡ one-shot sketch") {
    import graft.functions.CmsSketch
    val (w, dep) = (16, 2)
    val cspec = IncrementalAgg.Spec(keys = Seq("k"), sumCols = Nil,
      cmsCols = Seq(IncrementalAgg.CmsCol("slots", w, dep)))
    val srcDir = graft.Scratch.fresh("graft-mvrs-src5")
    val all = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("a", "x"), ("b", "z"))
      .toDF("k", "item")
      .withColumn("slots", CmsSketch.slotsFor(col("item"), w, dep))
      .drop("item")
    all.repartition(2).write.mode("overwrite").parquet(srcDir)
    val spec = freshSpec("cms")
    val ckpt = graft.Scratch.fresh("graft-mvrs5") + "/ckpt"
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = MvRefreshStream.start(spark, src, spec, cspec, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    ObjectStoreSink.snapshots(spec).size shouldBe 2
    canon(ObjectStoreSink.readVersion(spark, spec, None)) shouldBe
      canon(IncrementalAgg.aggregate(all, cspec))
  }

  test("checkpoint restart resumes batch numbering and never double-counts") {
    val srcDir = graft.Scratch.fresh("graft-mvrs-src3")
    val ckpt = graft.Scratch.fresh("graft-mvrs3") + "/ckpt"
    val d1 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    d1.repartition(2).write.mode("overwrite").parquet(srcDir)
    val spec = freshSpec("resume")
    drain(srcDir, spec, ckpt)
    ObjectStoreSink.snapshots(spec).size shouldBe 2
    // more files land; SAME checkpoint → ids continue at 2
    val d2 = Seq(("a", 10.0), ("z", 5.0)).toDF("k", "v")
    d2.repartition(1).write.mode("append").parquet(srcDir)
    drain(srcDir, spec, ckpt)
    ObjectStoreSink.snapshots(spec).size shouldBe 3
    canon(ObjectStoreSink.readVersion(spark, spec, None)) shouldBe
      canon(IncrementalAgg.aggregate(d1.union(d2), aspec))
  }
}
