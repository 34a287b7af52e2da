package graft.plans

import graft.{GraftExtensions, SparkSpec}
import graft.model.ObjectStoreSpec
import graft.sinks.ObjectStoreSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** The metadata-aggregate planner seam: plain SQL COUNT/MIN/MAX over a
  * manifest-committed versioned table must collapse to a LocalRelation
  * (zero scan tasks) with EXACTLY the relational answers — and must refuse
  * (leave the scan in place, still answer correctly) whenever the manifest
  * cannot prove the result.
  */
class MetaAggRuleSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  GraftExtensions.register(spark)

  private def commitTable(tag: String, df: DataFrame): String = {
    val spec = ObjectStoreSpec(path = scratchDir(tag).getAbsolutePath,
      database = s"graft_mar_$tag", table = "t")
    ObjectStoreSink.replaceTable(spark, df, spec)
  }

  private def scansOf(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case r: LogicalRelation => r }

  private def localsOf(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case l: LocalRelation => l }

  private def assertMetaOnly(df: DataFrame): Unit = {
    withClue(s"plan:\n${df.queryExecution.optimizedPlan}\n") {
      scansOf(df) shouldBe empty
      localsOf(df) should not be empty
    }
  }

  private def assertScans(df: DataFrame): Unit =
    withClue(s"plan:\n${df.queryExecution.optimizedPlan}\n") {
      scansOf(df) should not be empty
    }

  test("COUNT(*)/COUNT(col)/MIN/MAX over long, double, and string columns " +
    "collapse to a LocalRelation with the exact relational answers") {
    val df = ss.range(0, 100).toDF("id")
      .withColumn("v", when(col("id") % 4 =!= 0, col("id").cast("double") / 2))
      .withColumn("s", concat(lit("k"), format_string("%03d", col("id"))))
      .repartitionByRange(5, col("id"))
    val fq = commitTable("sql", df)
    val q = spark.sql(s"SELECT count(*) AS n, count(v) AS nv, min(id) AS mn, " +
      s"max(id) AS mx, min(v) AS vmn, max(v) AS vmx, min(s) AS smn, " +
      s"max(s) AS smx FROM $fq")
    assertMetaOnly(q)
    // relational answers computed over the ORIGINAL frame (range-backed —
    // the rule can't touch it), never through the rewritten scan
    q.collect().toSeq shouldBe
      df.agg(count(lit(1)), count(col("v")), min("id"), max("id"),
        min("v"), max("v"), min("s"), max("s")).collect().toSeq
  }

  test("date and timestamp MIN/MAX are answered from the manifest in their " +
    "own stats domains, pre-1970 values included") {
    val df = ss.range(0, 50).toDF("id")
      .withColumn("d", expr("date_add(DATE'1965-06-01', CAST(id * 37 AS INT))"))
      .withColumn("ts", expr("timestamp_micros(-5000000000 + id * 987654321)"))
      .repartitionByRange(4, col("id"))
    val fq = commitTable("tempo", df)
    val q = spark.sql(
      s"SELECT min(d) AS dmn, max(d) AS dmx, min(ts) AS tmn, max(ts) AS tmx FROM $fq")
    assertMetaOnly(q)
    q.collect().toSeq shouldBe
      df.agg(min("d"), max("d"), min("ts"), max("ts")).collect().toSeq
  }

  test("a WHERE clause, grouping, DISTINCT, or an unanswerable aggregate " +
    "refuses the rewrite — the scan stays and answers stay correct") {
    val fq = commitTable("refuse",
      ss.range(0, 60).toDF("id").repartitionByRange(3, col("id")))
    val filtered = spark.sql(s"SELECT count(*) AS n FROM $fq WHERE id > 10")
    assertScans(filtered)
    filtered.head.getLong(0) shouldBe 49L
    val grouped = spark.sql(s"SELECT id % 2 AS g, count(*) FROM $fq GROUP BY 1")
    assertScans(grouped)
    val distinct = spark.sql(s"SELECT count(DISTINCT id) FROM $fq")
    assertScans(distinct)
    distinct.head.getLong(0) shouldBe 60L
    val avg = spark.sql(s"SELECT avg(id) FROM $fq")
    assertScans(avg)
    avg.head.getDouble(0) shouldBe 29.5
  }

  test("a file the manifest does not cover breaks the evidence identity: " +
    "the rewrite refuses and the scan sees the foreign file") {
    val fq = commitTable("foreign",
      ss.range(0, 30).toDF("id").repartitionByRange(3, col("id")))
    // answered from metadata while the file set matches
    assertMetaOnly(spark.sql(s"SELECT count(*) AS n FROM $fq"))
    // drop a foreign parquet file into the committed version dir,
    // bypassing the manifest protocol entirely
    val vdir = java.nio.file.Paths.get(new java.net.URI(
      spark.table(fq).inputFiles.head)).getParent
    Seq(999L).toDF("id").coalesce(1).write.mode("append").parquet(vdir.toString)
    spark.catalog.refreshTable(fq)
    val q = spark.sql(s"SELECT count(*) AS n, max(id) AS mx FROM $fq")
    assertScans(q)
    q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) shouldBe
      Seq((31L, 999L))
  }

  test("decimal columns refuse metadata MIN/MAX (unscaled stats carry no " +
    "sound order proof) while sibling columns still answer") {
    val df = ss.range(0, 40).toDF("id")
      .withColumn("amt", (col("id") - 20).cast("decimal(10,2)") / 4)
      .repartitionByRange(3, col("id"))
    val fq = commitTable("dec", df)
    assertScans(spark.sql(s"SELECT min(amt) FROM $fq"))
    assertMetaOnly(spark.sql(s"SELECT min(id) AS mn, count(*) AS n FROM $fq"))
    // and COUNT(amt) is still answerable: null accounting is domain-free
    assertMetaOnly(spark.sql(s"SELECT count(amt) AS n FROM $fq"))
  }

  test("a non-versioned plain parquet directory (no manifest) is never " +
    "rewritten") {
    val dir = scratchDir("plain").getAbsolutePath + "/plain.parquet"
    ss.range(0, 10).toDF("id").write.mode("overwrite").parquet(dir)
    assertScans(spark.read.parquet(dir).agg(count(lit(1))))
  }
}
