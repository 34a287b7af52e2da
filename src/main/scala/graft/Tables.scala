package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * parquet from it. Reads are plain `spark.read.parquet` so Catalyst gets
  * full pushdown (PushedFilters / ReadSchema pruning) on the scan.
  */
object Tables {
  /** Session configs every graft session needs. `nanosAsLong`: the events
    * table carries TIMESTAMP(NANOS) which Spark's parquet reader otherwise
    * rejects (SPARK-40819 legacy flag) — `events.ts` surfaces as LongType
    * nanoseconds-since-epoch and query code derives seconds from it.
    */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough that a single-task scan is correct. */
  private val dims = Set("region", "nation")

  // The degenerate-scan probe (df.rdd.getNumPartitions) plans the scan on
  // the driver each time; with ~80 queries × several loads each, that adds
  // seconds of pure planning to a suite run. The decision is a property of
  // (session, dir, table) — memoize the loaded frame.
  //
  // CONTRACT: the parquet at a given (dir, name) is immutable for the
  // lifetime of the session — true for the driver's generated testdata
  // (written once per scale factor, never rewritten). A caller that DOES
  // rewrite a path in-session must call [[invalidate]] or the memoized
  // plan (and its degenerate-scan decision) is stale. Entries also pin
  // their session until invalidated — fine for the engine's one-session-
  // per-JVM mains (Verify/Bench/tests), not for a session-churning host.
  private val loadCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Drop memoized loads — all of them, one dir's, or one table's. */
  def invalidate(sfDir: String = null, name: String = null): Unit =
    loadCache.keySet.removeIf { case (_, d, n) =>
      (sfDir == null || d == sfDir) && (name == null || n == name)
    }

  /** The engine-wide convention for `events.ts` is a LongType
    * nanoseconds-since-epoch column (every consumer derives micros/seconds
    * with integer `div`). The driver's generator has emitted the column as
    * both TIMESTAMP(NANOS) (surfaces as LongType under `nanosAsLong`) and
    * plain microsecond TIMESTAMP/TIMESTAMP_NTZ — normalize either to the
    * nanos long here, once, at the scan. The cast to session-TZ timestamp
    * is exact for NTZ data under the required UTC session, and a single
    * projection on the scan costs nothing at any scale.
    */
  private def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions
            .expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    loadCache.computeIfAbsent((spark, sfDir, name), _ => {
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      val df = if (name == "events") normalizeEventsTs(raw) else raw
      if (dims(name)) df
      else {
        // The driver's test parquet is one file with one row group per table,
        // so the scan cannot split: every downstream pipeline would run on a
        // single core. Rebalance only when the scan is degenerate relative to
        // the session's parallelism — on a real multi-file/multi-row-group
        // layout (the 100 TB case) this branch is never taken and plans keep
        // their scan-attached pipelines with no extra exchange.
        val target = spark.sparkContext.defaultParallelism
        if (df.rdd.getNumPartitions < target / 2) df.repartition(target) else df
      }
    })

  /** Register all tables as temp views so spark.sql(...) parity queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
