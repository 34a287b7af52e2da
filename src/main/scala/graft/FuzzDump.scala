package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.queries.FuzzSql

/** Bulk cross-engine differential dump (VERDICT r7 #3): materializes N
  * seeded [[FuzzSql]] samples — Spark result parquet + the SQL text — in
  * the same layout `graft.Verify` uses, so `tools/fuzz_check.py` can run
  * every sample's SQL in DuckDB and value-compare. This is the wide
  * cross-engine sweep; the 12 `q_fuzz_*` gate entries are the committed
  * always-on subset.
  *
  * Usage: FuzzDump <sfDir> <outDir> [nSamples=200] [seedBase=1]
  *        [gen=v1..v8|asof|incagg|cdc|cdcstream]
  *
  * `asof`/`incagg`/`cdc`/`cdcstream` dispatch the OPERATOR-layer
  * generators ([[graft.queries.OperatorFuzz]] /
  * [[graft.queries.CdcStreamFuzz]]) through the same cross-engine sweep:
  * randomized AsofJoin instances against DuckDB's native ASOF JOIN,
  * randomized IncrementalAgg specs against full recomputation, and
  * randomized two-batch CDC op sequences (chained batch apply / the real
  * checkpointed CdcStream against a partitioned target) against a
  * relational replay of the same ops.
  */
object FuzzDump {

  /** Uniform shape over the SQL-fuzzer and operator-fuzzer samples. */
  private final case class Dumpable(seed: Long, sql: String,
      df: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame,
      describe: String)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val n = if (args.length > 2) args(2).toInt else 200
    val seedBase = if (args.length > 3) args(3).toLong else 1L
    def wrap(f: FuzzSql.Fuzzed): Dumpable =
      Dumpable(f.seed, f.sql, f.df, f.describe)
    val gen: Long => Dumpable = args.lift(4) match {
      case Some("v2")     => s => wrap(FuzzSql.sampleV2(s))
      case Some("v3")     => s => wrap(FuzzSql.sampleV3(s))
      case Some("v4")     => s => wrap(FuzzSql.sampleV4(s))
      case Some("v5")     => s => wrap(FuzzSql.sampleV5(s))
      case Some("v6")     => s => wrap(FuzzSql.sampleV6(s))
      case Some("v7")     => s => wrap(FuzzSql.sampleV7(s))
      case Some("v8")     => s => wrap(FuzzSql.sampleV8(s))
      case Some("asof")   => s => {
        val f = graft.queries.OperatorFuzz.sampleAsof(s)
        Dumpable(s, f.sql, f.df, f.desc)
      }
      case Some("incagg") => s => {
        val f = graft.queries.OperatorFuzz.sampleIncAgg(s)
        Dumpable(s, f.sql, f.df, f.desc)
      }
      case Some("cdc") => s => {
        val f = graft.queries.OperatorFuzz.sampleCdc(s)
        Dumpable(s, f.sql, f.df, f.desc)
      }
      case Some("cdcstream") => s => {
        val f = graft.queries.CdcStreamFuzz.sampleCdcStream(s)
        Dumpable(s, f.sql, f.df, f.desc)
      }
      case _              => s => wrap(FuzzSql.sample(s))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val samples = (seedBase until seedBase + n).map(gen)
    samples.foreach { smp =>
      try {
        val path = s"$outDir/fuzz_${smp.seed}"
        smp.df(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(path)
        val rows = spark.read.parquet(path).count()
        System.err.println(s"[fuzz] seed ${smp.seed} rows=$rows ${smp.describe}")
      } catch { case e: Throwable =>
        System.err.println(s"[fuzz] seed ${smp.seed} failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = samples
      .map(s => s"${q(s"fuzz_${s.seed}")}: ${q(s.sql)}").mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
