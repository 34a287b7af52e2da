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
  * Usage: FuzzDump <sfDir> <outDir> [nSamples=200] [seedBase=1] [gen=v1..v8]
  */
object FuzzDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val n = if (args.length > 2) args(2).toInt else 200
    val seedBase = if (args.length > 3) args(3).toLong else 1L
    val gen: Long => FuzzSql.Fuzzed = args.lift(4) match {
      case Some("v2") => FuzzSql.sampleV2
      case Some("v3") => FuzzSql.sampleV3
      case Some("v4") => FuzzSql.sampleV4
      case Some("v5") => FuzzSql.sampleV5
      case Some("v6") => FuzzSql.sampleV6
      case Some("v7") => FuzzSql.sampleV7
      case Some("v8") => FuzzSql.sampleV8
      case _          => FuzzSql.sample
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
