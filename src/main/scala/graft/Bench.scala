package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split("\\s+").filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None        => SparkEntry.queries
    }
    // Warmup pass at the smallest SF: compiles every query's codegen
    // classes and warms the JIT so timed numbers measure the plan, not
    // first-run compilation.
    sys.env.get("SPARK_GRAFT_WARMUP").orElse(Some("/root/testdata/sf0.001"))
      .filter(_ != "off").foreach { wdir =>
        selected.foreach { case (name, fn) =>
          try fn(spark, wdir).count()
          catch { case _: Throwable => }
        }
      }
    val results = selected.map { case (name, fn) =>
      System.err.println(s"[bench] running $name")
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      name -> ((System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
    val total = results.values.collect { case (v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    if (failed.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
