package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing breakdown of the clustering queries (not part of the
  * driver contract): separates pair-generation cost from the iterative
  * connected-components cost so perf work targets the right stage.
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup: touch the parquet + codegen paths once
    graft.SparkEntry.queries("q_embed_neardup")(spark, sfDir).count()

    val pairsE = time("embed_neardup pairs") {
      val p = graft.SparkEntry.queries("q_embed_neardup")(spark, sfDir)
        .select("id_a", "id_b").persist()
      println(s"  pairs=${p.count()}")
      p
    }
    time("CC on embed pairs") {
      val cc = graft.operators.ConnectedComponents.components(pairsE, "id_a", "id_b")
      println(s"  nodes=${cc.count()}")
    }
    spark.catalog.clearCache()

    val pairsJ = time("jaccard pairs") {
      val p = graft.SparkEntry.queries("q_jaccard_pairs")(spark, sfDir)
        .select("id_a", "id_b").persist()
      println(s"  pairs=${p.count()}")
      p
    }
    time("CC on jaccard pairs") {
      val cc = graft.operators.ConnectedComponents.components(pairsJ, "id_a", "id_b")
      println(s"  nodes=${cc.count()}")
    }
    time("q_embed_clusters full") {
      graft.SparkEntry.queries("q_embed_clusters")(spark, sfDir).count()
    }
    time("q_dedup_clusters full") {
      graft.SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count()
    }
    time("q_curation_pipeline full") {
      graft.SparkEntry.queries("q_curation_pipeline")(spark, sfDir).count()
    }
    spark.stop()
  }
}
