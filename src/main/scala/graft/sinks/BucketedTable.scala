package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-location trick for tables that are
  * joined/aggregated repeatedly on the same key: pay the shuffle ONCE at
  * write time (`bucketBy` hash-partitions rows into a fixed bucket count,
  * `sortBy` pre-sorts within each bucket), and every later equi-join or
  * aggregation on the bucket key plans WITHOUT an Exchange — Spark's scan
  * reports the bucket hash partitioning and Catalyst elides the shuffle
  * (and with sorted buckets, the sort) on both sides of a co-bucketed
  * join. At 100 TB this converts every fact⋈feature join from a full
  * two-sided shuffle into a zip of pre-aligned buckets.
  *
  * Scope: bucketing rides Spark's `saveAsTable` metadata, which is
  * incompatible with the versioned-directory swap `ObjectStoreSink` uses
  * for mutable tables (a `save(path)` cannot produce bucket metadata). Use
  * this for STABLE layouts — dimension snapshots, feature tables, dedup
  * indexes — rewritten wholesale, not merged into. Pick a bucket count
  * once per key domain and reuse it everywhere: only equal bucket counts
  * co-locate.
  */
object BucketedTable {

  /** Write `df` as a bucketed (optionally bucket-sorted) external table at
    * `path`. Overwrites any existing table of the same name.
    */
  def write(spark: SparkSession, df: DataFrame, database: String,
      table: String, path: String, bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil): String = {
    require(bucketCols.nonEmpty, "bucketed table needs bucket columns")
    require(nBuckets > 0, "bucketed table needs nBuckets > 0")
    val fq = s"$database.$table"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    val w0 = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*)
      else w0
    w.saveAsTable(fq)
    fq
  }
}
