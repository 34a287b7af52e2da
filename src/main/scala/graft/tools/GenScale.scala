package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress data generator: grows the sf0.1 `documents` and
  * `embeddings` tables by an integer factor via duplicate-and-reseed, for
  * probing the dedup and ANN families' growth curves ABOVE the driver's
  * largest SF (the candidate-pair blowup a 17 MB bench cannot see).
  *
  * Reseed contracts — both make the TRUE workload exactly linear in the
  * factor, so measured superlinearity is plan pathology, not data artifact:
  *   - documents: copy `c` suffixes every whitespace token with `_c<c>`,
  *     making each copy's shingle vocabulary DISJOINT from every other
  *     copy's — cross-copy near-dups are impossible, while intra-copy
  *     near-dup structure matches sf0.1 byte-for-byte.
  *   - embeddings: copy `c` multiplies each dimension by a copy-specific
  *     ±1 sign pattern. A diagonal ±1 matrix is an ISOMETRY applied to the
  *     whole copy — every intra-copy dot product (hence cosine, norm,
  *     neighbor ranking) is preserved EXACTLY, ±1 multiplication being
  *     exact in float — while cross-copy dot products decorrelate to ~0
  *     (about half the terms flip sign), so copies contribute no cross
  *     near-neighbors above any real threshold. The fixed query set
  *     (vec_id < 8) lives in copy 0 unchanged.
  *   - lineitem / orders / customer (relational facts): copy `c` shifts
  *     every key participating in an FK chain by the same `c * 1e8` offset
  *     on BOTH sides (l_orderkey = o_orderkey, o_custkey = c_custkey), so
  *     join matches stay strictly within-copy — join output, semi/anti hit
  *     rates, and MERGE overlap all scale exactly linearly in the factor.
  *     Non-key attributes (dates, prices, flags) are untouched, so every
  *     filter keeps its selectivity and every group-by keeps its key
  *     domain. Dimension tables (nation/region/supplier/part) stay fixed
  *     and symlinked — the realistic 100 TB shape (facts grow, dims
  *     don't) — so dim broadcast-ability is preserved and the l_suppkey /
  *     c_nationkey fans grow linearly.
  *   - events: copy `c` shifts `user_id` and `event_id` by `c * 1e8`;
  *     timestamps are untouched. Every events operator (sessionize,
  *     funnel, retention, as-of, range join) is user-keyed, so sessions,
  *     funnels, and as-of/range matches stay strictly within-copy — true
  *     workload exactly linear — while per-user event-time structure
  *     matches sf0.1 byte-for-byte. Time-bucketed group-bys (hourly)
  *     keep a constant bucket domain with k× rows per bucket.
  *
  * Other tables are symlinked from the base dir. Output:
  * `<outRoot>/x<factor>/...` usable as a SPARK_GRAFT_SF_DIR.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE", "/root/testdata/sf0.1")
    val outRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "target/scale")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "3,10")
      .split(",").map(_.trim.toInt).filter(_ >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // copy-specific ±1 sign pattern; c=0 stays the identity
    def signs(c: Int): Array[Float] =
      Array.tabulate(dim)(d =>
        if (((c * 0x9E3779B9L + d * 0x85EBCA6BL) >> 7 & 1) == 1) -1f else 1f)
    val lineitem = spark.read.parquet(s"$base/lineitem.parquet")
    val orders = spark.read.parquet(s"$base/orders.parquet")
    val customer = spark.read.parquet(s"$base/customer.parquet")
    val events = spark.read.parquet(s"$base/events.parquet")
    val keyOff = 100000000L // far above any sf key (max ~150k at sf0.1)
    factors.foreach { k =>
      val out = Paths.get(outRoot, s"x$k")
      Files.createDirectories(out)
      def grown(src: org.apache.spark.sql.DataFrame)(
          copy: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame) =
        (0 until k).map(c => if (c == 0) src else copy(src, c))
          .reduce(_ unionByName _)
      val scaled: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "documents" -> grown(docs) { (d, c) =>
          d.select(
            (col("doc_id") + c * 10000000L).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1_c$c").as("text"),
            col("lang"), col("source"), col("n_chars"))
        },
        "embeddings" -> grown(emb) { (d, c) =>
          d.select(
            (col("vec_id") + c * 10000000L).as("vec_id"),
            zip_with(col("embedding"), lit(signs(c)), (x, s) => x * s)
              .as("embedding"),
            col("label"))
        },
        "lineitem" -> grown(lineitem) { (d, c) =>
          d.withColumn("l_orderkey", col("l_orderkey") + c * keyOff)
        },
        "orders" -> grown(orders) { (d, c) =>
          d.withColumn("o_orderkey", col("o_orderkey") + c * keyOff)
            .withColumn("o_custkey", col("o_custkey") + c * keyOff)
        },
        "customer" -> grown(customer) { (d, c) =>
          d.withColumn("c_custkey", col("c_custkey") + c * keyOff)
        },
        "events" -> grown(events) { (d, c) =>
          d.withColumn("user_id", col("user_id") + c * keyOff)
            .withColumn("event_id", col("event_id") + c * keyOff)
        })
      // multi-file layout: the scan splits natively, no degenerate-scan
      // rebalance — the shape a real lake would have. Never write THROUGH
      // a stale symlink from an earlier run (the target is the read-only
      // base dir): unlink first.
      scaled.foreach { case (n, df) =>
        val p = out.resolve(s"$n.parquet")
        if (Files.isSymbolicLink(p)) Files.delete(p)
        df.repartition(cpus.toInt).write.mode("overwrite").parquet(p.toString)
      }
      graft.Tables.names.filterNot(scaled.map(_._1).toSet).foreach { n =>
        val link = out.resolve(s"$n.parquet")
        Files.deleteIfExists(link)
        Files.createSymbolicLink(link, Paths.get(base, s"$n.parquet")): Unit
      }
      val counts = Seq("documents", "lineitem")
        .map(n => s"$n=${spark.read.parquet(out.resolve(s"$n.parquet").toString).count()}")
      println(s"x$k: ${counts.mkString(", ")} -> $out")
    }
    spark.stop()
  }
}
