package graft.queries

import java.nio.file.{Files, Paths}

import graft.Tables
import graft.model.ObjectStoreSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The streamed half of the CDC-apply fuzzer (VERDICT r9 #2): where
  * [[OperatorFuzz.sampleCdc]] drives two randomized change batches through
  * chained `CdcApply.applyBatch` calls, this sampler drives them through
  * the REAL [[graft.streaming.CdcStream]] — Debezium envelope files, the
  * checkpointed file-source stream restarted between batches (exactly-once
  * intake across restarts), a PARTITIONED catalog target, and the
  * partition-scoped apply path with partition-MOVING updates (the after
  * image changes the partition column, the before image names the old
  * partition — reference CDCUtil.updateCreateSQL:63-88 before-image
  * keying). The final table must match a purely RELATIONAL replay of the
  * same two batches in DuckDB, which is partition-blind: any stale copy
  * left in a moved-out-of partition, any resurrection via a partition
  * re-sync, any checkpoint replay double-apply shows up as a row diff.
  *
  * Batch layout drawn from the seed (all ranges are fixed absolute keys,
  * so the fixture is bounded by constants, not by SF):
  *   - batch 1: updates+inserts on (a1, h1] that MOVE grp k%4 → (k+1)%4
  *     (after images periodically omit c_name → coalesce-resolve keeps the
  *     old name); deletes of k ≤ a1 with k % p1 = 0 (disjoint key sets —
  *     batch-1 before images are exact by construction);
  *   - batch 2: updates on (a2, a1] (grp unchanged), RE-INSERTS of the
  *     even keys batch 1 deleted, and deletes of k ≤ h1 with k % p2 = 0 —
  *     hitting keys batch 1 moved (before image names the NEW partition),
  *     keys already deleted (no-op, before-image mismatch), and keys that
  *     conflict with batch 2's own upserts (winner drawn by `flip2` via
  *     distinct seqs: 2k + flip vs 2k + 1 - flip, never a tie).
  */
object CdcStreamFuzz {

  def sampleCdcStream(seed: Long): OperatorFuzz.Fuzzed = {
    val rnd = new java.util.Random(seed * 10007L + 31L)
    val T = Seq(600, 800, 1000)(rnd.nextInt(6) % 3)
    val d1 = Seq(25.0, 50.0, 75.0)(rnd.nextInt(3))
    val d2 = Seq(-10.0, 30.0, 60.0)(rnd.nextInt(3))
    val p1 = Seq(83, 97, 101)(rnd.nextInt(3))
    val p2 = Seq(61, 71, 89)(rnd.nextInt(3))
    val a1 = T - 100 - 50 * rnd.nextInt(3)  // batch-1 upsert keys in (a1, h1]
    val h1 = T + 50 + 75 * rnd.nextInt(3)
    val a2 = a1 - 150 - 50 * rnd.nextInt(3) // batch-2 upsert keys in (a2, a1]
    val flip2 = rnd.nextInt(2) // 1 → batch-2 deletes outrank its upserts
    val desc = s"cdcstream T=$T d=($d1,$d2) p=($p1,$p2) " +
      s"b1=($a1,$h1] b2=($a2,$a1] flip2=$flip2"

    val df = (s: SparkSession, d: String) => {
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val target = cust.filter(col("c_custkey") <= T)
        .withColumn("grp", (col("c_custkey") % 4).cast("string"))
      val spec = ObjectStoreSpec(path = graft.Scratch.fresh("graft-cdcfz-lake"),
        database = "graft_opf", table = "cdcfz_t", partitionBy = Seq("grp"),
        writeMode = "overwrite", deleteBeforeWrite = true)
      graft.sinks.ObjectStoreSink.write(s, target, spec)

      // fixture rows, bounded by the FIXED key ranges (≤ max(h1, T) keys
      // at any SF) — a fixture-builder collect, not a data-path one
      import s.implicits._
      val rows = cust.as[(Long, String, Double)]
        .filter(t => t._1 <= math.max(h1.toLong, T.toLong))
        .collect().sortBy(_._1)

      def jstr(v: String): String = "\"" + v.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      def obj(m: Seq[(String, String)]): String =
        if (m.isEmpty) "null"
        else m.map { case (k, v) => jstr(k) + ": " + jstr(v) }
          .mkString("{", ", ", "}")
      def env(op: String, before: Seq[(String, String)],
          after: Seq[(String, String)], seq: Long): String =
        s"""{"payload": {"op": ${jstr(op)}, "before": ${obj(before)}, """ +
          s""""after": ${obj(after)}, "source": {"db": "tpch", "schema": """ +
          s""""public", "table": "customer"}, "ts_ms": $seq}}"""

      val b1 = rows.flatMap { case (k, n, b) =>
        val up =
          if (k > a1 && k <= h1)
            Some(env(if (k > T) "c" else "u",
              before = if (k <= T)
                Seq("c_custkey" -> k.toString, "grp" -> (k % 4).toString)
              else Nil,
              after = Seq("c_custkey" -> k.toString,
                "c_acctbal" -> (b + d1).toString,
                "grp" -> ((k + 1) % 4).toString) ++
                (if (k % 11 == 0) Nil else Seq("c_name" -> n)),
              seq = 2 * k))
          else None
        val del =
          if (k <= a1 && k % p1 == 0)
            Some(env("d",
              Seq("c_custkey" -> k.toString, "grp" -> (k % 4).toString),
              Nil, seq = 2 * k + 1))
          else None
        up.toSeq ++ del
      }
      val b2 = rows.flatMap { case (k, n, b) =>
        val resurrectKey = k <= a1 && k % p1 == 0 && k % 2 == 0
        val up =
          if (k > a2 && k <= a1 && !resurrectKey)
            Some(env("u",
              before = Seq("c_custkey" -> k.toString, "grp" -> (k % 4).toString),
              after = Seq("c_custkey" -> k.toString,
                "c_acctbal" -> (b + d2).toString, "grp" -> (k % 4).toString) ++
                (if (k % 13 == 0) Nil else Seq("c_name" -> n)),
              seq = 2 * k + (1 - flip2)))
          else None
        val res =
          if (resurrectKey)
            Some(env("c", Nil,
              Seq("c_custkey" -> k.toString, "c_name" -> n,
                "c_acctbal" -> (b + d2).toString, "grp" -> (k % 4).toString),
              seq = 2 * k + (1 - flip2)))
          else None
        val del =
          if (k <= h1 && k % p2 == 0)
            Some(env("d",
              Seq("c_custkey" -> k.toString,
                "grp" -> (if (k > a1 && k <= h1) (k + 1) % 4 else k % 4).toString),
              Nil, seq = 2 * k + flip2))
          else None
        up.toSeq ++ res ++ del
      }

      val inDir = Paths.get(graft.Scratch.fresh("graft-cdcfz-in"))
      val ckpt = graft.Scratch.fresh("graft-cdcfz-ckpt")
      Files.writeString(inDir.resolve("b1.jsonl"), b1.mkString("\n"))
      graft.streaming.CdcStream
        .start(s, inDir.toString, spec, Seq("c_custkey"), ckpt)
        .awaitTermination()
      Files.writeString(inDir.resolve("b2.jsonl"), b2.mkString("\n"))
      graft.streaming.CdcStream
        .start(s, inDir.toString, spec, Seq("c_custkey"), ckpt)
        .awaitTermination()
      s.table("graft_opf.cdcfz_t")
        // partition-column type inference reads "0".."3" dirs back as int;
        // pin the declared string type so the schema matches the oracle
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("grp").cast("string").as("grp"))
        .orderBy("c_custkey")
    }

    val sql =
      s"""WITH s0 AS (SELECT c_custkey AS k, c_name AS n, c_acctbal AS b,
         |                   CAST(c_custkey % 4 AS VARCHAR) AS g
         |            FROM customer WHERE c_custkey <= $T),
         |b1 AS (
         |  SELECT c_custkey AS k, FALSE AS isdel,
         |         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_name END AS n,
         |         c_acctbal + $d1 AS b,
         |         CAST((c_custkey + 1) % 4 AS VARCHAR) AS g,
         |         2*c_custkey AS seq
         |  FROM customer WHERE c_custkey > $a1 AND c_custkey <= $h1
         |  UNION ALL
         |  SELECT c_custkey, TRUE, NULL, NULL, NULL, 2*c_custkey + 1
         |  FROM customer WHERE c_custkey <= $a1 AND c_custkey % $p1 = 0),
         |b1w AS (
         |  SELECT k, isdel, n, b, g FROM (
         |    SELECT b1.*, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |    FROM b1) z WHERE rn = 1),
         |s1 AS (
         |  SELECT COALESCE(u.k, t.k) AS k, COALESCE(u.n, t.n) AS n,
         |         COALESCE(u.b, t.b) AS b, COALESCE(u.g, t.g) AS g
         |  FROM s0 t FULL JOIN (SELECT * FROM b1w WHERE NOT isdel) u ON t.k = u.k
         |  WHERE COALESCE(u.k, t.k) NOT IN (SELECT k FROM b1w WHERE isdel)),
         |b2 AS (
         |  SELECT c_custkey AS k, FALSE AS isdel,
         |         CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_name END AS n,
         |         c_acctbal + $d2 AS b, CAST(c_custkey % 4 AS VARCHAR) AS g,
         |         2*c_custkey + ${1 - flip2} AS seq
         |  FROM customer WHERE c_custkey > $a2 AND c_custkey <= $a1
         |    AND NOT (c_custkey % $p1 = 0 AND c_custkey % 2 = 0)
         |  UNION ALL
         |  SELECT c_custkey, FALSE, c_name, c_acctbal + $d2,
         |         CAST(c_custkey % 4 AS VARCHAR), 2*c_custkey + ${1 - flip2}
         |  FROM customer
         |  WHERE c_custkey <= $a1 AND c_custkey % $p1 = 0 AND c_custkey % 2 = 0
         |  UNION ALL
         |  SELECT c_custkey, TRUE, NULL, NULL, NULL, 2*c_custkey + $flip2
         |  FROM customer WHERE c_custkey <= $h1 AND c_custkey % $p2 = 0),
         |b2w AS (
         |  SELECT k, isdel, n, b, g FROM (
         |    SELECT b2.*, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
         |    FROM b2) z WHERE rn = 1),
         |s2 AS (
         |  SELECT COALESCE(u.k, t.k) AS k, COALESCE(u.n, t.n) AS n,
         |         COALESCE(u.b, t.b) AS b, COALESCE(u.g, t.g) AS g
         |  FROM s1 t FULL JOIN (SELECT * FROM b2w WHERE NOT isdel) u ON t.k = u.k
         |  WHERE COALESCE(u.k, t.k) NOT IN (SELECT k FROM b2w WHERE isdel))
         |SELECT k AS c_custkey, n AS c_name, b AS c_acctbal, g AS grp
         |FROM s2 ORDER BY c_custkey""".stripMargin
    OperatorFuzz.Fuzzed(desc, df, sql)
  }
}
