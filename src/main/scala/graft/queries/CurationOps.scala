package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.model.ObjectStoreSpec
import graft.operators.{Compaction, DatasetSplit}
import graft.sinks.ObjectStoreSink

/** Training-data curation operators past dedup: deterministic dataset
  * splits, per-domain quota sampling, PII scrubbing, eval-set
  * decontamination, KMV cardinality sketching, and small-file compaction —
  * each DuckDB-oracled end to end.
  *
  * Shared conventions: the engine-wide md5-prefix hash contract (both
  * engines compute identical 60-bit hashes), no raw double aggregation,
  * total ORDER BY everywhere.
  */
object CurationOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** 60-bit hash of a string — the engine-wide md5-prefix convention. */
  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
  private def hash60Sql(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT)"

  // ---- 8-gram shingles (decontamination wants long n-grams: a match means
  // a verbatim 8-token passage is shared, the standard eval-overlap test —
  // 3-grams would flag benign phrase reuse). Built with shifted slices +
  // zip_with like Dedup.docTokens (HOF lambdas re-evaluate expressions per
  // element, so the regex split must be referenced a constant number of
  // times per row, not once per gram).
  private val GramN = 8
  private def grams8(s: SparkSession, d: String): DataFrame = {
    val ta = split(trim(col("text")), "\\s+")
    val n = size(ta)
    val parts = (1 to GramN).map(j => slice(ta, lit(j), n - lit(GramN - 1)))
    val joined = parts.reduceLeft((acc, p) =>
      zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
    val grams = when(n >= GramN, array_distinct(joined))
      .otherwise(array().cast("array<string>"))
    t(s, d, "documents")
      .select(col("doc_id"), explode(grams).as("gram"))
      .select(col("doc_id"), hash60(col("gram")).as("gh"))
  }

  private val grams8Sql: String =
    s"""SELECT doc_id, ${hash60Sql("gram")} AS gh FROM (
       |  SELECT doc_id, UNNEST(list_distinct(list_transform(
       |    range(1, greatest(length(ta) - ${GramN - 2}, 1)),
       |    i -> ${(0 until GramN).map(o => s"ta[i+$o]").mkString(" || ' ' || ")}))) AS gram
       |  FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS ta
       |        FROM documents))""".stripMargin

  // ---- PII patterns (Java regex ⊆ RE2-compatible subset so Spark and
  // DuckDB agree; DuckDB needs the 'g' flag to match Spark's replace-all).
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+1-555-[0-9]{4}"
  private val IpPat = "10\\.[0-9]{1,3}\\.0\\.1"

  // rolling scratch dirs — one live tree per query tag per JVM (see Scratch)
  private def freshLake(tag: String): String = graft.Scratch.fresh(s"graft-$tag")

  val defs: Seq[QueryDef] = Seq(

    // ---- deterministic train/val/test assignment --------------------------
    // Hash-of-id buckets, not randomSplit: stable under repartition and
    // corpus growth, reproducible by the oracle, leak-safe across tables
    // keyed by the same id. A narrow map — no shuffle at any scale.
    QueryDef(
      "q_split_assign",
      (s, d) =>
        DatasetSplit.assign(t(s, d, "documents"), "doc_id")
          .select(col("doc_id"), col("bucket"), col("split"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, ${DatasetSplit.bucketSql("doc_id")} AS bucket,
              |${DatasetSplit.splitSql("doc_id")} AS split
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- per-domain quota sampling (domain mixing) ------------------------
    // Cap documents per source with a DETERMINISTIC priority (hash bucket,
    // then id). Selection runs through the bounded TopKByScore aggregate:
    // map-side partial keeps ≤ quota rows per domain, so the shuffle is
    // quota·|domains| — a row_number window would shuffle and sort the
    // whole corpus per domain.
    QueryDef(
      "q_domain_quota",
      (s, d) => {
        import graft.functions.TopKByScore.topk
        val quota = 25
        val prio = DatasetSplit.bucket(col("doc_id"))
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), prio.as("bucket"))
          .groupBy("source")
          // score = -bucket (topk orders score DESC, id ASC) ⇒ bucket ASC,
          // doc_id ASC — the exact priority the oracle's window replays
          .agg(topk(-col("bucket").cast("double"), col("doc_id"), quota).as("top"))
          .select(col("source"), explode(col("top")).as("t"))
          .select(col("source"), col("t.id").as("doc_id"))
          .orderBy("source", "doc_id")
      },
      Some(s"""SELECT source, doc_id FROM (
              |  SELECT source, doc_id,
              |         row_number() OVER (PARTITION BY source
              |           ORDER BY ${DatasetSplit.bucketSql("doc_id")}, doc_id) AS rn
              |  FROM documents) q
              |WHERE rn <= 25 ORDER BY source, doc_id""".stripMargin)),

    // ---- PII scrubbing ----------------------------------------------------
    // The synthetic corpus carries no real PII, so the query plants
    // deterministic contact strings derived from each row and then scrubs
    // them — the masking pipeline (regexp_replace chain, codegen'd, no
    // UDFs) is what's under test. Counts come from the pre-scrub text.
    QueryDef(
      "q_pii_scrub",
      (s, d) => {
        val planted = concat(
          lit("user"), col("doc_id").cast("string"), lit("@example.com +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0.1 "),
          substring(col("text"), 1, 40))
        val scrubbed = regexp_replace(
          regexp_replace(
            regexp_replace(planted, EmailPat, "<EMAIL>"),
            PhonePat, "<PHONE>"),
          IpPat, "<IP>")
        t(s, d, "documents")
          .select(
            col("doc_id"),
            regexp_count(planted, lit(EmailPat)).as("n_emails"),
            regexp_count(planted, lit(PhonePat)).as("n_phones"),
            scrubbed.as("masked"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |  CAST(len(regexp_extract_all(planted, '$EmailPat')) AS INT) AS n_emails,
              |  CAST(len(regexp_extract_all(planted, '$PhonePat')) AS INT) AS n_phones,
              |  regexp_replace(regexp_replace(regexp_replace(planted,
              |    '$EmailPat', '<EMAIL>', 'g'),
              |    '$PhonePat', '<PHONE>', 'g'),
              |    '$IpPat', '<IP>', 'g') AS masked
              |FROM (
              |  SELECT doc_id,
              |    'user' || CAST(doc_id AS VARCHAR) || '@example.com +1-555-' ||
              |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
              |    ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 ' ||
              |    substring(text, 1, 40) AS planted
              |  FROM documents) p
              |ORDER BY doc_id""".stripMargin)),

    // ---- eval-set decontamination -----------------------------------------
    // Drop training documents sharing any verbatim 8-token passage with the
    // held-out eval slice (doc_id % 20 = 0 stands in for the eval set).
    // The eval gram set is broadcast — eval sets are small by construction
    // (that is the premise of holding them out), so the probe corpus never
    // shuffles; at 100 TB this is a map-side semi-join over the scan.
    QueryDef(
      "q_decontaminate",
      (s, d) => {
        val g = grams8(s, d)
        val evalG = g.filter(col("doc_id") % 20 === 0).select("gh").distinct()
        val contaminated = g.filter(col("doc_id") % 20 =!= 0)
          .join(broadcast(evalG), "gh")
          .select("doc_id").distinct()
        t(s, d, "documents").filter(col("doc_id") % 20 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some(s"""WITH g AS ($grams8Sql),
              |evalg AS (SELECT DISTINCT gh FROM g WHERE doc_id % 20 = 0),
              |contaminated AS (
              |  SELECT DISTINCT doc_id FROM g
              |  WHERE doc_id % 20 <> 0 AND gh IN (SELECT gh FROM evalg))
              |SELECT doc_id, source FROM documents
              |WHERE doc_id % 20 <> 0
              |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
              |ORDER BY doc_id""".stripMargin)),

    // ---- decontamination, Bloom two-phase (the beyond-broadcast path) -----
    // When the eval set outgrows a broadcast hash set, the scale path is a
    // Bloom filter (bits ∝ n, not values): phase 1 prunes the corpus gram
    // stream with `might_contain` (map-side, false-positive-only), phase 2
    // removes the FPs with the exact join over the tiny survivor set. The
    // result is EXACTLY the exact-join answer — which is the oracle: the
    // Bloom layer may only ever cost extra verify work, never change the
    // outcome. Spark-native bloom_filter_agg/might_contain, codegen'd.
    QueryDef(
      "q_decontaminate_bloom",
      (s, d) => {
        graft.GraftExtensions.register(s) // idempotent; exposes bloom fns
        val g = grams8(s, d)
        val evalG = g.filter(col("doc_id") % 20 === 0).select("gh").distinct()
        // build the filter distributedly (partial-agg bloom merge), then
        // materialize the BITS on the driver: numBits/8 = 50 KB by
        // construction — a bloom filter IS the bounded summary you ship to
        // every task (might_contain requires a constant/scalar-subquery
        // filter; at 100 TB this single-row collect stays 50 KB).
        val bf = graft.functions.BloomOps.buildBloom(evalG, "gh",
          expectedItems = 50000L, numBits = 400000L)
        val candidates = g.filter(col("doc_id") % 20 =!= 0)
          .filter(graft.functions.BloomOps.mightContain(bf, col("gh")))
          .select("doc_id", "gh")
        // exact verify over the pruned stream only
        val contaminated = candidates
          .join(broadcast(evalG), "gh")
          .select("doc_id").distinct()
        t(s, d, "documents").filter(col("doc_id") % 20 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      // identical answer to the exact path by construction
      Some(s"""WITH g AS ($grams8Sql),
              |evalg AS (SELECT DISTINCT gh FROM g WHERE doc_id % 20 = 0),
              |contaminated AS (
              |  SELECT DISTINCT doc_id FROM g
              |  WHERE doc_id % 20 <> 0 AND gh IN (SELECT gh FROM evalg))
              |SELECT doc_id, source FROM documents
              |WHERE doc_id % 20 <> 0
              |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
              |ORDER BY doc_id""".stripMargin)),

    // ---- exact-substring duplication scoring (Lee et al. 2021 flavor) ----
    // Between whole-document exact dedup and MinHash-fuzzy: per document,
    // the fraction of its POSITIONAL 10-token spans whose span also occurs
    // in at least one OTHER document — the "duplicated text" signal
    // substring-level dedup filters on (Lee et al. 2021, "Deduplicating
    // Training Data Makes Language Models Better", which builds a suffix
    // array; the distributed equivalent is span hashing + aggregation).
    // Scale shape: spans reduce FIRST to (gh, doc_id, npos) grain — one
    // row per distinct span per doc, never per occurrence — the cross-doc
    // test is an aggregation over that reduced grain, and per-doc totals
    // come straight from token counts at the SCAN (no explode). All
    // shuffles carry 8-byte hashes, not span text; AQE handles hot spans.
    QueryDef(
      "q_dup_spans",
      (s, d) => {
        val K = 10
        val ta = split(trim(col("text")), "\\s+")
        val n = size(ta)
        val parts = (1 to K).map(j => slice(ta, lit(j), n - lit(K - 1)))
        val joined = parts.reduceLeft((acc, p) =>
          zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
        val spans = when(n >= K, joined) // positional: NOT array_distinct
          .otherwise(array().cast("array<string>"))
        // (gh, doc_id) grain with per-doc occurrence counts
        val g2 = t(s, d, "documents")
          .select(col("doc_id"), explode(spans).as("span"))
          .groupBy(hash60(col("span")).as("gh"), col("doc_id"))
          .agg(count(lit(1)).as("npos"))
        val crossDoc = g2.groupBy("gh")
          .agg(count(lit(1)).as("n_docs"))
          .filter(col("n_docs") >= 2)
          .select("gh")
        val dup = g2.join(crossDoc, "gh")
          .groupBy("doc_id").agg(sum("npos").as("dup_spans"))
        val totals = t(s, d, "documents")
          .select(col("doc_id"),
            greatest(n - lit(K - 1), lit(0)).cast("long").as("n_spans"))
        totals.join(dup, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_spans"),
            coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
            when(col("n_spans") === 0, lit(0.0))
              .otherwise(round(coalesce(col("dup_spans"), lit(0L)).cast("double") /
                col("n_spans").cast("double"), 6)).as("dup_frac"))
          .withColumn("keep", col("dup_frac") <= 0.5)
          .orderBy("doc_id")
      },
      Some(s"""WITH g AS (
              |  SELECT doc_id, ${hash60Sql("span")} AS gh FROM (
              |    SELECT doc_id, UNNEST(list_transform(
              |      range(1, greatest(length(ta) - 8, 1)),
              |      i -> ${(0 until 10).map(o => s"ta[i+$o]").mkString(" || ' ' || ")})) AS span
              |    FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS ta
              |          FROM documents))),
              |g2 AS (SELECT gh, doc_id, COUNT(*) AS npos FROM g GROUP BY 1, 2),
              |crossdoc AS (SELECT gh FROM g2 GROUP BY gh HAVING COUNT(*) >= 2),
              |dup AS (
              |  SELECT doc_id, SUM(npos) AS dup_spans FROM g2
              |  WHERE gh IN (SELECT gh FROM crossdoc) GROUP BY doc_id),
              |totals AS (
              |  SELECT doc_id, greatest(
              |    length(regexp_split_to_array(TRIM(text), '\\s+')) - 9, 0) AS n_spans
              |  FROM documents)
              |SELECT t.doc_id, CAST(t.n_spans AS BIGINT) AS n_spans,
              |       CAST(COALESCE(d.dup_spans, 0) AS BIGINT) AS dup_spans,
              |       CASE WHEN t.n_spans = 0 THEN 0.0
              |            ELSE ROUND(CAST(COALESCE(d.dup_spans, 0) AS DOUBLE) /
              |                       CAST(t.n_spans AS DOUBLE), 6) END AS dup_frac,
              |       (CASE WHEN t.n_spans = 0 THEN 0.0
              |             ELSE ROUND(CAST(COALESCE(d.dup_spans, 0) AS DOUBLE) /
              |                        CAST(t.n_spans AS DOUBLE), 6) END) <= 0.5 AS keep
              |FROM totals t LEFT JOIN dup d USING (doc_id)
              |ORDER BY t.doc_id""".stripMargin)),

    // ---- exact-substring REMOVAL (the dedup action, not just the score) ---
    // Lee et al. 2021 removes the duplicated substrings themselves; this is
    // that transform: every token covered by a cross-doc duplicated
    // 10-token span is dropped and the document re-joined. Positions of
    // duplicated spans per doc are a SMALL per-doc array (bounded by doc
    // length), gathered with sort_array(collect_set) for determinism; the
    // rebuild is a per-row HOF over (token, covered) pairs — zip_with
    // references the token array as an ARGUMENT, not inside a lambda, so
    // the regex split is not re-evaluated per element.
    QueryDef(
      "q_span_scrub",
      (s, d) => {
        val K = 10
        val ta0 = split(trim(col("text")), "\\s+")
        val n0 = size(ta0)
        val parts = (1 to K).map(j => slice(ta0, lit(j), n0 - lit(K - 1)))
        val joined = parts.reduceLeft((acc, p) =>
          zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
        val spans = when(n0 >= K, joined)
          .otherwise(array().cast("array<string>"))
        // positional span stream → (doc, pos, gh)
        val g = t(s, d, "documents")
          .select(col("doc_id"), posexplode(spans).as(Seq("pos0", "span")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"),
            hash60(col("span")).as("gh"))
        val crossDoc = g.select("gh", "doc_id").distinct()
          .groupBy("gh").agg(count(lit(1)).as("n_docs"))
          .filter(col("n_docs") >= 2).select("gh")
        val dupStarts = g.join(crossDoc, "gh")
          .groupBy("doc_id")
          .agg(sort_array(collect_set(col("pos"))).as("dup"))
        val docs = t(s, d, "documents")
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ta"))
        docs.join(dupStarts, Seq("doc_id"), "left")
          .select(col("doc_id"), col("ta"),
            coalesce(col("dup"), array().cast("array<int>")).as("dup"))
          .select(col("doc_id"), size(col("ta")).as("n_tok"),
            expr(s"""filter(
              zip_with(ta, transform(sequence(1, size(ta)),
                t -> exists(dup, s -> t >= s AND t <= s + ${K - 1})),
                (tok, cov) -> IF(cov, NULL, tok)),
              x -> x IS NOT NULL)""").as("kept"))
          .select(col("doc_id"), col("n_tok"),
            size(col("kept")).as("n_kept"),
            array_join(col("kept"), " ").as("scrubbed_text"))
          .orderBy("doc_id")
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS ta
              |  FROM documents),
              |g AS (
              |  SELECT doc_id, u.pos AS pos, u.gh AS gh FROM (
              |    SELECT doc_id, UNNEST(list_transform(
              |      range(1, greatest(length(ta) - 8, 1)),
              |      i -> struct_pack(pos := i,
              |        gh := ${hash60Sql(
                       (0 until 10).map(o => s"ta[i+$o]").mkString(" || ' ' || "))}
              |      ))) AS u
              |    FROM base)),
              |crossdoc AS (
              |  SELECT gh FROM (SELECT DISTINCT gh, doc_id FROM g)
              |  GROUP BY gh HAVING COUNT(*) >= 2),
              |dup AS (
              |  SELECT doc_id, list_sort(list(DISTINCT pos)) AS dup FROM g
              |  WHERE gh IN (SELECT gh FROM crossdoc) GROUP BY doc_id),
              |scrub AS (
              |  SELECT b.doc_id, length(b.ta) AS n_tok,
              |    list_filter(
              |      list_transform(range(1, length(b.ta) + 1),
              |        t -> CASE WHEN len(list_filter(COALESCE(d.dup, []),
              |                        s -> t >= s AND t <= s + 9)) > 0
              |             THEN NULL ELSE b.ta[t] END),
              |      x -> x IS NOT NULL) AS kept
              |  FROM base b LEFT JOIN dup d USING (doc_id))
              |SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok,
              |       CAST(len(kept) AS INTEGER) AS n_kept,
              |       -- fully-scrubbed doc: array_to_string of an empty list
              |       -- is NULL in DuckDB; Spark's array_join gives ''
              |       COALESCE(array_to_string(kept, ' '), '') AS scrubbed_text
              |FROM scrub ORDER BY doc_id""".stripMargin)),

    // ---- KMV distinct-cardinality sketch ----------------------------------
    // Estimate the corpus's distinct-shingle count from the k smallest
    // md5 hashes (kmv_sketch aggregate: map-side bounded, shuffle = k
    // longs). Deterministic hash ⇒ the oracle replays the exact sketch;
    // the exact distinct count rides along as the quality reference.
    QueryDef(
      "q_kmv_distinct",
      (s, d) => {
        import graft.functions.KmvDistinct.kmv
        val k = 1024
        val toks = Dedup.docTokensPublic(s, d)
          .select(hash60(col("token")).as("gh"))
        val sk = toks.agg(kmv(col("gh"), k).as("sk"))
          .select(
            lit(k).as("k"),
            size(col("sk")).cast("long").as("n_kept"),
            element_at(col("sk"), size(col("sk"))).as("kth_hash"))
          .withColumn("est_distinct",
            when(col("n_kept") < k, col("n_kept").cast("double"))
              .otherwise(lit((k - 1).toDouble) /
                (col("kth_hash").cast("double") / pow(lit(2.0), lit(60.0)))))
        val exact = toks.agg(countDistinct(col("gh")).as("exact_distinct"))
        sk.crossJoin(exact)
      },
      Some(s"""WITH h AS (SELECT DISTINCT ${hash60Sql("token")} AS gh
              |           FROM (${Dedup.docTokensSqlPublic})),
              |sk AS (SELECT gh FROM h ORDER BY gh LIMIT 1024),
              |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
              |               MAX(gh) AS kth_hash FROM sk),
              |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM h)
              |SELECT 1024 AS k, n_kept, kth_hash,
              |  CASE WHEN n_kept < 1024 THEN CAST(n_kept AS DOUBLE)
              |       ELSE 1023.0 / (CAST(kth_hash AS DOUBLE) / POWER(2, 60))
              |  END AS est_distinct,
              |  exact_distinct
              |FROM agg, ex""".stripMargin)),

    // ---- text normalization -----------------------------------------------
    // The standard pretraining canonicalization chain: lowercase, strip
    // non-alphanumerics to spaces, collapse whitespace, trim — one
    // codegen'd expression tree, no UDFs, no shuffle.
    QueryDef(
      "q_text_normalize",
      (s, d) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "),
          "\\s+", " "))
        t(s, d, "documents")
          .select(col("doc_id"),
            length(col("text")).as("n_before"),
            length(norm).as("n_after"),
            substring(norm, 1, 80).as("head80"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  LENGTH(text) AS n_before,
             |  LENGTH(norm) AS n_after,
             |  substring(norm, 1, 80) AS head80
             |FROM (
             |  SELECT doc_id, text, TRIM(regexp_replace(
             |    regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
             |    '\s+', ' ', 'g')) AS norm
             |  FROM documents) n
             |ORDER BY doc_id""".stripMargin)),

    // ---- repetition scoring (Gopher-style duplicate-n-gram fraction) ------
    // Quality signal: the fraction of a document's 3-grams that are
    // repeats (1 - distinct/total). High values flag boilerplate/spam-like
    // repetition. Ordered shingles with duplicates PRESERVED — the same
    // slice/zip_with build as the dedup family, minus the distinct.
    QueryDef(
      "q_text_repetition",
      (s, d) => {
        val ta = split(trim(col("text")), "\\s+")
        val n = size(ta)
        val s1 = slice(ta, lit(1), n - 2)
        val s2 = slice(ta, lit(2), n - 2)
        val s3 = slice(ta, lit(3), n - 2)
        val grams = when(n >= 3,
          zip_with(zip_with(s1, s2, (a, b) => concat(a, lit(" "), b)), s3,
            (ab, c) => concat(ab, lit(" "), c)))
          .otherwise(array().cast("array<string>"))
        t(s, d, "documents")
          .select(col("doc_id"), size(grams).as("n_grams"),
            size(array_distinct(grams)).as("n_distinct"))
          .select(col("doc_id"), col("n_grams"), col("n_distinct"),
            when(col("n_grams") > 0,
              round((col("n_grams") - col("n_distinct")).cast("double") /
                col("n_grams").cast("double"), 6)).otherwise(0.0)
              .as("dup_frac"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_grams, n_distinct,
             |  CASE WHEN n_grams > 0 THEN
             |    ROUND(CAST(n_grams - n_distinct AS DOUBLE) /
             |          CAST(n_grams AS DOUBLE), 6)
             |  ELSE 0.0 END AS dup_frac
             |FROM (
             |  SELECT doc_id,
             |    CAST(len(grams) AS INT) AS n_grams,
             |    CAST(len(list_distinct(grams)) AS INT) AS n_distinct
             |  FROM (
             |    SELECT doc_id, list_transform(
             |      range(1, greatest(length(ta) - 1, 1)),
             |      i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2]) AS grams
             |    FROM (SELECT doc_id,
             |            regexp_split_to_array(TRIM(text), '\s+') AS ta
             |          FROM documents) t0) t1) t2
             |ORDER BY doc_id""".stripMargin)),

    // ---- deterministic sharded training order -----------------------------
    // "Shuffle the dataset" as a pure function of the data: shard by hash
    // bucket, order within each shard by (hash, id). Per-shard windows keep
    // the sort distributed (a single global row_number would funnel the
    // corpus through one task); training consumers read shards in shard
    // order. Re-runs produce byte-identical order — resumable data loading.
    QueryDef(
      "q_train_order",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nShards = 8
        val b = DatasetSplit.bucket(col("doc_id"))
        val w = Window.partitionBy("shard").orderBy("bucket", "doc_id")
        t(s, d, "documents")
          .select(col("doc_id"), b.as("bucket"),
            (b % nShards).as("shard"))
          .withColumn("pos", row_number().over(w))
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy("shard", "pos")
      },
      Some(s"""SELECT doc_id, shard,
              |  CAST(row_number() OVER (PARTITION BY shard
              |    ORDER BY bucket, doc_id) AS INT) AS pos
              |FROM (SELECT doc_id,
              |        ${DatasetSplit.bucketSql("doc_id")} AS bucket,
              |        ${DatasetSplit.bucketSql("doc_id")} % 8 AS shard
              |      FROM documents) b
              |ORDER BY shard, pos""".stripMargin)),

    // ---- fixed-window chunking with overlap (context-length prep) ---------
    // Split each document into training chunks of CHUNK tokens with STRIDE
    // overlap — the standard long-document preprocessing before packing.
    // A pure per-row HOF expansion (token slices over a window sequence):
    // map-only, no shuffle at any scale; the final short chunk is kept iff
    // it adds tokens beyond the previous window (same rule as HF's
    // return_overflowing_tokens stride semantics, chunk starts at
    // 1, 1+stride, 1+2*stride, ... while start <= n).
    QueryDef(
      "q_chunk_windows",
      (s, d) => {
        val Chunk = 64
        val Stride = 48 // 16-token overlap
        val ta = split(trim(col("text")), "\\s+")
        t(s, d, "documents")
          .select(col("doc_id"), ta.as("ta"))
          .select(col("doc_id"),
            posexplode(expr(
              s"""transform(
                 |  sequence(1, size(ta), $Stride),
                 |  st -> array_join(slice(ta, st, $Chunk), ' '))""".stripMargin))
              .as(Seq("chunk_idx", "chunk_text")))
          .select(col("doc_id"), col("chunk_idx"),
            (size(split(col("chunk_text"), "\\s+"))).as("n_tok"),
            col("chunk_text"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS chunk_idx,
             |  CAST(length(regexp_split_to_array(u.txt, '\s+')) AS INTEGER) AS n_tok,
             |  u.txt AS chunk_text
             |FROM (
             |  SELECT doc_id, UNNEST(list_transform(
             |    list_transform(range(CAST(ceil(length(ta) / 48.0) AS BIGINT)),
             |                   k -> 1 + 48 * k),
             |    st -> struct_pack(
             |      i := (st - 1) // 48 + 1,
             |      txt := array_to_string(list_slice(ta, st, st + 63), ' ')))) AS u
             |  FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS ta
             |        FROM documents))
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- shard-local sequence packing (greedy by cumulative tokens) -------
    // Assign ordered chunks to fixed-budget training sequences: within each
    // shard (hash-partitioned, so the window never funnels the corpus
    // through one task), walk docs in the deterministic training order and
    // emit pack_id = floor(cumulative_tokens_before / budget). Greedy
    // running-sum packing — one partition-local window over the per-shard
    // order, the distributed version of the packer a data loader runs.
    QueryDef(
      "q_pack_sequences",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val Budget = 256L
        val nShards = 8
        val b = DatasetSplit.bucket(col("doc_id"))
        val w = Window.partitionBy("shard").orderBy("bucket", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .select(col("doc_id"), b.as("bucket"), (b % nShards).as("shard"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
          .withColumn("cum_after", sum("n_tok").over(w))
          .select(col("doc_id"), col("shard"), col("n_tok"),
            ((col("cum_after") - col("n_tok")) / Budget).cast("long")
              .as("pack_id"))
          .orderBy("shard", "pack_id", "doc_id")
      },
      Some(s"""SELECT doc_id, shard, n_tok,
              |  CAST(FLOOR((cum_after - n_tok) / 256.0) AS BIGINT) AS pack_id
              |FROM (
              |  SELECT doc_id, shard, n_tok,
              |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY bucket, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_after
              |  FROM (SELECT doc_id,
              |          ${DatasetSplit.bucketSql("doc_id")} AS bucket,
              |          ${DatasetSplit.bucketSql("doc_id")} % 8 AS shard,
              |          length(regexp_split_to_array(TRIM(text), '\\s+')) AS n_tok
              |        FROM documents) b)
              |ORDER BY shard, pack_id, doc_id""".stripMargin)),

    // ---- weighted domain mixing -------------------------------------------
    // Per-source sampling rates (the domain-mixing knob of a pretraining
    // recipe) applied as hash thresholds: keep a doc iff its bucket clears
    // the source's per-mille rate. Deterministic, stable, and a narrow
    // map — reweighting a 100 TB corpus is a filter, not a shuffle.
    QueryDef(
      "q_domain_mix",
      (s, d) => {
        val rate = when(col("source") === "src0", 1000)
          .when(col("source") === "src1", 500)
          .when(col("source") === "src2", 250)
          .otherwise(100)
        t(s, d, "documents")
          .select(col("doc_id"), col("source"), rate.as("rate_pm"),
            DatasetSplit.bucket(col("doc_id")).as("bucket"))
          .filter(col("bucket") < col("rate_pm"))
          .select(col("doc_id"), col("source"), col("rate_pm"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, source, rate_pm FROM (
              |  SELECT doc_id, source,
              |    CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 500
              |      WHEN 'src2' THEN 250 ELSE 100 END AS rate_pm,
              |    ${DatasetSplit.bucketSql("doc_id")} AS bucket
              |  FROM documents) r
              |WHERE bucket < rate_pm ORDER BY doc_id""".stripMargin)),

    // ---- temperature-based mixture derivation (the α-sampling recipe) -----
    // Where q_domain_mix APPLIES per-source rates, this DERIVES them: the
    // mT5/XLM-R α-smoothed multinomial — p_s ∝ (tokens_s)^α with α=0.3 —
    // which upweights small domains and damps head domains. Two bounded
    // aggregations (per-source token totals, then the normalizer over the
    // handful of sources) crossed in as broadcast 1-row aggs; deriving the
    // recipe for a 100 TB corpus costs one map-side-combined pass.
    // Determinism: pow/divisions on identical long inputs, rounded 6dp.
    QueryDef(
      "q_mix_temperature",
      (s, d) => {
        val alpha = 0.3
        val perSrc = t(s, d, "documents")
          .select(col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        val totals = perSrc.agg(
          sum("n_tokens").as("tot_tokens"),
          sum(pow(col("n_tokens").cast("double"), lit(alpha))).as("tot_pow"))
        perSrc.crossJoin(broadcast(totals))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            round(col("n_tokens").cast("double") / col("tot_tokens"), 6)
              .as("raw_share"),
            round(pow(col("n_tokens").cast("double"), lit(alpha)) /
              col("tot_pow"), 6).as("alpha_share"))
          .withColumn("boost",
            round(col("alpha_share") / col("raw_share"), 6))
          .orderBy("source")
      },
      Some("""WITH per_src AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |         SUM(length(regexp_split_to_array(TRIM(text), '\s+'))) AS n_tokens
             |  FROM documents GROUP BY source),
             |tot AS (SELECT SUM(n_tokens) AS tot_tokens,
             |               SUM(pow(CAST(n_tokens AS DOUBLE), 0.3)) AS tot_pow
             |        FROM per_src)
             |SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
             |       ROUND(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS raw_share,
             |       ROUND(pow(CAST(n_tokens AS DOUBLE), 0.3) / tot_pow, 6) AS alpha_share,
             |       ROUND(ROUND(pow(CAST(n_tokens AS DOUBLE), 0.3) / tot_pow, 6) /
             |             ROUND(CAST(n_tokens AS DOUBLE) / tot_tokens, 6), 6) AS boost
             |FROM per_src CROSS JOIN tot ORDER BY source""".stripMargin)),

    // ---- per-source distinct-shingle cardinality (grouped KMV sketches) ---
    // The grouped form of q_kmv_distinct: one kmv_sketch aggregate per
    // source — the shuffle is k longs per source, and the per-group merge
    // is the sketch union, so per-domain cardinality monitoring costs the
    // same map-side pass as a count.
    QueryDef(
      "q_kmv_by_source",
      (s, d) => {
        import graft.functions.KmvDistinct.kmv
        val k = 256
        val ta = split(trim(col("text")), "\\s+")
        val n = size(ta)
        val s1 = slice(ta, lit(1), n - 2)
        val s2 = slice(ta, lit(2), n - 2)
        val s3 = slice(ta, lit(3), n - 2)
        val shingles = when(n >= 3,
          zip_with(zip_with(s1, s2, (a, b) => concat(a, lit(" "), b)), s3,
            (ab, c) => concat(ab, lit(" "), c)))
          .otherwise(array().cast("array<string>"))
        t(s, d, "documents")
          .select(col("source"), explode(shingles).as("gram"))
          .select(col("source"), hash60(col("gram")).as("gh"))
          .groupBy("source")
          .agg(kmv(col("gh"), k).as("sk"))
          .select(col("source"),
            size(col("sk")).cast("long").as("n_kept"),
            element_at(col("sk"), size(col("sk"))).as("kth_hash"))
          .withColumn("est_distinct",
            when(col("n_kept") < k, col("n_kept").cast("double"))
              .otherwise(lit((k - 1).toDouble) /
                (col("kth_hash").cast("double") / pow(lit(2.0), lit(60.0)))))
          .orderBy("source")
      },
      Some(s"""WITH g AS (
              |  SELECT source, UNNEST(list_transform(
              |    range(1, greatest(length(ta) - 1, 1)),
              |    i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) AS gram
              |  FROM (SELECT source, regexp_split_to_array(TRIM(text), '\\s+') AS ta
              |        FROM documents)),
              |h AS (SELECT DISTINCT source, ${hash60Sql("gram")} AS gh FROM g),
              |sk AS (SELECT source, gh FROM (
              |    SELECT source, gh, row_number() OVER (PARTITION BY source
              |      ORDER BY gh) AS rn FROM h) r
              |  WHERE rn <= 256),
              |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
              |               MAX(gh) AS kth_hash
              |        FROM sk GROUP BY source)
              |SELECT source, n_kept, kth_hash,
              |  CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
              |       ELSE 255.0 / (CAST(kth_hash AS DOUBLE) / POWER(2, 60))
              |  END AS est_distinct
              |FROM agg ORDER BY source""".stripMargin)),

    // ---- per-source size-distribution profile -----------------------------
    // Exact order statistics per domain (median + p90 token counts, integer
    // rank arithmetic so both engines pick the identical row). Quantiles
    // run inside per-source windows — the corpus partitions by domain, no
    // global sort; the ranks are ties-broken on doc_id.
    QueryDef(
      "q_quality_profile",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stats = t(s, d, "documents")
          .select(col("source"), col("doc_id"),
            size(split(trim(col("text")), "\\s+")).as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
        val ranked = stats.withColumn("rn", row_number().over(w))
        val counts = stats.groupBy("source").agg(count(lit(1)).as("n_docs"))
        ranked.join(counts, "source")
          .withColumn("med_rn", ((col("n_docs") + 1) / 2).cast("int"))
          .withColumn("p90_rn",
            greatest(lit(1), (col("n_docs") * 9 / 10).cast("int")))
          .groupBy("source")
          .agg(max("n_docs").as("n_docs"),
            max(when(col("rn") === col("med_rn"), col("n_tokens")))
              .as("median_tokens"),
            max(when(col("rn") === col("p90_rn"), col("n_tokens")))
              .as("p90_tokens"))
          .orderBy("source")
      },
      Some("""WITH stats AS (
             |  SELECT source, doc_id,
             |    CAST(LENGTH(regexp_split_to_array(TRIM(text), '\s+')) AS INT)
             |      AS n_tokens
             |  FROM documents),
             |ranked AS (
             |  SELECT source, n_tokens,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_tokens, doc_id) AS rn
             |  FROM stats),
             |counts AS (SELECT source, COUNT(*) AS n_docs FROM stats GROUP BY 1)
             |SELECT source, MAX(n_docs) AS n_docs,
             |  MAX(CASE WHEN rn = CAST((n_docs + 1) // 2 AS INT)
             |      THEN n_tokens END) AS median_tokens,
             |  MAX(CASE WHEN rn = GREATEST(1, CAST(n_docs * 9 // 10 AS INT))
             |      THEN n_tokens END) AS p90_tokens
             |FROM ranked JOIN counts USING (source)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- pairwise domain overlap from KMV sketches ------------------------
    // Sketch ALGEBRA: the per-source KMV sketches are mergeable summaries,
    // so cross-domain Jaccard estimates come from k-long arrays — never a
    // rescan of the corpus. Estimator (Beyer et al.): take the k smallest
    // of the UNION of two sketches; the fraction of those present in both
    // estimates J(A,B). Everything is deterministic given the md5 hash
    // contract, so the oracle replays the exact estimates.
    QueryDef(
      "q_domain_overlap",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.KmvDistinct.kmv
        val k = 256
        val ta = split(trim(col("text")), "\\s+")
        val n = size(ta)
        val s1 = slice(ta, lit(1), n - 2)
        val s2 = slice(ta, lit(2), n - 2)
        val s3 = slice(ta, lit(3), n - 2)
        val shingles = when(n >= 3,
          zip_with(zip_with(s1, s2, (a, b) => concat(a, lit(" "), b)), s3,
            (ab, c) => concat(ab, lit(" "), c)))
          .otherwise(array().cast("array<string>"))
        val sk = t(s, d, "documents")
          .select(col("source"), explode(shingles).as("gram"))
          .select(col("source"), hash60(col("gram")).as("gh"))
          .groupBy("source").agg(kmv(col("gh"), k).as("sk"))
          .select(col("source"), explode(col("sk")).as("gh"))
        // ROLLING persist (graft.StageCache): bench repeats must not stack
        // leaked cache generations
        graft.StageCache.roll("q_domain_overlap", sk)
        val names = sk.select("source").distinct()
        // every sketch row lands in every pair its source belongs to; a
        // union value present in both sketches shows up from two sources
        val expanded = sk.crossJoin(broadcast(
            names.withColumnRenamed("source", "other")))
          .filter(col("source") =!= col("other"))
          .select(least(col("source"), col("other")).as("src_a"),
            greatest(col("source"), col("other")).as("src_b"),
            col("gh"), col("source").as("frm"))
        val perValue = expanded.groupBy("src_a", "src_b", "gh")
          .agg((countDistinct("frm") === 2).cast("int").as("in_both"))
        val w = Window.partitionBy("src_a", "src_b").orderBy("gh")
        perValue.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .groupBy("src_a", "src_b")
          .agg((sum("in_both") / k.toDouble).as("jaccard_est"))
          .orderBy(col("jaccard_est").desc, col("src_a"), col("src_b"))
          .limit(20)
      },
      Some(s"""WITH g AS (
              |  SELECT source, UNNEST(list_transform(
              |    range(1, greatest(length(ta) - 1, 1)),
              |    i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) AS gram
              |  FROM (SELECT source, regexp_split_to_array(TRIM(text), '\\s+') AS ta
              |        FROM documents)),
              |h AS (SELECT DISTINCT source, ${hash60Sql("gram")} AS gh FROM g),
              |sk AS (SELECT source, gh FROM (
              |    SELECT source, gh, row_number() OVER (PARTITION BY source
              |      ORDER BY gh) AS rn FROM h) r
              |  WHERE rn <= 256),
              |names AS (SELECT DISTINCT source FROM sk),
              |expanded AS (
              |  SELECT LEAST(s.source, o.source) AS src_a,
              |         GREATEST(s.source, o.source) AS src_b,
              |         s.gh, s.source AS frm
              |  FROM sk s JOIN names o ON o.source <> s.source),
              |per_value AS (
              |  SELECT src_a, src_b, gh,
              |         CASE WHEN COUNT(DISTINCT frm) = 2 THEN 1 ELSE 0 END
              |           AS in_both
              |  FROM expanded GROUP BY 1, 2, 3),
              |voted AS (
              |  SELECT src_a, src_b, in_both,
              |         row_number() OVER (PARTITION BY src_a, src_b
              |           ORDER BY gh) AS rn
              |  FROM per_value)
              |SELECT src_a, src_b, SUM(in_both) / 256.0 AS jaccard_est
              |FROM voted WHERE rn <= 256
              |GROUP BY src_a, src_b
              |ORDER BY jaccard_est DESC, src_a, src_b LIMIT 20""".stripMargin)),

    // ---- corpus datasheet -------------------------------------------------
    // The per-source summary every curation run publishes: volume, exact-
    // duplicate pressure (distinct text fingerprints vs docs), token
    // totals, language mix, size profile. One partial-aggregated groupBy —
    // the 100 TB datasheet is one shuffle of |sources| rows.
    QueryDef(
      "q_corpus_report",
      (s, d) =>
        t(s, d, "documents")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_uniq_text"),
            sum(size(split(trim(col("text")), "\\s+")).cast("long"))
              .as("total_tokens"),
            count(when(col("lang") === "en", 1)).as("n_en"),
            round(sum(col("n_chars")).cast("double") /
              count(lit(1)).cast("double"), 6).as("mean_chars"))
          .orderBy("source"),
      Some("""SELECT source,
             |  COUNT(*) AS n_docs,
             |  COUNT(DISTINCT md5(text)) AS n_uniq_text,
             |  CAST(SUM(LENGTH(regexp_split_to_array(TRIM(text), '\s+'))) AS BIGINT)
             |    AS total_tokens,
             |  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
             |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             |    AS mean_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- vacuum roundtrip: retention sweep is metadata-only ---------------
    // Three swaps accumulate versions (reader-safety grace retains them);
    // vacuum retires the superseded ones — and the LIVE content must be
    // byte-for-byte the last write (the oracle replays the final image).
    QueryDef(
      "q_vacuum_roundtrip",
      (s, d) => {
        import graft.operators.Vacuum
        val spec = ObjectStoreSpec(path = freshLake("vacrt"),
          database = "graft_tmp", table = s"vac_rt_${System.nanoTime()}")
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        Seq(100, 300, 500).foreach { lim =>
          ObjectStoreSink.replaceTable(s, cust.filter(col("c_custkey") < lim), spec)
        }
        Vacuum.vacuum(spec.path, keep = 1, graceMs = 0L)
        s.table(s"${spec.database}.${spec.table}")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal
             |FROM customer WHERE c_custkey < 500
             |ORDER BY c_custkey""".stripMargin)),

    // ---- small-file compaction roundtrip ----------------------------------
    // Land a deliberately fragmented table (40 files), compact it through
    // the versioned-directory commit, and read the result back — the oracle
    // is the source content itself (compaction must be a pure layout
    // change). File-count physics are pinned in CompactionSpec.
    QueryDef(
      "q_compact_roundtrip",
      (s, d) => {
        val spec = ObjectStoreSpec(path = freshLake("compact"),
          database = "graft_tmp", table = s"compact_rt_${System.nanoTime()}")
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        ObjectStoreSink.replaceTable(s, cust.repartition(40), spec)
        Compaction.compact(s, spec, targetBytes = 1L << 30)
        s.table(s"${spec.database}.${spec.table}")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---- count-min sketch over token occurrences --------------------------
    // The fixed-memory frequency structure (Cormode & Muthukrishnan 2005):
    // exact token frequency shuffles |vocab| rows and grows with the
    // corpus; cms_sketch ships a FIXED depth×width counter matrix from
    // each map task and merges by +. Slot hashing rides the engine's md5
    // convention, so the oracle rebuilds the ENTIRE sketch relationally —
    // every nonzero counter, bit-for-bit — by grouping occurrences on
    // (row, slot).
    QueryDef(
      "q_cms_sketch",
      (s, d) => {
        val (w, dep) = (1024, 4)
        t(s, d, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("token"))
          .agg(graft.functions.CmsSketch.cms(
            graft.functions.CmsSketch.slotsFor(col("token"), w, dep), w, dep)
            .as("sk"))
          .select(posexplode(col("sk")).as(Seq("pos", "cnt")))
          .filter(col("cnt") > 0)
          .select((col("pos") / w).cast("long").as("j"),
            (col("pos") % w).cast("long").as("slot"), col("cnt"))
          .orderBy("j", "slot")
      },
      Some("""WITH toks AS (
             |  SELECT UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS token
             |  FROM documents),
             |occ AS (
             |  SELECT j,
             |    CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || '#' || token), 1, 15)) AS BIGINT) % 1024 AS slot
             |  FROM toks CROSS JOIN (VALUES (0),(1),(2),(3)) t(j))
             |SELECT CAST(j AS BIGINT) AS j, slot, CAST(COUNT(*) AS BIGINT) AS cnt
             |FROM occ GROUP BY j, slot ORDER BY j, slot""".stripMargin)),

    // ---- grouped CMS: one sketch per source -------------------------------
    // The per-stratum form (q_kmv_by_source's CMS twin): one counter
    // matrix per source, still one map-side-combined groupBy — shuffle is
    // |sources| × sketch size, independent of corpus rows. Per-source
    // sketches merge associatively into the corpus sketch (the
    // IncrementalAgg property), so per-shard/per-day sketches roll up
    // without rescans. Oracle rebuilds every per-source nonzero counter.
    QueryDef(
      "q_cms_by_source",
      (s, d) => {
        val (w, dep) = (1024, 4)
        t(s, d, "documents")
          .select(col("source"),
            explode(split(trim(col("text")), "\\s+")).as("token"))
          .groupBy("source")
          .agg(graft.functions.CmsSketch.cms(
            graft.functions.CmsSketch.slotsFor(col("token"), w, dep), w, dep)
            .as("sk"))
          .select(col("source"), posexplode(col("sk")).as(Seq("pos", "cnt")))
          .filter(col("cnt") > 0)
          .select(col("source"), (col("pos") / w).cast("long").as("j"),
            (col("pos") % w).cast("long").as("slot"), col("cnt"))
          .orderBy("source", "j", "slot")
      },
      Some("""WITH toks AS (
             |  SELECT source,
             |    UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS token
             |  FROM documents),
             |occ AS (
             |  SELECT source, j,
             |    CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || '#' || token), 1, 15)) AS BIGINT) % 1024 AS slot
             |  FROM toks CROSS JOIN (VALUES (0),(1),(2),(3)) t(j))
             |SELECT source, CAST(j AS BIGINT) AS j, slot,
             |       CAST(COUNT(*) AS BIGINT) AS cnt
             |FROM occ GROUP BY source, j, slot
             |ORDER BY source, j, slot""".stripMargin)),

    // ---- CMS point estimates (heavy-hitter probes) ------------------------
    // The read side of the sketch: est(x) = min over rows of the counter at
    // x's slot — an upper bound on x's true count that both engines must
    // state identically. The probe set includes an absent token (zero or
    // pure-collision estimate) and the exact counts ride along as the
    // ground truth. Spark probes through the collected sketch as a literal
    // array (32 KB — the BloomOps ship-as-literal precedent), so the probe
    // side never shuffles the corpus.
    QueryDef(
      "q_cms_heavy",
      (s, d) => {
        val (w, dep) = (1024, 4)
        val toks = t(s, d, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        val sketch = toks
          .agg(graft.functions.CmsSketch.cms(
            graft.functions.CmsSketch.slotsFor(col("token"), w, dep), w, dep)
            .as("sk"))
          .head().getSeq[Long](0)
        val skLit = typedlit(sketch)
        import s.implicits._
        val probes = Seq("fast", "key", "table", "value", "zz_absent")
          .toDF("token")
        val ests = probes
          .withColumn("slots",
            graft.functions.CmsSketch.slotsFor(col("token"), w, dep))
          .withColumn("est_cnt", least((0 until dep).map(j =>
            element_at(skLit,
              (lit(j * w) + element_at(col("slots"), j + 1) + 1).cast("int"))): _*))
        val exact = toks.groupBy("token").agg(count(lit(1)).as("c"))
        ests.join(exact, Seq("token"), "left")
          .select(col("token"), coalesce(col("c"), lit(0L)).as("exact_cnt"),
            col("est_cnt"))
          .orderBy("token")
      },
      Some("""WITH toks AS (
             |  SELECT UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS token
             |  FROM documents),
             |occ AS (
             |  SELECT j,
             |    CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || '#' || token), 1, 15)) AS BIGINT) % 1024 AS slot
             |  FROM toks CROSS JOIN (VALUES (0),(1),(2),(3)) t(j)),
             |sk AS (SELECT j, slot, COUNT(*) AS cnt FROM occ GROUP BY j, slot),
             |probes AS (SELECT * FROM (VALUES ('fast'),('key'),('table'),('value'),('zz_absent')) p(token)),
             |pslots AS (
             |  SELECT p.token, t.j,
             |    CAST(('0x' || substring(md5(CAST(t.j AS VARCHAR) || '#' || p.token), 1, 15)) AS BIGINT) % 1024 AS slot
             |  FROM probes p CROSS JOIN (VALUES (0),(1),(2),(3)) t(j)),
             |est AS (
             |  SELECT ps.token, MIN(COALESCE(sk.cnt, 0)) AS est_cnt
             |  FROM pslots ps LEFT JOIN sk ON sk.j = ps.j AND sk.slot = ps.slot
             |  GROUP BY ps.token),
             |cnts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token)
             |SELECT e.token, CAST(COALESCE(c.c, 0) AS BIGINT) AS exact_cnt,
             |       CAST(e.est_cnt AS BIGINT) AS est_cnt
             |FROM est e LEFT JOIN cnts c USING (token) ORDER BY e.token""".stripMargin)))
}
