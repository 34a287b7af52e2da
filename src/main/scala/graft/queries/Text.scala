package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.dsumSql

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (builder prompt: language-ID, quality scoring, token
  * counting, exact dedup, DQ regex rules per SURVEY.md §2.10 F2).
  *
  * All token splitting is `\s+` on trimmed text on both sides (Spark `split`
  * keeps trailing empties like Java `String.split(re, -1)`; trimming first
  * makes Spark and DuckDB agree). Ratios are single int/int double divisions
  * — deterministic IEEE ops, safe to hash-compare.
  */
object Text {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private val stopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Shared scoring relation for q_bigram_likelihood and its CCNet-bucket
    * composite: (doc_id, n_bigrams, avg_bigram_p) per document with ≥1
    * bigram. See q_bigram_likelihood's Scaladoc for the plan rationale
    * (bigram-key shuffle, BROADCAST unigram counts, dsum determinism).
    */
  private def bigramScores(s: SparkSession, d: String): DataFrame = {
    val ta = split(trim(col("text")), "\\s+")
    val n = size(ta)
    val bigrams = when(n >= 2,
      zip_with(slice(ta, lit(1), n - 1), slice(ta, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val occ = t(s, d, "documents")
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
    // ROLLING persist (graft.StageCache): two queries share this stage
    // sequentially; one live cache generation, never a leak per repeat
    graft.StageCache.roll("bigramScores", occ)
    val cbg = occ.groupBy("bg").agg(count(lit(1)).as("c_bg"))
    val cw1 = occ.groupBy("w1").agg(count(lit(1)).as("c_w1"))
    val vocab = t(s, d, "documents")
      .select(explode(ta).as("w"))
      .agg(countDistinct(col("w")).as("vn"))
    val p = occ.join(cbg, "bg").join(broadcast(cw1), "w1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round((col("c_bg") + lit(1)) / (col("c_w1") + col("vn")), 6).as("p"))
    p.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("p").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast("double") / count(lit(1)), 6).as("avg_bigram_p"))
  }

  /** DuckDB twin of [[bigramScores]]: CTE chain ending in
    * `scores(doc_id, n_bigrams, avg_bigram_p)`.
    */
  private val bigramScoreCtes: String =
    """occ AS (
      |  SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM (
      |    SELECT doc_id, UNNEST(list_transform(
      |      range(1, greatest(length(ta), 1)),
      |      i -> ta[i] || ' ' || ta[i+1])) AS bg
      |    FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS ta
      |          FROM documents))),
      |cbg AS (SELECT bg, COUNT(*) AS c_bg FROM occ GROUP BY bg),
      |cw1 AS (SELECT w1, COUNT(*) AS c_w1 FROM occ GROUP BY w1),
      |v AS (SELECT COUNT(DISTINCT w) AS vn FROM (
      |  SELECT UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS w
      |  FROM documents)),
      |p AS (
      |  SELECT doc_id, ROUND((c_bg + 1.0) / (c_w1 + vn), 6) AS p
      |  FROM occ JOIN cbg USING (bg) JOIN cw1 USING (w1) CROSS JOIN v),
      |scores AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams,
      |    ROUND(CAST(SUM(CAST(p AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
      |      AS avg_bigram_p
      |  FROM p GROUP BY doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- statistical LM quality signal: add-one bigram likelihood ---------
    // The corpus-statistics quality score curation pipelines filter on
    // (CCNet-style LM scoring, deterministic edition): per document, the
    // average add-one-smoothed conditional bigram probability under the
    // corpus's own bigram model — boilerplate and fluent text score high,
    // token soup scores near 1/V. Two aggregation passes over the bigram
    // occurrence stream (staged once) + joins back: c(w1,w2) joins on the
    // bigram key (shuffle — bigram vocab grows with corpus), c(w1) joins
    // BROADCAST (unigram vocab is language-bounded, and w1 is maximally
    // skewed — broadcasting it removes the hot-key shuffle entirely).
    // Determinism contract: probabilities are IEEE divisions of identical
    // integers on both engines, rounded to 6dp, summed as DECIMAL (order-
    // free), divided by the count — the house dsum pattern.
    QueryDef(
      "q_bigram_likelihood",
      (s, d) => bigramScores(s, d).orderBy("doc_id"),
      Some(s"""WITH $bigramScoreCtes
             |SELECT doc_id, n_bigrams, avg_bigram_p
             |FROM scores ORDER BY doc_id""".stripMargin)),

    // ---- CCNet-style perplexity-bucket curation (Wenzek et al. 2020) ------
    // The canonical LM-filtered-corpus recipe as a composite over the
    // oracled bigram score: corpus-percentile thresholds split documents
    // into head/middle/tail (fluent → boilerplate-adjacent → soup), then
    // each bucket keeps a deterministic hash fraction (head 100%, middle
    // 50%, tail 10% — the md5 key-bucket sampling convention, so re-runs
    // and engines agree doc-by-doc). Thresholds are exact percentile_disc
    // over the rounded scores: one 1-row aggregate broadcast against the
    // score relation — no sort of the corpus, no second scoring pass. The
    // oracle replays scoring, thresholds, bucketing, and the kept counts.
    QueryDef(
      "q_ccnet_buckets",
      (s, d) => {
        val scores = bigramScores(s, d)
        val th = scores.agg(
          expr("percentile_disc(0.33) WITHIN GROUP (ORDER BY avg_bigram_p)")
            .as("p33"),
          expr("percentile_disc(0.66) WITHIN GROUP (ORDER BY avg_bigram_p)")
            .as("p66"))
        val kb = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast(org.apache.spark.sql.types.LongType) % 1000
        val rate = when(col("bucket") === "head", 1000L)
          .when(col("bucket") === "middle", 500L).otherwise(100L)
        scores.crossJoin(broadcast(th))
          .withColumn("bucket",
            when(col("avg_bigram_p") >= col("p66"), "head")
              .when(col("avg_bigram_p") >= col("p33"), "middle")
              .otherwise("tail"))
          .withColumn("kept", kb < rate)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(col("n_bigrams")).as("sum_bigrams"))
          .orderBy("bucket")
      },
      Some(s"""WITH $bigramScoreCtes,
             |th AS (
             |  SELECT percentile_disc(0.33) WITHIN GROUP (ORDER BY avg_bigram_p) AS p33,
             |         percentile_disc(0.66) WITHIN GROUP (ORDER BY avg_bigram_p) AS p66
             |  FROM scores),
             |b AS (
             |  SELECT s.*, CASE WHEN avg_bigram_p >= p66 THEN 'head'
             |                   WHEN avg_bigram_p >= p33 THEN 'middle'
             |                   ELSE 'tail' END AS bucket,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS kb
             |  FROM scores s CROSS JOIN th)
             |SELECT bucket, COUNT(*) AS n_docs,
             |  CAST(SUM(CASE WHEN kb < (CASE bucket WHEN 'head' THEN 1000
             |                                       WHEN 'middle' THEN 500
             |                                       ELSE 100 END)
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ---- token counting + basic stats -------------------------------------
    QueryDef(
      "q_text_stats",
      (s, d) =>
        t(s, d, "documents")
          .select(
            col("doc_id"),
            length(col("text")).as("len_chars"),
            size(split(trim(col("text")), "\\s+")).as("n_tokens"),
            (length(col("text")).cast(DoubleType) /
              size(split(trim(col("text")), "\\s+")).cast(DoubleType))
              .as("chars_per_token"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  LENGTH(text) AS len_chars,
             |  LENGTH(regexp_split_to_array(TRIM(text), '\s+')) AS n_tokens,
             |  CAST(LENGTH(text) AS DOUBLE) /
             |    CAST(LENGTH(regexp_split_to_array(TRIM(text), '\s+')) AS DOUBLE)
             |    AS chars_per_token
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Gopher quality rules (Rae et al. 2021, Appendix A) ---------------
    // The canonical published corpus-filter rule set, as a per-document
    // rule matrix + keep flag: word count in [50, 100k], mean word length
    // in [3, 10], symbol-to-word ratio (# or ellipsis) <= 0.1, >= 80% of
    // words contain an alphabetic character, and >= 2 distinct stopwords
    // present (the "harmful repetition" line-based rules need multi-line
    // documents; the synthetic corpus is single-line, so they'd be
    // constant columns and are omitted). Every ratio is a single int/int
    // IEEE division on both engines, so the threshold comparisons are
    // exact — the rule matrix hash-compares bit-for-bit.
    QueryDef(
      "q_text_gopher",
      (s, d) => {
        val words = split(trim(col("text")), "\\s+")
        val nWords = size(words)
        val meanLen = aggregate(transform(words, w => length(w)), lit(0),
          (acc, x) => acc + x).cast(DoubleType) / nWords.cast(DoubleType)
        val symRatio = regexp_count(col("text"), lit("#|\\.\\.\\."))
          .cast(DoubleType) / nWords.cast(DoubleType)
        val alphaRatio = size(filter(words, w => w.rlike("[A-Za-z]")))
          .cast(DoubleType) / nWords.cast(DoubleType)
        val stopsPresent = stopwordsEn.map(sw =>
          when(regexp_count(col("text"), lit(s"\\b$sw\\b")) > 0, 1)
            .otherwise(0)).reduce(_ + _)
        val r1 = nWords.between(50, 100000)
        val r2 = meanLen >= 3.0 && meanLen <= 10.0
        val r3 = symRatio <= 0.1
        val r4 = alphaRatio >= 0.8
        val r5 = stopsPresent >= 2
        t(s, d, "documents")
          .select(
            col("doc_id"),
            nWords.as("n_words"),
            meanLen.as("mean_word_len"),
            r1.cast("int").as("rule_word_count"),
            r2.cast("int").as("rule_mean_word_len"),
            r3.cast("int").as("rule_symbol_ratio"),
            r4.cast("int").as("rule_alpha_words"),
            r5.cast("int").as("rule_stopwords"),
            (r1 && r2 && r3 && r4 && r5).cast("int").as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (
              |  SELECT doc_id, text,
              |         regexp_split_to_array(TRIM(text), '\\s+') AS words
              |  FROM documents),
              |m AS (
              |  SELECT doc_id,
              |    LENGTH(words) AS n_words,
              |    CAST(list_sum(list_transform(words, x -> LENGTH(x))) AS DOUBLE)
              |      / CAST(LENGTH(words) AS DOUBLE) AS mean_word_len,
              |    CAST(LENGTH(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
              |      / CAST(LENGTH(words) AS DOUBLE) AS symbol_ratio,
              |    CAST(LENGTH(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
              |      / CAST(LENGTH(words) AS DOUBLE) AS alpha_ratio,
              |    (${stopwordsEn.map(sw =>
                     s"CASE WHEN LENGTH(regexp_extract_all(text, '\\b$sw\\b')) > 0 THEN 1 ELSE 0 END")
                     .mkString(" + ")}) AS n_stops
              |  FROM w)
              |SELECT doc_id, n_words, mean_word_len,
              |  CAST(n_words BETWEEN 50 AND 100000 AS INTEGER) AS rule_word_count,
              |  CAST(mean_word_len >= 3 AND mean_word_len <= 10 AS INTEGER) AS rule_mean_word_len,
              |  CAST(symbol_ratio <= 0.1 AS INTEGER) AS rule_symbol_ratio,
              |  CAST(alpha_ratio >= 0.8 AS INTEGER) AS rule_alpha_words,
              |  CAST(n_stops >= 2 AS INTEGER) AS rule_stopwords,
              |  CAST(n_words BETWEEN 50 AND 100000
              |    AND mean_word_len >= 3 AND mean_word_len <= 10
              |    AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
              |    AND n_stops >= 2 AS INTEGER) AS keep
              |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- quality scoring: stopword ratio + uniqueness ratio ---------------
    QueryDef(
      "q_text_quality",
      (s, d) => {
        val toks = size(split(trim(col("text")), "\\s+"))
        val stopPat = stopwordsEn.mkString("\\b(", "|", ")\\b")
        val stops = regexp_count(col("text"), lit(stopPat))
        val uniq = size(array_distinct(split(trim(col("text")), "\\s+")))
        t(s, d, "documents")
          .select(
            col("doc_id"),
            stops.as("n_stopwords"),
            (stops.cast(DoubleType) / toks.cast(DoubleType)).as("stopword_ratio"),
            (uniq.cast(DoubleType) / toks.cast(DoubleType)).as("uniq_token_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |  LENGTH(regexp_extract_all(text, '\\b(${stopwordsEn.mkString("|")})\\b')) AS n_stopwords,
              |  CAST(LENGTH(regexp_extract_all(text, '\\b(${stopwordsEn.mkString("|")})\\b')) AS DOUBLE) /
              |    CAST(LENGTH(regexp_split_to_array(TRIM(text), '\\s+')) AS DOUBLE) AS stopword_ratio,
              |  CAST(LENGTH(list_distinct(regexp_split_to_array(TRIM(text), '\\s+'))) AS DOUBLE) /
              |    CAST(LENGTH(regexp_split_to_array(TRIM(text), '\\s+')) AS DOUBLE) AS uniq_token_ratio
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- language-ID (n-gram/function-word heuristic) ---------------------
    // Scores each language by hits on a tiny per-language function-word list;
    // arg-max with a deterministic tie-break order. On the synthetic corpus
    // everything scores as English — the operator shape (scoring + argmax) is
    // what's under test; real word lists drop in without a plan change.
    QueryDef(
      "q_text_langid",
      (s, d) => {
        def hits(words: Seq[String]) =
          regexp_count(col("text"), lit(words.mkString("\\b(", "|", ")\\b")))
        val en = hits(Seq("the", "and", "of", "is"))
        val es = hits(Seq("el", "la", "los", "es"))
        val de = hits(Seq("der", "die", "das", "und"))
        val fr = hits(Seq("le", "les", "des", "est"))
        val best = greatest(en, es, de, fr)
        val lang = when(best === 0, lit("und"))
          .when(en === best, lit("en"))
          .when(es === best, lit("es"))
          .when(de === best, lit("de"))
          .otherwise(lit("fr"))
        t(s, d, "documents")
          .select(col("doc_id"), lang.as("lang_guess"), best.as("best_score"))
          .orderBy("doc_id")
      },
      Some("""WITH scored AS (
             |  SELECT doc_id,
             |    LENGTH(regexp_extract_all(text, '\b(the|and|of|is)\b')) AS en,
             |    LENGTH(regexp_extract_all(text, '\b(el|la|los|es)\b'))  AS es,
             |    LENGTH(regexp_extract_all(text, '\b(der|die|das|und)\b')) AS de,
             |    LENGTH(regexp_extract_all(text, '\b(le|les|des|est)\b')) AS fr
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN GREATEST(en, es, de, fr) = 0 THEN 'und'
             |       WHEN en = GREATEST(en, es, de, fr) THEN 'en'
             |       WHEN es = GREATEST(en, es, de, fr) THEN 'es'
             |       WHEN de = GREATEST(en, es, de, fr) THEN 'de'
             |       ELSE 'fr' END AS lang_guess,
             |  GREATEST(en, es, de, fr) AS best_score
             |FROM scored ORDER BY doc_id""".stripMargin)),

    // ---- BPE-ish regex tokenization (builder prompt: whitespace + a
    // BPE-style pre-tokenizer). The pattern is the GPT-2 pre-tokenizer
    // simplified to the RE2-compatible subset (no lookahead — DuckDB is
    // RE2): contractions, letter runs, digit runs, punctuation runs.
    QueryDef(
      "q_tokenize_bpe",
      (s, d) => {
        val bpe = "'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
        t(s, d, "documents")
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
            size(regexp_extract_all(col("text"), lit(bpe), lit(0))).as("n_bpe_tokens"),
            size(regexp_extract_all(col("text"), lit("[a-zA-Z]+"), lit(0))).as("n_alpha"),
            size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_num"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  LENGTH(regexp_split_to_array(TRIM(text), '\s+')) AS n_ws_tokens,
             |  CAST(LENGTH(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS INT) AS n_bpe_tokens,
             |  CAST(LENGTH(regexp_extract_all(text, '[a-zA-Z]+')) AS INT) AS n_alpha,
             |  CAST(LENGTH(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_num
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- global token frequency (explode + agg) ---------------------------
    QueryDef(
      "q_token_freq",
      (s, d) =>
        t(s, d, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      Some("""SELECT token, COUNT(*) AS n
             |FROM (SELECT UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS token
             |      FROM documents)
             |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin)),

    // ---- adjacent-token bigram frequencies (the BPE merge-step statistic:
    // each learned merge is the currently most frequent adjacent pair) ----
    QueryDef(
      "q_token_bigrams",
      (s, d) => {
        val ta = split(trim(col("text")), "\\s+")
        val n = size(ta)
        val bigrams = when(n >= 2,
          zip_with(slice(ta, lit(1), n - 1), slice(ta, lit(2), n - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))
        t(s, d, "documents")
          .select(explode(bigrams).as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20)
      },
      Some("""SELECT bigram, COUNT(*) AS n FROM (
             |  SELECT UNNEST(list_transform(
             |    range(1, greatest(length(ta), 1)),
             |    i -> ta[i] || ' ' || ta[i+1])) AS bigram
             |  FROM (SELECT regexp_split_to_array(TRIM(text), '\s+') AS ta
             |        FROM documents))
             |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin)),

    // ---- exact deduplication (hash-groupBy; keeps lowest doc_id) ----------
    // The 100 TB shape: group on md5(text) — fixed-width shuffle key instead
    // of shuffling full document bodies.
    QueryDef(
      "q_dedup_exact",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(md5(col("text")).as("fingerprint"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("keep_id"),
      Some("""SELECT md5(text) AS fingerprint,
             |       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)),

    // ---- corpus-weighted term importance: per-doc top-3 by tf-idf --------
    // The keyword-extraction primitive curation pipelines use for topic
    // tagging and domain mixing. Scale shape: tf is a (doc_id, token)
    // aggregation, df a second aggregation over tf's (already reduced)
    // output, the tf×df join shuffles on token (vocab grows with corpus —
    // not broadcastable by design), and the top-k is a row_number window
    // PARTITIONED BY doc — bounded per key, never a global sort. N (corpus
    // size) is a 1-row agg crossed in as a broadcast literal.
    // Determinism: rank on the 6dp-ROUNDED score (identical int inputs →
    // identical IEEE division/ln on both engines at 6dp), token tie-break.
    QueryDef(
      "q_tfidf_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = t(s, d, "documents")
          .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val n = t(s, d, "documents").agg(count(lit(1)).as("n_total"))
        val scored = tf.join(df, "token")
          .crossJoin(broadcast(n))
          .withColumn("score",
            round(col("tf").cast("double") *
              log(col("n_total").cast("double") / col("df").cast("double")), 6))
        scored
          .withColumn("rank", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("score").desc, col("token"))))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("token"), col("tf"),
            col("df"), col("score"))
          .orderBy("doc_id", "rank")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, token, COUNT(*) AS tf FROM (
             |    SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS token
             |    FROM documents) GROUP BY doc_id, token),
             |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
             |n AS (SELECT COUNT(*) AS n_total FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
             |         ROUND(CAST(tf.tf AS DOUBLE) *
             |               ln(CAST(n.n_total AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS score
             |  FROM tf JOIN df USING (token) CROSS JOIN n),
             |ranked AS (
             |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
             |           PARTITION BY doc_id ORDER BY score DESC, token) AS INTEGER) AS rank,
             |         token, tf, df, score
             |  FROM scored)
             |SELECT doc_id, rank, token, tf, df, score FROM ranked
             |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // ---- BM25 term scoring (Robertson-Sparck Jones; the retrieval twin of
    // q_tfidf_topk) ---------------------------------------------------------
    // Okapi BM25 with the Lucene idf (ln(1 + (N-df+0.5)/(df+0.5))) and
    // length normalization k1=1.2, b=0.75: the scorer every search stack
    // ships, and the piece tf-idf lacks — term-frequency SATURATION (a
    // 100-occurrence token isn't 100× more relevant) and short-document
    // compensation via dl/avgdl. Plan shape: tf and dl come from one
    // explode; df from the reduced tf grain (never re-tokenizes); N and
    // total token count cross in as a broadcast 1-row aggregate; the dl
    // join and the final per-doc window share the doc_id partitioning, so
    // top-3-per-doc plans as WindowGroupLimit with no extra exchange.
    // Both engines evaluate the identically-parenthesized double
    // expression, rounded to 6 places with an exact token tie-break.
    QueryDef(
      "q_bm25_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = t(s, d, "documents")
          .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("token"))
        val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_total"), sum("dl").as("t_tokens"))
        val joined = tf.join(dfreq, "token").join(dl, "doc_id")
          .crossJoin(broadcast(stats))
        val avgdl = col("t_tokens").cast("double") / col("n_total").cast("double")
        val idf = log(lit(1.0) +
          (col("n_total").cast("double") - col("df").cast("double") + 0.5) /
            (col("df").cast("double") + 0.5))
        val norm = (col("tf").cast("double") * 2.2) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
        joined
          .withColumn("score", round(idf * norm, 6))
          .withColumn("rank", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("score").desc, col("token"))))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("token"), col("tf"),
            col("df"), col("dl"), col("score"))
          .orderBy("doc_id", "rank")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS token
             |  FROM documents),
             |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
             |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
             |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
             |stats AS (SELECT COUNT(*) AS n_total, SUM(dl) AS t_tokens FROM dl),
             |scored AS (
             |  SELECT tf.doc_id, tf.token, tf.tf, df.df, dl.dl,
             |    ROUND(
             |      ln(1.0 + (CAST(s.n_total AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
             |               / (CAST(df.df AS DOUBLE) + 0.5)) *
             |      ((CAST(tf.tf AS DOUBLE) * 2.2) /
             |       (CAST(tf.tf AS DOUBLE) +
             |        1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) /
             |          (CAST(s.t_tokens AS DOUBLE) / CAST(s.n_total AS DOUBLE)))))),
             |      6) AS score
             |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s),
             |ranked AS (
             |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
             |           PARTITION BY doc_id ORDER BY score DESC, token) AS INTEGER) AS rank,
             |         token, tf, df, dl, score
             |  FROM scored)
             |SELECT doc_id, rank, token, tf, df, dl, score FROM ranked
             |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // ---- DQ regex column rule (§2.10 columnRules, reference DataQuality
    // F2 semantics: per-cell matches(pattern), violations counted) ----------
    QueryDef(
      "q_dq_regex",
      (s, d) => {
        val docs = t(s, d, "documents")
        docs.groupBy("source").agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("lang").rlike("^[a-z]{2}$"), 0).otherwise(1))
            .as("lang_violations"),
          sum(when(col("text").rlike("^[a-z ]+$"), 0).otherwise(1))
            .as("text_violations"))
          .orderBy("source")
      },
      Some("""SELECT source, COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN regexp_matches(lang, '^[a-z]{2}$') THEN 0 ELSE 1 END) AS BIGINT) AS lang_violations,
             |  CAST(SUM(CASE WHEN regexp_matches(text, '^[a-z ]+$') THEN 0 ELSE 1 END) AS BIGINT) AS text_violations
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- hashed-linear quality classifier (fasttext shape) ----------------
    // The inference half of a fasttext-style linear text classifier: each
    // token maps to a HASHED weight slot (no vocabulary table to ship —
    // the standard hashing-trick layout, Weinberger et al. 2009), the doc
    // score is the mean token weight, and the band is the decision. The
    // sigmoid is omitted deliberately: it is monotone, so thresholding the
    // raw mean decides identically and the oracle never has to compare
    // transcendental libm outputs across engines. Weights here are derived
    // from md5 (engine-neutral) in lieu of trained values — swapping in a
    // real weight table changes ONE projection, not the plan. All math
    // before the final division is INTEGER (exact, order-independent), so
    // the aggregation commutes across any partitioning; the plan is one
    // explode + one groupBy on doc_id — map-side combinable, one shuffle.
    QueryDef(
      "q_quality_classifier",
      (s, d) => {
        val wMilli =
          conv(substring(md5(lower(col("tok"))), 1, 7), 16, 10)
            .cast(LongType) % 1001 - 500
        t(s, d, "documents")
          .select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("tok"))
          .select(col("doc_id"), wMilli.as("w_milli"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"), sum(col("w_milli")).as("sw"))
          .select(col("doc_id"), col("n_tok"),
            round(col("sw").cast(DoubleType) /
              (col("n_tok").cast(DoubleType) * 1000.0), 6).as("score"))
          .withColumn("band",
            when(col("score") > 0.01, "high")
              .when(col("score") < -0.01, "low").otherwise("mid"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS tok0
             |  FROM documents),
             |w AS (
             |  SELECT doc_id,
             |         ('0x' || substr(md5(LOWER(tok0)), 1, 7))::BIGINT % 1001 - 500 AS w_milli
             |  FROM toks),
             |agg AS (
             |  SELECT doc_id, COUNT(*) AS n_tok,
             |         ROUND(CAST(SUM(w_milli) AS DOUBLE) /
             |               (CAST(COUNT(*) AS DOUBLE) * 1000.0), 6) AS score
             |  FROM w GROUP BY doc_id)
             |SELECT doc_id, n_tok, score,
             |       CASE WHEN score > 0.01 THEN 'high'
             |            WHEN score < -0.01 THEN 'low' ELSE 'mid' END AS band
             |FROM agg ORDER BY doc_id""".stripMargin))
  )
}
