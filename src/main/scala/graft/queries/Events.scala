package graft.queries

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import QueryDef.{dsum, dsumSql}

/** Event-stream operator coverage (SURVEY.md §2.9 batch-equivalents): tumbling
  * window aggregation, JSON extraction (§1.2 `_json` column semantics),
  * gap-based sessionization (the stateful-streaming shape, here in its batch
  * form — the Structured Streaming twin lives in graft.streaming), and pivot.
  *
  * Determinism notes: `events.ts` arrives as LongType nanos-since-epoch
  * regardless of what the parquet carries (TIMESTAMP(NANOS) or microsecond
  * TIMESTAMP/NTZ) — Tables.load normalizes the column at the scan — while
  * DuckDB keeps a timestamp. Queries therefore compare only
  * micro-or-coarser derivations: Spark floor-divides the nanos long,
  * DuckDB uses `epoch`/`epoch_us` — identical for positive epochs.
  */
object Events {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- tumbling-window aggregation (batch form of readStream+window) ----
    QueryDef(
      "q_events_hourly",
      (s, d) =>
        t(s, d, "events")
          .groupBy(
            (expr("ts div 1000000000") - expr("ts div 1000000000") % 3600)
              .as("hour_epoch"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("hour_epoch", "event_type"),
      Some(s"""SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
              |       event_type, COUNT(*) AS n,
              |       ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin)),

    // ---- JSON extraction over the `_json`-style string column -------------
    QueryDef(
      "q_events_json",
      (s, d) =>
        t(s, d, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
          .groupBy((col("k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
          .orderBy("k_mod"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
             |       COUNT(*) AS n,
             |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin)),

    // ---- gap-based sessionization (30-min inactivity window) --------------
    // The batch twin of flatMapGroupsWithState sessionization: lag() to flag
    // session starts, running sum to number sessions, then per-session agg.
    // At scale this is one shuffle on user_id (window + groupBy share it).
    QueryDef(
      "q_events_sessionize",
      (s, d) => {
        val sec = expr("ts div 1000000000")
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("sec"), col("event_id"))
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), sec.as("sec"))
          .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1)
              .otherwise(0))
          .withColumn("session_id",
            sum(col("new_sess")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ev.groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id,
             |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, sec,
             |         CASE WHEN lag(sec) OVER w IS NULL
             |                   OR sec - lag(sec) OVER w > 1800
             |              THEN 1 ELSE 0 END AS new_sess
             |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
             |sessions AS (
             |  SELECT user_id, sec,
             |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |       MIN(sec) AS start_sec, MAX(sec) AS end_sec
             |FROM sessions GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // ---- pivot (wide per-user event-type counts) --------------------------
    QueryDef(
      "q_events_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = t(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
        types.foldLeft(pivoted) { (df, ty) =>
          df.withColumn(s"n_$ty", coalesce(col(ty), lit(0L))).drop(ty)
        }.orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  COUNT(*) FILTER (event_type = 'click')    AS n_click,
             |  COUNT(*) FILTER (event_type = 'error')    AS n_error,
             |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
             |  COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
             |  COUNT(*) FILTER (event_type = 'view')     AS n_view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- ordered funnel analysis (view → click → purchase) ---------------
    // Stage timestamps must be ORDERED per user (the click counts only
    // after the first view, the purchase only after that click) — the
    // sequence constraint pivot counts can't express. Three min-aggregates
    // chained on user_id: every join/agg shares the same shuffle key, so
    // the whole funnel is one partitioning of the event table. Nanosecond
    // longs on both engines (Spark reads TIMESTAMP(NANOS) as ns longs,
    // DuckDB via epoch_ns) — exact integers, no float time math.
    QueryDef(
      "q_events_funnel",
      (s, d) => {
        // µs from the first projection on: DuckDB reads TIMESTAMP(NANOS)
        // at µs precision, so BOTH the stage comparisons and the output
        // run on the same truncated clock (a ns-side comparison could
        // order two same-µs events differently than the oracle)
        val ev = t(s, d, "events").select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("tus"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("tus").as("tv"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("tus") > col("tv"))
          .groupBy("user_id").agg(min("tus").as("tc"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("tus") > col("tc"))
          .groupBy("user_id").agg(min("tus").as("tp"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("tv"), col("tc"), col("tp"),
            (lit(1) + when(col("tc").isNotNull, 1).otherwise(0) +
              when(col("tp").isNotNull, 1).otherwise(0)).cast("int").as("stage"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tns FROM events),
             |v AS (SELECT user_id, MIN(tns) AS tv FROM e
             |      WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, MIN(tns) AS tc FROM e JOIN v USING (user_id)
             |      WHERE event_type = 'click' AND tns > tv GROUP BY 1),
             |p AS (SELECT e.user_id, MIN(tns) AS tp FROM e JOIN c USING (user_id)
             |      WHERE event_type = 'purchase' AND tns > tc GROUP BY 1)
             |SELECT v.user_id, tv, tc, tp,
             |  CAST(1 + CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END +
             |           CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage
             |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // ---- cohort retention matrix ------------------------------------------
    // Users cohorted by first-seen epoch-week; for each (cohort, week
    // offset) the fraction of the cohort active that week. Week ids come
    // straight from the ns clock (floor composition makes ns-side and the
    // oracle's µs-side division agree for every value). Two aggregations
    // and one join, all on bounded keys — cohorts × offsets output rows.
    QueryDef(
      "q_events_retention",
      (s, d) => {
        val weekNs = 604800L * 1000000000L
        val e = t(s, d, "events")
          .select(col("user_id"), expr(s"ts div $weekNs").as("week"))
        val first = e.groupBy("user_id").agg(min("week").as("cohort"))
        val active = e.distinct()
        val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
        active.join(first, "user_id")
          .select(col("cohort"), (col("week") - col("cohort")).as("week_offset"),
            col("user_id"))
          .groupBy("cohort", "week_offset")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(sizes, "cohort")
          .select(col("cohort"), col("week_offset"), col("n_active"), col("n_cohort"),
            round(col("n_active").cast("double") /
              col("n_cohort").cast("double"), 6).as("retention"))
          .orderBy("cohort", "week_offset")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week
             |           FROM events),
             |fw AS (SELECT user_id, MIN(week) AS cohort FROM e GROUP BY 1),
             |active AS (SELECT DISTINCT user_id, week FROM e),
             |sizes AS (SELECT cohort, COUNT(*) AS n_cohort FROM fw GROUP BY 1),
             |m AS (
             |  SELECT cohort, week - cohort AS week_offset,
             |         COUNT(DISTINCT a.user_id) AS n_active
             |  FROM active a JOIN fw f USING (user_id)
             |  GROUP BY 1, 2)
             |SELECT cohort, week_offset, n_active, n_cohort,
             |       ROUND(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
             |         AS retention
             |FROM m JOIN sizes USING (cohort)
             |ORDER BY cohort, week_offset""".stripMargin)),

    // ---- as-of join (point-in-time: each purchase ↔ latest prior click) --
    // Spark lacks ASOF JOIN; operators.AsofJoin composes it as ONE shuffle
    // (union + sorted carry-forward window) — no range join, which Spark
    // would execute as a nested loop. DuckDB HAS a native ASOF JOIN, so the
    // oracle checks our composition against an independent implementation
    // of the same semantics.
    QueryDef(
      "q_asof_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        // timestamps compared at µs: DuckDB's TIMESTAMP is µs-precision, so
        // the ns parquet truncates there — truncate identically here
        graft.operators.AsofJoin(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts")
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"),
            col("asof_click_id"),
            expr("asof_ts div 1000").as("click_ts_us"))
          .orderBy("event_id")
      },
      Some("""SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us,
             |       c.event_id AS asof_click_id, epoch_us(c.ts) AS click_ts_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ---- as-of join with tolerance (latest prior click ≤ 30 min old) ------
    // merge_asof's `tolerance`: a match staler than the bound degrades to
    // no-match. The whole comparison runs on the µs clock so both engines
    // agree on the boundary.
    QueryDef(
      "q_asof_tolerance",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id").as("click_id"))
        graft.operators.AsofJoin(purchases, clicks, Seq("user_id"),
          leftTs = "ts_us", rightTs = "ts_us",
          tolerance = Some(1800000000L)) // 30 min in µs
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("asof_click_id"), col("asof_ts_us").as("click_ts_us"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, epoch_us(ts) AS ts_us,
             |             event_id AS click_id
             |      FROM events WHERE event_type = 'click'),
             |m AS (
             |  SELECT p.user_id, p.event_id, p.ts_us,
             |         c.click_id, c.ts_us AS click_ts_us
             |  FROM p ASOF LEFT JOIN c
             |    ON p.user_id = c.user_id AND p.ts_us >= c.ts_us)
             |SELECT user_id, event_id, ts_us,
             |  CASE WHEN ts_us - click_ts_us <= 1800000000
             |       THEN click_id END AS asof_click_id,
             |  CASE WHEN ts_us - click_ts_us <= 1800000000
             |       THEN click_ts_us END AS click_ts_us
             |FROM m ORDER BY event_id""".stripMargin)),

    // ---- forward as-of join (each click ↔ NEXT purchase at-or-after) ------
    // merge_asof direction='forward' (the "time-to-next-event" shape):
    // same one-shuffle union+window plan with the scan order reversed.
    // DuckDB's native ASOF expresses forward by flipping the inequality
    // (l.ts <= r.ts picks the SMALLEST satisfying right ts), so the oracle
    // stays an independent implementation of the same semantics.
    QueryDef(
      "q_asof_forward",
      (s, d) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id").as("purchase_id"))
        graft.operators.AsofJoin(clicks, purchases, Seq("user_id"),
          leftTs = "ts_us", rightTs = "ts_us", direction = "forward")
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("asof_purchase_id"),
            (col("asof_ts_us") - col("ts_us")).as("lead_us"))
          .orderBy("event_id")
      },
      Some("""SELECT c.user_id, c.event_id, epoch_us(c.ts) AS ts_us,
             |       p.event_id AS asof_purchase_id,
             |       epoch_us(p.ts) - epoch_us(c.ts) AS lead_us
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON c.user_id = p.user_id AND c.ts <= p.ts
             |ORDER BY c.event_id""".stripMargin)),

    // ---- bucketed range join (clicks within 1h after a signup) ------------
    // operators.RangeJoin bucketizes the time axis (15-min buckets) so the
    // range condition becomes an equi-join on (user, bucket) + residual
    // BETWEEN — never Spark's nested-loop fallback. Compared at µs like the
    // oracle (DuckDB timestamps are µs).
    QueryDef(
      "q_range_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id").as("click_id"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), expr("ts div 1000").as("lo_us"),
            expr("ts div 1000 + 3600000000").as("hi_us"),
            col("event_id").as("signup_id"))
        graft.operators.RangeJoin.pointInInterval(
          clicks, signups, Seq("user_id"),
          pointCol = "ts_us", loCol = "lo_us", hiCol = "hi_us",
          bucketWidth = 900000000L) // 15 min in µs
          .select("user_id", "click_id", "signup_id", "ts_us", "lo_us")
          .orderBy("click_id", "signup_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, s.event_id AS signup_id,
             |       epoch_us(c.ts) AS ts_us, epoch_us(s.ts) AS lo_us
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |JOIN (SELECT * FROM events WHERE event_type = 'signup') s
             |  ON c.user_id = s.user_id
             | AND epoch_us(c.ts) BETWEEN epoch_us(s.ts) AND epoch_us(s.ts) + 3600000000
             |ORDER BY click_id, signup_id""".stripMargin)),

    // ---- attribution: per-purchase view counts in the preceding hour ------
    // The batch form of the stream-stream interval join (EventStreams
    // .attributionJoin): purchases attribute the same user's views within
    // [purchase-1h, purchase]. Planned through RangeJoin's bucketization so
    // the time predicate rides an equi-join on (user, bucket) — one shuffle
    // per side, no nested loop — then a per-purchase aggregation that reuses
    // the same user-keyed partitioning. Seconds grain on both engines.
    QueryDef(
      "q_attribution",
      (s, d) => {
        val ev = t(s, d, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), expr("ts div 1000000000").as("view_sec"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"),
            expr("ts div 1000000000 - 3600").as("lo_sec"),
            expr("ts div 1000000000").as("purchase_sec"),
            col("event_id").as("purchase_id"))
        graft.operators.RangeJoin.pointInInterval(
          views, purchases, Seq("user_id"),
          pointCol = "view_sec", loCol = "lo_sec", hiCol = "purchase_sec",
          bucketWidth = 900L)
          .groupBy("purchase_id", "user_id", "purchase_sec")
          .agg(count(lit(1)).as("n_views"),
            min(col("purchase_sec") - col("view_sec")).as("min_lag_sec"),
            max(col("purchase_sec") - col("view_sec")).as("max_lag_sec"))
          .orderBy("purchase_id")
      },
      Some(attributionOracleSql)),

    // ---- STREAMING equivalence for the attribution interval join ----------
    // Runs the real Structured Streaming stream-stream join (EventStreams
    // .attributionJoin: both sides watermarked, two-sided time-range
    // condition bounding the state store) over a file-source stream of the
    // events table, lands the joined rows in a memory sink, then aggregates
    // them to the exact shape of q_attribution — and must hash-match the
    // same DuckDB oracle. Inner-mode emission is arrival-complete, so the
    // single AvailableNow batch yields the full batch-join result.
    QueryDef(
      "q_attribution_stream_equiv",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val fileSchema = s.read.parquet(s"$d/events.parquet").schema
        val tsIsLong = fileSchema("ts").dataType == LongType
        def src() = {
          // FileStreamSource needs a DIRECTORY basePath. A real lake table
          // (and GenScale output) IS a directory — stream it directly; the
          // driver's single-FILE testdata layout streams its parent dir
          // with a glob pinned to the one file. (A glob under the
          // directory layout would silently match nothing: the files
          // inside are part-*.parquet.)
          val tableFile = new java.io.File(s"$d/events.parquet")
          val raw =
            if (tableFile.isDirectory)
              s.readStream.schema(fileSchema).parquet(tableFile.getPath)
            else s.readStream.schema(fileSchema)
              .option("pathGlobFilter", "events.parquet").parquet(d)
          // same normalization contract as Tables.load: ns-long or native
          // timestamp parquet both reduce to a seconds-grain event time
          val sec =
            if (tsIsLong) expr("ts div 1000000000")
            else expr("unix_micros(cast(ts as timestamp)) div 1000000")
          raw.withColumn("tsec", timestamp_seconds(sec))
        }
        val views = src().filter(col("event_type") === "view")
          .select(col("tsec").as("ts"), col("user_id"))
        val purchases = src().filter(col("event_type") === "purchase")
          .select(col("tsec").as("ts"), col("user_id"),
            col("event_id"))
        val joined = graft.streaming.EventStreams.attributionJoin(
          views, purchases, windowMinutes = 60, watermark = "1 hour",
          how = "inner", carryPurchaseCols = Seq("event_id"))
        val sink = "attrib_equiv_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = joined.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .option("checkpointLocation",
            graft.Scratch.fresh("graft-attrib") + "/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(sink)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_timestamp(col("purchase_ts")).as("purchase_sec"),
            unix_timestamp(col("view_ts")).as("view_sec"))
          .groupBy("purchase_id", "user_id", "purchase_sec")
          .agg(count(lit(1)).as("n_views"),
            min(col("purchase_sec") - col("view_sec")).as("min_lag_sec"),
            max(col("purchase_sec") - col("view_sec")).as("max_lag_sec"))
          .orderBy("purchase_id")
      },
      Some(attributionOracleSql))
  )

  /** Shared oracle: the batch interval join and its streaming twin must
    * produce byte-identical per-purchase attributions.
    */
  private lazy val attributionOracleSql: String =
    """WITH ev AS (SELECT event_id, user_id, event_type,
      |                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events)
      |SELECT p.event_id AS purchase_id, p.user_id, p.sec AS purchase_sec,
      |       COUNT(*) AS n_views,
      |       MIN(p.sec - v.sec) AS min_lag_sec,
      |       MAX(p.sec - v.sec) AS max_lag_sec
      |FROM ev p JOIN ev v ON p.user_id = v.user_id
      |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
      |  AND v.sec BETWEEN p.sec - 3600 AND p.sec
      |GROUP BY 1, 2, 3 ORDER BY purchase_id""".stripMargin
}
