package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of the batch event queries (graft.queries
  * .Events): the same logical aggregation declared over an unbounded
  * source, with event-time watermarking — the piece the reference lacks
  * entirely (SURVEY §2.9: poll loops, no event-time) and Spark provides
  * natively.
  */
object EventStreams {

  /** Streaming twin of q_events_hourly: tumbling 1-hour event-time windows
    * of event counts per type, 2-hour watermark for late data. Input: any
    * streaming DataFrame with (ts timestamp, event_type string).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("approx_users"))

  /** Sessionization twin (q_events_sessionize's streaming form): session
    * windows with a 30-minute gap per user. `session_window` is Spark's
    * native stateful gap-session operator — state store + watermark expiry
    * replace the batch query's lag/cumsum window trick.
    */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Streaming deduplication — the intake twin of the batch dedup family:
    * drop re-deliveries of the same key within the watermark horizon
    * (`dropDuplicates` keeps per-key state; the watermark bounds it, so
    * state is O(keys per horizon), not O(stream)). `keys` should be the
    * natural identity (doc id, content hash); include the event-time
    * column implicitly via the watermark.
    */
  def dedupeStream(events: DataFrame, tsCol: String, keys: Seq[String],
      horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicates(keys :+ tsCol)

  /** Running per-user session state carried between micro-batches. */
  final case class SessionState(
      start: Long, last: Long, n: Long, firstEvent: String, lastEvent: String)

  /** A CLOSED session, emitted once — with the first/last event types the
    * built-in `session_window` aggregation can't carry.
    */
  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, first_event: String, last_event: String)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * KeyValueGroupedDataset path for semantics the built-ins can't express:
    * emit a record ONLY when a session CLOSES (gap passed or event-time
    * timeout fired), carrying first/last event types across micro-batches.
    *
    * State per key is one fixed-size [[SessionState]]; expiry rides the
    * watermark (EventTimeTimeout), so idle users cost nothing after
    * watermark + gap. Input columns: (ts timestamp, user_id long,
    * event_type string); output mode must be Append.
    */
  def closedSessions(events: DataFrame, gapMinutes: Int = 30): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", "2 hours")
      .select(col("ts"), col("user_id").cast("long"), col("event_type"))
      .as[(Timestamp, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, batch: Iterator[(Timestamp, Long, String)],
         state: GroupState[SessionState]) => {
          def emit(s: SessionState): ClosedSession =
            ClosedSession(user, new Timestamp(s.start), new Timestamp(s.last),
              s.n, s.firstEvent, s.lastEvent)
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events → session closes
            val out = state.getOption.map(emit).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_._1.getTime)
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { case (t, _, tpe) =>
              val ms = t.getTime
              cur match {
                case Some(s) if ms - s.last <= gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, ms), n = s.n + 1,
                    lastEvent = if (ms >= s.last) tpe else s.lastEvent))
                case Some(s) => // intra-batch gap → close and start fresh
                  closed += emit(s)
                  cur = Some(SessionState(ms, ms, 1, tpe, tpe))
                case None =>
                  cur = Some(SessionState(ms, ms, 1, tpe, tpe))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
        })
  }

  /** Stream-static enrichment: join the unbounded stream with a bounded
    * dimension (user profile, source registry). Spark plans this
    * STATELESSLY — the static side is re-resolved per micro-batch (a
    * catalog-table dim picks up table swaps between batches) and a small
    * dim broadcasts, so the stream side never shuffles. `how` may be
    * "inner" or "left_outer" (the stream side must drive an outer join).
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      how: String = "left_outer"): DataFrame = {
    require(Seq("inner", "left_outer").contains(how),
      s"stream-static enrichment supports inner/left_outer, got '$how'")
    stream.join(broadcast(dim), keys, how)
  }

  /** Per-user funnel progress carried across micro-batches (-1 = stage not
    * reached): the streaming twin of the batch `q_events_funnel`.
    */
  final case class FunnelState(tv: Long, tc: Long, tp: Long)

  final case class FunnelProgress(
      user_id: Long, stage: Int, tv: Long, tc: Long, tp: Long)

  /** Streaming funnel: a per-user state machine over view → click →
    * purchase, advanced in ARRIVAL order (micro-batch semantics, like the
    * CDC path — a late-arriving earlier view does not retract an accepted
    * click; the batch query is the event-time-exact reference). State per
    * user is three longs; output mode Update emits each user's current
    * stage whenever it advances.
    */
  def funnelProgress(events: DataFrame): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("ts"), col("user_id").cast("long"), col("event_type"))
      .as[(Timestamp, Long, String)]
      .groupByKey(_._2)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[(Timestamp, Long, String)],
         state: GroupState[FunnelState]) => {
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          batch.toSeq.sortBy(_._1.getTime).foreach { case (t, _, tpe) =>
            val ms = t.getTime
            tpe match {
              case "view" if st.tv < 0 => st = st.copy(tv = ms)
              case "click" if st.tv >= 0 && st.tc < 0 && ms > st.tv =>
                st = st.copy(tc = ms)
              case "purchase" if st.tc >= 0 && st.tp < 0 && ms > st.tc =>
                st = st.copy(tp = ms)
              case _ => // out-of-order or repeated stage: ignored
            }
          }
          state.update(st)
          val stage = (if (st.tv >= 0) 1 else 0) +
            (if (st.tc >= 0) 1 else 0) + (if (st.tp >= 0) 1 else 0)
          FunnelProgress(user, stage, st.tv, st.tc, st.tp)
        })
  }

  /** Watermarked stream-stream interval join — the attribution shape:
    * each purchase joins to the same user's views in the preceding
    * `windowMinutes`. Spark buffers BOTH sides in the state store; the
    * watermarks plus the two-sided time-range condition are what BOUND
    * that state (views older than the purchase watermark minus the window
    * are evicted, ditto purchases past their own watermark) — an
    * equality-only stream-stream join would grow state forever, so the
    * interval is a scale requirement, not a semantic nicety. At 100 TB
    * both sides shuffle once on user_id and state is per-key local.
    *
    * `how` = "inner" (rows emit as soon as both sides have arrived) or
    * "left_outer" (an unmatched purchase emits null view columns only
    * after the view-side watermark passes purchase_ts, i.e. a late view
    * can no longer appear — outer results are necessarily
    * watermark-delayed).
    *
    * Inputs: two streaming frames with (ts timestamp, user_id long).
    * `carryPurchaseCols` names extra purchase-side columns (an order id,
    * an amount) to carry through to the output unchanged — attribution is
    * per purchase, so downstream grouping needs the purchase identity.
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 60, watermark: String = "1 hour",
      how: String = "inner",
      carryPurchaseCols: Seq[String] = Nil): DataFrame = {
    require(Seq("inner", "left_outer").contains(how),
      s"stream-stream attribution supports inner/left_outer, got '$how'")
    val v = views
      .select(col("ts").as("view_ts"), col("user_id").as("view_user"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("ts").as("purchase_ts") +: col("user_id") +:
        carryPurchaseCols.map(col): _*)
      .withWatermark("purchase_ts", watermark)
    p.join(v,
      col("user_id") === col("view_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $windowMinutes MINUTES"),
      how)
      .select(col("user_id") +: col("purchase_ts") +: col("view_ts") +:
        carryPurchaseCols.map(col): _*)
  }
}
