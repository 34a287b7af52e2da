package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
