package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window operators over the `events` table (SURVEY.md §2.9:
  * absent in the reference; the Spark-native analogue is the built-in
  * `window`/`session_window` family, identical in batch and
  * Structured Streaming — the same functions are reused by
  * [[EventStreams]] with a watermark on top).
  *
  * Scale: windowed aggregation shuffles on (window, keys) — partial
  * aggregation happens map-side per input partition, so shuffle
  * volume is #distinct (window, key) pairs, independent of event
  * count. Session windows shuffle on the session key (user) then
  * merge per-key sorted runs.
  */
object EventWindows {

  /** Tumbling-window aggregate: count + exact value sum per
    * (window start, event_type). The sum aggregates exact integer
    * cents (value is 2-decimal; scale-0 round of value·100 is exact
    * and engine-agreed) with ONE final division — a float
    * sum-then-round is partition-order-dependent at the .xx5
    * boundary the jitter sweep forces (the q04 class). */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window aggregate (width, slide). */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session-window stats per user (gap-based sessionization):
    * sessions close after `gap` of inactivity. */
  def sessions(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"))

  /** JSON props extraction (the events side-channel payload). */
  def propsField(props: Column, field: String): Column =
    get_json_object(props, "$." + field)
}
