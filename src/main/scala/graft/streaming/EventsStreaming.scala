package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming over the `events` stream shape (SURVEY.md §2.8:
  * the reference is batch-only; this is the additive north-star path —
  * same transforms work on a batch DataFrame, which is how the
  * correctness oracle exercises them).
  *
  * Scale notes: every aggregation is keyed on (window, key) — state is
  * bounded by watermark eviction; dedup state is bounded by the
  * watermark horizon. No driver-side state.
  */
object EventsStreaming {

  /** Tumbling-window counts/sums per event type. On a streaming input,
    * pair with `withWatermark` (see [[withLateDataHandling]]); on a
    * batch input this is the plain windowed aggregate the oracle
    * checks. */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked variant: late events beyond the delay are dropped and
    * window state is evicted. */
  def withLateDataHandling(stream: DataFrame, delay: String = "10 minutes",
                           windowLength: String = "1 hour"): DataFrame =
    windowedAgg(stream.withWatermark("ts", delay), windowLength)

  /** Exactly-once event dedup by id within the watermark horizon. */
  def dedup(stream: DataFrame, delay: String = "10 minutes"): DataFrame =
    stream.withWatermark("ts", delay)
      .dropDuplicates("event_id", "ts")

  /** Session windows per user: events within `gap` of each other fuse
    * into one session. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))
}
