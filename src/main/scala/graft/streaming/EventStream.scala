package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming surface over the `events` schema (stretch goal
  * per SURVEY.md §7.2 step 4 — the reference is batch-only, so this is
  * capability-extension, not parity).
  *
  * Each transform takes a DataFrame that may be a batch table OR a
  * stream (`spark.readStream`): the same declarative plan serves both,
  * which is the Spark-native way to keep batch backfill and live
  * ingestion semantically identical. Watermarking bounds state so the
  * windowed aggregation runs indefinitely at scale; output mode
  * `append` emits each window once it is final.
  */
object EventStream {

  /** Tumbling-window counts/sums per event type. `withWatermark` is a
    * no-op on batch inputs, so batch parity with Relational.eventsHourly
    * holds (asserted in EventStreamSpec). */
  def windowedTypeCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 4))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window event rate per user (5-minute window, 1-minute
    * slide): the fan-out pattern for rolling activity metrics. */
  def slidingUserActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n_events"))
}
