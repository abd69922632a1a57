package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation with a watermark — the engine
  * extension surface beyond the reference (which has no time semantics,
  * SURVEY.md §2.1 "Streaming semantics"): counts and an exact integer value
  * sum per (window, event_type), late data dropped past the watermark.
  *
  * State scale: one row per (window, type) partition-distributed; the
  * watermark bounds state growth — expired windows are evicted from the
  * store every trigger, so state is O(types × windows-in-watermark), not
  * O(stream length). */
object EventTimeAgg {

  /** input: an (event-time `ts` timestamp, `event_type`, `value`) stream.
    * Emits one row per closed window in append mode, or running updates in
    * update mode. */
  def hourlyByType(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("value_cents"))
}
