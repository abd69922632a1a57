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

  /** Adapt a physical events table/stream — `ts` as timestamp[us] (TZ or
    * NTZ) or as integer epoch-nanos — to the (`ts` TIMESTAMP, event_type,
    * value) contract [[hourlyByType]] expects: the stream-side twin of the
    * load-boundary normalization [[graft.Tables.events]] applies for
    * batch. The NTZ→TZ cast reads the wall-clock in the session timezone
    * (graft sessions pin UTC), so a file-streamed replay of
    * events.parquet aggregates into the same hour buckets as the batch
    * `hourly_events` query — EventTimeAggSpec pins that identity. */
  def asEventTimeStream(events: DataFrame): DataFrame = {
    val tsCol = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    events.withColumn("ts", tsCol)
  }
}
