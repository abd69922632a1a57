package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** `events_anomaly_mad` on a hand-computed series: hourly counts
  * (8,9,10,10,10,11,12,100) have lower median 10 and MAD 1 (deviations
  * sorted (0,0,0,1,1,2,2,90), rank 4), so with the 3·MAD rule exactly the
  * spike hour (dev 90) fires — the ±2 routine wobble stays silent, which
  * is the robustness mean/stddev would not give (the spike drags a mean
  * to ~21 and flags nothing at 3σ≈90... or everything at 1σ). */
class EventsAnomalySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("median/MAD flags exactly the spike hour") {
    import spark.implicits._
    val counts = Seq(8, 9, 10, 10, 10, 11, 12, 100)
    val base = 1767225600L // 2026-01-01 00:00:00 UTC
    val rows = for {
      (c, h) <- counts.zipWithIndex
      i <- 0 until c
    } yield (new Timestamp((base + h * 3600L + i * 30L) * 1000L), "click")
    val tmp = java.nio.file.Files.createTempDirectory("graft-anom")
    rows.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(tmp.resolve("events.parquet").toString)
    val got = SparkEntry.queries("events_anomaly_mad")(spark, tmp.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length === 1, s"exactly the spike fires: ${got.toSeq}")
    val (et, hour, n, med, mad, dev) = got.head
    assert(et === "click" && hour === base + 7 * 3600L)
    assert((n, med, mad, dev) === ((100L, 10L, 1L, 90L)), s"evidence: ${got.head}")
  }

  test("seasonal-naive backtest: same-hour-yesterday forecast, hand-checked errors") {
    import spark.implicits._
    val base = 1767225600L // 2026-01-01 00:00:00 UTC
    // day 1 hours 0..2: 5, 3, 2 events; day 2 hours 0..2: 4, 3, 7
    val counts = Seq((0, 5), (1, 3), (2, 2), (24, 4), (25, 3), (26, 7))
    val rows = for { (h, c) <- counts; i <- 0 until c }
      yield (new Timestamp((base + h * 3600L + i * 60L) * 1000L), "view")
    val tmp = java.nio.file.Files.createTempDirectory("graft-snaive")
    rows.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(tmp.resolve("events.parquet").toString)
    val got = SparkEntry.queries("events_forecast_snaive")(spark, tmp.toString)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // trailing 24 h = day 2 only; forecasts are day 1's same hours;
    // MAE = 1000 * (1 + 0 + 5) div (4 + 3 + 7) = 428
    assert(got === Map(
      (base + 24 * 3600L) -> ((4L, 5L, 1L, 428L)),
      (base + 25 * 3600L) -> ((3L, 3L, 0L, 428L)),
      (base + 26 * 3600L) -> ((7L, 2L, 5L, 428L))), s"got $got")
  }

  test("all-quiet series (MAD 0, constant counts) flags nothing") {
    import spark.implicits._
    val base = 1767225600L
    val rows = for (h <- 0 until 6; i <- 0 until 5)
      yield (new Timestamp((base + h * 3600L + i * 60L) * 1000L), "view")
    val tmp = java.nio.file.Files.createTempDirectory("graft-anom2")
    rows.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(tmp.resolve("events.parquet").toString)
    assert(SparkEntry.queries("events_anomaly_mad")(spark, tmp.toString).count() === 0L)
  }
}
