package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-arithmetic fixtures for the round-11 product-analytics pair and
  * the decontamination strip.
  *
  * Funnel: strict ordering — a click BEFORE the user's first view must
  * not count stage 2, and a purchase between view and click must not
  * count stage 3. Retention: cohort size is the offset-0 row by
  * construction; pre-signup events are excluded; users without signup
  * never appear. Strip: conservation (kept + dropped = corpus), the 10%
  * threshold boundary, and short-doc keep. */
class FunnelRetentionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def writeEvents(rows: Seq[(Long, String, Long, String)]): String = {
    // (event_id, ts ISO, user_id, event_type)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel")
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(tmp.resolve("events.parquet").toString)
    tmp.toString
  }

  test("funnel stages demand strict event-time order per user") {
    val d = writeEvents(Seq(
      // u1: clean view -> click -> purchase (all three stages)
      (0L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:01:00", 1L, "click"),
      (2L, "2024-01-01 10:02:00", 1L, "purchase"),
      // u2: click BEFORE first view -> stage 2 not reached
      (3L, "2024-01-02 09:00:00", 2L, "click"),
      (4L, "2024-01-02 10:00:00", 2L, "view"),
      // u3: purchase between view and click -> stages 1,2 but NOT 3
      (5L, "2024-01-03 10:00:00", 3L, "view"),
      (6L, "2024-01-03 10:30:00", 3L, "purchase"),
      (7L, "2024-01-03 11:00:00", 3L, "click"),
      // u4: never views -> no stage at all, but counts in the user base
      (8L, "2024-01-04 10:00:00", 4L, "purchase")))
    val got = SparkEntry.queries("funnel_events")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("view", 3L, 750L)), s"stage1: ${got(1L)}")   // 3 of 4 users
    assert(got(2L) === (("click", 2L, 666L)), s"stage2: ${got(2L)}")  // u1, u3
    assert(got(3L) === (("purchase", 1L, 500L)), s"stage3: ${got(3L)}") // u1 only
  }

  test("window funnel: the 24-hour window expires what the plain funnel counts") {
    val dir = writeEvents(Seq(
      // user 1: full chain inside the window → level 3
      (1L, "2026-01-01 00:00:00", 1L, "view"),
      (2L, "2026-01-01 01:00:00", 1L, "click"),
      (3L, "2026-01-01 02:00:00", 1L, "purchase"),
      // user 2: click 25 h after the view → window expired, level 1
      (4L, "2026-01-01 00:00:00", 2L, "view"),
      (5L, "2026-01-02 01:00:00", 2L, "click"),
      // user 3: purchase outside the anchor's window → level 2
      (6L, "2026-01-01 00:00:00", 3L, "view"),
      (7L, "2026-01-01 01:00:00", 3L, "click"),
      (8L, "2026-01-02 01:00:00", 3L, "purchase"),
      // user 4: purchase without a click never reaches level 2
      (9L, "2026-01-01 00:00:00", 4L, "view"),
      (10L, "2026-01-01 01:00:00", 4L, "purchase"),
      // user 5: the SECOND view anchors a window that catches the click
      (11L, "2026-01-01 00:00:00", 5L, "view"),
      (12L, "2026-01-02 05:00:00", 5L, "view"),
      (13L, "2026-01-02 06:00:00", 5L, "click")))
    val got = SparkEntry.queries("window_funnel_events")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L), s"got $got")
    // the unbounded funnel counts user 2's late click as a stage-2
    // conversion — the window variant exists precisely for the difference
    val plain = SparkEntry.queries("funnel_events")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(plain(2L) === 4L, s"plain funnel stage-2 users: $plain")
  }

  test("retention cohorts: offset-0 is the cohort, pre-signup excluded") {
    val d = writeEvents(Seq(
      // u1 signs up Mon 2024-01-01 (day 19723), active 8 days later (wk 1)
      (0L, "2024-01-01 10:00:00", 1L, "signup"),
      (1L, "2024-01-09 10:00:00", 1L, "click"),
      // u2 same cohort week (day 19724), one pre-signup event (excluded)
      (2L, "2024-01-01 09:00:00", 2L, "view"),
      (3L, "2024-01-02 10:00:00", 2L, "signup"),
      // u3: no signup -> never cohorted
      (4L, "2024-01-02 12:00:00", 3L, "purchase")))
    val got = SparkEntry.queries("retention_cohorts")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // day(2024-01-01) = 19723; both signups land in week 19723 div 7 = 2817
    assert(got.keySet.map(_._1) === Set(2817L), s"one cohort: ${got.keySet}")
    assert(got((2817L, 0L)) === ((2L, 2L, 1000L)), s"cohort row: $got")
    // u1's day-8 click is (19731-19723) div 7 = wk 1; u2 inactive then
    assert(got((2817L, 1L)) === ((1L, 2L, 500L)), s"week1 row: $got")
    // u2's pre-signup view created no (-1) offset row
    assert(!got.keySet.exists(_._2 < 0L), "pre-signup events excluded")
  }

  test("contamination strip conserves the corpus and keeps short docs") {
    val audit = SparkEntry.queries("contamination_ngram")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val kept = SparkEntry.queries("contamination_strip")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // every kept measured doc is strictly under the 10% threshold; every
    // audited doc over it is absent from the kept set
    for ((id, (nSh, nHit)) <- audit) {
      val keep = 10 * nHit < nSh
      assert(kept.contains(id) === keep, s"doc $id: nSh=$nSh nHit=$nHit")
    }
    // short (<5-token) corpus docs bypass the audit but survive the strip
    val corpusIds = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0)).filter(_ % 97 != 0).toSet
    val shortIds = corpusIds -- audit.keySet
    assert(shortIds.subsetOf(kept.keySet), "unmeasurable docs are kept")
    assert(kept.keySet.subsetOf(corpusIds), "benchmark slice never kept")
  }
}
