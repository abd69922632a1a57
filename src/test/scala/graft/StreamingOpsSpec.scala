package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

final case class IdEvent(id: Long, ts: Timestamp, payload: String)
final case class Click(k: String, lts: Timestamp, page: String)
final case class Buy(k: String, rts: Timestamp, amount: Long)
final case class UserEvent(user: String, ts: Timestamp)

/** MemoryStream micro-batch semantics for the streaming training-pipeline
  * operators: watermark-bounded dedup, stream-stream range join, session
  * windows. */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("dropDuplicatesWithinWatermark emits first occurrence, drops in-horizon dups") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[IdEvent]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = StreamingOps.dedupWithinWatermark(input.toDF(), "id")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => seen.add((r.getLong(0), r.getString(2)))); ()
      }.start()
    try {
      input.addData(IdEvent(1, t(0), "first"), IdEvent(2, t(1), "first"))
      q.processAllAvailable()
      // same ids again within the watermark horizon → dropped
      input.addData(IdEvent(1, t(2), "dup"), IdEvent(2, t(3), "dup"), IdEvent(3, t(3), "first"))
      q.processAllAvailable()
      val got = seen.toArray(Array.empty[(Long, String)]).toSet
      assert(got === Set((1L, "first"), (2L, "first"), (3L, "first")))
    } finally q.stop()
  }

  test("stream-stream range join matches buys to clicks within the horizon") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long)]()
    val joined = StreamingOps.rangeBoundedJoin(
      clicks.toDF(), buys.toDF(), "k", "lts", "rts")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("k", "page", "amount").collect()
          .foreach(r => out.add((r.getString(0), r.getString(1), r.getLong(2)))); ()
      }.start()
    try {
      clicks.addData(Click("u1", t(0), "home"), Click("u2", t(5), "search"))
      buys.addData(
        Buy("u1", t(10), 42),  // 10 min after u1's click → inside 15-min horizon
        Buy("u2", t(25), 99))  // 20 min after u2's click → outside horizon
      q.processAllAvailable()
      val got = out.toArray(Array.empty[(String, String, Long)]).toSet
      assert(got === Set(("u1", "home", 42L)))
    } finally q.stop()
  }

  test("left-outer range join keeps unmatched clicks, nulls emitted only past the watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Option[Long])]()
    val joined = StreamingOps.rangeBoundedJoinLeftOuter(
      clicks.toDF(), buys.toDF(), "k", "lts", "rts")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("k", "page", "amount").collect().foreach(r =>
          out.add((r.getString(0), r.getString(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))); ()
      }.start()
    def got = out.toArray(Array.empty[(String, String, Option[Long])]).toSet
    try {
      clicks.addData(Click("u1", t(0), "home"), Click("u2", t(0), "search"))
      buys.addData(Buy("u1", t(10), 42)) // u1 attributed; u2 pending
      q.processAllAvailable()
      assert(!got.exists(_._1 == "u2"),
        "u2's null row must NOT emit while a match could still arrive")
      // advance both watermarks well past u2's click+horizon window
      clicks.addData(Click("u3", t(60), "late"))
      buys.addData(Buy("u4", t(60), 1))
      q.processAllAvailable()
      assert(got.contains(("u1", "home", Some(42L))))
      assert(got.contains(("u2", "search", None)),
        s"unmatched click must surface with nulls after the horizon closes: $got")
    } finally q.stop()
  }

  test("observe-based peek surfaces per-batch metrics without touching the data") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics
        if (m.containsKey("inventory-peek")) {
          val row = m.get("inventory-peek")
          observed.add((row.getLong(0), row.getLong(1)))
        }
      }
    }
    spark.streams.addListener(listener)
    val input = MemoryStream[graft.model.OrderedUpdateEvent]
    val results = new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.KeyedCount]()
    val q = graft.streaming.InventoryStream.withPeek(
        graft.streaming.InventoryStream.foldStream(input.toDS()))
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.KeyedCount], _: Long) =>
        b.collect().foreach(results.add); ()
      }.start()
    try {
      input.addData(
        graft.model.OrderedUpdateEvent("a", 1, "INC", 5),
        graft.model.OrderedUpdateEvent("b", 2, "INC", 3))
      q.processAllAvailable()
      // listener events are async; wait for delivery
      spark.streams.awaitAnyTermination(1)
      var waited = 0
      while (observed.isEmpty && waited < 50) { Thread.sleep(100); waited += 1 }
      val metrics = observed.toArray(Array.empty[(Long, Long)])
      assert(metrics.exists { case (n, d) => n === 2L && d === 2L },
        s"peek must report 2 emitted records for 2 distinct products, got ${metrics.toSeq}")
      assert(results.size === 2, "observe must not alter the data path")
    } finally { q.stop(); spark.streams.removeListener(listener) }
  }

  test("session windows merge gap-contiguous events and close via watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Timestamp, Timestamp, String, Long)]()
    val q = StreamingOps.sessionWindows(input.toDF(), "user", gap = "30 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r =>
          out.add((r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))); ()
      }.start()
    try {
      // u: events at 0 and 20 chain one session (gap 20 < 30); 70 starts another
      input.addData(UserEvent("u", t(0)), UserEvent("u", t(20)), UserEvent("u", t(70)))
      q.processAllAvailable()
      // advance the watermark far enough to close both sessions
      input.addData(UserEvent("w", t(300)))
      q.processAllAvailable()
      input.addData(UserEvent("w", t(600)))
      q.processAllAvailable()
      val got = out.toArray(Array.empty[(Timestamp, Timestamp, String, Long)])
        .filter(_._3 == "u").toSet
      assert(got === Set(
        (t(0), t(50), "u", 2L),   // session = [first, last+gap)
        (t(70), t(100), "u", 1L)))
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dimension, no streaming state") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val dim = Seq(("u1", "gold"), ("u2", "silver")).toDF("user", "tier")
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q = StreamingOps.enrichWithStatic(input.toDF(), dim, "user")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => out.add((r.getString(0),
          Option(r.getString(2)).getOrElse("none")))); ()
      }.start()
    try {
      input.addData(UserEvent("u1", t(0)), UserEvent("u3", t(1)))
      q.processAllAvailable()
      input.addData(UserEvent("u2", t(2)))
      q.processAllAvailable()
      val got = out.toArray(Array.empty[(String, String)]).toSet
      assert(got === Set(("u1", "gold"), ("u3", "none"), ("u2", "silver")))
      // stateless: the progress metrics must report no state store rows
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not allocate streaming state")
    } finally q.stop()
  }

  test("curationStream cleans, filters, and dedups by content within the watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = graft.streaming.StreamingOps.curationStream(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => out.add((r.getLong(0), r.getString(2)))); ()
      }.start()
    val good = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi").trim  // 16 distinct tokens
    val short = "too short"
    val repetitive = Array.fill(20)("spam").mkString(" ")  // dup fraction 950‰
    try {
      input.addData(
        StreamDoc(1, "s0", "  " + good.toUpperCase + "  ", t(0)),
        StreamDoc(2, "s0", short, t(1)),
        StreamDoc(3, "s0", repetitive, t(1)))
      q.processAllAvailable()
      // doc 4 cleans to the same bytes as doc 1 → in-horizon dup, dropped
      input.addData(StreamDoc(4, "s1", good, t(2)))
      q.processAllAvailable()
      val got = out.toArray(Array.empty[(Long, String)])
      assert(got.map(_._1).toSet === Set(1L), s"got $got")
      assert(got.head._2 === good, "cleaned text must be normalized")
    } finally q.stop()
  }

  test("curationStreamGated: the published-gate admission filter admits " +
      "EXACTLY the batch pipeline's gate keep-set on the same fixture " +
      "(batch == stream, the scd2Stream discipline on the quality gate), " +
      "holding no state beyond the content dedup") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the CurationV2Spec adversarial trio + a short doc + an in-horizon dup
    val theSpam = Array.fill(10)("the").mkString(" ")        // gopher ok, entropy low
    val letters = "abcdefghij"
    val nonl = "0123456789!#$%&()*+,-./:;<=>?[]^_{|}~"
    val noise = "a a " + (0 until 10)
      .map(i => letters(i) + nonl.slice(4 * i, 4 * i + 4)).mkString(" ") // entropy 5181
    val natural = "the quick brown fox jumps over a lazy dog near the " +
      "riverbank while value and key travel home under warm evening light"
    val short = "the a key"                                   // gopher count rule
    val fixture = Seq(
      (1L, "s0", theSpam), (2L, "s0", noise), (3L, "s0", natural),
      (4L, "s1", short))
    // BATCH keep-set: the v2 pipeline's gate stage over the same rows
    val batchKeep = graft.operators.TrainingData
      .cleanedOn(fixture.toDF("doc_id", "source", "text"))
      .filter(graft.operators.TextAnalysis.gopherKeepCol(col("cleaned")) &&
        graft.operators.TextAnalysis.charEntropyMilliCol(col("cleaned"))
          .between(graft.operators.TrainingData.EntropyBandLo,
            graft.operators.TrainingData.EntropyBandHi))
      .select("doc_id").as[Long].collect().toSet
    assert(batchKeep === Set(3L), s"fixture sanity: $batchKeep")

    val input = MemoryStream[StreamDoc]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = StreamingOps.curationStreamGated(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => out.add(
          (r.getLong(0), r.getAs[Long]("char_entropy_milli")))); ()
      }.start()
    try {
      input.addData(fixture.zipWithIndex.map { case ((id, src, tx), i) =>
        StreamDoc(id, src, tx, t(i)) }: _*)
      q.processAllAvailable()
      // an in-horizon content dup of the admitted doc → dropped by state
      input.addData(StreamDoc(5L, "s2", natural, t(4)))
      q.processAllAvailable()
      val got = out.toArray(Array.empty[(Long, Long)])
      assert(got.map(_._1).toSet === batchKeep,
        s"stream admitted set must equal the batch keep-set: ${got.toSeq}")
      // the emitted entropy equals the batch gate's value for the doc
      val batchEnt = graft.operators.TrainingData
        .cleanedOn(fixture.toDF("doc_id", "source", "text"))
        .select(col("doc_id"), graft.operators.TextAnalysis
          .charEntropyMilliCol(col("cleaned")).as("e"))
        .filter(col("doc_id") === 3L).as[(Long, Long)].collect().head._2
      assert(got.head._2 === batchEnt, "entropy value batch == stream")
      // gates are stateless: only the content dedup holds streaming state
      assert(q.lastProgress.stateOperators.length === 1,
        "only dropDuplicatesWithinWatermark may hold streaming state")
    } finally q.stop()
  }

  test("curationStreamIncremental drops cross-snapshot dups at ingest via the store") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // yesterday's snapshot, persisted exactly as the batch pipeline does
    val histText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val hist = Seq((100L, histText)).toDF("doc_id", "text")
    val store = graft.sources.ParquetSink.writeBucketed(
      graft.operators.Dedup.fingerprintSnapshot(hist), "stream_fp_store", "fp",
      graft.operators.Dedup.storeBuckets(spark))

    val input = MemoryStream[StreamDoc]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = StreamingOps.curationStreamIncremental(input.toDF(), store)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => out.add(r.getLong(0))); ()
      }.start()
    // same token SET as history (reordered) → same fingerprint → drop at
    // ingest even though the content hash differs
    val histReordered = histText.split(" ").reverse.mkString(" ")
    val fresh = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    try {
      input.addData(
        StreamDoc(1, "s0", histReordered, t(0)),
        StreamDoc(2, "s0", fresh, t(1)))
      q.processAllAvailable()
      // in-stream dup of the fresh doc → dropped by the watermark state
      input.addData(StreamDoc(3, "s1", fresh, t(2)))
      q.processAllAvailable()
      val got = out.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSet
      assert(got === Set(2L),
        s"history dup (1) and in-stream dup (3) must be dropped, got $got")
      // the cross-snapshot gate is stateless: only the content-hash dedup
      // holds state, so the store can be arbitrarily large
      assert(q.lastProgress.stateOperators.length === 1,
        "only dropDuplicatesWithinWatermark may hold streaming state")
    } finally q.stop()
  }

  test("Bloom-gated incremental curation emits exactly what the exact form emits") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val histText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val hist = Seq((100L, histText)).toDF("doc_id", "text")
    val store = graft.sources.ParquetSink.writeBucketed(
      graft.operators.Dedup.fingerprintSnapshot(hist), "bloom_fp_store", "fp",
      graft.operators.Dedup.storeBuckets(spark))

    val input = MemoryStream[StreamDoc]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val gated = StreamingOps.curationStreamIncrementalBloom(input.toDF(), store)
    // the gate must be the NATIVE bloom expressions, not a per-row Scala
    // UDF (round-7 advisor: UDF serialization in the streaming hot path)
    locally {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ScalaUDF}
      val exprs = scala.collection.mutable.ArrayBuffer[Expression]()
      gated.queryExecution.analyzed.foreach(p =>
        p.expressions.foreach(e => e.foreach(exprs += _)))
      assert(!exprs.exists(_.isInstanceOf[ScalaUDF]),
        "bloom gate must not plan a Scala UDF")
      assert(exprs.exists(_.isInstanceOf[BloomFilterMightContain]),
        "bloom gate must probe through BloomFilterMightContain")
    }
    val q = gated
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => out.add(r.getLong(0))); ()
      }.start()
    val fresh1 = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val fresh2 = "uno dos tres cuatro cinco seis siete ocho nueve diez " +
      "once doce trece catorce quince dieciseis"
    try {
      input.addData(
        StreamDoc(1, "s0", histText.split(" ").reverse.mkString(" "), t(0)), // seen: no false negatives, must drop
        StreamDoc(2, "s0", fresh1, t(1)),  // new: bypass or FP->anti-join, must keep
        StreamDoc(3, "s0", fresh2, t(1)),  // new
        StreamDoc(4, "s1", fresh1, t(2)))  // in-stream dup, dropped by watermark state
      q.processAllAvailable()
      val got = out.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSet
      assert(got === Set(2L, 3L),
        s"bloom gate must emit exactly the exact-form survivors, got $got")
    } finally q.stop()
  }

  test("FULL outer stream-stream join surfaces unmatched rows from BOTH sides") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[String], Option[Long])]()
    val joined = StreamingOps.rangeBoundedJoinFullOuter(
      clicks.toDF(), buys.toDF(), "k", "lts", "rts")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("k", "page", "amount").collect().foreach(r =>
          out.add((r.getString(0),
            if (r.isNullAt(1)) None else Some(r.getString(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))); ()
      }.start()
    def got = out.toArray(Array.empty[(String, Option[String], Option[Long])]).toSet
    try {
      clicks.addData(Click("u1", t(0), "home"), Click("u2", t(0), "search"))
      buys.addData(Buy("u1", t(10), 42), Buy("u9", t(10), 7)) // u9: buy with no click
      q.processAllAvailable()
      assert(!got.exists(r => r._1 == "u2" || r._1 == "u9"),
        s"null rows must NOT emit while a match could still arrive: $got")
      // advance both watermarks past every open join window
      clicks.addData(Click("u3", t(60), "late"))
      buys.addData(Buy("u4", t(60), 1))
      q.processAllAvailable()
      assert(got.contains(("u1", Some("home"), Some(42L))))
      assert(got.contains(("u2", Some("search"), None)),
        s"unmatched LEFT row must surface: $got")
      assert(got.contains(("u9", None, Some(7L))),
        s"unmatched RIGHT row must surface — the full-outer addition: $got")
    } finally q.stop()
  }

  test("session merge handles out-of-order (above-watermark) events correctly") {
    import graft.streaming.StreamingOps.{mergeSessionEvents, SessionAcc}
    val gap = 5L * 60 * 1000
    def m(min: Long) = min * 60 * 1000
    // in-gap EARLIER event pulls session_start backwards and counts
    assert(mergeSessionEvents(Some(SessionAcc(m(20), m(20), 1)), Array(m(16)), gap)
      === (Nil, Some(SessionAcc(m(16), m(20), 2))))
    // event more than a gap BEFORE the open session: its own closed
    // session; the open session is untouched
    assert(mergeSessionEvents(Some(SessionAcc(m(20), m(20), 1)), Array(m(13)), gap)
      === (List(SessionAcc(m(13), m(13), 1)), Some(SessionAcc(m(20), m(20), 1))))
    // forward extension and gap-close still behave
    assert(mergeSessionEvents(Some(SessionAcc(m(20), m(20), 1)), Array(m(22), m(40)), gap)
      === (List(SessionAcc(m(20), m(22), 2)), Some(SessionAcc(m(40), m(40), 1))))
    // cold start
    assert(mergeSessionEvents(None, Array(m(1), m(3)), gap)
      === (Nil, Some(SessionAcc(m(1), m(3), 2))))
    // TWO early events within gap of each other: ONE closed session, not
    // two single-event splits (advisor round 7 — the per-event fold closed
    // each early event on sight)
    assert(mergeSessionEvents(Some(SessionAcc(m(20), m(20), 1)), Array(m(10), m(13)), gap)
      === (List(SessionAcc(m(10), m(13), 2)), Some(SessionAcc(m(20), m(20), 1))))
    // chain-merge: an early pair whose chain reaches within gap of the
    // open session merges INTO it — transitivity, not just pairing
    assert(mergeSessionEvents(Some(SessionAcc(m(20), m(20), 1)), Array(m(12), m(16)), gap)
      === (Nil, Some(SessionAcc(m(12), m(20), 3))))
    // a bridge event connects two otherwise-separate islands ([0] and [8]
    // are 8 min apart — past the gap — until [4] arrives between them)
    assert(mergeSessionEvents(None, Array(m(0), m(8), m(4)), gap)
      === (Nil, Some(SessionAcc(m(0), m(8), 3))))
  }

  test("EventTimeTimeout sessionization: gap-close emits, timeout EVICTS state") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    val gapMs = 5 * 60 * 1000L // 5-minute session gap
    val q = StreamingOps.sessionizeWithTimeout(input.toDS(), gapMs)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingOps.SessionOut], _: Long) =>
        b.collect().foreach(s => out.add((s.key, s.n_events, s.finalized_by))); ()
      }.start()
    def stateRows: Long = q.lastProgress.stateOperators.head.numRowsTotal
    try {
      // key a: two events 2 min apart -> one open session of 2
      input.addData(("a", t(0)), ("a", t(2)), ("b", t(2)))
      q.processAllAvailable()
      assert(out.isEmpty, "open sessions must not emit in append mode")
      assert(stateRows === 2, "one state row per active key")
      // key a again 20 min later: past the gap -> closes a's first session
      // inline ("gap"); watermark (max event time - 0s) = t(22) also passes
      // b's timeout (t(2)+gap=t(7)) -> b is finalized by TIMEOUT + evicted
      input.addData(("a", t(22)))
      q.processAllAvailable()
      // one more empty-ish trigger so the timeout pass runs after the
      // watermark update propagates
      input.addData(("c", t(23)))
      q.processAllAvailable()
      val got = out.toArray(Array.empty[(String, Long, String)]).toSet
      assert(got.contains(("a", 2L, "gap")), s"gap-closed session missing: $got")
      assert(got.contains(("b", 1L, "timeout")), s"timeout-evicted session missing: $got")
      // the eviction is real: only the still-active keys hold state
      assert(stateRows === 2, s"b's state row must be gone, got $stateRows")
    } finally q.stop()
  }

  test("early events in SEPARATE triggers merge into one session (buffered until watermark)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    val gapMs = 5 * 60 * 1000L
    // nonzero watermark delay: exactly the regime where an event can arrive
    // in a LATER trigger than the session it belongs to
    val q = StreamingOps.sessionizeWithTimeout(input.toDS(), gapMs, watermark = "30 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingOps.SessionOut], _: Long) =>
        b.collect().foreach(s => out.add((s.key, s.n_events, s.finalized_by))); ()
      }.start()
    try {
      input.addData(("x", t(20))) // trigger 1: session [20,20]
      q.processAllAvailable()
      input.addData(("x", t(40))) // trigger 2: gap-successor observed
      q.processAllAvailable()
      // trigger 3: EARLIER than the first session's horizon (t23 <= 20+gap),
      // above the watermark (t40 - 30m = t10) — with the old eager-gap
      // emission the [20,20] session was already immutable output and this
      // event became a spurious single-event session
      input.addData(("x", t(23)))
      q.processAllAvailable()
      // advance the watermark past both horizons, then one more trigger so
      // the timeout pass runs after the watermark update propagates
      input.addData(("z", t(80)))
      q.processAllAvailable()
      input.addData(("z", t(81)))
      q.processAllAvailable()
      val got = out.toArray(Array.empty[(String, Long, String)]).toSet
      assert(got.contains(("x", 2L, "gap")),
        s"t20+t23 (separate triggers) must be ONE gap-closed session: $got")
      assert(got.contains(("x", 1L, "timeout")),
        s"the t40 session closes by watermark: $got")
      assert(!got.exists(r => r._1 == "x" && r._2 == 1L && r._3 == "gap"),
        s"no spurious single-event gap session for x: $got")
    } finally q.stop()
  }

  test("Bloom gate over the item cap degrades to the exact anti-join path") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val histText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val store = graft.operators.Dedup.fingerprintSnapshot(
      Seq((100L, histText)).toDF("doc_id", "text"))
    val input = MemoryStream[StreamDoc]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    // cap of 0 < any store count → the driver Bloom must NOT be built; the
    // stream must still dedup correctly through the exact anti-join
    val q = StreamingOps.curationStreamIncrementalBloom(
        input.toDF(), store, maxBloomItems = 0L)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => out.add(r.getLong(0))); ()
      }.start()
    val fresh = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    try {
      input.addData(
        StreamDoc(1, "s0", histText.split(" ").reverse.mkString(" "), t(0)),
        StreamDoc(2, "s0", fresh, t(1)))
      q.processAllAvailable()
      val got = out.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSet
      assert(got === Set(2L),
        s"over-cap branch must still drop the history dup, got $got")
    } finally q.stop()
  }

  test("ingestLoop accumulates fingerprints across batches: batch N+1 sees batch N's docs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val (storePath, outPath, ckpt) = (s"$base/store", s"$base/out", s"$base/ckpt")
    val input = MemoryStream[StreamDoc]
    val q = StreamingOps.ingestLoop(
      input.toDF().select("doc_id", "text"), storePath, outPath, ckpt)
    val a = "alpha beta gamma"
    val b = "delta epsilon zeta"
    val c = "eta theta iota"
    try {
      // doc 1 appears TWICE in the first batch (at-least-once replay):
      // exactly one output row may survive
      input.addData(StreamDoc(1, "s0", a, t(0)), StreamDoc(1, "s0", a, t(0)),
        StreamDoc(2, "s0", b, t(0)))
      q.processAllAvailable()
      // batch 2: doc 3 re-sends doc 1's token set (reordered) — the fps doc 1
      // appended in batch 1 must drop it; doc 4 is genuinely new
      input.addData(
        StreamDoc(3, "s1", a.split(" ").reverse.mkString(" "), t(1)),
        StreamDoc(4, "s1", c, t(1)))
      q.processAllAvailable()
      val keptRows = spark.read.parquet(outPath)
      val kept = keptRows.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L),
        s"cross-batch dup (3) must be dropped by the accumulated store, got $kept")
      assert(keptRows.count() === 3,
        "intra-batch replay of doc 1 must not re-expand through the payload join")
      // survivors carry the full document payload, not just (doc_id, fp)
      val keptTexts = keptRows.select("text").collect().map(_.getString(0)).toSet
      assert(keptTexts === Set(a, b, c),
        s"emitted rows must keep the batch payload, got $keptTexts")
      // the store is the accumulator: every survivor's fp, nothing else
      assert(spark.read.parquet(storePath).distinct().count() === 3,
        "store must hold exactly the survivors' fingerprints")
    } finally q.stop()
  }

  test("ingestCatchUp drains the backlog, stops itself, and resumes from the checkpoint") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-catchup").toString
    val (storePath, outPath, ckpt) = (s"$base/store", s"$base/out", s"$base/ckpt")
    val input = MemoryStream[StreamDoc]
    val a = "alpha beta gamma"
    val b = "delta epsilon zeta"
    val c = "eta theta iota"
    // backlog before the query even starts — the crashed-loop restart shape
    input.addData(StreamDoc(1, "s0", a, t(0)), StreamDoc(2, "s0", b, t(0)))
    val q1 = StreamingOps.ingestCatchUp(
      input.toDF().select("doc_id", "text"), storePath, outPath, ckpt)
    assert(q1.awaitTermination(60000), "AvailableNow must terminate on its own")
    assert(spark.read.parquet(outPath).select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L))
    // new arrivals AFTER the first catch-up finished: a replay of doc 1's
    // token set (must drop via the persisted store) and a genuinely new doc
    input.addData(
      StreamDoc(3, "s1", a.split(" ").reverse.mkString(" "), t(1)),
      StreamDoc(4, "s1", c, t(1)))
    val q2 = StreamingOps.ingestCatchUp(
      input.toDF().select("doc_id", "text"), storePath, outPath, ckpt)
    assert(q2.awaitTermination(60000), "second catch-up must terminate on its own")
    val kept = spark.read.parquet(outPath).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L),
      s"checkpoint resume must process only the new backlog and the store must drop doc 3, got $kept")
  }

  test("ingestLoopNearDup drops cross-batch NEAR-dups via the accumulated signature store") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val input = MemoryStream[StreamDoc]
    val q = StreamingOps.ingestLoopNearDup(
      input.toDF().select("doc_id", "text"),
      s"$base/sig", s"$base/band", s"$base/out", s"$base/ckpt")
    val long = (1 to 20).map(i => s"w$i").mkString(" ")
    val novel = (1 to 20).map(i => s"v$i").mkString(" ")
    try {
      input.addData(StreamDoc(1, "s0", long, t(0)))
      q.processAllAvailable()
      // batch 2: doc 2 is a one-token edit of doc 1 (J≈0.84, est >> 0.5) —
      // only the ACCUMULATED store can catch it; doc 3 is novel
      input.addData(
        StreamDoc(2, "s1", long.split(" ").dropRight(1).mkString(" ") + " zz", t(1)),
        StreamDoc(3, "s1", novel, t(1)))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$base/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L),
        s"cross-batch near-dup (2) must be dropped, got $kept")
      // constant-space store: one signature row and Bands band rows per survivor
      assert(spark.read.parquet(s"$base/sig").count() === 2)
      assert(spark.read.parquet(s"$base/band").count() === 2L * graft.operators.MinHashLSH.Bands)
    } finally q.stop()
  }
  test("ingestLoopSpans audits span duplication across batches, store grows by novel hashes only") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val W = graft.operators.Dedup.SpanWindow
    val base = java.nio.file.Files.createTempDirectory("graft-spanloop").toString
    val input = MemoryStream[StreamDoc]
    val q = StreamingOps.ingestLoopSpans(
      input.toDF().select("doc_id", "text"),
      s"$base/spans", s"$base/out", s"$base/ckpt")
    val para = (1 to W).map(i => s"p$i").mkString(" ") // exactly one window
    val other = (1 to W).map(i => s"q$i").mkString(" ")
    try {
      input.addData(StreamDoc(1, "s0", para, t(0)))
      q.processAllAvailable()
      // batch 2: doc 2 re-uses batch 1's paragraph (history dup), docs 3+4
      // share a batch-internal span, doc 5 is sub-window
      input.addData(
        StreamDoc(2, "s1", para + " tail1 tail2", t(1)),
        StreamDoc(3, "s1", other, t(1)),
        StreamDoc(4, "s1", other + " x y", t(1)),
        StreamDoc(5, "s1", "too short", t(1)))
      q.processAllAvailable()
      val audit = spark.read.parquet(s"$base/out")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
      // batch 1: nothing to collide with
      assert(audit(1L) === ((1L, 0L, 0L)), s"doc1 ${audit(1L)}")
      // doc 2's first window == doc 1's span → history dup (store caught it)
      assert(audit(2L)._1 === 3L && audit(2L)._2 >= 1L, s"doc2 ${audit(2L)}")
      // docs 3/4 share `other` → batch dups, not history
      assert(audit(3L) === ((1L, 0L, 1L)), s"doc3 ${audit(3L)}")
      assert(audit(4L)._3 >= 1L && audit(4L)._2 === 0L, s"doc4 ${audit(4L)}")
      // sub-window doc audited as zeros, never dropped (nothing is)
      assert(audit(5L) === ((0L, 0L, 0L)))
      assert(audit.size === 5, "the loop drops nothing — audit row per doc")
      // store: distinct hashes only — doc 2's repeat of para's window and
      // docs 3/4's shared span each add ONE row
      val stored = spark.read.parquet(s"$base/spans").select("h")
        .collect().map(_.getString(0))
      assert(stored.length === stored.distinct.length, "store stays distinct")
      // para window, doc2's two novel tail windows, other, doc4's two novel
      val expectStore = 1 + 2 + 1 + 2
      assert(stored.length === expectStore, s"store rows ${stored.length}")
    } finally q.stop()
  }

  test("driftStream: bootstrap is silent, steady state is quiet, a swapped " +
      "dominant token tops the report; replay never double-counts") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-driftloop").toString
    val input = MemoryStream[StreamDoc]
    import org.apache.spark.sql.functions.col
    val q = StreamingOps.driftStream(
      input.toDF().select("doc_id", "text"),
      s"$base/store", s"$base/out", s"$base/ckpt")
    val steady = "alpha alpha alpha beta gamma"
    try {
      input.addData(StreamDoc(1, "s0", steady, t(0)))
      q.processAllAvailable()
      // bootstrap: store seeded, no report
      assert(!new java.io.File(s"$base/out").exists() ||
        spark.read.parquet(s"$base/out").count() === 0L)
      assert(spark.read.parquet(s"$base/store").count() === 3L)

      input.addData(StreamDoc(2, "s0", steady, t(1)))
      q.processAllAvailable()
      val r1 = spark.read.parquet(s"$base/out")
        .filter(col("batch_id") === 1L).collect()
      assert(r1.nonEmpty, "steady batch must emit a report")
      val quietTotal = r1.head.getAs[Long]("total_psi_micro")

      // batch 2: 'alpha' mass swaps to a brand-new token
      input.addData(StreamDoc(3, "s0", "omega omega omega beta gamma", t(2)))
      q.processAllAvailable()
      val r2 = spark.read.parquet(s"$base/out")
        .filter(col("batch_id") === 2L)
        .orderBy(col("contrib_micro").desc, col("term")).collect()
      val drifted = r2.head.getAs[String]("term")
      assert(drifted === "omega" || drifted === "alpha",
        s"swap must dominate, got $drifted")
      assert(r2.head.getAs[Long]("total_psi_micro") > quietTotal,
        "distribution swap must raise total PSI above the steady level")
    } finally q.stop()

    // replay: same batchId scored against the pre-append store
    val b = Seq((9L, "omega nu")).toDF("doc_id", "text")
    StreamingOps.ingestBatchDrift(b, s"$base/store", s"$base/out9", 9L)
    val store1 = spark.read.parquet(s"$base/store")
      .groupBy("t").sum("c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rep1 = spark.read.parquet(s"$base/out9")
      .select("term", "contrib_micro").collect().map(r => (r.getString(0), r.getLong(1)))
    StreamingOps.ingestBatchDrift(b, s"$base/store", s"$base/out9", 9L)
    val store2 = spark.read.parquet(s"$base/store")
      .groupBy("t").sum("c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(store2 === store1, "replay must not double-count the store")
    val rep2 = spark.read.parquet(s"$base/out9")
      .select("term", "contrib_micro").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rep2.length === rep1.length && rep2.toSet === rep1.toSet,
      "replayed report must overwrite its own batch_id partition, not append")
  }

  test("ingestLoopUrl drops a re-crawled URL variant stored one batch earlier") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-urlloop").toString
    val input = MemoryStream[UrlDoc]
    val q = StreamingOps.ingestLoopUrl(
      input.toDF(), s"$base/store", s"$base/out", s"$base/ckpt")
    try {
      input.addData(
        UrlDoc(1L, "https://example.org/a"),
        UrlDoc(2L, "http://www.example.org/a/"), // in-batch re-crawl of 1
        UrlDoc(3L, "https://other.net/x"))
      q.processAllAvailable()
      val b0 = spark.read.parquet(s"$base/out").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(b0 === Map(1L -> "example.org/a", 3L -> "other.net/x"),
        s"first batch keeps min-id per canonical: $b0")

      input.addData(
        UrlDoc(10L, "HTTPS://EXAMPLE.ORG/a#frag"),  // re-crawl of stored 1
        UrlDoc(11L, "https://other.net/x?utm_source=f"), // re-crawl of stored 3
        UrlDoc(12L, "https://example.org/A"))       // path case differs: NEW
      q.processAllAvailable()
      val all = spark.read.parquet(s"$base/out").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(all === Map(1L -> "example.org/a", 3L -> "other.net/x",
        12L -> "example.org/A"),
        s"re-crawls of stored pages dropped, case-distinct path kept: $all")
      // the store accumulated exactly the survivors' canonical keys
      val store = spark.read.parquet(s"$base/store").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(store === Seq("example.org/A", "example.org/a", "other.net/x"))
    } finally q.stop()
  }

  test("ingestLoopUrlMerge: a re-crawled page whose content CHANGED replaces " +
      "its stale store row across batches; unchanged re-crawls are skippable") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-urlmerge").toString
    val input = MemoryStream[CrawlDoc]
    val q = StreamingOps.ingestLoopUrlMerge(
      input.toDF(), s"$base/store", s"$base/out", s"$base/ckpt")
    try {
      input.addData(
        CrawlDoc(1L, "https://example.org/a", "alpha v1"),
        CrawlDoc(2L, "https://example.org/b", "beta v1"))
      q.processAllAvailable()
      val b0 = spark.read.parquet(s"$base/out")
        .filter($"batch_id" === 0L).collect()
        .map(r => r.getString(0) -> r.getString(4)).toMap
      assert(b0 === Map("example.org/a" -> "new", "example.org/b" -> "new"),
        s"bootstrap batch: everything is a first crawl: $b0")

      input.addData(
        CrawlDoc(10L, "http://www.example.org/a/", "alpha v1"), // same bytes
        CrawlDoc(11L, "HTTPS://EXAMPLE.ORG/b#frag", "beta v2"), // content moved
        CrawlDoc(12L, "https://example.org/c", "gamma v1"))     // first crawl
      q.processAllAvailable()
      val b1 = spark.read.parquet(s"$base/out")
        .filter($"batch_id" === 1L).collect()
        .map(r => r.getString(0) -> r.getString(4)).toMap
      assert(b1 === Map("example.org/a" -> "unchanged",
        "example.org/b" -> "changed", "example.org/c" -> "new"),
        s"provenance per batch key: $b1")
      // the live generation holds the REPLACED row for b (doc 11, v2 fp),
      // the carried-over a (unchanged re-crawl still updates to the latest
      // crawl row — last-writer-wins), and the new c
      val gen = spark.read.parquet(s"$base/store/gen=1").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
      assert(gen("example.org/b") ===
          ((11L, b1Fp(spark, "beta v2"))),
        s"stale row replaced by the changed re-crawl: $gen")
      assert(gen("example.org/a")._1 === 10L && gen.size === 3,
        s"last-writer-wins on the unchanged re-crawl, one row per key: $gen")
    } finally q.stop()
  }

  private def b1Fp(spark: org.apache.spark.sql.SparkSession, s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(org.apache.spark.sql.functions.md5($"t"))
      .head.getString(0)
  }

  test("ingestLoopIvfPq: the accumulated code store equals a full re-encode " +
      "bit-for-bit (frozen artifacts), and a replayed batch rewrites its own " +
      "partition identically") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ivfpq-loop").toString
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Double] = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    // history trains the frozen artifacts (compaction-time posture)
    val hist = (100L until 116L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val hn = graft.operators.Similarity.withNorm(hist)
    val cents = graft.operators.Similarity.kmeansCentroidArray(hn, 4, 1).cache()
    val cb = graft.operators.Similarity.ivfPqCodebook(hn, 8, cents, 1).cache()
    val b1 = (0L until 6L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val b2 = (6L until 12L).map(i => (i, vec())).toDF("vec_id", "embedding")
    StreamingOps.ingestBatchIvfPq(b1, cents, cb, 8, s"$base/codes", 0L)
    StreamingOps.ingestBatchIvfPq(b2, cents, cb, 8, s"$base/codes", 1L)
    def storeRows() = spark.read.parquet(s"$base/codes")
      .select("vec_id", "codes", "cid", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).mkString(","), r.getLong(2),
        r.getDouble(3))).toSet
    val acc = storeRows()
    val full = graft.operators.Similarity.ivfPqIndex(
        graft.operators.Similarity.withNorm(b1.unionByName(b2)), 8, cents, cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).mkString(","),
        r.getLong(2), r.getDouble(3))).toSet
    assert(acc === full,
      "per-vector encoding under frozen codebooks: accumulated ≡ re-encode")
    // replay batch 1 (crash before checkpoint commit): its partition is
    // overwritten with the identical rows — never appended
    StreamingOps.ingestBatchIvfPq(b2, cents, cb, 8, s"$base/codes", 1L)
    assert(storeRows() === acc, "replay is bit-identical, no duplicates")
    assert(spark.read.parquet(s"$base/codes").count() === 12L)
  }

  test("ingestBatchUrlMerge replay is a fixpoint: a batch replayed after its " +
      "merge committed (crash before checkpoint commit) recomputes the SAME " +
      "provenance against the pre-merge generation and overwrites, never " +
      "double-merges — and a crash between emit and merge loses nothing") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-urlmerge-replay").toString
    val b0 = Seq((1L, "https://example.org/a", "alpha v1"),
      (2L, "https://example.org/b", "beta v1")).toDF("doc_id", "url", "text")
    StreamingOps.ingestBatchUrlMerge(b0, s"$base/store", s"$base/out", 0L)
    val b1 = Seq((10L, "https://example.org/b", "beta v2"))
      .toDF("doc_id", "url", "text")
    StreamingOps.ingestBatchUrlMerge(b1, s"$base/store", s"$base/out", 1L)
    def prov1() = spark.read.parquet(s"$base/out")
      .filter($"batch_id" === 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(4))).toSet
    def liveStore() = spark.read.parquet(s"$base/store/gen=1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet
    val firstProv = prov1()
    val firstStore = liveStore()
    assert(firstProv.map(x => (x._1, x._3)) === Set(("example.org/b", "changed")),
      s"the content-moved re-crawl reports changed: $firstProv")
    // replay batch 1 (any crash point: between emit and merge — the emit is
    // re-overwritten and the merge then lands; or after the merge — the
    // store read is the generation STRICTLY OLDER than batchId, so the
    // pre-merge state is still what provenance is computed against)
    StreamingOps.ingestBatchUrlMerge(b1, s"$base/store", s"$base/out", 1L)
    assert(prov1() === firstProv,
      "replayed provenance identical — 'changed' stays changed, no dup rows")
    assert(liveStore() === firstStore, "replayed merge is a fixpoint")
    // a third batch prunes the unreachable generation 0 but keeps 1
    val b2 = Seq((20L, "https://example.org/d", "delta v1"))
      .toDF("doc_id", "url", "text")
    StreamingOps.ingestBatchUrlMerge(b2, s"$base/store", s"$base/out", 2L)
    val gens = new java.io.File(s"$base/store").listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).sorted.toSeq
    assert(gens === Seq("gen=1", "gen=2"),
      s"two live generations at steady state: $gens")
    assert(spark.read.parquet(s"$base/store/gen=2").count() === 3L,
      "history carried over: a, b(v2), d — one row per key")
  }

  test("ingestBatchUrlMergeParted: a generation holds ONLY touched bands — " +
      "untouched bands stay byte-identical in their original generation and " +
      "resolve through the manifest; replay is a fixpoint; prune is " +
      "reference-aware") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-urlmerge-parted").toString
    val nb = 4
    // map candidate pages to hash bands so the test can pick keys in
    // three DISTINCT bands (xxhash64 is fixed — this is deterministic)
    val byBand = ('a' to 'p').map(c => s"https://example.org/$c").toDF("url")
      .select($"url", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          graft.operators.Dedup.canonicalUrl($"url")),
        org.apache.spark.sql.functions.lit(nb.toLong)).as("band"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBand.size >= 3, s"fixture spans 3+ bands: ${byBand.keys}")
    val Seq(bA, bB, bC) = byBand.keys.toSeq.sorted.take(3)
    val (uA, uB, uC) = (byBand(bA).head, byBand(bB).head, byBand(bC).head)
    def ingest(bid: Long, rows: (Long, String, String)*): Unit =
      StreamingOps.ingestBatchUrlMergeParted(
        rows.toDF("doc_id", "url", "text"),
        s"$base/store", s"$base/out", bid, nb)
    def snapshot(dir: String): Map[String, (Long, String)] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val sum = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
        f.getName -> ((f.length(), sum))
      }.toMap
    }
    def gens(): Seq[String] = new java.io.File(s"$base/store").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    def prov(bid: Long) = spark.read.parquet(s"$base/out")
      .filter($"batch_id" === bid).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(4))).toSet
    def serving() = StreamingOps.urlMergePartedStore(spark, s"$base/store")
      .collect().map(r => (r.getLong(1), r.getString(3))).toSet

    ingest(0L, (1L, uA, "alpha v1"), (2L, uB, "beta v1"))
    val gen0B = snapshot(s"$base/store/gen=0/band=$bB")
    assert(gen0B.nonEmpty, "band B written by the seed batch")
    // batch 1 touches ONLY band A (a content-changed re-crawl of uA)
    ingest(1L, (10L, uA, "alpha v2"))
    val gen1Bands = new java.io.File(s"$base/store/gen=1").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(gen1Bands === Seq(s"band=$bA"),
      s"the generation holds only the touched band: $gen1Bands")
    assert(snapshot(s"$base/store/gen=0/band=$bB") === gen0B,
      "untouched band's files byte-identical in their original generation")
    val p1 = prov(1L)
    assert(p1.map(x => (x._2, x._3)) === Set((10L, "changed")),
      s"content move detected against the manifest-resolved slice: $p1")
    val s1 = serving()
    assert(s1.map(_._1) === Set(10L, 2L),
      s"band A served from gen 1, band B through the manifest from gen 0: $s1")
    // replay batch 1 (crash before checkpoint commit): fixpoint
    ingest(1L, (10L, uA, "alpha v2"))
    assert(prov(1L) === p1 && serving() === s1, "replay is a fixpoint")
    // batch 2 rewrites band B. Generation 0 is still referenced by the
    // read generation's manifest (batch 2 can replay) — it must survive
    ingest(2L, (20L, uB, "beta v2"))
    assert(gens() === Seq("gen=0", "gen=1", "gen=2"),
      s"gen 0 survives while the replay anchor references it: ${gens()}")
    // batch 3 (band C): gen 0 is now unreachable from both the read
    // manifest (A→1, B→2) and the new one — pruned; gen 1 stays live
    ingest(3L, (30L, uC, "gamma v1"))
    assert(gens() === Seq("gen=1", "gen=2", "gen=3"),
      s"only the unreferenced generation is pruned: ${gens()}")
    assert(serving() === Set((10L, md5Of(spark, "alpha v2")),
      (20L, md5Of(spark, "beta v2")), (30L, md5Of(spark, "gamma v1"))),
      "the manifest-resolved store equals the last-writer-wins fold")
  }

  test("compactPartedStore rewrites the serving view into ONE self-contained " +
      "generation: serving frame is a fixpoint, live generation count drops " +
      "to 1, the next batch's read resolves through the compacted gen only, " +
      "and its replay still holds") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-parted-compact").toString
    val nb = 4
    val byBand = ('a' to 'p').map(c => s"https://example.org/$c").toDF("url")
      .select($"url", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          graft.operators.Dedup.canonicalUrl($"url")),
        org.apache.spark.sql.functions.lit(nb.toLong)).as("band"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val Seq(bA, bB, bC) = byBand.keys.toSeq.sorted.take(3)
    val (uA, uB, uC) = (byBand(bA).head, byBand(bB).head, byBand(bC).head)
    def ingest(bid: Long, rows: (Long, String, String)*): Unit =
      StreamingOps.ingestBatchUrlMergeParted(
        rows.toDF("doc_id", "url", "text"),
        s"$base/store", s"$base/out", bid, nb)
    def gens(): Seq[String] = new java.io.File(s"$base/store").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    def serving() = StreamingOps.urlMergePartedStore(spark, s"$base/store")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet
    // K scattered batches, each touching a different band — the serving
    // manifest now spans three generations (the fan-out compaction bounds)
    ingest(0L, (1L, uA, "alpha v1"))
    ingest(1L, (2L, uB, "beta v1"))
    ingest(2L, (3L, uC, "gamma v1"))
    assert(gens().size >= 3, s"scattered batches leave a spanning manifest: ${gens()}")
    val viewBefore = serving()
    assert(viewBefore.map(_._2) === Set(1L, 2L, 3L))
    // compaction id must exceed every existing generation — loud otherwise
    val e = intercept[IllegalArgumentException] {
      StreamingOps.compactPartedStore(spark, s"$base/store", 1L)
    }
    assert(e.getMessage.contains("compactPartedStore"))
    val pruned = StreamingOps.compactPartedStore(spark, s"$base/store", 100L)
    assert(pruned >= 3, s"all pre-compaction generations pruned: $pruned")
    assert(gens() === Seq("gen=100"), s"live generation count = 1: ${gens()}")
    assert(serving() === viewBefore, "compaction is a serving-frame fixpoint")
    // the next batch reads through the compacted generation only and the
    // incremental contract is unchanged: content-move detected, replay holds
    ingest(101L, (10L, uA, "alpha v2"))
    def prov(bid: Long) = spark.read.parquet(s"$base/out")
      .filter($"batch_id" === bid).collect()
      .map(r => (r.getLong(1), r.getString(4))).toSet
    assert(prov(101L) === Set((10L, "changed")),
      s"provenance against the compacted view: ${prov(101L)}")
    val afterBatch = serving()
    assert(afterBatch.map(_._2) === Set(10L, 2L, 3L),
      s"replacement landed, compacted history carried: $afterBatch")
    ingest(101L, (10L, uA, "alpha v2")) // replay
    assert(prov(101L) === Set((10L, "changed")) && serving() === afterBatch,
      "replay after compaction is a fixpoint")
    assert(gens() === Seq("gen=100", "gen=101"),
      s"steady state back to the two-generation window: ${gens()}")
    // compacting an empty store is a no-op, not an error
    assert(StreamingOps.compactPartedStore(spark, s"$base/empty", 5L) === -1)

    // RETRY AFTER A CRASH MID-COMPACTION: a leftover gen=<compactId>
    // directory with NO _BANDS (crashed between the parquet write and
    // the manifest publish) must not block the retry with the SAME id —
    // replay-heals-by-rewriting, like every other writer in the module
    val crashDir = new java.io.File(s"$base/store/gen=200")
    assert(crashDir.mkdirs(), "simulated crashed compaction dir")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$base/store/gen=200/partial.bin"), "junk")
    val retried = StreamingOps.compactPartedStore(spark, s"$base/store", 200L)
    assert(retried >= 2, s"retry with the crashed id publishes + vacuums: $retried")
    assert(gens() === Seq("gen=200"), s"retry healed the crashed dir: ${gens()}")
    assert(serving() === afterBatch, "retry is a serving-frame fixpoint")
    // a COMMITTED gen=<compactId> (crash between publish and vacuum)
    // makes the retry a publish no-op that finishes the vacuum: re-add a
    // stale unreferenced generation and rerun with the same id
    val staleDir = new java.io.File(s"$base/store/gen=150")
    assert(staleDir.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$base/store/gen=150/_BANDS"), "0=150\n")
    assert(StreamingOps.compactPartedStore(spark, s"$base/store", 200L) === 1,
      "committed-self retry just finishes the vacuum")
    assert(gens() === Seq("gen=200"))

    // DEFERRED VACUUM (the OPTIMIZE-then-VACUUM retention split): with
    // vacuum=false the compaction publishes but deletes nothing — an
    // in-flight reader's generations survive until vacuumPartedStore
    ingest(201L, (2L, uB, "beta v2")) // spread the manifest again
    val before = gens().size
    assert(StreamingOps.compactPartedStore(spark, s"$base/store", 300L,
      vacuum = false) === 0, "deferred: publish only, nothing deleted")
    assert(gens().size === before + 1, s"old generations retained: ${gens()}")
    assert(serving().map(_._2) === Set(10L, 2L, 3L))
    assert(StreamingOps.vacuumPartedStore(spark, s"$base/store") === before,
      "the grace-window vacuum frees exactly the unreferenced history")
    assert(gens() === Seq("gen=300"), s"post-vacuum: ${gens()}")
    assert(serving().map(_._2) === Set(10L, 2L, 3L),
      "vacuum never touches the committed serving view")
  }

  test("compaction high-water mark: a micro-batch whose id collides with " +
      "or precedes a published compaction fails LOUD — the compacted " +
      "generation can never be silently static-overwritten (r16 ADVICE)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-parted-hw").toString
    def ingest(bid: Long, doc: Long, url: String, text: String): Unit =
      StreamingOps.ingestBatchUrlMergeParted(
        Seq((doc, url, text)).toDF("doc_id", "url", "text"),
        s"$base/store", s"$base/out", bid, 4)
    ingest(0L, 1L, "https://example.org/a", "alpha v1")
    ingest(1L, 2L, "https://example.org/b", "beta v1")
    StreamingOps.compactPartedStore(spark, s"$base/store", 50L)
    val viewAfterCompact = StreamingOps
      .urlMergePartedStore(spark, s"$base/store").collect().toSet
    // the exact collision the contract could not previously detect: a
    // resumed stream reaching batchId == compactId would rewrite gen=50
    val collide = intercept[IllegalArgumentException] {
      ingest(50L, 9L, "https://example.org/a", "poison")
    }
    assert(collide.getMessage.contains("high-water mark gen=50"))
    // a pre-compaction replay (uncommitted checkpoint) fails the same way
    val replay = intercept[IllegalArgumentException] {
      ingest(1L, 2L, "https://example.org/b", "beta v1")
    }
    assert(replay.getMessage.contains("high-water"))
    assert(StreamingOps.urlMergePartedStore(spark, s"$base/store")
      .collect().toSet === viewAfterCompact,
      "both rejected batches left the compacted store untouched")
    // the stream resumed PAST the compaction proceeds normally
    ingest(51L, 10L, "https://example.org/a", "alpha v2")
    assert(StreamingOps.urlMergePartedStore(spark, s"$base/store")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet ===
      Set((10L, "https://example.org/a"), (2L, "https://example.org/b")))
    // a SECOND compaction advances the mark (overwrite-rename, no window)
    StreamingOps.compactPartedStore(spark, s"$base/store", 90L)
    val old = intercept[IllegalArgumentException] {
      ingest(60L, 11L, "https://example.org/b", "late")
    }
    assert(old.getMessage.contains("gen=90"), "mark advanced to the newest compaction")
    ingest(91L, 11L, "https://example.org/b", "beta v3")
    assert(StreamingOps.urlMergePartedStore(spark, s"$base/store")
      .filter($"doc_id" === 11L).count() === 1L)
  }

  test("the _COMPACT high-water mark is a MAX over per-publish marker " +
      "files (r18 ADVICE): a newer marker committed between an older " +
      "writer's read and its publish is never regressed, and the legacy " +
      "single-file form still participates") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-parted-max").toString
    def ingest(bid: Long, doc: Long, url: String, text: String): Unit =
      StreamingOps.ingestBatchUrlMergeParted(
        Seq((doc, url, text)).toDF("doc_id", "url", "text"),
        s"$base/store", s"$base/out", bid, 4)
    ingest(0L, 1L, "https://example.org/a", "alpha v1")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(name: String, id: Long): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$base/store/$name"), true)
      try out.write(s"$id\n".getBytes("UTF-8")) finally out.close()
    }
    // the lost-update interleave the single-file form could not survive:
    // compactor B commits 90 (legacy bare file), then slower compactor A —
    // which read the marker before B's commit — publishes its 50. Under
    // overwrite-rename A would have clobbered 90; under per-publish names
    // both files coexist and the read side takes the max.
    put("_COMPACT", 90L)
    put("_COMPACT.50", 50L)
    val collide = intercept[IllegalArgumentException] {
      ingest(60L, 9L, "https://example.org/a", "poison")
    }
    assert(collide.getMessage.contains("gen=90"),
      s"max over both marker forms must win: ${collide.getMessage}")
    // a real compaction past both advances the mark and prunes the
    // superseded markers — exactly one (the max) remains
    ingest(91L, 2L, "https://example.org/b", "beta v1")
    StreamingOps.compactPartedStore(spark, s"$base/store", 95L, vacuum = false)
    val markers = fs.globStatus(new org.apache.hadoop.fs.Path(s"$base/store/_COMPACT*"))
      .map(_.getPath.getName).toSet
    assert(markers === Set("_COMPACT.95"),
      s"superseded markers pruned, max kept: $markers")
    val after = intercept[IllegalArgumentException] {
      ingest(92L, 9L, "https://example.org/b", "late")
    }
    assert(after.getMessage.contains("gen=95"))
  }

  test("the _COMPACT high-water mark is MONOTONE: replaying an older " +
      "committed compaction after out-of-band surgery removed the newer " +
      "generation cannot regress the mark and re-open the collision " +
      "window (r17 ADVICE)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-parted-mono").toString
    def ingest(bid: Long, doc: Long, url: String, text: String): Unit =
      StreamingOps.ingestBatchUrlMergeParted(
        Seq((doc, url, text)).toDF("doc_id", "url", "text"),
        s"$base/store", s"$base/out", bid, 4)
    ingest(0L, 1L, "https://example.org/a", "alpha v1")
    ingest(1L, 2L, "https://example.org/b", "beta v1")
    StreamingOps.compactPartedStore(spark, s"$base/store", 50L, vacuum = false)
    StreamingOps.compactPartedStore(spark, s"$base/store", 90L, vacuum = false)
    // out-of-band surgery: the newer compacted generation disappears, so
    // the retry's existing-generation require sees only gens ≤ 50 and the
    // selfCommitted branch for 50 becomes reachable again
    val dir = new org.apache.hadoop.fs.Path(s"$base/store/gen=90")
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(dir, true)
    StreamingOps.compactPartedStore(spark, s"$base/store", 50L)
    // the mark must still read 90: a batch in the re-opened id range
    // stays rejected with the NEWER mark in the message
    val collide = intercept[IllegalArgumentException] {
      ingest(60L, 9L, "https://example.org/a", "poison")
    }
    assert(collide.getMessage.contains("gen=90"),
      s"marker must not regress to 50: ${collide.getMessage}")
    // and the store still serves from the surviving committed generation
    assert(StreamingOps.urlMergePartedStore(spark, s"$base/store")
      .collect().map(_.getLong(1)).toSet === Set(1L, 2L))
  }

  private def md5Of(spark: org.apache.spark.sql.SparkSession, s: String): String =
    b1Fp(spark, s)

  test("ingestBatchUrlMerge prune is never destructive: a batchId restart " +
      "at 0 against an existing store deletes NO history, and a stray " +
      "non-numeric gen directory neither crashes the batch nor gets " +
      "swept") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-urlmerge-restart").toString
    val b0 = Seq((1L, "https://example.org/a", "alpha v1"))
      .toDF("doc_id", "url", "text")
    val b1 = Seq((10L, "https://example.org/b", "beta v1"))
      .toDF("doc_id", "url", "text")
    StreamingOps.ingestBatchUrlMerge(b0, s"$base/store", s"$base/out", 0L)
    StreamingOps.ingestBatchUrlMerge(b1, s"$base/store", s"$base/out", 1L)
    val gen1Before = spark.read.parquet(s"$base/store/gen=1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gen1Before.map(_._1) === Set("example.org/a", "example.org/b"))
    // a tool leaves a stray directory the gen parser must skip, not throw on
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$base/store/gen=tmp"))
    // checkpoint reset: a NEW stream restarts batch ids at 0 against the
    // same store. Nothing older than batchId exists, so the prune's keep
    // set is empty — it must delete NOTHING (the old rule wiped gen=1
    // here: the entire accumulated history)
    val r0 = Seq((20L, "https://example.org/c", "gamma v1"))
      .toDF("doc_id", "url", "text")
    StreamingOps.ingestBatchUrlMerge(r0, s"$base/store", s"$base/out2", 0L)
    val gens = new java.io.File(s"$base/store").listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).sorted.toSeq
    assert(gens === Seq("gen=0", "gen=1", "gen=tmp"),
      s"history generations and the stray dir all survive the restart: $gens")
    assert(spark.read.parquet(s"$base/store/gen=1").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet === gen1Before,
      "the newest pre-restart generation is untouched")
  }

  test("ingestBatchUrlMerge prune anchor is commit-marker-aware: a crashed " +
      "uncommitted newer generation (dir present, no _SUCCESS) is NOT the " +
      "keep anchor — the committed generation the batch actually read " +
      "survives the prune, and the batch's replay fixpoint holds") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-urlmerge-crashgen").toString
    val b0 = Seq((1L, "https://example.org/a", "alpha v1"),
      (2L, "https://example.org/b", "beta v1")).toDF("doc_id", "url", "text")
    StreamingOps.ingestBatchUrlMerge(b0, s"$base/store", s"$base/out", 0L)
    // simulate batch 1 crashing MID-WRITE: its generation directory exists
    // with data files but the _SUCCESS marker never landed
    val b1 = Seq((10L, "https://example.org/b", "beta v2"))
      .toDF("doc_id", "url", "text")
    StreamingOps.ingestBatchUrlMerge(b1, s"$base/store", s"$base/out", 1L)
    assert(java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$base/store/gen=1/_SUCCESS")),
      "fixture: gen=1 exists and its commit marker is removed")
    val gen0Before = spark.read.parquet(s"$base/store/gen=0").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet
    // batch 2 runs: the read skips uncommitted gen=1 and resolves gen=0;
    // the prune's keep anchor must apply the SAME committed filter — the
    // old rule anchored on gen=1 and deleted gen=0, the replay anchor
    val b2 = Seq((20L, "https://example.org/c", "gamma v1"))
      .toDF("doc_id", "url", "text")
    StreamingOps.ingestBatchUrlMerge(b2, s"$base/store", s"$base/out", 2L)
    def prov2() = spark.read.parquet(s"$base/out")
      .filter($"batch_id" === 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(4))).toSet
    val firstProv = prov2()
    assert(firstProv.map(x => (x._1, x._3)) ===
      Set(("example.org/c", "new")),
      s"provenance computed against committed gen=0, not the crashed dir: $firstProv")
    val gens = new java.io.File(s"$base/store").listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).sorted.toSeq
    assert(gens.contains("gen=0"),
      s"the committed generation the batch read survives the prune: $gens")
    assert(spark.read.parquet(s"$base/store/gen=0").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet
      === gen0Before, "gen=0 untouched byte-for-byte in content")
    // replay batch 2 (crash before checkpoint commit): reads gen=0 again —
    // identical provenance, identical merged generation (the fixpoint the
    // old rule broke by deleting the anchor: replay would have seen an
    // empty store and reported everything 'new' with lost history)
    StreamingOps.ingestBatchUrlMerge(b2, s"$base/store", s"$base/out", 2L)
    assert(prov2() === firstProv, "replay fixpoint: provenance identical")
    assert(spark.read.parquet(s"$base/store/gen=2").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      === Set(("example.org/a", 1L), ("example.org/b", 2L),
        ("example.org/c", 20L)),
      "merged generation carries the full committed history plus the batch")
  }

  test("ingestLoopChunks embeds each distinct chunk once across batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-chunkloop").toString
    val input = MemoryStream[UrlDoc] // (doc_id, url) stands in for (doc_id, text)
    val q = StreamingOps.ingestLoopChunks(
      input.toDF().withColumnRenamed("url", "text"),
      s"$base/store", s"$base/out", s"$base/ckpt")
    val para = (1 to 32).map(i => s"w$i").mkString(" ")   // one full window
    val tail = (1 to 8).map(i => s"x$i").mkString(" ")
    try {
      input.addData(UrlDoc(1L, s"$para $tail"))          // chunks: [w1..w32], [w25..x8]
      q.processAllAvailable()
      val b0 = spark.read.parquet(s"$base/out").count()
      assert(b0 === 2L, s"first doc contributes its two windows: $b0")
      // doc 2 re-sends the same leading window (boilerplate) + new tail
      input.addData(UrlDoc(2L, s"$para y1 y2 y3 y4 y5 y6 y7 y8"))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$base/out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.size === 3,
        s"shared leading window must not re-embed: $rows")
      assert(rows.contains((2L, 1L)), s"doc 2's novel tail window kept: $rows")
      assert(!rows.contains((2L, 0L)), s"doc 2's boilerplate window dropped: $rows")
    } finally q.stop()
  }

  test("ingestLoopChunkSemantic drops a PARAPHRASED boilerplate chunk (different " +
      "md5, same bag) before the embedder, keeps novel content") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-chunksem").toString
    // ≤ 24 tokens → exactly one window per doc (W=32, S=24)
    val boiler = (1 to 20).map(i => s"w$i").mkString(" ")
    // word-order paraphrase: identical token bag, different md5
    val para = (1 to 20).map(i => s"w$i").reverse.mkString(" ")
    val novel = (1 to 20).map(i => s"z$i").mkString(" ")
    // frozen centroids trained on a small history corpus (causal artifact)
    val hist = Seq((100L, boiler), (101L, novel)).toDF("doc_id", "text")
    val histEmb = graft.operators.Similarity.chunkEmbed(
      graft.operators.TrainingData.chunkTexts(hist)
        .groupBy(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("chunk_text")).as("chunk_hash"))
        .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("chunk_text")).as("chunk_text")))
    val cents = graft.operators.Similarity.centroidArray(histEmb, 16)
    val input = MemoryStream[UrlDoc] // (doc_id, url) stands in for (doc_id, text)
    val q = StreamingOps.ingestLoopChunkSemantic(
      input.toDF().withColumnRenamed("url", "text"),
      cents, s"$base/mem", s"$base/out", s"$base/ckpt")
    try {
      input.addData(UrlDoc(1L, boiler))
      q.processAllAvailable()
      val b0 = spark.read.parquet(s"$base/out").collect().map(_.getLong(0)).toSet
      assert(b0 === Set(1L), s"first arrival of the boilerplate embeds: $b0")
      input.addData(
        UrlDoc(2L, boiler), // exact copy → dropped before embedding
        UrlDoc(3L, para),   // paraphrase: new md5, cosine 1.0 → dropped
        UrlDoc(4L, novel))  // novel content → kept
      q.processAllAvailable()
      val docs = spark.read.parquet(s"$base/out").collect().map(_.getLong(0)).toSet
      assert(docs === Set(1L, 4L),
        s"exact AND paraphrased boilerplate drop, novel keeps: $docs")
      // the member store holds exactly the two surviving chunks
      assert(spark.read.parquet(s"$base/mem").count() === 2L)
    } finally q.stop()
  }

  test("ingestBatchChunkSemantic same-batch rule: of two paraphrases arriving " +
      "together exactly one survives (smaller vec_id)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-chunksem2").toString
    val a = (1 to 20).map(i => s"q$i").mkString(" ")
    val b = (1 to 20).map(i => s"q$i").reverse.mkString(" ")
    val hist = Seq((100L, a)).toDF("doc_id", "text")
    val histEmb = graft.operators.Similarity.chunkEmbed(
      graft.operators.TrainingData.chunkTexts(hist)
        .groupBy(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("chunk_text")).as("chunk_hash"))
        .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("chunk_text")).as("chunk_text")))
    val cents = graft.operators.Similarity.centroidArray(histEmb, 16)
    StreamingOps.ingestBatchChunkSemantic(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      cents, s"$base/mem", s"$base/out", 0L)
    val out = spark.read.parquet(s"$base/out").collect()
    assert(out.length === 1,
      s"same-batch paraphrase pair collapses to one embedder row: ${out.toSeq}")
    // replay the SAME batchId (crash after both writes, before checkpoint
    // commit): the store read excludes batch=0, so the batch dedups against
    // the empty pre-append store it first saw and overwrites its own rows —
    // no duplicated embedder input, store unchanged (advisor round 13)
    StreamingOps.ingestBatchChunkSemantic(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      cents, s"$base/mem", s"$base/out", 0L)
    val replay = spark.read.parquet(s"$base/out").collect()
    assert(replay.length === 1,
      s"replay is a fixpoint, not an append: ${replay.toSeq}")
    assert(spark.read.parquet(s"$base/mem").count() === 1L,
      "member store unchanged by the replay")
  }

  test("ingestBatchSpans store write is idempotent per batchId: a replay after " +
      "a crashed checkpoint audits against the pre-append store") {
    import spark.implicits._
    val W = graft.operators.Dedup.SpanWindow
    val base = java.nio.file.Files.createTempDirectory("graft-spanreplay").toString
    val para = (1 to W).map(i => s"p$i").mkString(" ")
    val b0 = Seq((1L, para)).toDF("doc_id", "text")
    StreamingOps.ingestBatchSpans(b0, s"$base/spans", s"$base/out0", 0L)
    // batch 1 re-uses batch 0's paragraph → exactly one history dup
    val b1 = Seq((2L, para + " t1 t2")).toDF("doc_id", "text")
    StreamingOps.ingestBatchSpans(b1, s"$base/spans", s"$base/out1", 1L)
    val firstStore = spark.read.parquet(s"$base/spans")
      .select("h").collect().map(_.getString(0)).sorted
    val firstAudit = spark.read.parquet(s"$base/out1")
      .select("doc_id", "n_hist_dup").collect().map(r => (r.getLong(0), r.getLong(1)))
    // simulate the crash-after-store-append replay: same batchId again
    StreamingOps.ingestBatchSpans(b1, s"$base/spans", s"$base/out1", 1L)
    val replayStore = spark.read.parquet(s"$base/spans")
      .select("h").collect().map(_.getString(0)).sorted
    assert(replayStore === firstStore, "replay must not grow the store")
    // the replayed audit rows are byte-identical to the first attempt's —
    // n_hist_dup did NOT inflate from the batch's own already-stored spans
    val audits = spark.read.parquet(s"$base/out1")
      .select("doc_id", "n_hist_dup").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(audits.length === 2 * firstAudit.length)
    assert(audits.toSet === firstAudit.toSet,
      s"replay audit drifted: ${audits.toSet} vs ${firstAudit.toSet}")
  }

  test("ingestLoopEmbeddingDrift: bootstrap silent, steady quiet, a cluster-mass " +
      "shift fires the alarm; replay never double-counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-embdrift").toString
    val input = MemoryStream[StreamVec]
    // the frozen serving codebook: the e1/e2 axes (cids 100, 101)
    val boot = Seq((100L, Array(1f, 0f)), (101L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorFunctions.dotProduct(col("e"), col("e"))))
    val cents = graft.operators.Similarity.centroidArray(boot, 2)
    val q = StreamingOps.ingestLoopEmbeddingDrift(
      input.toDF().select("vec_id", "embedding"),
      cents, s"$base/store", s"$base/out", s"$base/ckpt")
    def nearE1(id: Long) = StreamVec(id, Array(1f, 0.01f * id))
    def nearE2(id: Long) = StreamVec(id, Array(0.01f * id, 1f))
    try {
      // bootstrap: 3:1 mass on the e1 cluster — store seeded, no report
      input.addData(nearE1(1), nearE1(2), nearE1(3), nearE2(4))
      q.processAllAvailable()
      assert(!new java.io.File(s"$base/out").exists() ||
        spark.read.parquet(s"$base/out").count() === 0L)
      assert(spark.read.parquet(s"$base/store").groupBy("t").sum("c").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap === Map("100" -> 3L, "101" -> 1L))

      // steady batch: same 3:1 shape → quiet report
      input.addData(nearE1(5), nearE1(6), nearE1(7), nearE2(8))
      q.processAllAvailable()
      val r1 = spark.read.parquet(s"$base/out").filter(col("batch_id") === 1L).collect()
      assert(r1.nonEmpty, "steady batch must emit a report")
      val quietTotal = r1.head.getAs[Long]("total_psi_micro")

      // shifted batch: the mass swaps to the e2 cluster — the codebook
      // re-train trigger must fire (total PSI above the steady level)
      input.addData(nearE2(9), nearE2(10), nearE2(11), nearE1(12))
      q.processAllAvailable()
      val r2 = spark.read.parquet(s"$base/out")
        .filter(col("batch_id") === 2L)
        .orderBy(col("contrib_micro").desc, col("term")).collect()
      assert(r2.head.getAs[Long]("total_psi_micro") > quietTotal,
        "cluster-mass shift must raise total PSI above the steady level")
      assert(Set("100", "101").contains(r2.head.getAs[String]("term")),
        "the drifted bin must top the report")
    } finally q.stop()

    // replay: same batchId scores against the pre-append store
    val b = Seq((20L, Array(1f, 0f))).toDF("vec_id", "embedding")
    StreamingOps.ingestBatchEmbeddingDrift(b, cents, s"$base/store", s"$base/out9", 9L)
    val store1 = spark.read.parquet(s"$base/store").groupBy("t").sum("c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rep1 = spark.read.parquet(s"$base/out9")
      .select("term", "contrib_micro").collect().map(r => (r.getString(0), r.getLong(1)))
    StreamingOps.ingestBatchEmbeddingDrift(b, cents, s"$base/store", s"$base/out9", 9L)
    val store2 = spark.read.parquet(s"$base/store").groupBy("t").sum("c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(store2 === store1, "replay must not double-count the store")
    val rep2 = spark.read.parquet(s"$base/out9")
      .select("term", "contrib_micro").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rep2.length === rep1.length && rep2.toSet === rep1.toSet,
      "replayed report must overwrite its own batch_id partition, not append")
  }

  test("ingestLoopSemantic drops cross-batch semantic dups via the accumulated member store") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-semloop").toString
    val input = MemoryStream[StreamVec]
    // centroids trained on a 2-vector bootstrap "history" (the e1/e2 axes) —
    // the fixed causal artifact the loop serves against
    val boot = Seq((100L, Array(1f, 0f)), (101L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorFunctions.dotProduct(col("e"), col("e"))))
    val cents = graft.operators.Similarity.centroidArray(boot, 2)
    val q = StreamingOps.ingestLoopSemantic(
      input.toDF().select("vec_id", "embedding"),
      cents, s"$base/mem", s"$base/out", s"$base/ckpt")
    try {
      // batch 1: v2 is a near-exact copy of v1 (same cluster, cos ≈ 1) —
      // dropped in-batch by the first-arrival rule; v3 lives in the other
      // cluster and survives
      input.addData(
        StreamVec(1, Array(1f, 0.01f)),
        StreamVec(2, Array(1f, 0.011f)),
        StreamVec(3, Array(0.01f, 1f)))
      q.processAllAvailable()
      val kept1 = spark.read.parquet(s"$base/out")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(kept1 === Set(1L, 3L), s"in-batch semantic dup (2) must drop, got $kept1")
      // batch 2: v4 re-sends v1's direction — only the ACCUMULATED member
      // store can catch it; v5 shares v3's cluster but sits far away
      input.addData(
        StreamVec(4, Array(0.999f, 0.012f)),
        StreamVec(5, Array(-1f, 0.5f)))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$base/out")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L, 5L),
        s"cross-batch semantic dup (4) must drop via the store, got $kept")
      // the member store is the accumulator: one full row per survivor
      assert(spark.read.parquet(s"$base/mem").count() === 3,
        "store must hold exactly the survivors' member rows")
    } finally q.stop()
  }
}

final case class StreamVec(vec_id: Long, embedding: Array[Float])

final case class StreamDoc(doc_id: Long, source: String, text: String, ingest_ts: Timestamp)
final case class UrlDoc(doc_id: Long, url: String)
final case class CrawlDoc(doc_id: Long, url: String, text: String)
