package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData
import graft.streaming.StreamingOps

final case class CurationDoc(doc_id: Long, source: String, text: String,
  ingest_ts: Timestamp)

/** STREAMING ATTRITION CARD ≡ BATCH DATA CARD (r17 verdict item 5): the
  * gated curation stream's `observe` counters, accumulated across
  * micro-batches, must equal the batch `curation_report_v2` stage rows on
  * the same fixture — a stream that admits per batch but drops silently
  * is not publishing the data card the batch pipeline prints. The fixture
  * exercises every stage: one gopher drop, one entropy-band drop, one
  * exact cross-batch duplicate (same cleaned bytes, so the stream's
  * content-hash dedup and the batch's token-set keep-best agree on both
  * doc and token counts), two clean survivors. */
class CurationAttritionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private def t(min: Int) = new Timestamp(3600000L + min * 60000L)

  // passes all gates: 12 varied words, stopwords "the"/"a", English-ish
  // character entropy inside [3000, 5000]
  private val passA = "the quick brown fox jumps over a lazy dog near green river"
  private val passB = "a small boat drifts down the wide stream past old stone bridges"
  // 3 words: fails the gopher word-count floor
  private val gopherFail = "too few words"
  // 10 words, mean word length 3.6, all alpha, 2 stopwords → PASSES gopher;
  // 5-letter alphabet → char entropy ~2 bits, below the band floor
  private val entropyFail = "thee thee thee thee thee thee thee thee the a"

  test("cumulative streamed gate/emit counters equal the batch " +
      "curation_report_v2 stage rows on a shared fixture") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batch1 = Seq(
      CurationDoc(1, "s0", passA, t(0)),
      CurationDoc(2, "s0", gopherFail, t(0)),
      CurationDoc(3, "s0", entropyFail, t(1)))
    val batch2 = Seq(
      CurationDoc(4, "s1", passB, t(2)),
      CurationDoc(5, "s1", passA, t(2))) // exact dup of doc 1, later batch
    val allDocs = (batch1 ++ batch2)
      .map(d => (d.doc_id, d.source, d.text))
      .toDF("doc_id", "source", "text")

    // ---- batch data card (the oracle-checked registered query's body)
    val report = TrainingData.curationReportV2On(allDocs)
      .orderBy("stage_idx").collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    // fixture is non-vacuous: every stage drops something
    assert(report("raw")._1 === 5L)
    assert(report("gopher_rules")._1 === 4L, s"gopher must drop doc 2: $report")
    assert(report("entropy_band")._1 === 3L, s"entropy must drop doc 3: $report")
    assert(report("keep_best_dedup")._1 === 2L, s"dedup must drop one of 1/5: $report")

    // ---- streamed counters, accumulated across micro-batches
    val gate = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, Long].withDefaultValue(0L))
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        def add(name: String, fields: Seq[String]): Unit =
          Option(e.progress.observedMetrics.get(name)).foreach { row =>
            gate.updateAndGet(m => fields.foldLeft(m)((acc, f) =>
              acc + (f -> (acc(f) + row.getAs[Long](f)))))
          }
        add(StreamingOps.CurationGateMetrics,
          Seq("n_raw", "t_raw", "n_gopher", "t_gopher", "n_admitted", "t_admitted"))
        add(StreamingOps.CurationEmitMetrics, Seq("n_emitted", "t_emitted"))
      }
    }
    spark.streams.addListener(listener)
    val input = MemoryStream[CurationDoc]
    val q = StreamingOps.curationStreamGated(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect(); () // fully consume: the stateful dedup must commit
      }
      .start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      // listener delivery is async
      var waited = 0
      def done() = gate.get()("n_raw") >= 5L && gate.get()("n_emitted") >= 2L
      while (!done() && waited < 100) { Thread.sleep(100); waited += 1 }
    } finally { q.stop(); spark.streams.removeListener(listener) }

    val m = gate.get()
    assert((m("n_raw"), m("t_raw")) === report("raw"),
      s"raw stage: $m vs $report")
    assert((m("n_gopher"), m("t_gopher")) === report("gopher_rules"),
      s"gopher stage: $m vs $report")
    assert((m("n_admitted"), m("t_admitted")) === report("entropy_band"),
      s"entropy stage: $m vs $report")
    assert((m("n_emitted"), m("t_emitted")) === report("keep_best_dedup"),
      s"dedup stage (exact-copy fixture ⇒ counts agree): $m vs $report")
  }
}
