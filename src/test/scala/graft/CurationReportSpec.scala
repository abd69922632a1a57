package graft

import org.scalatest.funsuite.AnyFunSuite

/** `curation_report` is the attrition table of the composed pipeline:
  * stages must be monotone, drop accounting must balance row to row, the
  * raw stage must cover the corpus, and the dedup stage's survivor count
  * must equal the standalone `curation_pipeline`'s output (same clean →
  * quality → dedup rules on the same data). */
class CurationReportSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("monotone stages, balanced drops, agreement with curation_pipeline") {
    val rows = SparkEntry.queries("curation_report")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq ===
      Seq("raw", "quality", "dedup", "decontaminate", "classifier"))
    assert(rows.head._3 === 500L, "raw stage must cover the corpus")
    for (Array(prev, cur) <- rows.sliding(2)) {
      assert(cur._3 <= prev._3, s"docs must be monotone: $prev -> $cur")
      assert(cur._4 <= prev._4, s"tokens must be monotone: $prev -> $cur")
      assert(cur._5 === prev._3 - cur._3, s"drop accounting: $prev -> $cur")
      assert(cur._6 === (if (prev._3 > 0) 1000L * cur._5 / prev._3 else 0L))
    }
    val pipeline = SparkEntry.queries("curation_pipeline")(spark, sf).count()
    assert(rows(2)._3 === pipeline,
      s"dedup-stage survivors (${rows(2)._3}) must equal curation_pipeline rows ($pipeline)")
    // the classifier stage must actually bind (drop something) at this SF
    assert(rows(4)._3 < rows(3)._3, "classifier stage is vacuous")
  }
}
