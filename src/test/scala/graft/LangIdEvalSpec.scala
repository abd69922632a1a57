package graft

import org.scalatest.funsuite.AnyFunSuite

/** `text_langid_eval` must be the exact aggregate of the per-doc
  * `text_langid_trigram` output: cells sum to the corpus, each cell equals
  * its per-doc count, accuracy = diagonal/support in integer milli. */
class LangIdEvalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("confusion cells aggregate the per-doc predictions exactly") {
    val perDoc = SparkEntry.queries("text_langid_trigram")(spark, sf)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val expected = perDoc.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rows = SparkEntry.queries("text_langid_eval")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(rows.map(_._2._1).sum === perDoc.length.toLong, "cells must cover the corpus")
    for ((cell, (n, support, correct, accMilli)) <- rows) {
      assert(n === expected(cell), s"cell $cell")
      val exSupport = perDoc.count(_._1 == cell._1).toLong
      val exCorrect = perDoc.count(p => p._1 == cell._1 && p._1 == p._2).toLong
      assert((support, correct) === ((exSupport, exCorrect)), s"per-lang $cell")
      assert(accMilli === 1000L * exCorrect / exSupport)
    }
  }
}
