package graft

import org.scalatest.funsuite.AnyFunSuite

/** The PosShift packing bound fails LOUD (r19 verdict item 3).
  *
  * Every span-dedup consumer packs positions as doc_id·2^20 + pos
  * (Dedup.PosShift); a document at ≥2^20 tokens would silently alias into
  * another document's key space — corrupting canon keys (span_strip) and
  * posting order (span_longest) with no error. spanHashesPos now raises
  * on such a document instead; this spec pins both directions. */
class PosShiftGuardSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def messages(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("a document at the 2^20-token bound fails loud, naming the bound") {
    import spark.implicits._
    // 2^20 single-char tokens ≈ 2 MB of text — over the packing bound
    val over = Array.fill(1 << 20)("a").mkString(" ")
    val docs = Seq((7L, over)).toDF("doc_id", "text")
    val e = intercept[Throwable] {
      graft.operators.Dedup.spanHashesPos(docs).count()
    }
    val msg = messages(e)
    assert(msg.contains("PosShift"), s"error must name the packing bound:\n$msg")
    assert(msg.contains("document 7"), s"error must name the offending doc:\n$msg")
  }

  test("a document under the bound passes the guard unchanged") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 200).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val n = graft.operators.Dedup.spanHashesPos(docs).count()
    // 200 tokens, window W → 200 − W + 1 spans
    assert(n === 200 - graft.operators.Dedup.SpanWindow + 1)
  }
}
