package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.ParquetSink

/** Incremental containment (`dedupIncrementalContainmentOn`): the directed
  * keep rule — a batch EXCERPT of stored history drops even where the
  * Jaccard twin keeps it (the operator's reason to exist), history is
  * never the dropped side, the first-arrival analogue within a batch, and
  * short docs survive. Probes the SAME store shape as the Jaccard twin. */
class IncrementalContainmentSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def shingleSet(text: String): Set[String] = {
    val w = text.split(" ")
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("a batch excerpt of history drops where the Jaccard twin keeps it; " +
      "in-batch excerpts drop against earlier arrivals; clean docs survive") {
    import spark.implicits._
    val full = (0 until 30).map(j => s"t$j").mkString(" ")
    val excerpt = (0 until 12).map(j => s"t$j").mkString(" ") // first 40%
    val hist = Seq((1L, full)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, excerpt),                                  // C(10 in 1)=1.0 → drop
      (11L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),         // novel → keep
      (12L, "u1 u2 u3 u4 u5 u6 u7 u8"),                // excerpt of 11 → drop
      (13L, "v1 v2")                                   // too short → keep, 0
    ).toDF("doc_id", "text")

    // premise: the excerpt pair sits BELOW the Jaccard twin's threshold
    val j = {
      val (a, b) = (shingleSet(excerpt), shingleSet(full))
      a.intersect(b).size.toDouble / a.union(b).size
    }
    assert(j < 0.5, s"fixture must be invisible to Jaccard at 0.5: $j")

    val (postings, stop) = Dedup.shingleStoreSnapshot(hist)
    val p = ParquetSink.writeBucketed(postings, "inc_cont_post", "sid", 4)
    val s = ParquetSink.writeBucketed(stop, "inc_cont_stop", "sid", 4)

    val kept = Dedup.dedupIncrementalContainmentOn(batch, p, s)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.toSeq === Seq(11L -> 8L, 13L -> 0L), s"got ${kept.toSeq}")

    // the Jaccard twin keeps the history excerpt — the divergence is real
    val jacKept = Dedup.dedupIncrementalJaccardOn(batch, p, s)
      .collect().map(_.getLong(0))
    assert(jacKept.contains(10L),
      "the Jaccard twin must keep the excerpt this rule exists to drop")
  }

  test("direction: a batch doc CONTAINING a stored doc whole is kept " +
      "(history is the excerpt side, never dropped; only batch-in-history fires)") {
    import spark.implicits._
    val small = (0 until 10).map(j => s"s$j").mkString(" ")
    val bigger = ((0 until 10).map(j => s"s$j") ++
      (0 until 20).map(j => s"x$j")).mkString(" ")
    val hist = Seq((1L, small)).toDF("doc_id", "text")
    val batch = Seq((10L, bigger)).toDF("doc_id", "text")
    val (postings, stop) = Dedup.shingleStoreSnapshot(hist)
    val p = ParquetSink.writeBucketed(postings, "inc_cont_dir_post", "sid", 4)
    val s = ParquetSink.writeBucketed(stop, "inc_cont_dir_stop", "sid", 4)
    val kept = Dedup.dedupIncrementalContainmentOn(batch, p, s)
      .collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(10L),
      "C(batch in hist) = 8/28 < 0.8: the superset batch doc survives")
  }
}
