package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Chunk-grain hybrid retrieval: max-passage doc aggregation (a document
  * scores by its BEST chunk), doc-level self-exclusion (a chunk shared
  * between the query doc and doc X still counts for X), md5 chunk collapse
  * (identical passages in different documents are ONE scored chunk), and
  * the fused output's integer-RRF arithmetic laws on the real corpus. */
class ChunkHybridSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("max-passage + shared-chunk semantics on a hand-built fixture: a " +
      "long document is ranked by its best (suffix) window, the identical " +
      "standalone passage ties with it, and the query document is excluded " +
      "at the doc level while its shared chunk still scores the others") {
    import spark.implicits._
    // the match passage: 8 tokens, 4 distinct (all length >= 4) — doc 0's
    // whole text, doc 30's whole text, and the second window (stride 24)
    // of doc 20, whose first 24 tokens are distinct filler
    val matchTxt = "alpha bravo gamma delta alpha bravo gamma delta"
    val filler = (1 to 24).map(i => f"fill$i%02d").mkString(" ")
    val docs = Seq(
      (0L, matchTxt),                  // the query document (doc_id < 10)
      (20L, s"$filler $matchTxt"),     // 32 tokens -> windows [1..32], [25..32]
      (30L, matchTxt)                  // standalone copy of the passage
    ).toDF("doc_id", "text")
    val out = Retrieval.chunkHybridFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // the match chunk is ONE distinct chunk shared by docs 0, 20, 30; both
    // legs score it once and max-passage hands the identical score to docs
    // 20 and 30 (doc 0 = the query, excluded) — ties break to doc_id, and
    // the dual-leg RRF sums are exact integers: 2*(1000000 div 61), then
    // 2*(1000000 div 62)
    assert(out.toSeq === Seq(
      (0L, 20L, 1L, 1L, 2L * (1000000L / 61), 1L),
      (0L, 30L, 2L, 2L, 2L * (1000000L / 62), 2L)),
      s"fixture fusion: ${out.toSeq}")
  }

  test("corpus run (sf0.001): per-query contiguous ranks, doc-level " +
      "self-exclusion, leg-rank bounds, and rrf_score recomputable from " +
      "the two leg ranks") {
    val d = "/root/testdata/sf0.001"
    val rows = Retrieval.chunkHybridRanks(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).distinct.sorted.toSeq === (0L until 10L).toSeq,
      "all ten queries produce fused lists")
    for ((q, g) <- rows.groupBy(_._1)) {
      assert(g.map(_._6).sorted.toSeq === (1L to g.length).toSeq,
        s"contiguous ranks for query $q")
      // ranks must follow (rrf_score DESC, doc_id ASC)
      val orderedByRnk = g.sortBy(_._6).map(x => (-x._5, x._2)).toSeq
      assert(orderedByRnk === orderedByRnk.sorted,
        s"rank order is (score desc, doc_id) for query $q")
    }
    for ((q, doc, lexR, denR, score, _) <- rows) {
      assert(doc !== q, s"query doc $q leaked into its own candidates")
      assert(lexR >= 0L && lexR <= 10L, s"lex rank bound at ($q,$doc)")
      assert(denR >= 0L && denR <= 5L, s"dense rank bound at ($q,$doc)")
      assert(lexR > 0L || denR > 0L, s"($q,$doc) in neither leg")
      val exp = (if (lexR > 0) 1000000L / (Retrieval.RrfK + lexR) else 0L) +
        (if (denR > 0) 1000000L / (Retrieval.RrfK + denR) else 0L)
      assert(score === exp, s"integer RRF arithmetic at ($q,$doc)")
    }
  }
}
