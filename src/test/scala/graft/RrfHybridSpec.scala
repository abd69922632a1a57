package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** RRF fusion semantics: union (not intersection) candidate handling — a
  * document ranked top by EITHER leg alone can win the fused list — plus
  * exact-integer scores, absent-leg zero contribution, per-query lexical
  * lists (round 13: the lexical leg is query-dependent), and the
  * registered query's agreement with a by-hand replay of both legs. */
class RrfHybridSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def fuse(lex: Seq[(Long, Long, Long)], den: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    Retrieval.rrfFuse(
      lex.toDF("query_id", "doc_id", "lex_rank"),
      den.toDF("query_id", "doc_id", "dense_rank"), topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
  }

  test("a dense-only #1 wins the fusion against lexical-only candidates") {
    // lexical list has docs 100..102 at ranks 1..3; dense #1 is doc 7,
    // absent from the lexical list entirely
    val out = fuse(
      lex = Seq((0L, 100L, 1L), (0L, 101L, 2L), (0L, 102L, 3L)),
      den = Seq((0L, 7L, 1L), (0L, 100L, 4L)))
    // doc 100: lex 1 + dense 4 -> 16393 + 15625 = 32018 (dual-leg beats all)
    // doc 7:  dense-only rank 1 -> 16393; beats lexical-only rank 2 (16129)
    assert(out.head === ((0L, 100L, 1L, 4L, 32018L, 1L)), s"got ${out.head}")
    val d7 = out.find(_._2 == 7L).get
    val d101 = out.find(_._2 == 101L).get
    assert(d7._5 === 1000000L / 61 && d7._3 === 0L,
      s"dense-only score is exactly 1000000 div 61 with lex_rank 0: $d7")
    assert(d7._6 < d101._6,
      s"dense-only #1 ($d7) must outrank lexical rank-2 ($d101)")
  }

  test("a lexical-only #1 wins symmetrically") {
    val out = fuse(
      lex = Seq((0L, 100L, 1L)),
      den = Seq((0L, 7L, 2L), (0L, 8L, 3L)))
    // lexical-only rank 1 (16393) vs dense rank 2 (16129) and 3 (15873)
    assert(out.map(x => (x._2, x._6)).toSeq ===
      Seq((100L, 1L), (7L, 2L), (8L, 3L)), s"got ${out.toSeq}")
  }

  test("per-query fusion: each query fuses its OWN lexical and dense lists " +
      "— a doc ranked for query 0 never leaks into query 1's fusion; ties " +
      "break to the smaller doc_id") {
    val out = fuse(
      lex = Seq((0L, 100L, 1L), (1L, 200L, 1L)),
      den = Seq((0L, 7L, 1L), (1L, 9L, 1L)))
    val q0 = out.filter(_._1 == 0L).map(x => (x._2, x._5, x._6)).toSeq
    val q1 = out.filter(_._1 == 1L).map(x => (x._2, x._5, x._6)).toSeq
    // within a query all entries score 1000000 div 61 = 16393: tie ->
    // smaller doc_id first; query 0's lexical doc 100 must NOT appear
    // under query 1 (the round-12 broadcast form would have put it there)
    assert(q0 === Seq((7L, 16393L, 1L), (100L, 16393L, 2L)), s"q0 $q0")
    assert(q1 === Seq((9L, 16393L, 1L), (200L, 16393L, 2L)), s"q1 $q1")
  }

  test("a query present in only ONE leg still fuses (full-outer on query_id)") {
    val out = fuse(
      lex = Seq((2L, 100L, 1L)),
      den = Seq((0L, 7L, 1L)))
    assert(out.filter(_._1 == 2L).map(x => (x._2, x._3, x._4, x._5)).toSeq ===
      Seq((100L, 1L, 0L, 16393L)), s"lex-only query: ${out.toSeq}")
    assert(out.filter(_._1 == 0L).map(x => (x._2, x._3, x._4, x._5)).toSeq ===
      Seq((7L, 0L, 1L, 16393L)), s"dense-only query: ${out.toSeq}")
  }

  test("retrieval_rrf_eval counts hits on EXACTLY the served lists against " +
      "label ground truth, with MRR/nDCG from the fused ranks (by-hand " +
      "replay at sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val labels = Tables.embeddings(spark, d)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val lex = graft.operators.TextAnalysis.bm25PerQuery.run(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rnk")))
    // round 14: the served dense leg is the IVF index, not brute force
    val den = graft.operators.Similarity.knnIvfKmeansQuery.run(spark, d)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rnk")))
    val bf = graft.operators.Similarity.knnBruteForce.run(spark, d)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rnk")))
    val fusedRows = SparkEntry.queries("retrieval_rrf_hybrid")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    def hitsOf(list: Array[(Long, Long, Long)], q: Long): Long =
      list.count { case (qq, doc, _) => qq == q && labels(doc) == labels(q) }.toLong
    // the shared fixed-point milli-log2 and the 1000000-div gain, by hand
    def ml2(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      1000L * e + ((x - (1L << e)) * 1000L) / (1L << e)
    }
    def gain(pos: Long): Long = 1000000L / ml2(pos + 1)
    // a leg's (MRR@10, nDCG@10): relevant ranks clipped to the @10 window
    def rankMetrics(list: Array[(Long, Long, Long)], q: Long, nRel: Long)
        : (Long, Long) = {
      val relRanks = list.filter(x => x._1 == q && x._3 <= 10L &&
        labels(x._2) == labels(q)).map(_._3).sorted
      val mrr = relRanks.headOption.map(1000L / _).getOrElse(0L)
      val idcg = (1L to math.min(nRel, 10L)).map(gain).sum
      // nRel=0 (a query whose label is unique in the corpus) makes
      // idcg=0 here; the engine still emits 0 for that query (dcg is
      // coalesced to 0 with no relevant ranks) — mirror it, don't divide
      val ndcg = if (idcg == 0L) 0L else (1000L * relRanks.map(gain).sum) / idcg
      (mrr, ndcg)
    }
    val cols = Seq("n_rel", "lex_hits", "dense_hits", "dense_exact_hits",
      "rrf_hits", "lex_recall_milli", "dense_exact_recall_milli",
      "dense_vs_exact_delta_milli", "lex_mrr_milli", "lex_ndcg_milli",
      "dense_mrr_milli", "dense_ndcg_milli", "dense_exact_mrr_milli",
      "dense_exact_ndcg_milli", "rrf_mrr_milli", "rrf_ndcg_milli")
    val got = Retrieval.rrfEval.run(spark, d).collect()
      .map(r => r.getLong(0) ->
        cols.map(c => c -> r.getAs[Long](c)).toMap).toMap
    assert(got.keySet === (0L until 10L).toSet, "one row per query")
    for (q <- 0L until 10L) {
      val nRel = labels.count { case (v, l) => v != q && l == labels(q) }.toLong
      val g = got(q)
      assert(g("n_rel") === nRel, s"n_rel for query $q")
      assert(g("lex_hits") === hitsOf(lex, q), s"lex hits for query $q")
      assert(g("dense_hits") === hitsOf(den, q), s"served dense hits for query $q")
      assert(g("dense_exact_hits") === hitsOf(bf, q), s"exact dense hits for query $q")
      assert(g("rrf_hits") === hitsOf(fusedRows, q), s"rrf hits for query $q")
      assert(g("lex_recall_milli") === 1000L * g("lex_hits") / math.max(nRel, 1L),
        s"milli recall arithmetic for query $q")
      assert(g("dense_exact_recall_milli") ===
        1000L * g("dense_exact_hits") / math.max(nRel, 1L),
        s"exact milli recall for query $q")
      assert(g("dense_vs_exact_delta_milli") ===
        1000L * g("dense_hits") / math.max(nRel, 1L) -
          g("dense_exact_recall_milli"),
        s"served-vs-exact delta for query $q")
      // round 16: EVERY leg carries MRR@10/nDCG@10, hand-replayed on the
      // exact served list (lexical clipped to rank <= 10)
      for ((legName, list) <- Seq(("lex", lex), ("dense", den),
          ("dense_exact", bf), ("rrf", fusedRows))) {
        val (expMrr, expNdcg) = rankMetrics(list, q, nRel)
        assert(g(s"${legName}_mrr_milli") === expMrr,
          s"$legName MRR@10 for query $q")
        assert(g(s"${legName}_ndcg_milli") === expNdcg,
          s"$legName nDCG@10 for query $q")
      }
    }
    // the point of the per-leg columns: "hybrid beats (or at least matches)
    // the weaker leg" is now a checked number, not folklore. NOTE this is
    // an EMPIRICAL PIN of the current test corpus, not an RRF law — RRF
    // can rank a doc that sits mid-list in BOTH legs above each leg's
    // top relevant hit (two rank-2 scores beat one rank-1), pushing the
    // fused MRR below both legs on a query. The metric arithmetic itself
    // is verified exactly against the by-hand replay above; this pin is
    // over the MEAN so a single pathological query can't flip it. If a
    // corpus regeneration trips it, re-examine the legs and re-pin.
    def meanOf(c: String): Long = got.values.map(_(c)).sum / got.size
    assert(meanOf("rrf_mrr_milli") >= math.min(meanOf("lex_mrr_milli"),
      meanOf("dense_mrr_milli")),
      "fused mean MRR fell below both legs on the pinned corpus — " +
        "corpus/leg change, not metric arithmetic (that is replay-checked)")
  }

  test("registered query matches a by-hand replay of its two rank tables") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val lex = graft.operators.TextAnalysis.bm25PerQuery.run(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val den = graft.operators.Similarity.knnIvfKmeansQuery.run(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val queries = lex.keys.map(_._1).toSet ++ den.keys.map(_._1).toSet
    val expected = queries.flatMap { q =>
      val docs = lex.keys.filter(_._1 == q).map(_._2).toSet ++
        den.keys.filter(_._1 == q).map(_._2)
      docs.map { doc =>
        val s = lex.get((q, doc)).map(r => 1000000L / (60 + r)).getOrElse(0L) +
          den.get((q, doc)).map(r => 1000000L / (60 + r)).getOrElse(0L)
        (q, doc) -> s
      }
    }.toMap
    val fusedAll = SparkEntry.queries("retrieval_rrf_hybrid")(spark, d).collect()
    val got = fusedAll.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    for ((k, s) <- got) assert(s === expected(k), s"score mismatch at $k")
    // per query the fused list is the score-descending top-10 of the union
    for (q <- queries) {
      val top = expected.filter(_._1._1 == q).toSeq
        .sortBy { case ((_, doc), s) => (-s, doc) }.take(10).map(_._1._2)
      val gotQ = fusedAll.filter(_.getLong(0) == q)
        .sortBy(_.getLong(5)).map(_.getLong(1)).toSeq
      assert(gotQ === top, s"query $q fused order")
    }
  }
}
