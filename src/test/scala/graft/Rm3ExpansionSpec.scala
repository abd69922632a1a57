package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, TextAnalysis}

/** Semantics of `retrieval_rm3_expansion` beyond the end-to-end DuckDB
  * oracle: (1) the expansion-term SELECTION replayed by hand with exact
  * integer arithmetic (tf/df are integers; the offer weight is
  * milli-rounded before any ordering, so the replay is bit-exact); (2)
  * ranking-shape invariants; (3) the operator's point — expansion
  * actually changes what pass 1 retrieved (corpus-pinned empirical). */
class Rm3ExpansionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def tokens(text: String): Array[String] = text.split(" ")

  test("expansion-term selection matches the by-hand offer-weight replay") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // corpus statistics from first principles
    val tf = docs.view.mapValues(t => tokens(t).groupBy(identity)
      .view.mapValues(_.length).toMap).toMap
    val dfm = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size).toMap
    val nDocs = docs.size.toLong
    // original query terms: top-3 len>=4 by (df DESC, tk ASC) per query doc
    def qtermsOf(q: Long): Seq[String] =
      tf(q).keys.filter(_.length >= 4).toSeq
        .sortBy(tk => (-dfm(tk).toLong, tk)).take(3)
    // feedback = the oracled pass-1 ranking's top-10
    val fb = TextAnalysis.bm25PerQuery.run(spark, d)
      .filter(col("rnk") <= 10).select(col("query_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def idf(df: Long): Double =
      math.log(((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    val expected = fb.keys.toSeq.sorted.flatMap { q =>
      val orig = qtermsOf(q).toSet
      val cand = fb(q).toSeq.flatMap(doc => tf(doc).toSeq)
        .filter { case (tk, _) => tk.length >= 4 && !orig(tk) }
        .groupBy(_._1).view.mapValues(_.map(_._2.toLong).sum).toMap
      cand.toSeq
        .map { case (tk, tff) =>
          (tk, math.round(1000.0 * tff.toDouble * idf(dfm(tk).toLong))) }
        .sortBy { case (tk, ow) => (-ow, tk) }.take(3)
        .map { case (tk, _) => (q, tk) }
    }
    val got = Retrieval.rm3ExpansionTerms(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      .sortBy(x => (x._1, x._2))
    assert(got === expected.sortBy(x => (x._1, x._2)),
      s"expansion terms diverge from the offer-weight replay: $got")
  }

  test("ranking shape: contiguous ranks, milli-DESC/doc-ASC order, no self") {
    val rows = Retrieval.rm3ExpansionRanks(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet === (0L until 10L).toSet)
    for ((q, rs) <- byQ) {
      assert(rs.map(_._4).sorted.toSeq === (1L to rs.length).toSeq,
        s"contiguous ranks for query $q")
      assert(rs.length <= 10)
      val inRankOrder = rs.sortBy(_._4).toSeq
      assert(inRankOrder === inRankOrder.sortBy(x => (-x._3, x._2)),
        s"milli DESC then doc ASC for query $q")
      assert(!rs.exists(_._2 == q), s"query doc $q excluded from its ranking")
    }
  }

  test("expansion has teeth on the pinned corpus: some query's top-10 " +
      "contains a doc pass 1 did not retrieve (EMPIRICAL PIN — a corpus " +
      "regeneration may move which queries, not the arithmetic)") {
    import org.apache.spark.sql.functions.col
    val p1 = TextAnalysis.bm25PerQuery.run(spark, d).filter(col("rnk") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rm3 = Retrieval.rm3ExpansionRanks(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(rm3.exists { case (q, ds) => (ds -- p1.getOrElse(q, Set.empty)).nonEmpty },
      "no query surfaced a new doc — expansion had no effect anywhere")
  }
}
