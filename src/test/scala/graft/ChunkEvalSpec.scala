package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** `retrieval_chunk_eval` against a by-hand integer replay of both served
  * lists' metrics — the RrfHybridSpec discipline at two legs: the engine's
  * hits/MRR@10/nDCG@10 per grain must equal what the lists + label table
  * imply, and the delta column is exactly the MRR difference. */
class ChunkEvalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("metrics equal the by-hand replay of both fused lists") {
    import org.apache.spark.sql.functions.col
    val labels = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def listOf(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long)] =
      df.select(col("query_id"), col("doc_id"), col("rnk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ch = listOf(Retrieval.chunkHybrid.run(spark, d))
    val doc = listOf(Retrieval.rrfHybrid.run(spark, d)
      .select(col("query_id"), col("doc_id"), col("rnk")))
    def ml2(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      1000L * e + ((x - (1L << e)) * 1000L) / (1L << e)
    }
    def gain(pos: Long): Long = 1000000L / ml2(pos + 1)
    def metrics(list: Array[(Long, Long, Long)], q: Long, nRel: Long)
        : (Long, Long, Long) = {
      val rel = list.filter(x => x._1 == q && labels(x._2) == labels(q))
        .map(_._3).sorted
      val mrr = rel.headOption.map(1000L / _).getOrElse(0L)
      val idcg = (1L to math.min(nRel, 10L)).map(gain).sum
      val ndcg = if (idcg == 0L) 0L else (1000L * rel.map(gain).sum) / idcg
      (rel.length.toLong, mrr, ndcg)
    }
    val got = Retrieval.chunkEval.run(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === (0L until 10L).toSet)
    for (q <- 0L until 10L) {
      val nRel = labels.count { case (v, l) => v != q && l == labels(q) }.toLong
      val (chHits, chMrr, chNdcg) = metrics(ch, q, nRel)
      val (doHits, doMrr, doNdcg) = metrics(doc, q, nRel)
      val r = got(q)
      assert(r.getAs[Long]("n_rel") === nRel)
      assert(r.getAs[Long]("chunk_hits") === chHits, s"chunk hits q$q")
      assert(r.getAs[Long]("doc_hits") === doHits, s"doc hits q$q")
      assert(r.getAs[Long]("chunk_mrr_milli") === chMrr, s"chunk mrr q$q")
      assert(r.getAs[Long]("doc_mrr_milli") === doMrr, s"doc mrr q$q")
      assert(r.getAs[Long]("chunk_ndcg_milli") === chNdcg, s"chunk ndcg q$q")
      assert(r.getAs[Long]("doc_ndcg_milli") === doNdcg, s"doc ndcg q$q")
      assert(r.getAs[Long]("chunk_vs_doc_mrr_delta_milli") === chMrr - doMrr)
      assert(r.getAs[Long]("chunk_recall_milli") ===
        1000L * chHits / math.max(nRel, 1L))
      assert(r.getAs[Long]("doc_recall_milli") ===
        1000L * doHits / math.max(nRel, 1L))
    }
  }
}
