package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Chunk-grain semantic dedup (`dedup_chunk_semantic`): exact copies
  * collapse on the md5 signature (n_copies), a word-order PARAPHRASE of a
  * boilerplate chunk — different md5, identical token bag — dedups in
  * embedding space (cosine 1.0 ≥ 0.99), and genuinely different chunks
  * survive. */
class ChunkSemanticSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("paraphrased boilerplate dedups; exact copies fold into n_copies") {
    import spark.implicits._
    val boiler = (1 to 20).map(i => s"w$i").mkString(" ")
    val para = (1 to 20).map(i => s"w$i").reverse.mkString(" ")
    val novel = (1 to 20).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, boiler), (2L, boiler), (3L, para), (4L, novel))
      .map { case (id, t) => (id, t, "xx", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunksem-batch")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    // (vec_id, chunk_hash, cid, dup_of, kept, n_copies)
    val rows = Similarity.chunkSemantic.run(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length === 3,
      s"distinct-signature grid: boiler/para/novel → 3 rows: ${rows.toSeq}")
    val hashes = docs.select(org.apache.spark.sql.functions.md5(
      org.apache.spark.sql.functions.col("text"))).as[String].collect()
    val byHash = rows.map(t => t._2 -> t).toMap
    val (hBoiler, hPara, hNovel) = (hashes(0), hashes(2), hashes(3))
    assert(byHash(hBoiler)._5 === 2L, "exact copies fold into n_copies")
    // exactly one of {boiler, para} keeps (smaller vec_id); the other is
    // its semantic dup — the paraphrase dedup the RAG index needs
    val pair = Seq(byHash(hBoiler), byHash(hPara))
    val kept = pair.filter(_._4 == 1L)
    val dropped = pair.filter(_._4 == 0L)
    assert(kept.length === 1 && dropped.length === 1,
      s"one of the paraphrase pair dedups: $pair")
    assert(dropped.head._3 === kept.head._1,
      "dup_of points at the kept paraphrase's vec_id")
    assert(kept.head._1 < dropped.head._1, "smaller vec_id is the keeper")
    assert(byHash(hNovel)._4 === 1L && byHash(hNovel)._3 === -1L,
      "novel chunk survives with no dup_of")
  }
}
