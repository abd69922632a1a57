package graft

import org.scalatest.funsuite.AnyFunSuite

/** `drift_embedding_psi` semantics: bin counts cover the corpus split
  * exactly, every contribution row recomputes from its own counts via the
  * shared fixed-point arithmetic, and the reported total is the sum over
  * all bins. */
class EmbeddingDriftSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def ml2(x: Long): Long = {
    val e = java.lang.Long.toBinaryString(x).length - 1
    val p = 1L << e
    1000L * e + ((x - p) * 1000L) / p
  }

  test("counts cover the 80/20 split; contribs and total recompute exactly") {
    val rows = SparkEntry.queries("drift_embedding_psi")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty && rows.length <= 16, s"${rows.length} bins")
    val nVec = Tables.embeddings(spark, dir).count()
    val nHist = Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 10 < 8).count()
    assert(rows.map(_._2).sum === nHist, "history counts cover the 80% slice")
    assert(rows.map(_._3).sum === nVec - nHist, "batch counts cover the 20%")
    val th = rows.map(_._2).sum; val tb = rows.map(_._3).sum
    val v = rows.length.toLong
    for ((term, ch, cb, p, q, contrib, total) <- rows) {
      assert(p === 1000L * (ch + 1) / (th + v), s"$term p")
      assert(q === 1000L * (cb + 1) / (tb + v), s"$term q")
      val lr = (ml2(ch + 1) - ml2(th + v)) - (ml2(cb + 1) - ml2(tb + v))
      assert(contrib === (p - q) * lr, s"$term contrib")
      assert(total === rows.map(_._6).sum, s"$term total is the corpus sum")
    }
    // the vec_id%10 tail slice has a genuinely different label mix than
    // the 80% head (measured: e.g. one label carries ~28% of the batch vs
    // ~8% of history at sf0.01) — the alarm MUST fire: PSI is positive
    // and a real distribution shift lands above the 0.1 alarm line
    assert(rows.head._7 > 100000L,
      s"label-mix shift must raise PSI past the 0.1 alarm, got ${rows.head._7} micro")
  }
}
