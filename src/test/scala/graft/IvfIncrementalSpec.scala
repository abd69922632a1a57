package graft

import org.scalatest.funsuite.AnyFunSuite

/** `knn_ivf_incremental`: under a FROZEN coarse quantizer, incremental
  * add is exact — the merged (persisted store ∪ batch assignments) index
  * must serve row-for-row identically to the full one-shot rebuild
  * (`knn_cosine_ivf_kmeans` over the same corpus and codebook), and the
  * second run must reuse the persisted list store. */
class IvfIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String) = SparkEntry.queries(name)(spark, dir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("merged store+batch index serves identically to the full rebuild") {
    val inc = rows("knn_ivf_incremental")
    val full = rows("knn_cosine_ivf_kmeans")
    assert(inc === full, "incremental add under a frozen quantizer must be exact")
    val again = rows("knn_ivf_incremental")
    assert(again === inc, "second run serves from the persisted list store")
  }

  test("IVF-PQ incremental add: merged code store+batch serves identically " +
      "to the full re-encode (frozen coarse quantizer AND residual codebook)") {
    val inc = rows("knn_ivf_pq_incremental")
    val full = rows("knn_cosine_ivf_pq")
    assert(inc === full,
      "per-vector encoding under frozen codebooks makes incremental add exact")
    val again = rows("knn_ivf_pq_incremental")
    assert(again === inc, "second run serves from the persisted code store")
  }
}
