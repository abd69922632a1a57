package graft

import org.scalatest.funsuite.AnyFunSuite

/** `pack_sequences_greedy` semantics on a hand-packed fixture: documents
  * never cross a bin boundary, a doc opens a new bin exactly when it would
  * overflow, oversize docs truncate to the budget, and the per-shard state
  * machine resets cleanly between sources. */
class PackGreedySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("hand-packed assignment, truncation, and per-source reset") {
    import spark.implicits._
    def doc(id: Long, source: String, nTokens: Int) =
      (id, (1 to nTokens).map(i => s"w$i").mkString(" "), "xx", source, nTokens.toLong)
    // srcA lengths 300, 300, 200, 600 (oversize), 100 → bins (1),(2: 300+200),(3: 512 trunc),(4)
    // srcB lengths 512, 1 → bins (1: exactly full),(2)
    val docs = Seq(
      doc(0, "srcA", 300), doc(1, "srcA", 300), doc(2, "srcA", 200),
      doc(3, "srcA", 600), doc(4, "srcA", 100),
      doc(5, "srcB", 512), doc(6, "srcB", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-packg")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("pack_sequences_greedy")(spark, tmp.toString)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // (n_tokens, eff_tokens, bin_id, bin_offset, bin_fill, bin_padding)
    assert(got(0L) === ((300L, 300L, 1L, 0L, 300L, 212L)), s"doc0 ${got(0L)}")
    assert(got(1L) === ((300L, 300L, 2L, 0L, 500L, 12L)), s"doc1 ${got(1L)}")
    assert(got(2L) === ((200L, 200L, 2L, 300L, 500L, 12L)), s"doc2 ${got(2L)}")
    assert(got(3L) === ((600L, 512L, 3L, 0L, 512L, 0L)),
      s"oversize doc truncates to the budget and packs alone: ${got(3L)}")
    assert(got(4L) === ((100L, 100L, 4L, 0L, 100L, 412L)), s"doc4 ${got(4L)}")
    assert(got(5L) === ((512L, 512L, 1L, 0L, 512L, 0L)),
      s"srcB restarts at bin 1 — state must reset between sources: ${got(5L)}")
    assert(got(6L) === ((1L, 1L, 2L, 0L, 1L, 511L)), s"doc6 ${got(6L)}")
    // global invariant: nothing crosses a boundary
    for ((id, v) <- got)
      assert(v._4 + v._2 <= 512L, s"doc $id crosses its bin: $v")
  }
}
