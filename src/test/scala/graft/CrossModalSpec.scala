package graft

import org.scalatest.funsuite.AnyFunSuite

/** `dedup_crossmodal_audit` on planted pairs: a consistent duplicate pair
  * (same caption, same rendered image) must report as dup on BOTH sides
  * with one variant each; caption spam (same caption, different images)
  * must surface img_variants > 1; token-permuted captions must land in ONE
  * text group (the normalized fingerprint's job) spanning their distinct
  * images; clean docs must not appear. Fixture geometry: image dims derive
  * from doc_id mod 9 / mod 7, so ids congruent mod 63 render the same
  * text to the SAME image, others to different ones. */
class CrossModalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("consistent pairs, caption spam, and permuted captions all classify") {
    import spark.implicits._
    val tA = "alpha beta gamma delta epsilon"
    val tB = "one two three four five six"
    val docs = Seq(
      (0L, tA),   // same text, same dims as 63 → consistent dup pair
      (63L, tA),
      (1L, tB),   // same text, different dims → caption spam
      (2L, tB),
      (3L, "zeta eta theta"),  // token permutations: one normalized text
      (4L, "theta zeta eta"),  //   group, two distinct images
      (5L, "unique content entirely"))
      .map { case (id, t) => (id, t, "xx", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-xmodal")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("dedup_crossmodal_audit")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // (n_text_dup, img_variants, n_image_dup, text_variants)
    assert(got(0L) === ((2L, 1L, 2L, 1L)), s"consistent pair: ${got.get(0L)}")
    assert(got(63L) === got(0L))
    assert(got(1L) === ((2L, 2L, 1L, 1L)), s"caption spam: ${got.get(1L)}")
    assert(got(2L) === got(1L))
    assert(got(3L)._1 === 2L && got(3L)._2 === 2L,
      s"permuted captions must share one normalized text group: ${got.get(3L)}")
    assert(!got.contains(5L), s"clean doc flagged: $got")
  }
}
