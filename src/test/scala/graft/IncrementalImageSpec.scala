package graft

import org.scalatest.funsuite.AnyFunSuite

/** `dedup_incremental_image` drop paths on planted copies. Image dims
  * derive from doc_id mod 9 / mod 7, so ids congruent mod 63 render the
  * same text to the SAME image. Fixture: history doc 0 and batch docs 378
  * and 1008 (all ≡ 0 mod 63, 378 % 10 = 8, 1008 % 10 = 8) share one text:
  * 378 must drop against the persisted history store, 1008 against both
  * history and its earlier-id batch twin; an unrelated batch doc must
  * survive. */
class IncrementalImageSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("history store match and earlier-batch match both drop; clean doc survives") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (0L, shared),                      // history (0 % 10 = 0)
      (1L, "history only filler text"),  // history
      (378L, shared),                    // batch, same image as doc 0
      (1008L, shared),                   // batch, same image as 0 AND 378
      (9L, "a completely different document"))
      .map { case (id, t) => (id, t, "xx", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-incimg")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val kept = SparkEntry.queries("dedup_incremental_image")(spark, tmp.toString)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(9L), s"kept $kept")
    // second run hits the persisted store instead of rebuilding: same result
    val again = SparkEntry.queries("dedup_incremental_image")(spark, tmp.toString)
      .collect().map(_.getLong(0)).toSet
    assert(again === kept)
  }
}
