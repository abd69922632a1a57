package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** `text_char_entropy` against a from-first-principles fixed-point model:
  * the milli-log2 entropy of hand-picked distributions (uniform, single
  * char, skewed), the gibberish-vs-text separation the signal exists for,
  * and the empty-doc zero row. */
class CharEntropySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def ml2(x: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    1000L * e + ((x - (1L << e)) * 1000L) / (1L << e)
  }
  private def entropyMilli(text: String): Long = {
    val counts = text.groupBy(identity).view.mapValues(_.length.toLong)
    val n = text.length.toLong
    counts.values.map(c => c * (ml2(n) - ml2(c))).sum / n
  }

  test("matches the fixed-point model; gibberish scores low, text higher") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd"),            // uniform over 4 chars → exactly 2000 milli
      (2L, "aaaaaaaa"),        // single char → 0
      (3L, "aaaaaaab"),        // heavy skew → low
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "")                 // empty → 0 row via the left join
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropyOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === ((4L, 4L, 2000L)), s"uniform: ${got(1L)}")
    assert(got(2L) === ((8L, 1L, 0L)), s"degenerate: ${got(2L)}")
    for (id <- Seq(3L, 4L)) {
      val text = Seq("aaaaaaab",
        "the quick brown fox jumps over the lazy dog")(id.toInt - 3)
      assert(got(id)._3 === entropyMilli(text), s"model for doc $id")
    }
    assert(got(3L)._3 < 700L, s"skewed is low: ${got(3L)}")
    assert(got(4L)._3 > 3000L, s"natural text is high: ${got(4L)}")
    assert(got(5L) === ((0L, 0L, 0L)), s"empty doc zero row: ${got(5L)}")
  }

  test("row-local gate form == explode+aggregate audit form, value-exact, " +
      "on the fixtures AND the whole corpus (raw and cleaned text)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val fixtures = Seq((1L, "abcd"), (2L, "aaaaaaaa"), (3L, "aaaaaaab"),
      (4L, "the quick brown fox jumps over the lazy dog"), (5L, ""))
      .toDF("doc_id", "text")
    for (docs <- Seq(
        fixtures,
        Tables.documents(spark, "/root/testdata/sf0.001"),
        graft.operators.TrainingData
          .cleanedOn(Tables.documents(spark, "/root/testdata/sf0.001"))
          .select(col("doc_id"), col("cleaned").as("text")))) {
      val audit = TextAnalysis.charEntropyOn(docs)
        .select("doc_id", "char_entropy_milli")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gate = docs.select(col("doc_id"),
          TextAnalysis.charEntropyMilliCol(col("text")).as("e"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gate === audit, "the two forms must agree on every doc")
    }
  }
}
