package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Each Gopher rule exercised on the adversarial fixture that trips it
  * (the corpus only binds the stopword rule at test scale), plus `keep` =
  * the conjunction and value columns matching a by-hand model. */
class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("every rule fires on its adversarial fixture; keep is the conjunction") {
    import spark.implicits._
    val good = "the quick brown fox jumps over a lazy dog near the key value store"
    val docs = Seq(
      (1L, good),                                         // all rules pass
      (2L, "the a key"),                                  // 3 words → r_count fails
      (3L, ("the a " + Seq.fill(20)("xy").mkString(" "))), // mean wlen 2.xx → r_wlen fails
      (4L, ("the a " + Seq.fill(20)("123456").mkString(" "))), // digits → r_alpha fails
      (5L, "quick brown foxes jump over lazy dogs beside quiet rivers today") // 0 stopwords → r_stop fails
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRulesOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))).toMap
    assert(got(1L) === ((true, true, true, true, true)), s"good doc: ${got(1L)}")
    assert(got(2L)._1 === false && got(2L)._5 === false, "word-count rule")
    assert(got(3L)._2 === false && got(3L)._5 === false, "mean-word-length rule")
    assert(got(4L)._3 === false && got(4L)._5 === false, "alpha-fraction rule")
    assert(got(5L)._4 === false && got(5L)._5 === false, "stopword rule")
    // value columns against the model for the good doc
    val row = TextAnalysis.gopherRulesOn(docs).filter("doc_id = 1").collect()(0)
    val w = good.split(" ")
    assert(row.getLong(1) === w.length.toLong)
    assert(row.getLong(2) === 1000L * w.map(_.length).sum / w.length)
    assert(row.getLong(3) ===
      1000L * w.count(_.exists(_.isLetter)) / w.length)
    assert(row.getLong(4) ===
      w.count(Set("the", "a", "value", "key")).toLong)
  }

  test("row-local gate predicate == the rule table's keep column, on the " +
      "adversarial fixtures AND the whole corpus") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val fixtures = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the key value store"),
      (2L, "the a key"),
      (3L, ("the a " + Seq.fill(20)("xy").mkString(" "))),
      (4L, ("the a " + Seq.fill(20)("123456").mkString(" "))),
      (5L, "quick brown foxes jump over lazy dogs beside quiet rivers today")
    ).toDF("doc_id", "text")
    for (docs <- Seq(fixtures, Tables.documents(spark, "/root/testdata/sf0.001"))) {
      val table = TextAnalysis.gopherRulesOn(docs)
        .collect().map(r => r.getLong(0) -> r.getBoolean(9)).toMap
      val gate = docs.select(col("doc_id"),
          TextAnalysis.gopherKeepCol(col("text")).as("k"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(gate === table, "gate predicate must equal the table's keep")
    }
  }
}
