package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Semantics of the two round-10 retrieval/dedup additions, on adversarial
  * fixtures the synthetic corpus can't guarantee (the oracle pins them at
  * value level on the real corpus; these pin the RULES).
  *
  *  - `dedup_span_ngram`: a shared verbatim window between two otherwise
  *    different documents is flagged on BOTH; a window repeated within one
  *    document counts too; sub-window documents report zeros.
  *  - `knn_cosine_filtered`: every returned neighbor carries the query's
  *    label (pre-filter semantics — a post-filtered top-k would surface
  *    off-label rows or truncate silently), and a label with fewer than k
  *    candidates returns exactly those, ranked.
  */
class SpanFilteredSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("span dedup: shared and self-repeated windows flagged, short docs zero") {
    import spark.implicits._
    val W = Dedup.SpanWindow
    val shared = (1 to W).map(i => s"s$i").mkString(" ") // exactly one window
    val a = shared + " " + (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (1 to 30).map(i => s"b$i").mkString(" ") + " " + shared
    val selfRep = ((1 to W).map(i => s"r$i") ++ (1 to W).map(i => s"r$i"))
      .mkString(" ") // window 1 == window W+1
    val short = "too short"
    val docs = Seq((0L, a), (1L, b), (2L, selfRep), (3L, short))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-span")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("dedup_span_ngram")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 0: 31 windows (50 tokens), only the leading `shared` window dups
    assert(got(0L)._1 === 31 && got(0L)._2 === 1, s"doc0 ${got(0L)}")
    // doc 1: shared window sits at the END (position 31)
    assert(got(1L)._1 === 31 && got(1L)._2 === 1, s"doc1 ${got(1L)}")
    // doc 2: 2W tokens → W+1 windows; window 1 and window W+1 are equal —
    // both occurrences count as duplicated
    assert(got(2L)._1 === (W + 1).toLong, s"doc2 ${got(2L)}")
    assert(got(2L)._2 >= 2, "both copies of the self-repeated window count")
    // doc 3: under W tokens → zero spans, zero dups (still present)
    assert(got(3L) === ((0L, 0L)))
  }

  test("incremental span dedup: history and batch provenances flagged separately") {
    import spark.implicits._
    val W = Dedup.SpanWindow
    val histSpan = (1 to W).map(i => s"h$i").mkString(" ")
    val batchSpan = (1 to W).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      // history (doc_id % 10 < 8): carries histSpan into the store
      (0L, histSpan + " " + (1 to 10).map(i => s"p$i").mkString(" ")),
      // batch doc sharing the HISTORY span only
      (8L, histSpan),
      // two batch docs sharing a batch-only span
      (18L, batchSpan),
      (28L, batchSpan + " tail1 tail2"),
      // batch doc with no duplication at all
      (38L, (1 to W + 5).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("srcX"))
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-span-inc")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("dedup_span_incremental")(spark, tmp.toString)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // doc 8: its single span is in the history store, not batch-repeated
    assert(got(8L) === ((1L, 1L, 1L, 0L)), s"doc8 ${got(8L)}")
    // docs 18/28: share batchSpan — batch-dup, absent from history
    assert(got(18L) === ((1L, 1L, 0L, 1L)), s"doc18 ${got(18L)}")
    assert(got(28L)._4 >= 1L && got(28L)._3 === 0L, s"doc28 ${got(28L)}")
    // doc 38: unique content → zero dups of either provenance
    assert(got(38L) === ((6L, 0L, 0L, 0L)), s"doc38 ${got(38L)}")
    // history docs never appear in the output (batch-only audit)
    assert(!got.contains(0L))
  }

  test("filtered knn: neighbors always share the query's label; small labels rank all") {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("knn_cosine_filtered")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(labels(n) === labels(q),
        s"neighbor $n (label ${labels(n)}) returned for query $q (label ${labels(q)})")
      assert(q !== n, "query must not be its own neighbor")
    }
    // per query: ranks are 1..m with m = min(5, |label cohort| - 1)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val cohort = labels.count(_._2 == labels(q)) - 1
      val expected = math.min(5, cohort)
      assert(rs.map(_.getLong(2)).sorted.toSeq === (1 to expected).map(_.toLong),
        s"query $q: expected ranks 1..$expected")
    }
  }

  test("span strip: keeps the canonical occurrence, conserves tokens, idempotent") {
    import spark.implicits._
    val W = Dedup.SpanWindow
    val para = (1 to W).map(i => s"s$i").mkString(" ")   // exactly one window
    val paraB = (1 to W).map(i => s"b$i").mkString(" ")
    val novel = (1 to 15).map(i => s"n$i").mkString(" ") // sub-window, untouched
    val docs = Seq(
      (0L, para),                                   // canonical owner of para
      (1L, para + " x1 x2 x3 x4 x5"),               // re-uses para, then novel tail
      (2L, paraB + " " + paraB),                    // self-repeated paragraph
      (3L, novel)                                   // no duplication at all
    ).toDF("doc_id", "text")
    def runStrip(df: org.apache.spark.sql.DataFrame) =
      Dedup.stripSpans(spark, df)
    val out = runStrip(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 0 is the canonical occurrence — byte-identical
    assert(out(0L) === ((W.toLong, 0L, para)))
    // doc 1: its para window is non-canonical → its W tokens stripped,
    // the novel tail survives in order
    assert(out(1L) === (((W + 5).toLong, W.toLong, "x1 x2 x3 x4 x5")))
    // doc 2: second copy of paraB stripped, first copy kept (canonical is
    // within the same document)
    assert(out(2L) === (((2 * W).toLong, W.toLong, paraB)))
    // doc 3: no duplicated window → untouched
    assert(out(3L) === ((15L, 0L, novel)))
    // conservation: n_tokens = n_removed + tokens(clean_text) for every doc
    out.foreach { case (id, (n, rem, clean)) =>
      val keptTokens = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(n === rem + keptTokens, s"doc $id: $n != $rem + $keptTokens")
    }
    // idempotence: stripping the stripped corpus removes nothing further
    val cleaned = runStrip(docs)
      .select(col("doc_id"), col("clean_text").as("text"))
      .filter(length(col("text")) > 0)
    val second = runStrip(cleaned).collect()
    assert(second.nonEmpty)
    second.foreach { r =>
      assert(r.getLong(2) === 0L, s"second pass removed tokens from doc ${r.getLong(0)}")
    }
  }
}
