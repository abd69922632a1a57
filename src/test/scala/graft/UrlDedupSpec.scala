package graft

import org.scalatest.funsuite.AnyFunSuite

/** `dedup_url_canonical`: all four URL variant shapes of one page must
  * collapse to a single canonical form with the min-id keeper; distinct
  * pages must not merge. Variant shape is doc_id mod 4 and page id
  * doc_id mod 50, so ids {0, 50, 2} hit page ids {0, 0, 2} under variants
  * {plain, scheme+www+slash... } etc. */
class UrlDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("scheme, www, trailing slash, query, and host case all canonicalize away") {
    import spark.implicits._
    // page 0 via ids 0 (v0 plain), 50 (v2 utm query), 100 (v0), 150 (v2);
    // page 1 via ids 1 (v1 www+slash), 51 (v3 uppercase host+fragment);
    // page 7 via id 7 (v3) alone
    val ids = Seq(0L, 50L, 100L, 150L, 1L, 51L, 7L)
    val docs = ids.map(id => (id, s"text $id", "xx", "srcX", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-urldedup")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val rows = SparkEntry.queries("dedup_url_canonical")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.size === ids.size, "audit row per doc, nothing dropped")
    for (id <- Seq(0L, 50L, 100L, 150L))
      assert(rows(id) === (("example.org/page/0", 0L, 4L, if (id == 0L) 1L else 0L)),
        s"page-0 variant $id: ${rows(id)}")
    for (id <- Seq(1L, 51L))
      assert(rows(id) === (("example.org/page/1", 1L, 2L, if (id == 1L) 1L else 0L)),
        s"page-1 variant $id: ${rows(id)}")
    assert(rows(7L) === (("example.org/page/7", 7L, 1L, 1L)), s"singleton: ${rows(7L)}")
  }
}
