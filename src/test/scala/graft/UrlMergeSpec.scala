package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** URL-keyed MERGE (`dedup_url_merge`): the re-crawl content-change case —
  * a changed page's batch row REPLACES the stale store row (same canonical
  * key, new doc_id + fingerprint), an identical re-fetch reads back as
  * `unchanged`, a first crawl as `new`, a page the batch never touched as
  * `history`. sf0.01 gives every page ≥ 2 crawl ranks, so the fixture's
  * four page classes (pm = doc_id % 5) each materialize. */
class UrlMergeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val result = Dedup.urlMerge.run(spark, dir)
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getString(4)))

  test("every canonical page lands exactly once with its class's status") {
    val byStatus = result.groupBy(_._4).view.mapValues(_.length).toMap
    assert(result.map(_._1).distinct.length === result.length,
      "post-merge store must hold one row per canonical key")
    // pm = page % 5: 0 → history, 1 → unchanged, {2,3} → changed, 4 → new
    assert(byStatus === Map(
      "history" -> 10, "unchanged" -> 10, "changed" -> 20, "new" -> 10))
    result.foreach { case (canonical, docId, _, status) =>
      val page = canonical.stripPrefix("example.org/page/").toLong
      val expected = (page % 5) match {
        case 0 => "history"
        case 1 => "unchanged"
        case 4 => "new"
        case _ => "changed"
      }
      assert(status === expected, s"page $page ($canonical, doc $docId)")
    }
  }

  test("a changed page's stale row is REPLACED: the merged store carries the " +
      "batch's newer doc and fingerprint, not the stored crawl's") {
    import spark.implicits._
    // ground truth straight off the corpus: latest doc per page
    val latest = Tables.documents(spark, dir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(50)).as("page"),
        md5(col("text")).as("fp"))
      .groupBy("page").agg(max(struct(col("doc_id"), col("fp"))).as("m"))
      .select(col("page"), col("m.doc_id").as("doc_id"), col("m.fp").as("fp"))
      .as[(Long, Long, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val changed = result.filter(_._4 == "changed")
    assert(changed.nonEmpty)
    changed.foreach { case (canonical, docId, fp, _) =>
      val page = canonical.stripPrefix("example.org/page/").toLong
      val (wantId, wantFp) = latest(page)
      assert(docId === wantId && fp === wantFp,
        s"page $page must serve the batch's crawl after the merge")
    }
  }

  test("re-running the merge is a fixpoint (crash-replay posture)") {
    val again = Dedup.urlMerge.run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getString(4)))
    assert(again.sortBy(_._1).toSeq === result.sortBy(_._1).toSeq)
  }
}
