package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The two round-18 data-card queries over the real corpus:
  * `contamination_span` (eval-set extent decontamination — the
  * spanLongestIncrementalOn kernel on the %97 contamination split) and
  * `dedup_cluster_report` (the keep-one-per-component attrition card over
  * the cluster artifact). The kernels are pinned elsewhere
  * (SpanLongestSpec, DedupClustersSpec); these specs pin the PRODUCTS:
  * split membership, sentinel coherence, and exact consistency with the
  * tables they summarize. */
class DedupCardSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("contamination_span: one row per eval doc (doc_id % 97 = 0), " +
      "sentinels coherent, and any reported run is a real pair extent in " +
      "the one-shot pair table") {
    val rows = Dedup.contaminationSpan.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val evalIds = Tables.documents(spark, d)
      .filter(col("doc_id") % 97 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet === evalIds, "exactly the eval split")
    rows.foreach { case (id, run, top, np) =>
      if (run === 0L) assert(top === -1L && np === 0L, s"clean sentinels for $id")
      else {
        assert(run >= Dedup.SpanWindow.toLong, s"extent below window grain: $run")
        assert(top % 97 !== 0L, s"partner $top must come from the train split")
        assert(np >= 1L)
      }
    }
    // cross-check against the one-shot pair table: a reported
    // (eval, top_train_doc, extent) must appear there with the same extent
    // (the cap never binds on this corpus, so the two agree exactly)
    val leaked = rows.filter(_._2 > 0L)
    assert(leaked.nonEmpty, "the synthetic corpus plants cross-split spans")
    val oneShot = Dedup.spanLongest.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    leaked.foreach { case (id, run, top, _) =>
      val key = if (id < top) (id, top) else (top, id)
      assert(oneShot.get(key).contains(run),
        s"($id, $top, $run) must match the one-shot pair table: ${oneShot.get(key)}")
    }
  }

  test("dedup_cluster_report: buckets partition the corpus, counts and " +
      "token sums reconcile exactly with the cluster table, singletons " +
      "remove nothing, and every bucket keeps one doc per cluster") {
    val report = Dedup.clusterReport.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val clusters = Dedup.clusters.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nt = Tables.documents(spark, d)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent local reconstruction of the card
    def bucketOf(sz: Long) = if (sz == 1) 0L else if (sz == 2) 1L else if (sz <= 4) 2L else 3L
    val byBucket = clusters.groupBy { case (_, _, sz) => bucketOf(sz) }
    val want = byBucket.map { case (b, ms) =>
      b -> ((ms.map(_._2).distinct.size.toLong, ms.size.toLong,
        ms.map(m => nt(m._1)).sum,
        ms.count(m => m._3 > 1 && m._1 != m._2).toLong,
        ms.filter(m => m._3 > 1 && m._1 != m._2).map(m => nt(m._1)).sum))
    }
    assert(report.map(_._1).toSet === want.keySet, "bucket coverage")
    report.foreach { case (b, name, nc, ndocs, ntok, rd, rt) =>
      assert(want(b) === ((nc, ndocs, ntok, rd, rt)), s"bucket $name reconciles")
      if (b == 0L) assert(rd === 0L && rt === 0L, "singletons remove nothing")
      else assert(ndocs - rd === nc, s"bucket $name keeps one doc per cluster")
    }
    assert(report.map(_._4).sum === clusters.length.toLong,
      "buckets partition every document")
  }
}
