package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.ParquetSink

/** Incremental cross-snapshot NEAR-dup dedup (`dedupIncrementalJaccardOn`):
  * the keep rule (no history near-dup, no earlier in-batch near-dup), the
  * causal boilerplate cap, a differential check of the registered split query
  * against an independent in-memory model, and the scale property — the
  * persisted shingle store is joined IN PLACE (bucketed scan, no exchange on
  * the store side); only the day's shingles ever shuffle. */
class IncrementalJaccardSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Word-3-gram shingle set, mirroring Dedup.shingles. */
  private def shingleSet(text: String): Set[String] = {
    val w = text.split(" ")
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  private def jac(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  test("keep rule: history near-dups drop, in-batch near-dups drop, novel and short docs survive") {
    import spark.implicits._
    val hist = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 zz"), // J=9/11 vs doc 1 → dropped
      (11L, "u1 u2 u3 u4 u5"),                        // novel → kept (3 shingles)
      (12L, "u1 u2 u3 u4 zz"),                        // J=2/4 vs 11 → dropped (11 first)
      (13L, "v1 v2")                                  // too short to shingle → kept, 0
    ).toDF("doc_id", "text")
    val (postings, stop) = Dedup.shingleStoreSnapshot(hist)
    val p = ParquetSink.writeBucketed(postings, "inc_jac_rule_post", "sid", 4)
    val s = ParquetSink.writeBucketed(stop, "inc_jac_rule_stop", "sid", 4)
    val out = Dedup.dedupIncrementalJaccardOn(batch, p, s)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq(11L -> 3L, 13L -> 0L))
  }

  test("boilerplate cap is causal: history-frequent shingles match nothing") {
    import spark.implicits._
    // three identical boilerplate docs → both shingles have history df 3 > 2
    val hist = Seq(
      (1L, "b1 b2 b3 b4"), (2L, "b1 b2 b3 b4"), (3L, "b1 b2 b3 b4"),
      (4L, "c1 c2 c3 c4")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "b1 b2 b3 b4"), // verbatim boilerplate, but stoplisted → empty set → kept
      (11L, "c1 c2 c3 c4")  // matches the non-boilerplate history doc → dropped
    ).toDF("doc_id", "text")
    val (postings, stop) = Dedup.shingleStoreSnapshot(hist, maxDf = 2)
    val p = ParquetSink.writeBucketed(postings, "inc_jac_cap_post", "sid", 4)
    val s = ParquetSink.writeBucketed(stop, "inc_jac_cap_stop", "sid", 4)
    val out = Dedup.dedupIncrementalJaccardOn(batch, p, s)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq(10L -> 0L))
    assert(s.count() === 2, "both boilerplate shingles must be stoplisted")
  }

  test("registered split query matches an independent in-memory model") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val histSets = docs.filter(_._1 % 10 < 8).map { case (id, t) => id -> shingleSet(t) }
    // MaxShingleDf never binds at sf0.001 (max df ~25 at sf0.1), so the
    // model can skip the cap — asserted here so a binding cap fails loudly
    val dfCounts = histSets.flatMap(_._2).groupBy(identity).map(_._2.size)
    assert(dfCounts.forall(_ <= Dedup.MaxShingleDf), "cap must not bind at this SF")
    val batch = docs.filter(_._1 % 10 >= 8).sortBy(_._1)
      .map { case (id, t) => id -> shingleSet(t) }
    val expected = batch.flatMap { case (id, set) =>
      val histDup = histSets.exists { case (_, h) => jac(set, h) >= 0.5 }
      val earlierDup = batch.exists { case (e, b) => e < id && jac(set, b) >= 0.5 }
      if (!histDup && !earlierDup) Some(id -> set.size.toLong) else None
    }
    val got = Dedup.incrementalJaccard.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty, "split must leave survivors")
    assert(got.length < batch.length, "near-dups must actually drop docs")
  }

  test("store join is in place: postings scan bucketed, only the batch shuffles") {
    val docs = Tables.documents(spark, dir)
    val (postings, stop) = Dedup.shingleStoreSnapshot(docs.filter(col("doc_id") % 10 < 8))
    val p = ParquetSink.writeBucketed(postings, "inc_jac_plan_post", "sid",
      Dedup.storeBuckets(spark))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // probe exactly the store join: batch shingles → join(postings, sid)
      val out = Dedup.batchShingles(docs.filter(col("doc_id") % 10 >= 8), stop)
        .join(p, Seq("sid"))
      out.collect()
      val root = out.queryExecution.executedPlan
      val plan = root.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(root).toString
      val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      // exactly one: the day's shingles move to the store's bucketing; the
      // store itself is scanned in place (its scan reports Bucketed: true)
      assert(hashExchanges === 1, s"store side must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"store scan must be bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
