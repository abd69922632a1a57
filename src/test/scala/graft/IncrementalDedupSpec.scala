package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.ParquetSink

/** Incremental cross-snapshot dedup: correctness of the keep rule (unseen in
  * history AND first-in-batch) and the scale property that makes it the daily
  * operation of a 100 TB pipeline — the persisted fingerprint store is joined
  * IN PLACE (bucketed scan, no exchange); only the day's batch ever shuffles. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def fp(text: String): String = {
    val joined = text.split(" ").distinct.sorted.mkString(" ")
    java.security.MessageDigest.getInstance("MD5").digest(joined.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("keep rule: drop history hits, drop in-batch dups, keep the unseen") {
    import spark.implicits._
    val hist = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "beta alpha gamma alpha"), // token-set dup of doc 1 → dropped vs history
      (11L, "eta theta iota"),         // unseen → kept
      (12L, "theta iota eta"),         // in-batch token-set dup of 11 → dropped (11 < 12)
      (13L, "kappa lambda mu")         // unseen → kept
    ).toDF("doc_id", "text")
    val store = ParquetSink.writeBucketed(
      Dedup.fingerprintSnapshot(hist), "inc_store_rule", "fp", 4)
    val out = Dedup.dedupIncrementalOn(batch, store)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.map(_._1).toSeq === Seq(11L, 13L))
    assert(out.toMap === Map(11L -> fp("eta theta iota"), 13L -> fp("kappa lambda mu")))
  }

  test("registered split query matches the exact NOT-EXISTS rule on real docs") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val histFps = docs.filter(_._1 % 10 < 8).map(d => fp(d._2)).toSet
    val batch = docs.filter(_._1 % 10 >= 8).sortBy(_._1)
    val seenInBatch = scala.collection.mutable.Set[String]()
    val expected = batch.flatMap { case (id, text) =>
      val f = fp(text)
      if (!histFps.contains(f) && seenInBatch.add(f)) Some(id -> f) else None
    }.toMap
    val got = Dedup.incremental.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty, "split must leave survivors")
    assert(got.size < batch.length, "history/batch dups must actually drop docs")
  }

  test("anti-join scans the bucketed store in place: only the batch shuffles") {
    val docs = Tables.documents(spark, dir)
    // buckets = the session's CURRENT shuffle.partitions (not a hardcoded 4):
    // the exchange-free property must hold under whatever conf earlier suites
    // left behind — this is what Dedup.incremental itself does via storeBuckets
    val store = ParquetSink.writeBucketed(
      Dedup.fingerprintSnapshot(docs.filter(col("doc_id") % 10 < 8)),
      "inc_store_plan", "fp", Dedup.storeBuckets(spark))
    // force the shuffle-join path: broadcasting the store would hide the
    // property under test (and is impossible at real store sizes anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = Dedup.dedupIncrementalOn(docs.filter(col("doc_id") % 10 >= 8), store)
      out.collect() // let AQE finalize before inspecting
      // unwrap to the FINAL adaptive plan: AdaptiveSparkPlanExec.toString
      // renders final + initial plans, double-counting every exchange
      val root = out.queryExecution.executedPlan
      val plan = root.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(root).toString
      val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      // exactly one: the batch-side fingerprint groupBy, whose partitioning
      // the bucketed store matches — zero exchanges serve the join itself
      assert(hashExchanges === 1, s"store side must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"store scan must be bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
