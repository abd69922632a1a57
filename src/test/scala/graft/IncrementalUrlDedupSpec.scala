package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.ParquetSink

/** Incremental URL dedup: the canonical-key keep rule (unseen in the store
  * AND first-in-batch, min-id's url riding along) and the scale property
  * that makes it the crawl-frontier operation — the persisted key store is
  * probed IN PLACE (bucketed scan, no exchange); only the batch's 32-byte
  * keys ever shuffle. */
class IncrementalUrlDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("keep rule: re-crawled variants of stored pages drop, unseen pages " +
      "keep the first arrival with its url") {
    import spark.implicits._
    val store = ParquetSink.writeBucketed(
      Seq("example.org/a", "example.org/b").toDF("canonical"),
      "url_store_rule", "canonical", 4)
    val batch = Seq(
      (10L, "http://www.example.org/a/"),              // stored → dropped
      (11L, "HTTPS://EXAMPLE.ORG/b#x"),                // stored → dropped
      (12L, "https://example.org/c?utm_source=feed"),  // new page → kept
      (13L, "https://example.org/c"),                  // in-batch dup of 12
      (14L, "https://example.org/A"))                  // path case ≠ /a → kept
      .toDF("doc_id", "url")
      .withColumn("canonical", Dedup.canonicalUrl(col("url")))
    val out = Dedup.urlSurvivorsOn(batch, store)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (12L, "https://example.org/c?utm_source=feed", "example.org/c"),
      (14L, "https://example.org/A", "example.org/A")), s"got ${out.toSeq}")
  }

  test("registered split query matches the NOT-EXISTS rule on real doc ids") {
    val ids = Tables.documents(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    def canon(id: Long) = s"example.org/page/${id % 50}"
    val histPages = ids.filter(_ % 10 < 8).map(canon).toSet
    val seen = scala.collection.mutable.Set[String]()
    val expected = ids.filter(_ % 10 >= 8).flatMap { id =>
      val c = canon(id)
      if (!histPages.contains(c) && seen.add(c)) Some(id -> c) else None
    }.toMap
    val got = Dedup.incrementalUrl.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === expected, s"got $got expected $expected")
  }

  test("anti-join probes the bucketed key store in place: only the batch shuffles") {
    val k = Dedup.urlCanonicalized(Tables.documents(spark, dir))
    val store = ParquetSink.writeBucketed(
      k.filter(col("doc_id") % 10 < 8).select(col("canonical")).distinct(),
      "url_store_plan", "canonical", Dedup.storeBuckets(spark))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = Dedup.urlSurvivorsOn(k.filter(col("doc_id") % 10 >= 8), store)
      out.collect()
      val root = out.queryExecution.executedPlan
      val plan = root.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(root).toString
      val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(hashExchanges === 1, s"store side must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"store scan must be bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
