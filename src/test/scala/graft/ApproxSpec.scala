package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ApproxAndSample, SimHash}

/** Error-bound and property checks for the sketch/sample operators (their
  * outputs are engine-specific, so no DuckDB oracle — bounds vs. the exact
  * computation are the contract). Runs on sf0.001. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact per group") {
    val approx = ApproxAndSample.approxAggregates.run(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (p, s)) =>
      val (ap, as_) = approx(k)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"parts HLL error at $k: $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s < 0.05, s"supps HLL error at $k: $as_ vs $s")
    }
  }

  test("stratified sample respects per-stratum fractions (loose binomial bounds)") {
    val sampled = ApproxAndSample.stratifiedSample.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = Map("O" -> 0.05, "F" -> 0.5, "P" -> 1.0)
    fracs.foreach { case (k, f) =>
      val n = totals(k); val got = sampled.getOrElse(k, 0L)
      val expect = n * f
      val slack = 4 * math.sqrt(expect max 1.0) + 3
      assert(math.abs(got - expect) <= slack, s"stratum $k: got $got, expected ~$expect ± $slack")
    }
  }

  test("hash-threshold bernoulli keeps ~10% overall") {
    val total = Tables.orders(spark, dir).count()
    val sampled = ApproxAndSample.bernoulliSample.run(spark, dir)
      .agg(sum(col("n_sampled"))).head.getLong(0)
    val expect = total * 0.1
    val slack = 4 * math.sqrt(expect) + 3
    assert(math.abs(sampled - expect) <= slack, s"got $sampled, expected ~$expect ± $slack")
  }

  test("weighted sample skews toward long documents") {
    val corpusAvg = Tables.documents(spark, dir)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val s = ApproxAndSample.weightedSample.run(spark, dir)
      .agg(sum(col("chars_sampled")), sum(col("n_sampled"))).head
    val sampledAvg = s.getLong(0).toDouble / s.getLong(1)
    assert(sampledAvg > corpusAvg,
      s"length-weighted inclusion must lift the sampled mean: $sampledAvg vs $corpusAvg")
  }

  test("content-hash samples are invariant to partitioning (seeded .sample is not)") {
    // the defining property of hash sampling: the KEPT ROW SET is a pure
    // function of the data, not of the physical layout
    def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] = df
      .filter(substring(md5(col("doc_id").cast("string")), 1, 8) < "19999999")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, dir)
    assert(keptIds(docs) === keptIds(docs.repartition(7)))
    assert(keptIds(docs) === keptIds(docs.repartition(1)))
    // and the k-min reservoir: same k rows under any layout
    def reservoir(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
      .select(col("doc_id"), substring(md5(col("doc_id").cast("string")), 1, 8).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(20)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(reservoir(docs) === reservoir(docs.repartition(13)))
    assert(reservoir(docs).size === 20)
  }

  test("simhash near-dup banding finds exactly the pairs at hamming <= 3") {
    val docs = Tables.documents(spark, dir)
    val fps = SimHash.fingerprints(docs)
    val viaBands = SimHash.nearDuplicates(fps, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force all-pairs check on the small corpus
    val all = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (d1, h1) <- all; (d2, h2) <- all if d1 < d2
      dist = java.lang.Long.bitCount(h1 ^ h2) if dist <= 3
    } yield (d1, d2, dist.toLong)).toSet
    assert(viaBands === brute, "band-join must be exact for hamming <= 3 (pigeonhole)")
  }

  test("approx_topk_cms: estimates never undercount and match exact counts vs brute force") {
    val out = ApproxAndSample.approxTopKCms.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length <= ApproxAndSample.CmsTopK)
    assert(out.nonEmpty)
    // structural CMS guarantee: min-of-cells can only OVERcount
    out.foreach { case (_, t, exact, est, over) =>
      assert(est >= exact, s"CMS undercounted '$t': $est < $exact")
      assert(over === est - exact)
    }
    // the exact side really is the exact top-k (independent recount)
    val truth = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (_, t, exact, _, _) =>
      assert(truth(t) === exact, s"exact count mismatch for '$t'")
    }
    val expectedTop = truth.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(ApproxAndSample.CmsTopK).map(_._1)
    assert(out.map(_._2).toSeq === expectedTop, "top-k set/order must match brute force")
  }
}
