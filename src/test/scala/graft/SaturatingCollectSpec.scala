package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SaturatingCollectLong.satCollect

/** The bounded posting-list aggregate vs `sort_array(collect_list(...))`:
  * bit-identical for under-cap groups REGARDLESS of partitioning (merges
  * concatenate, the eval sort normalizes), saturation caps the buffer at
  * cap + 1 so only the SIZE of an over-cap group is meaningful, and the
  * serialize/merge path is exercised by forcing partial aggregation
  * across many partitions. */
class SaturatingCollectSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("under-cap groups equal sort_array(collect_list) across partitionings") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i % 97L, i.toLong)).toDF("k", "v")
    for (parts <- Seq(1, 7, 32)) {
      val rows = df.repartition(parts)
        .groupBy(col("k"))
        .agg(satCollect(col("v"), 64).as("a"),
          sort_array(collect_list(col("v"))).as("b"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"key ${r.getLong(0)} parts $parts")
      }
    }
  }

  test("over-cap groups saturate at cap + 1 elements, sorted, a subset of the input") {
    import spark.implicits._
    val df = (1 to 500).map(i => (1L, i.toLong)).toDF("k", "v")
    val got = df.repartition(16)
      .groupBy(col("k")).agg(satCollect(col("v"), 10).as("a"))
      .head().getSeq[Long](1)
    assert(got.size === 11, "exactly cap + 1 — enough to fail a size <= cap filter")
    assert(got === got.sorted)
    assert(got.toSet.subsetOf((1L to 500L).toSet))
    assert(got.toSet.size === 11, "no duplicates fabricated")
  }

  test("nulls are skipped (collect_list semantics); all-null group yields empty array") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (1L, None), (2L, None))
      .toDF("k", "v")
    val rows = df.groupBy(col("k")).agg(satCollect(col("v"), 4).as("a"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) === Seq(5L))
    assert(rows(2L) === Seq.empty)
  }

  test("non-positive cap fails analysis loud") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("k", "v")
    intercept[Exception] {
      df.groupBy(col("k")).agg(satCollect(col("v"), 0)).collect()
    }
  }
}
