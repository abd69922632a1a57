package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** `dedup_keep_best` semantics: the quality-priority keep rule picks the
  * high-TTR member even when it arrives LATER (the case first-arrival
  * keep gets wrong), ties fall to the smallest id, singletons keep
  * themselves — against a from-first-principles model. */
class KeepBestSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("padded early copy loses to the tight later original; ties to min id") {
    import spark.implicits._
    val docs = Seq(
      // group A: doc 1 is a word-padded copy (lower TTR), doc 2 is tight —
      // same token SET, so one fingerprint group; min-id keep would pick 1
      (1L, "alpha beta gamma alpha alpha beta"),
      (2L, "alpha beta gamma"),
      // group B: exact copies — identical TTR, tie falls to min id 10
      (10L, "delta epsilon"),
      (11L, "delta epsilon"),
      // singleton
      (20L, "zeta eta theta")).toDF("doc_id", "text")

    val got = Dedup.keepBestOn(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
      .sortBy(_._3)

    def ttr(t: String): Long = {
      val w = t.split(" ")
      math.round(1000.0 * w.distinct.length / w.length)
    }
    assert(got === Array(
      (2L, ttr("alpha beta gamma"), 1L, 2L, true), // upgraded: 2 beats 1
      (10L, ttr("delta epsilon"), 10L, 2L, false), // tie → min id
      (20L, ttr("zeta eta theta"), 20L, 1L, false)), // singleton
      s"got ${got.toSeq}")
  }

  test("corpus invariants: keep_id is a group member with the group-max " +
      "ttr; upgraded iff it differs from min_id") {
    import org.apache.spark.sql.functions.{col, split, size, array_distinct, round, lit}
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val ttrs = docs.select(col("doc_id"),
        Dedup.tokenSetFp(col("text")).as("fp"),
        round(lit(1000.0) * size(array_distinct(split(col("text"), " "))) /
          size(split(col("text"), " "))).cast("long").as("ttr"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byFp = ttrs.groupBy(_._2)
    val got = Dedup.keepBestOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.length === byFp.size)
    for ((fp, keep, kttr, minId, n, up) <- got) {
      val members = byFp(fp)
      assert(members.length === n.toInt)
      val maxTtr = members.map(_._3).max
      assert(kttr === maxTtr, s"group-max ttr for $fp")
      assert(keep === members.filter(_._3 === maxTtr).map(_._1).min,
        s"smallest id among max-ttr members for $fp")
      assert(minId === members.map(_._1).min)
      assert(up === (keep != minId))
    }
  }
}
