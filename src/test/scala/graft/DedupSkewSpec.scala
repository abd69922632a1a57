package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Adversarial hot-bucket test for the shingle-Jaccard inverted index:
  * a corpus where every document shares the same long boilerplate header
  * (the pattern that makes an uncapped posting-list self-join quadratic —
  * round-1 verdict "what's wrong" #4). With the df cap binding, boilerplate
  * shingles leave the shingle sets entirely, so (a) the candidate join is
  * bounded by genuine overlap and (b) Jaccard is computed over the filtered
  * sets — asserted against a Scala model of exactly that definition. */
class DedupSkewSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val boiler =
    "terms of service apply to all content in this repository please read carefully before proceeding"
  // 40 docs: all share the boilerplate; docs 2k/2k+1 share a unique tail
  // (true near-dups); odd tails otherwise distinct.
  private def corpus: Seq[(Long, String)] = (0 until 40).map { i =>
    val tail = (0 until 12).map(j => s"w${(i / 2) * 100 + j}").mkString(" ")
    (i.toLong, s"$boiler $tail uniq$i")
  }

  private def shingleSet(text: String): Set[String] = {
    val w = text.split(" ")
    (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("df cap bounds boilerplate skew and matches the filtered-set model") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val maxDf = 10 // binding: boilerplate shingles have df = 40

    // model: Jaccard over shingle sets with df-capped shingles removed
    val sets = corpus.map { case (id, t) => id -> shingleSet(t) }
    val df = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val filtered = sets.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }.toMap
    val expected = (for {
      (i, si) <- filtered.toSeq; (j, sj) <- filtered.toSeq if i < j
      inter = (si & sj).size if inter > 0
      jac = inter.toDouble / (si.size + sj.size - inter) if jac >= 0.5
    } yield (i, j, jac)).toSet

    val got = Dedup.shingleJaccardOn(docs, maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    // the true near-dup pairs (shared 12-word tails) must survive the cap
    assert((0 until 20).forall(k => got.exists(p => p._1 == 2L * k && p._2 == 2L * k + 1)))

    // the cap actually bounds the join: candidate pairs after the cap are
    // only the tail-sharing ones, not the all-pairs blowup from boilerplate
    val uncappedPairs = 40L * 39 / 2 // what boilerplate alone would generate
    assert(got.size < uncappedPairs / 10)
  }

  test("default cap does not bind on the driver corpus (oracle-stable)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val capped = Dedup.shingleJaccardOn(docs).collect().toSeq.map(_.toSeq).toSet
    val uncapped = Dedup.shingleJaccardOn(docs, maxDf = Int.MaxValue)
      .collect().toSeq.map(_.toSeq).toSet
    assert(capped === uncapped)
  }
}
