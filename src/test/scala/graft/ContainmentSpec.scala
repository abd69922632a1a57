package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The case [[Dedup.containmentOn]] exists for — and shingle-Jaccard
  * structurally cannot catch: an EXCERPT. A page quoting half of a long
  * document has J ≈ |A|/|B| (here ≈ 0.48, below the 0.5 near-dup
  * threshold) but C(A in B) = 1.0. Plus a filtered-set model check of the
  * exact containment definition over a mixed corpus, same discipline as
  * DedupSkewSpec's Jaccard model. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def shingleSet(text: String): Set[String] = {
    val w = text.split(" ")
    (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("an excerpt is invisible to Jaccard but containment fires, directed") {
    import spark.implicits._
    val full = (0 until 60).map(j => s"w$j").mkString(" ") // doc 2: 60 tokens
    val excerpt = (0 until 30).map(j => s"w$j").mkString(" ") // doc 1: its first half
    val docs = Seq((1L, excerpt), (2L, full), (3L, "something else entirely here"))
      .toDF("doc_id", "text")

    // the premise: resemblance genuinely misses this pair at its threshold
    val sA = shingleSet(excerpt); val sB = shingleSet(full)
    val j = sA.intersect(sB).size.toDouble / sA.union(sB).size
    assert(j < 0.5, s"fixture must sit below the Jaccard threshold: $j")
    assert(Dedup.shingleJaccardOn(docs).collect().isEmpty,
      "shingle-Jaccard at 0.5 does not fire on the excerpt pair")

    val got = Dedup.containmentOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0)),
      s"exactly the directed (excerpt, source, 1.0) row: ${got.toSeq}")
  }

  test("matches the set model C(A,B) = |A∩B| / |A| on a mixed corpus, " +
      "both directions, df-capped universe") {
    import spark.implicits._
    val corpus: Seq[(Long, String)] = Seq(
      1L -> (0 until 40).map(j => s"a$j").mkString(" "),
      2L -> (0 until 20).map(j => s"a$j").mkString(" "), // half-excerpt of 1
      3L -> ((0 until 35).map(j => s"a$j") ++ Seq("x1", "x2", "x3", "x4", "x5"))
        .mkString(" "), // near-dup of 1 (both directions high)
      4L -> (0 until 30).map(j => s"b$j").mkString(" "), // unrelated
      5L -> "too short") // below the 3-token shingle floor
    val docs = corpus.toDF("doc_id", "text")
    val thresh = 0.8

    val sets = corpus.map { case (id, t) => id -> shingleSet(t) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia != ib
      inter = sa.intersect(sb).size
      if inter > 0
      c = inter.toDouble / sa.size
      if c >= thresh
    } yield (ia, ib, c)).sortBy(x => (x._1, x._2))

    val got = Dedup.containmentOn(docs, threshold = thresh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got === expected, s"got $got, expected $expected")
    // sanity on the fixture's intent: the excerpt direction is present,
    // its reverse is not, and the near-dup pair appears in BOTH directions
    assert(got.exists(x => x._1 == 2L && x._2 == 1L))
    assert(!got.exists(x => x._1 == 1L && x._2 == 2L))
    assert(got.exists(x => x._1 == 1L && x._2 == 3L) &&
      got.exists(x => x._1 == 3L && x._2 == 1L))
  }
}
