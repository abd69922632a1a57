package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.operators.Tokenize

/** ScalaCheck properties for the two shared round-14 kernels:
  *
  *  - [[Tokenize.mergeExpr]] — the greedy leftmost-first BPE merge fold
  *    both the trainer and `bpe_segment_trained` run — differentialed
  *    against an independent list-walk reference on GENERATED symbol
  *    sequences (the seeded specs cover the corpus; generators cover
  *    self-pairs, immediate re-adjacency after a merge, and runs of the
  *    same symbol — the shapes where leftmost-first-with-rescan
  *    semantics can silently drift), plus the algebraic law that a merge
  *    never re-consumes its own output within one pass.
  *
  *  - [[graft.operators.Retrieval.rrfFuse]] — the exact-integer RRF
  *    fusion — differentialed against a local reimplementation on
  *    generated rank tables (absent legs, single-leg queries, disjoint
  *    doc sets, rank ties across legs).
  */
class MergeApplyPropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def check(p: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  /** Independent reference: one greedy leftmost-first pass with rescan —
    * the TokenizeSpec local trainer's applyMerge, restated. */
  private def refApply(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var rest = syms
    while (rest.nonEmpty) rest match {
      case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
      case a :: tail => out += a; rest = tail
      case Nil => ()
    }
    out.toList
  }

  // a tiny alphabet maximizes merge-pattern collisions (self-pairs, runs)
  private val genSym = Gen.oneOf("a", "b", "c")
  private val genSyms = Gen.listOfN(8, genSym).flatMap(l =>
    Gen.choose(0, 8).map(l.take))

  test("mergeExpr ≡ the reference leftmost-first pass on generated " +
      "sequences (one Spark job batching all cases)") {
    import spark.implicits._
    val cases = (for {
      i <- 0 until 300
      seed = new scala.util.Random(i)
      n = seed.nextInt(9)
      syms = List.fill(n)(Seq("a", "b", "c")(seed.nextInt(3)))
      l = Seq("a", "b", "c")(seed.nextInt(3))
      r = Seq("a", "b", "c")(seed.nextInt(3))
    } yield (i.toLong, syms, l, r)).toSeq
    // group by (l, r) so each merge rule is ONE Spark expression over all
    // its generated sequences — 9 jobs total, not 300
    cases.groupBy { case (_, _, l, r) => (l, r) }.foreach { case ((l, r), grp) =>
      val df = grp.map { case (id, syms, _, _) => (id, syms) }.toDF("id", "syms")
      val got = df.select(col("id"), Tokenize.mergeExpr(col("syms"), l, r).as("m"))
        .collect().map(row => row.getLong(0) -> row.getSeq[String](1).toList).toMap
      grp.foreach { case (id, syms, _, _) =>
        assert(got(id) === refApply(syms, l, r),
          s"merge ($l,$r) on $syms")
      }
    }
  }

  test("law: a pass never re-consumes its own output (the merged token can " +
      "match as the LEFT of a later pair only if l+r == l, impossible)") {
    check(Prop.forAll(genSyms, genSym, genSym) { (syms, l, r) =>
      val once = refApply(syms, l, r)
      // a second pass of the same rule can still fire (rescan semantics
      // permit new (l, r) adjacencies formed by DELETION between them is
      // impossible — merging consumes both; adjacency of untouched l and r
      // survivors is unchanged), so the law is: a second pass equals the
      // first iff the first produced no new (l, r) adjacency — and it
      // cannot, because every emitted l in `once` is followed by whatever
      // followed the consumed r, which the first pass already inspected
      refApply(once, l, r) == once
    }, 300)
  }

  /** Local RRF reference: union of per-query candidate docs, score =
    * Σ 1000000/(60+rank) over present legs, top-10 by (score desc, doc). */
  private def refFuse(lex: Seq[(Long, Long, Long)], den: Seq[(Long, Long, Long)])
      : Map[(Long, Long), (Long, Long)] = {
    val lexM = lex.map(x => (x._1, x._2) -> x._3).toMap
    val denM = den.map(x => (x._1, x._2) -> x._3).toMap
    val qs = (lex.map(_._1) ++ den.map(_._1)).distinct
    qs.flatMap { q =>
      val docs = (lexM.keys ++ denM.keys).filter(_._1 == q).map(_._2).toSeq.distinct
      val scored = docs.map { doc =>
        val sc = lexM.get((q, doc)).map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
          denM.get((q, doc)).map(rk => 1000000L / (60 + rk)).getOrElse(0L)
        (doc, sc)
      }.sortBy { case (doc, sc) => (-sc, doc) }.take(10)
      scored.zipWithIndex.map { case ((doc, sc), i) =>
        (q, doc) -> ((sc, (i + 1).toLong))
      }
    }.toMap
  }

  test("rrfFuse ≡ the local reference on generated rank tables " +
      "(absent legs, disjoint docs, cross-leg ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def genLeg(maxQ: Int, maxDocs: Int): Seq[(Long, Long, Long)] =
      (0 until maxQ).flatMap { q =>
        val docs = rnd.shuffle((0L until 20L).toList).take(rnd.nextInt(maxDocs))
        docs.zipWithIndex.map { case (doc, i) => (q.toLong, doc, (i + 1).toLong) }
      }
    for (_ <- 1 to 5) {
      val lex = genLeg(3, 12)
      val den = genLeg(4, 6) // query 3 is dense-only: full-outer on query_id
      val got = graft.operators.Retrieval.rrfFuse(
          lex.toDF("query_id", "doc_id", "lex_rank"),
          den.toDF("query_id", "doc_id", "dense_rank"), topK = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(4), r.getLong(5))))
        .toMap
      assert(got === refFuse(lex, den), s"fusion mismatch: lex=$lex den=$den")
    }
  }
}
