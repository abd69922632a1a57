package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** dedup_span_longest against planted ground truth: a pair sharing a
  * verbatim run of exactly L tokens (unique filler everywhere else) must
  * report longest_run_tokens == L for every L ≥ SpanWindow and every
  * placement; runs below the window grain are invisible by construction;
  * multiple disjoint runs report the max with the right run count; and a
  * super-[[Dedup.MaxSpanDf]] boilerplate block never seeds pairs. */
class SpanLongestSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val W = Dedup.SpanWindow

  /** doc = unique filler ++ shared ++ unique filler (token grain). */
  private def doc(id: Long, pre: Int, shared: Seq[String], post: Int): (Long, String) =
    (id, ((0 until pre).map(i => s"f${id}_a$i") ++ shared ++
      (0 until post).map(i => s"f${id}_b$i")).mkString(" "))

  private def run(rows: Seq[(Long, String)]): Map[(Long, Long), (Long, Long)] = {
    import spark.implicits._
    Dedup.spanLongestOn(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("planted overlap of exactly L tokens reports longest_run_tokens == L " +
      "for a sweep of lengths and placements; L < W is invisible") {
    val cases = Seq(
      // (L, prefix1, post1, prefix2, post2)
      (W, 0, 0, 0, 0),        // the whole doc IS the run, both sides
      (W, 7, 31, 0, 25),      // minimal run, asymmetric placement
      (W + 1, 3, 3, 11, 0),   // one past the grain
      (25, 0, 40, 40, 0),     // head-of-one vs tail-of-other
      (40, 13, 22, 5, 37),    // mid-doc both sides
      (93, 1, 1, 29, 2))      // long run, the corpus's own max scale
    cases.zipWithIndex.foreach { case ((l, a1, b1, a2, b2), i) =>
      val shared = (0 until l).map(j => s"s${i}_$j")
      val got = run(Seq(doc(1, a1, shared, b1), doc(2, a2, shared, b2)))
      assert(got.keySet === Set((1L, 2L)), s"case $i: pair must surface")
      assert(got((1L, 2L))._1 === l.toLong,
        s"case $i: extent must be exactly L=$l, got ${got((1L, 2L))}")
      assert(got((1L, 2L))._2 === 1L, s"case $i: one run only")
    }
    // below the window grain: invisible by construction
    val sub = (0 until W - 1).map(j => s"u$j")
    assert(run(Seq(doc(1, 10, sub, 10), doc(2, 10, sub, 10))).isEmpty,
      "a shared run of W-1 tokens must not seed")
  }

  test("two disjoint shared runs: longest wins, run count is exact, and a " +
      "third document sharing one run pairs independently") {
    val runA = (0 until 24).map(j => s"ra$j") // shorter
    val runB = (0 until 57).map(j => s"rb$j") // longer
    val d1 = (1L, ((0 until 5).map(i => s"f1_$i") ++ runA ++
      (0 until 9).map(i => s"g1_$i") ++ runB).mkString(" "))
    val d2 = (2L, (runB ++ (0 until 7).map(i => s"f2_$i") ++ runA).mkString(" "))
    val d3 = doc(3, 4, runA, 4)
    val got = run(Seq(d1, d2, d3))
    assert(got((1L, 2L)) === ((57L, 2L)),
      s"longest of the two runs with both counted: ${got.get((1L, 2L))}")
    assert(got((1L, 3L))._1 === 24L && got((2L, 3L))._1 === 24L,
      s"the shorter run pairs d3 with both: $got")
  }

  test("a boilerplate block shared by more than MaxSpanDf occurrences is " +
      "capped out of seeding (the spanTop/spanStrip boundary); under the " +
      "cap it seeds normally") {
    val block = (0 until W).map(j => s"bp$j")
    val over = (1L to (Dedup.MaxSpanDf + 6).toLong).map(id => doc(id, 2, block, 2))
    assert(run(over).isEmpty,
      "an over-cap boilerplate block must not fan out occ^2 pairs")
    val under = (1L to 3L).map(id => doc(id, 2, block, 2))
    val got = run(under)
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"under the cap the same block seeds all pairs: $got")
    assert(got.values.forall(_ == ((W.toLong, 1L))), s"extent = the block: $got")
  }

  test("an over-cap boilerplate window EMBEDDED in a longer rare run does " +
      "not split the chain: the extent reports the full run and one island " +
      "(the seed/extend split — r17 ADVICE)") {
    val l = 2 * W + 11
    val shared = (0 until l).map(j => s"em$j")
    // the interior W-token slice of the run, planted verbatim in more than
    // MaxSpanDf unrelated docs so its single window hash crosses the cap
    val mid = shared.slice(W / 2 + 3, W / 2 + 3 + W)
    val noise = (10L to (10L + Dedup.MaxSpanDf + 8).toLong)
      .map(id => doc(id, 2, mid, 2))
    val got = run(Seq(doc(1, 4, shared, 4), doc(2, 9, shared, 0)) ++ noise)
    assert(got.keySet === Set((1L, 2L)),
      s"only the rare-run pair may surface (boilerplate never seeds): ${got.keySet}")
    assert(got((1L, 2L)) === ((l.toLong, 1L)),
      s"the over-cap interior window must not split the island: $got")
  }

  test("adjacent matched windows CHAIN: a run longer than W is one island, " +
      "not per-window pairs (n_shared_runs stays 1 as L grows)") {
    val l = 3 * W + 7
    val shared = (0 until l).map(j => s"c$j")
    val got = run(Seq(doc(1, 6, shared, 6), doc(2, 0, shared, 13)))
    assert(got((1L, 2L)) === ((l.toLong, 1L)),
      s"the ${l - W + 1} matched windows must fold into one island: $got")
  }

  private def storeOf(hist: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    // the build-time causal cap, mirrored from the registered query: ALL
    // positions stored, seed_ok stamped from history occurrences
    val sp = Dedup.spanHashesPos(hist.toDF("doc_id", "text"))
    val occ = sp.groupBy(col("h")).agg(count(lit(1)).as("o"))
    sp.join(occ, Seq("h"))
      .withColumn("seed_ok", col("o") <= Dedup.MaxSpanDf).drop("o")
  }

  private def runInc(hist: Seq[(Long, String)], batch: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Dedup.spanLongestIncrementalOn(batch.toDF("doc_id", "text"), storeOf(hist))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("incremental extent: planted history run reports its exact length " +
      "and source; unmatched docs carry the 0/-1/0 sentinels; extent ties " +
      "resolve to the LOWEST history doc deterministically") {
    val runA = (0 until 41).map(j => s"ha$j")
    val hist = Seq(doc(100, 5, runA, 5), doc(101, 0, runA, 9),
      doc(102, 3, (0 until W).map(j => s"hx$j"), 3))
    val batch = Seq(doc(900, 7, runA, 2), doc(901, 4, (0 until 30).map(j => s"zz$j"), 4))
    val got = runInc(hist, batch)
    // doc 900 shares the 41-token run with BOTH 100 and 101 → tie on
    // extent, best = min(hd) = 100; n_partners = 2
    assert(got(900L) === ((41L, 100L, 2L)), s"planted extent + tie: $got")
    assert(got(901L) === ((0L, -1L, 0L)), s"unmatched sentinels: $got")
  }

  test("incremental seed/extend split: an over-cap HISTORY window embedded " +
      "in a stored run extends the chain but never seeds — full extent for " +
      "the real copy, sentinels for a boilerplate-only batch doc") {
    val l = 2 * W + 5
    val shared = (0 until l).map(j => s"ie$j")
    val mid = shared.slice(5, 5 + W)
    val hist = Seq(doc(100, 3, shared, 3)) ++
      (200L to (200L + Dedup.MaxSpanDf + 4).toLong).map(id => doc(id, 1, mid, 1))
    val batch = Seq(doc(900, 0, shared, 6), doc(901, 2, mid, 2))
    val got = runInc(hist, batch)
    assert(got(900L) === ((l.toLong, 100L, 1L)),
      s"the over-cap interior window must bridge, not split, and the " +
        s"boilerplate docs must not count as partners: $got")
    assert(got(901L) === ((0L, -1L, 0L)),
      s"a batch doc sharing ONLY the over-cap window never seeds: $got")
  }

  test("cap-semantics divergence, pinned explicitly: a block under the " +
      "HISTORY cap but pushed over the corpus cap by the batch is still " +
      "reported by the incremental audit (causal store, by design) while " +
      "the one-shot suppresses it") {
    import spark.implicits._
    val block = (0 until W).map(j => s"cap$j")
    val histN = Dedup.MaxSpanDf - 4                    // 60 ≤ cap: stored
    val hist = (1L to histN.toLong).map(id => doc(id, 2, block, 2))
    val batch = (900L to 909L).map(id => doc(id, 1, block, 1)) // total 70 > cap
    val inc = runInc(hist, batch)
    batch.map(_._1).foreach { d =>
      assert(inc(d) === ((W.toLong, 1L, histN.toLong)),
        s"incremental must still report the stored block for $d: ${inc(d)}")
    }
    // the one-shot over the combined corpus caps on TOTAL occurrences —
    // the same block seeds nothing there
    val oneShot = Dedup.spanLongestOn((hist ++ batch).toDF("doc_id", "text"))
    assert(oneShot.count() === 0L,
      "one-shot suppresses the over-corpus-cap block entirely")
  }

  test("incremental extent == the one-shot pair extent on the combined " +
      "corpus — the agreement holds wherever the df-cap does not bind " +
      "(max occ 4 here; the binding case is pinned separately above)") {
    import spark.implicits._
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions.col
    val hist = corpus.filter(col("doc_id") % 10 < 8)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val batch = corpus.filter(col("doc_id") % 10 >= 8)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val inc = runInc(hist, batch).filter(_._2._1 > 0)
    // the one-shot query over the WHOLE corpus: cross-split pairs only
    val histIds = hist.map(_._1).toSet
    val oneShot = Dedup.spanLongestOn(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .flatMap { case (d1, d2, l) =>
        if (histIds(d1) && !histIds(d2)) Some((d2, d1) -> l)
        else if (!histIds(d1) && histIds(d2)) Some((d1, d2) -> l)
        else None
      }.toMap
    inc.foreach { case (d, (l, best, _)) =>
      assert(oneShot.get((d, best)).contains(l),
        s"incremental extent ($d, $best, $l) must equal the one-shot pair")
    }
    val expectByDoc = oneShot.groupBy(_._1._1).view
      .mapValues(_.values.max).toMap
    assert(inc.map { case (d, (l, _, _)) => d -> l } === expectByDoc,
      "per-doc max extent must agree with the one-shot pair table")
  }

  test("registered query on the corpus: extents bounded by the shorter " +
      "document, pairs symmetric-free (d1 < d2), and every pair's extent " +
      ">= the window grain") {
    val out = Dedup.spanLongest.run(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty, "the synthetic corpus plants span duplicates")
    val lens = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val (d1, d2, l) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(d1 < d2, "pair orientation")
      assert(l >= W.toLong, s"extent below the seed grain: $l")
      assert(l <= math.min(lens(d1), lens(d2)).toLong,
        s"extent $l exceeds a member of pair ($d1,$d2)")
    }
  }
}
