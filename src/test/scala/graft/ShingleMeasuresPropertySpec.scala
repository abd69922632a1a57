package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Generator-driven differential properties for the shingle-measure family
  * (`shingleJaccardOn` / `containmentOn` share one candidate + exact-
  * intersection stage): on random small corpora with planted overlap
  * structure, both operators must equal the brute-force set models over
  * df-capped 3-gram shingle sets — every pair, every direction, exact
  * values. Complements the fixed fixtures in ContainmentSpec/DedupSkewSpec
  * with generated shapes (prefix excerpts, shared blocks, boilerplate
  * repetition, sub-shingle shorties). Each case is a Spark job, so the
  * differential runs few cases over rich corpora. */
class ShingleMeasuresPropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def shingleSet(text: String): Set[String] = {
    val w = text.split(" ")
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  /** A corpus with planted structure: a shared vocabulary small enough to
    * force overlap, docs drawn as (a) fresh word runs, (b) prefix excerpts
    * of an earlier doc, (c) an earlier doc plus a fresh tail. */
  private val genCorpus: Gen[List[String]] = for {
    n <- Gen.choose(4, 14)
    seeds <- Gen.listOfN(n, Gen.choose(0, 30))
    kinds <- Gen.listOfN(n, Gen.choose(0, 2))
    lens <- Gen.listOfN(n, Gen.choose(2, 18))
  } yield {
    val docs = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- 0 until n) {
      val fresh = (0 until lens(i)).map(j => s"w${(seeds(i) + j) % 31}").mkString(" ")
      val doc = (kinds(i), docs.length) match {
        case (1, k) if k > 0 => // prefix excerpt of an earlier doc
          val base = docs(seeds(i) % k).split(" ")
          base.take(math.max(3, base.length / 2)).mkString(" ")
        case (2, k) if k > 0 => // earlier doc + fresh tail
          docs(seeds(i) % k) + " " + fresh
        case _ => fresh
      }
      docs += doc
    }
    docs.toList
  }

  private def check(p: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  test("jaccard and containment equal the brute-force set models on " +
      "generated corpora (df-capped universe, every pair, every direction)") {
    import spark.implicits._
    val maxDf = 4 // binding on purpose: repetition across docs gets capped
    check(Prop.forAll(genCorpus) { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // model: df-capped shingle sets
      val sets0 = corpus.zipWithIndex.map { case (t, i) => i.toLong -> shingleSet(t) }
      val df = sets0.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      val sets = sets0.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }.toMap
      val jacModel = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a < b
        i = sa.intersect(sb).size
        if i > 0
        j = i.toDouble / sa.union(sb).size
        if j >= 0.5
      } yield (a, b, j)).toSet
      val contModel = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a != b
        i = sa.intersect(sb).size
        if i > 0 && sa.nonEmpty
        c = i.toDouble / sa.size
        if c >= 0.8
      } yield (a, b, c)).toSet
      val jacGot = Dedup.shingleJaccardOn(docs, maxDf = maxDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val contGot = Dedup.containmentOn(docs, maxDf = maxDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      Prop.propBoolean(jacGot == jacModel) :|
          s"jaccard got $jacGot model $jacModel" &&
        (Prop.propBoolean(contGot == contModel) :|
          s"containment got $contGot model $contModel")
    }, 12)
  }

  test("prefix-filtered branch equals the direct branch and the model " +
      "(directPairCap = 0 forces the prefix plan — r21 counted switch)") {
    import spark.implicits._
    val maxDf = 4
    check(Prop.forAll(genCorpus) { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def norm(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val jacDirect = norm(Dedup.shingleJaccardOn(docs, maxDf = maxDf,
        directPairCap = Long.MaxValue).collect())
      val jacPrefix = norm(Dedup.shingleJaccardOn(docs, maxDf = maxDf,
        directPairCap = 0L).collect())
      val contDirect = norm(Dedup.containmentOn(docs, maxDf = maxDf,
        directPairCap = Long.MaxValue).collect())
      val contPrefix = norm(Dedup.containmentOn(docs, maxDf = maxDf,
        directPairCap = 0L).collect())
      Prop.propBoolean(jacPrefix == jacDirect) :|
          s"jaccard prefix $jacPrefix direct $jacDirect" &&
        (Prop.propBoolean(contPrefix == contDirect) :|
          s"containment prefix $contPrefix direct $contDirect")
    }, 10)
  }
}
