package graft

import org.scalatest.funsuite.AnyFunSuite

/** `split_leakage_audit` on a constructed fixture: a verbatim copy of a
  * train document planted in the val slice must surface as exact leakage,
  * a near-verbatim variant as shingle leakage, and an unrelated val doc
  * must stay silent. Split membership is the same md5(doc_id) rule the
  * operator uses, recomputed here independently. */
class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def draw(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
  }
  private def splitOf(id: Long): String =
    if (draw(id) < "e6666666") "train"        // hexThreshold(0.90)
    else if (draw(id) < "f3333333") "val"     // hexThreshold(0.95)
    else "test"

  test("verbatim and near-verbatim train copies surface; clean docs stay silent") {
    import spark.implicits._
    val trainIds = (0L until 200L).filter(splitOf(_) == "train")
    val evalIds = (0L until 200L).filter(splitOf(_) != "train")
    assert(trainIds.size > 100 && evalIds.size >= 3, s"${evalIds.size} eval ids")

    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val leakedExact = evalIds(0)   // verbatim copy of a train doc
    val leakedNear = evalIds(1)    // one token changed: most shingles shared
    val clean = evalIds(2)         // disjoint vocabulary
    val docs =
      trainIds.take(5).map(id => (id, base)) ++
        Seq(
          (leakedExact, base),
          (leakedNear, base.replace("kappa", "lambda")),
          (clean, "uno dos tres cuatro cinco seis siete ocho nueve diez"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-leak")
    docs.map { case (id, t) => (id, t, "xx", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)

    val got = SparkEntry.queries("split_leakage_audit")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.contains(leakedExact), s"exact copy missed: $got")
    assert(got(leakedExact)._1 === 5L, "counts every verbatim train copy")
    assert(got(leakedExact)._3 === got(leakedExact)._2, "all shingles hit too")
    assert(got.contains(leakedNear), s"near copy missed: $got")
    assert(got(leakedNear)._1 === 0L, "near copy is not an exact leak")
    assert(got(leakedNear)._3 * 10 >= got(leakedNear)._2, "over threshold")
    assert(!got.contains(clean), s"clean doc flagged: $got")
  }
}
