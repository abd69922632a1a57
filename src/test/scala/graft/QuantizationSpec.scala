package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextAnalysis}

/** Int8 quantization invariants (beyond the DuckDB oracle's value parity)
  * and PII-scrub completeness — the properties that make these operators
  * trustworthy, not just reproducible. */
class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("int8 quantization: error bounded by scale/2, max element saturates, cosine loss tiny") {
    val rows = Similarity.quantizeInt8.run(spark, dir)
      .select("vec_id", "scale", "n_sat", "max_err_micro", "cos_loss_nano")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, nSat, maxErr, cosLoss) =
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // rounding to the nearest code can miss by at most half a step
      assert(maxErr <= math.ceil(1e6 * scale / 2).toLong + 1,
        s"vec ${r.getLong(0)}: err $maxErr exceeds scale/2 bound for scale $scale")
      assert(nSat >= 1, s"vec ${r.getLong(0)}: the max-abs element must hit ±127")
      assert(cosLoss >= 0 && cosLoss < 1000000L, // cosine within 1e-3 of exact
        s"vec ${r.getLong(0)}: cos loss $cosLoss nano out of range")
    }
  }

  test("int8 kNN serves from the compressed store with high recall vs exact") {
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topSets(Similarity.knnBruteForce.run(spark, dir))
    val int8 = topSets(Similarity.knnInt8.run(spark, dir))
    assert(int8.keySet === exact.keySet)
    val recall = exact.map { case (q, e) => int8(q).intersect(e).size.toDouble / e.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.9, s"mean recall@5 $mean below 0.9 — quantization too lossy")
  }

  test("PII scrub leaves no residual matches and redacts every counted span") {
    val rows = TextAnalysis.piiScrub.run(spark, dir).collect()
    val res = Seq(TextAnalysis.EmailRe, TextAnalysis.Ipv4Re, TextAnalysis.PhoneRe)
      .map(_.r)
    rows.foreach { r =>
      val (id, nEmail, nIp, nPhone, scrubbed) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      res.foreach(re => assert(re.findFirstIn(scrubbed).isEmpty,
        s"doc $id: residual PII in: $scrubbed"))
      // one span per residue class, none for the clean class — and each
      // counted span must surface as its redaction token
      val expected = (id % 4) match {
        case 0 => (1L, 0L, 0L); case 1 => (0L, 0L, 1L)
        case 2 => (0L, 1L, 0L); case _ => (0L, 0L, 0L)
      }
      assert((nEmail, nIp, nPhone) === expected, s"doc $id counts")
      assert(scrubbed.contains("<email>") === (nEmail > 0), s"doc $id email token")
      assert(scrubbed.contains("<ip>") === (nIp > 0), s"doc $id ip token")
      assert(scrubbed.contains("<phone>") === (nPhone > 0), s"doc $id phone token")
    }
  }
}
