package graft

import org.scalatest.funsuite.AnyFunSuite

/** `quality_ensemble` cross-checked leg by leg against the three
  * already-oracled queries it composes: nb_pass must equal membership in
  * `curation_classifier_filter`'s kept set, ppl_pass must equal the
  * at-or-below-median rule over `text_lm_perplexity`'s scores, keep must
  * be the majority — and the ensemble must differ from serial stacking
  * (some kept document loses one vote), or it wouldn't be worth running. */
class EnsembleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("votes agree with the standalone legs; majority is not a veto") {
    val rows = SparkEntry.queries("quality_ensemble")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap

    val nbKept = SparkEntry.queries("curation_classifier_filter")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ppl = SparkEntry.queries("text_lm_perplexity")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sorted = ppl.values.toSeq.sorted
    val med = sorted((sorted.size - 1) / 2) // lower median, rank (n+1)/2

    for ((id, (heur, pplPass, nbPass, votes, keep)) <- rows) {
      assert(nbPass === (if (nbKept(id)) 1L else 0L), s"nb vote drifted for $id")
      val expectPpl = if (ppl.get(id).exists(_ <= med)) 1L else 0L
      assert(pplPass === expectPpl, s"ppl vote drifted for $id (med=$med)")
      assert(votes === heur + pplPass + nbPass)
      assert(keep === (if (votes >= 2) 1L else 0L))
    }
    // the ensemble's reason to exist: majority keeps docs a veto would drop
    val savedByMajority = rows.values.count(v => v._5 == 1L && v._4 == 2L)
    assert(savedByMajority > 0, "no 2-of-3 keeps — ensemble degenerates to veto")
    // and it is not vacuous in the other direction either
    assert(rows.values.exists(_._5 == 0L), "nothing dropped at sf0.001")
  }
}
