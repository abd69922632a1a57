package graft

import org.scalatest.funsuite.AnyFunSuite

/** `split_group_holdout`: the zero-leakage invariant (a group never
  * straddles splits), the deliberate contrast with the doc-keyed split
  * (which DOES strand re-crawls of one page on both sides), and sane
  * group-level proportions. */
class GroupSplitSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("no group straddles splits; the doc-keyed split does; ratios sane") {
    val rows = SparkEntry.queries("split_group_holdout")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length === 500)
    val byGroup = rows.groupBy(_._2).map { case (g, rs) => g -> rs.map(_._3).toSet }
    assert(byGroup.values.forall(_.size === 1),
      s"leak: ${byGroup.filter(_._2.size > 1).keys.take(3)}")
    // the doc-keyed 90/5/5 split strands the same canonical groups across
    // splits — the failure mode this operator exists to prevent
    def docSplit(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      if (h < graft.operators.ApproxAndSample.hexThreshold(0.90)) "train"
      else if (h < graft.operators.ApproxAndSample.hexThreshold(0.95)) "val"
      else "test"
    }
    val docLeaky = rows.groupBy(_._2)
      .exists { case (_, rs) => rs.map(r => docSplit(r._1)).toSet.size > 1 }
    assert(docLeaky, "fixture must contain groups the doc split would strand")
    // group-level proportions: ~90/5/5 with small-n slack (50 page groups)
    val groupSplits = byGroup.values.map(_.head).toSeq
    val train = groupSplits.count(_ == "train").toDouble / groupSplits.size
    assert(train > 0.7 && train < 1.0, s"train share $train")
  }
}
