package graft

import org.scalatest.funsuite.AnyFunSuite

/** `drift_token_psi` behavior on hand fixtures: identical hist/batch
  * distributions score near zero, and an injected token swap dominates
  * the ranking with a positive corpus total. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift")
    rows.map { case (id, text) => (id, text, "xx", "srcX", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    tmp.toString
  }

  test("no drift: identical distributions contribute ~zero") {
    // ids 0..9: 8 hist docs (id%10<8) and 2 batch docs, all 'a b c'
    val d = writeDocs((0L to 9L).map(i => i -> "a b c"))
    val rows = SparkEntry.queries("drift_token_psi")(spark, d).collect()
    val total = rows.head.getLong(6)
    // smoothing + milli rounding leave dust, but nothing resembling drift
    assert(math.abs(total) < 3000, s"self-drift PSI $total micro")
  }

  test("a swapped token dominates the drift ranking") {
    // batch slice replaces 'c' with 'z' — both ends of the swap drift
    val d = writeDocs((0L to 9L).map(i =>
      i -> (if (i % 10 >= 8) "a b z" else "a b c")))
    val rows = SparkEntry.queries("drift_token_psi")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(5), r.getLong(6)))
    val top2 = rows.take(2).map(_._1).toSet
    assert(top2 === Set("c", "z"), s"top drifted: ${rows.take(4).mkString(", ")}")
    assert(rows.head._3 > 0, "corpus total reflects the injected drift")
    // stable tokens contribute strictly less than the swapped pair
    val swapMin = rows.filter(r => top2(r._1)).map(_._2).min
    val stableMax = rows.filterNot(r => top2(r._1)).map(_._2).max
    assert(stableMax < swapMin, s"stable $stableMax vs swapped $swapMin")
  }
}
