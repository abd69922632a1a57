package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData

/** Chunking semantics: window/stride starts, short tail kept, full token
  * coverage with W−S overlap, and the cross-doc duplicate-chunk count. */
class ChunkWindowsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("window starts, tail, coverage, and duplicate counting") {
    import spark.implicits._
    val w50 = (1 to 50).map(i => s"t$i").mkString(" ")
    // doc 2's first window (t1..t32) is exactly doc 1's first window
    val w56 = (1 to 56).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, w50), (2L, w56))
      .map { case (id, t) => (id, t, "xx", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunk")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val rows = TrainingData.chunkWindows.run(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // 50 tokens, W=32, S=24: starts 0, 24, 48 with lengths 32, 26, 2
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ===
      Seq((0L, 0L, 32L), (1L, 24L, 26L), (2L, 48L, 2L)), s"d1 $d1")
    // full coverage with W−S-token overlap between consecutive full windows
    val covered = d1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered === (0L until 50L).toSet, "every token lands in ≥1 chunk")
    // doc 2's first window is exactly doc 1's: that hash counts 2 copies
    val d2 = rows.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.map(c => (c._2, c._3, c._4)).toSeq ===
      Seq((0L, 0L, 32L), (1L, 24L, 32L), (2L, 48L, 8L)), s"d2 $d2")
    assert(d2.head._5 === d1.head._5, "identical chunk text hashes equal")
    assert(d2.head._6 === 2L && d1.head._6 === 2L,
      s"corpus-wide copy count: ${d1.head._6}/${d2.head._6}")
    assert((d1.tail ++ d2.tail).forall(_._6 === 1L),
      "overlapping-but-different windows stay singletons")
  }
}
