package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Md5MinLanes expression vs the nested-HOF form it replaced in
  * the md5 LSH twins: bit-for-bit equality on real corpus shingle arrays
  * (the drop-in-plan-upgrade contract, the MinHashSigSpec discipline), plus
  * the edge shapes the fused loop must match `array_min` on. */
class Md5MinLanesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val Lanes = 8

  private def hofSig(sh: org.apache.spark.sql.Column) =
    transform(sequence(lit(0), lit(Lanes - 1)),
      k => array_min(transform(sh,
        s => md5(concat(k.cast("string"), lit(":"), s)))))

  private def shingleArrays = Tables.documents(spark, dir)
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .filter(size(col("w")) >= 3)
    .select(col("doc_id"), array_distinct(transform(
      sequence(lit(1), size(col("w")) - 2),
      i => concat_ws(" ",
        element_at(col("w"), i),
        element_at(col("w"), i + 1),
        element_at(col("w"), i + 2)))).as("sh"))

  test("native signature equals the nested-HOF md5 form bit for bit on the corpus") {
    val both = shingleArrays
      .select(col("doc_id"),
        graft.functions.Md5MinLanes.md5MinLanes(col("sh"), Lanes).as("a"),
        hofSig(col("sh")).as("b"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
  }

  test("edge shapes: empty array -> all-null lanes; null elements skipped " +
      "(array_min semantics); singleton array") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq[String](null, "a b c")),
      (3L, Seq("only one shingle"))
    ).toDF("id", "sh")
    val rows = df.select(col("id"),
        graft.functions.Md5MinLanes.md5MinLanes(col("sh"), Lanes).as("a"),
        hofSig(col("sh")).as("b"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"id ${r.getLong(0)}")
    }
    // the empty-array row really is all nulls (not an empty array)
    val empty = rows.find(_.getLong(0) == 1L).get
    assert(empty.getSeq[String](1).size === Lanes)
    assert(empty.getSeq[String](1).forall(_ == null))
  }

  test("signature build stays a scan-local projection (no exchange below it)") {
    val plan = shingleArrays
      .select(graft.functions.Md5MinLanes.md5MinLanes(col("sh"), Lanes))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"signature build must be scan-local:\n$plan")
  }

  test("lane count outside 1..MaxLanes fails analysis loud") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("x"))).toDF("sh")
    intercept[Exception] {
      df.select(graft.functions.Md5MinLanes.md5MinLanes(col("sh"), 0)).collect()
    }
    intercept[Exception] {
      df.select(graft.functions.Md5MinLanes.md5MinLanes(col("sh"),
        graft.functions.Md5MinLanes.MaxLanes + 1)).collect()
    }
  }
}
