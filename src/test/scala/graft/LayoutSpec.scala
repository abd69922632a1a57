package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Pins the Z-order layout's pruning claim against a Scala model of the
  * Morton interleave, and the punchline the audit query exists for: under
  * a 2-D range predicate, z-bucketed "files" are opened strictly less
  * often than lexicographically-bucketed ones on the same rows (the
  * lexico layout keeps x tight but every bucket spans the full y range). */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def mortonModel(x: Long, y: Long): Long =
    (0 until Layout.Bits).map { j =>
      (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))
    }.reduce(_ | _)

  test("zValue column expression matches the bit-interleave model") {
    import spark.implicits._
    val xs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (899L, 2467L), (12345L, 54321L))
    val got = xs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === mortonModel(x, y), s"($x,$y)") }
    // spot-pin the canonical small values: interleave(1,0)=1, interleave(0,1)=2
    assert(mortonModel(1, 0) === 1L && mortonModel(0, 1) === 2L)
  }

  test("2-D predicate opens fewer z-order buckets than lexico buckets") {
    // uniform grid: every (custkey mod, day) cell occupied, so bucket
    // bounding boxes reflect layout geometry, not data accidents
    import spark.implicits._
    val orders = (0 until 65536).map { i =>
      (i.toLong % 256, java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i / 256)))
    }.toDF("o_custkey", "o_orderdate")
    val byLayout = Layout.audit(orders)
      .groupBy("layout")
      .agg(sum("hit").as("opened"), count(lit(1)).as("buckets"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val (zOpened, zBuckets) = byLayout("zorder")
    val (lOpened, lBuckets) = byLayout("lexico")
    assert(zOpened < lOpened,
      s"z-order should prune harder: z=$zOpened/$zBuckets lexico=$lOpened/$lBuckets")
    // and pruning must actually bind — the rectangle cannot open everything
    assert(zOpened < zBuckets)
  }
}
