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

  test("Hilbert index is a continuous bijection; Morton teleports") {
    import graft.functions.HilbertCurve.xy2d
    val bits = 4
    val n = 1 << bits
    val cell = (0 until n).flatMap(x => (0 until n).map(y =>
      xy2d(bits, x, y) -> ((x, y)))).toMap
    assert(cell.size === n * n, "xy2d must be a bijection on the grid")
    for (d <- 0 until n * n - 1) {
      val (x0, y0) = cell(d); val (x1, y1) = cell(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1,
        s"Hilbert step $d -> ${d + 1} is not grid-adjacent: ($x0,$y0)->($x1,$y1)")
    }
    // the property Z-order lacks: Morton d=1 is (1,0), d=2 is (0,1) —
    // a diagonal teleport, which is what widens unaligned-run boxes
    assert(mortonModel(1, 0) === 1L && mortonModel(0, 1) === 2L)
  }

  test("row-count-cut files: Hilbert opens fewer than Z, Z fewer than lexico") {
    import spark.implicits._
    val orders = (0 until 65536).map { i =>
      (i.toLong % 256, java.sql.Date.valueOf(java.time.LocalDate.of(1992, 1, 1).plusDays(i / 256)))
    }.toDF("o_custkey", "o_orderdate")
    val byLayout = Layout.hilbertAuditDf(orders)
      .groupBy("layout")
      .agg(sum("hit").as("opened"), count(lit(1)).as("buckets"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val (hOpened, hBuckets) = byLayout("hilbert")
    val (zOpened, _) = byLayout("zorder")
    val (lOpened, _) = byLayout("lexico")
    // the full-grid model numbers in the scaladoc: 14 < 18 < 28
    assert(hOpened === 14L && zOpened === 18L && lOpened === 28L,
      s"h=$hOpened z=$zOpened l=$lOpened")
    assert(hOpened < hBuckets)
  }

  test("hilbert key expression stays inside whole-stage codegen") {
    import spark.implicits._
    val plan = spark.range(100)
      .select(col("id").as("x"), (col("id") * 3 % 256).as("y"))
      .select(graft.functions.LayoutFunctions.hilbertD(col("x"), col("y"), 8))
      .queryExecution.executedPlan.toString
    // the `*(n)` star prefix marks a WholeStageCodegen subtree
    assert("""\*\(\d+\) Project \[graft_hilbert_d""".r.findFirstIn(plan).isDefined,
      s"fell out of codegen:\n$plan")
  }
}
