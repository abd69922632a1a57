package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DotProductFusion: the HOF dot-product pattern rewrites to the native
  * expression, non-matching shapes are left alone, and the rewrite is
  * value-preserving (bit-exact, since DotProduct IS the HOF's fold). */
class DotProductFusionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)")

  private def withRule[T](f: => T): T = {
    GraftExtensions.register(spark) // installs the experimental optimization
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == graft.plans.DotProductFusion)
  }

  test("HOF dot product fuses to graft_dot and keeps bit-exact values") {
    import spark.implicits._
    // Seq[Double] encodes as array<double> containsNull=false — eligible
    val df = Seq(
      (Seq(1.5, -2.25, 3.125), Seq(0.5, 4.0, -1.0)),
      (Seq(0.1, 0.2, 0.3), Seq(0.9, 0.8, 0.7))).toDF("a", "b")
    val unfused = df.select(hofDot.as("d")).collect().map(_.getDouble(0))
    val (fused, plan) = withRule {
      val q = df.select(hofDot.as("d"))
      (q.collect().map(_.getDouble(0)), q.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("graft_dot"), s"pattern must fuse:\n$plan")
    assert(!plan.contains("aggregate("), s"HOF must be gone:\n$plan")
    assert(fused.toSeq === unfused.toSeq, "rewrite must be value-preserving")
  }

  test("non-matching shapes are left alone") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val wrongZero = expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1.0d, (acc, v) -> acc + v)")
    val sumNotProduct = expr(
      "aggregate(zip_with(a, b, (x, y) -> x + y), 0.0d, (acc, v) -> acc + v)")
    withRule {
      for ((e, label) <- Seq((wrongZero, "non-zero seed"), (sumNotProduct, "non-product zip"))) {
        val plan = df.select(e.as("d")).queryExecution.optimizedPlan.toString
        assert(!plan.contains("graft_dot"), s"$label must not fuse:\n$plan")
      }
    }
  }

  test("nullable-element arrays are not fused (null semantics differ)") {
    import spark.implicits._
    // Option[Double] elements → containsNull=true → rule must stay out,
    // because a null element nulls the HOF result but not the fused loop
    val df = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0))))
      .toDF("a", "b")
    withRule {
      val q = df.select(hofDot.as("d"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_dot"), s"nullable elements must not fuse:\n$plan")
      assert(q.collect().head.isNullAt(0), "null element must null the result")
    }
  }
}
