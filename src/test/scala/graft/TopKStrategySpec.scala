package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerGroup

/** The injected SparkStrategy end to end: plan shape (custom exec present;
  * no Sort, no Window; the one clustered exchange survives) and
  * value-identity with the window row_number form it replaces.
  *
  * All cases run over parquet-backed relations — over a local Seq,
  * ConvertToLocalRelation folds projections before user rules/strategies
  * matter and the assertion would be vacuous (same trap note as
  * DotProductFusionSpec). */
class TopKStrategySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Parquet-backed (group, score, tie) rows with real duplicate scores
    * (quantity has few distinct values → heavy ties per flag). */
  private def scored = {
    GraftExtensions.register(spark)
    Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("grp"),
      col("l_quantity").cast("double").as("score"),
      col("l_orderkey").as("tie"))
  }

  test("plans through the strategy: exec node, clustered exchange, no Sort/Window") {
    val df = TopKPerGroup(scored, Seq(col("grp")), col("score"), col("tie"), 7)
    df.collect() // finalize any adaptive planning before reading the plan
    val plan = df.queryExecution.executedPlan.toString
    // "TopKPerGroup" is a substring of "TopKPerGroupPartial": detect the
    // FINAL node as an occurrence not followed by "Partial"
    assert("TopKPerGroup(?!Partial)".r.findFirstIn(plan).isDefined,
      s"final exec missing:\n$plan")
    assert(plan.contains("TopKPerGroupPartial"),
      s"map-side partial phase must plan below the exchange:\n$plan")
    assert(plan.contains("hashpartitioning(grp"),
      s"group clustering must come from the declared distribution:\n$plan")
    assert(!plan.contains("Sort"), s"top-k must not pay a sort:\n$plan")
    assert(!plan.contains("Window"), s"top-k must not pay a window:\n$plan")
  }

  test("value-identity with the window row_number form, duplicate scores included") {
    import org.apache.spark.sql.expressions.Window
    val k = 7
    val viaStrategy = TopKPerGroup(scored, Seq(col("grp")), col("score"), col("tie"), k)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("tie"))
    val viaWindow = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaStrategy === viaWindow)
    assert(viaStrategy.nonEmpty)
    // the fixture really exercises tie-breaking
    val tied = viaWindow.groupBy(t => (t._1, t._2)).values.count(_.size > 1)
    assert(tied > 0, "fixture must contain duplicate scores within a group")
  }

  test("partial-phase flush keeps correctness when groups exceed the cap") {
    // drive the flush path directly: tiny cap (10), ~150 groups per
    // partition — multiple flushes per task, output must still reduce to
    // exact per-group top-k
    val k = 2
    val grouped = scored // 3 base groups; synthesize many via modulo
      .withColumn("grp", concat(col("grp"), (col("tie") % 50).cast("string")))
    sys.props("graft.topk.maxPartialGroups") = "10"
    try {
      val viaStrategy = TopKPerGroup(grouped, Seq(col("grp")), col("score"), col("tie"), k)
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("tie"))
      val viaWindow = grouped.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      assert(viaStrategy === viaWindow)
      assert(viaWindow.size > 100, "fixture must have enough groups to force flushes")
    } finally sys.props -= "graft.topk.maxPartialGroups"
  }

  test("NaN scores agree with the window form (ordered above every value)") {
    import org.apache.spark.sql.expressions.Window
    // 0/0 cosines surface as NaN in real retrieval pipelines; Spark's sort
    // ranks NaN above all doubles, and the heap must do the same whether
    // the NaN arrives before or after the heap fills
    val withNaN = scored.withColumn("score",
      when(col("tie") % 11 === 0, lit(Double.NaN)).otherwise(col("score")))
    val k = 5
    val viaStrategy = TopKPerGroup(withNaN, Seq(col("grp")), col("score"), col("tie"), k)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("tie"))
    val viaWindow = withNaN.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(viaStrategy === viaWindow)
    assert(viaWindow.nonEmpty)
  }

  test("respects k per group and drops null scores") {
    val withNulls = scored
      .withColumn("score", when(col("tie") % 3 === 0, lit(null)).otherwise(col("score")))
    val got = TopKPerGroup(withNulls, Seq(col("grp")), col("score"), col("tie"), 4)
      .collect()
    assert(got.forall(!_.isNullAt(1)), "null scores are non-candidates")
    val perGroup = got.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perGroup.values.forall(_ <= 4))
    assert(perGroup.values.exists(_ === 4), "populous groups must fill k")
  }
}
