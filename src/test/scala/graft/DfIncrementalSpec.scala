package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** `text_df_incremental`: the merged store must equal a from-scratch
  * recompute over the whole corpus (the defining property of incremental
  * maintenance), and the merge plan must scan the bucketed history store in
  * place — only the batch side shuffles. */
class DfIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("merged df equals a full-corpus recompute, term by term") {
    val got = SparkEntry.queries("text_df_incremental")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, dir)
    def dfMap(part: org.apache.spark.sql.DataFrame): Map[String, Long] = part
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .distinct().groupBy("w").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hist = dfMap(docs.filter(col("doc_id") % 10 < 8))
    val batch = dfMap(docs.filter(col("doc_id") % 10 >= 8))
    val terms = hist.keySet ++ batch.keySet
    assert(got.keySet === terms)
    for (t <- terms) {
      val (h, b, tot) = got(t)
      assert(h === hist.getOrElse(t, 0L), s"hist df of '$t'")
      assert(b === batch.getOrElse(t, 0L), s"batch df of '$t'")
      assert(tot === h + b, s"total df of '$t'")
    }
  }

  test("merge scans the bucketed store in place: only the batch shuffles") {
    val out = SparkEntry.queries("text_df_incremental")(spark, dir)
    out.collect() // let AQE finalize before inspecting
    val root = out.queryExecution.executedPlan
    val plan = root.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(root).toString
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // exactly two, both on the batch side: the distinct on (doc_id, w) and
    // the df groupBy on w — whose partitioning the bucketed store matches,
    // so zero exchanges serve the full-outer merge itself
    assert(hashExchanges === 2, s"store side must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"), s"store scan must be bucketed:\n$plan")
  }
}
