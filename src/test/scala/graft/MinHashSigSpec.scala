package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MinHashLSH

/** The native MinHashSig expression vs the composable aggregate form: the
  * two must agree bit for bit (the whole point of the expression is being a
  * drop-in plan upgrade), and the native signature build must plan as a
  * pure projection — no exchange anywhere below the signature columns. */
class MinHashSigSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("native signature equals the 64-aggregate form bit for bit") {
    val docs = Tables.documents(spark, dir)
    val native = MinHashLSH.signatures(docs).collect()
      .map(r => r.getLong(0) -> (1 to MinHashLSH.NumHashes).map(r.getLong).toSeq).toMap
    val agg = MinHashLSH.signaturesAgg(docs).collect()
      .map(r => r.getLong(0) -> (1 to MinHashLSH.NumHashes).map(r.getLong).toSeq).toMap
    assert(native.keySet === agg.keySet)
    assert(native.nonEmpty)
    native.foreach { case (id, sig) => assert(sig === agg(id), s"doc $id") }
  }

  test("native signature build plans with zero hash exchanges") {
    val sigs = MinHashLSH.signatures(Tables.documents(spark, dir))
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"signature build must be scan-local:\n$plan")
  }

  test("graft_minhash is callable from SQL and matches the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, Seq(7L, 42L, 99L))).toDF("id", "sids").createOrReplaceTempView("mh_in")
    val sql = spark.sql("SELECT graft_minhash(sids, 8) AS sig FROM mh_in")
      .head.getSeq[Long](0)
    val api = Seq((1L, Seq(7L, 42L, 99L))).toDF("id", "sids")
      .select(graft.functions.MinHashSig.minHashSig(col("sids"), 8).as("sig"))
      .head.getSeq[Long](0)
    assert(sql === api)
    assert(sql.length === 8)
    // spot-check one lane against the aggregate formula
    val lane0 = Seq(7L, 42L, 99L)
      .map(s => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(s,
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(0, 42L)) & Long.MaxValue).min
    assert(sql.head === lane0)
  }
}
