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

  private def model(sids: Seq[Long], numHashes: Int): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (0 until numHashes).map { k =>
      val seed = XXH64.hashInt(k, 42L)
      if (sids.isEmpty) Long.MaxValue
      else sids.map(s => XXH64.hashLong(s, seed) & Long.MaxValue).min
    }
  }

  private def exprSig(sids: Seq[Long], numHashes: Int): Seq[Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Seq(Tuple1(sids)).toDF("sids")
      .select(graft.functions.MinHashSig.minHashSig(col("sids"), numHashes).as("sig"))
      .head.getSeq[Long](0)
  }

  test("properties: model equality, order invariance, and union = elementwise min") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genSids = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    val p = Prop.forAll(genSids, genSids) { (a: List[Long], b: List[Long]) =>
      val sa = exprSig(a, 8)
      // the expression equals the direct model
      sa == model(a, 8) &&
      // a signature is a SET function: element order cannot matter
      exprSig(scala.util.Random.shuffle(a), 8) == sa && {
        // mergeability: sig(A ∪ B) = elementwise min(sig A, sig B) — the law
        // that lets an incremental pipeline maintain signatures by merging
        val sb = exprSig(b, 8)
        exprSig(a ++ b, 8) == sa.zip(sb).map { case (x, y) => math.min(x, y) }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
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
