package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Full MinHash signature of a shingle-id set as ONE native expression:
  * array<long> sids → array<long> of `numHashes` minima, where hash family
  * member k is `xxhash64(k, sid) & Long.MaxValue` — BIT-IDENTICAL to the
  * composable aggregation form `min(xxhash64(lit(k), col("sid")))` ×64
  * (Spark's XxHash64 folds children as hashInt(k, 42) → hashLong(sid, ·),
  * which is exactly the seed precomputation + per-sid hashLong below;
  * MinHashSigSpec pins the equality).
  *
  * Why an expression and not the aggregate: the signature becomes a
  * per-ROW projection over the doc's shingle array — no explode, no
  * groupBy, no exchange. At 100 TB that turns signature build from a
  * corpus-wide aggregation into scan-local work that pipelines straight
  * into band hashing; only band buckets ever shuffle. The generated code
  * is one fused nested loop (sids × hashes) with the seed table hoisted
  * into a reference object, inside whole-stage codegen.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"numHashes must be positive, got $numHashes")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash needs array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  /** seeds(k) = xxhash64's fold state after its first child (int literal k,
    * default seed 42) — hoisted so the inner loop is one hashLong per
    * (sid, k). */
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(k => XXH64.hashInt(k, 42L))

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = a.numElements()
    var j = 0
    while (j < n) {
      val sid = a.getLong(j)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashLong(sid, seeds(k)) & Long.MaxValue
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val sid = ctx.freshName("sid")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $sid = $a.getLong($j);
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $h = $xxh.hashLong($sid, $seedsRef[$k]) & Long.MAX_VALUE;
         |    if ($h < $mins[$k]) $mins[$k] = $h;
         |  }
         |}
         |${ev.value} = ${classOf[UnsafeArrayData].getName}.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Column API: minhash signature of an array<long> shingle-id column. */
  def minHashSig(sids: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(sids), numHashes))
}
