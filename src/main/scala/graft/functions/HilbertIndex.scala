package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index for 2-D layout clustering ([[graft.operators.Layout]]):
  * unlike the Morton/Z interleave, consecutive Hilbert indices are always
  * GRID-ADJACENT cells (no diagonal jumps across the space), which is why
  * Hilbert-clustered files get tighter bounding boxes than Z-clustered
  * ones under range predicates — the published reason lakehouse clustering
  * implementations moved from Z-order to Hilbert curves. */
object HilbertCurve {

  /** (x, y) → d on a 2^bits × 2^bits grid — the classic iterative
    * rotate-and-accumulate conversion (public-domain algorithm, as given
    * on Wikipedia "Hilbert curve", "Programs for encoding"): walk square
    * sizes s from the top bit down, accumulate the quadrant's share
    * s²·((3·rx) xor ry), and rotate/reflect the frame for the recursion. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The same conversion as a mechanically UNROLLED SQL CTE chain (for
    * the DuckDB oracle): step i rewrites (x, y, d) for s = 2^(bits-1-i).
    * `src` is the CTE holding columns x, y (plus carried columns, listed
    * in `carry`); returns (cteChainSql, finalCteName) where the final CTE
    * exposes carried columns plus `hd`. */
  def unrolledSqlCtes(bits: Int, src: String, carry: Seq[String]): (String, String) = {
    val keep = carry.mkString(", ")
    val steps = (0 until bits).map { i =>
      val k = bits - 1 - i
      val s = 1L << k
      val rx = s"((x >> $k) & 1)"
      val ry = s"((y >> $k) & 1)"
      val prev = if (i == 0) src else s"h$i"
      val dExpr = if (i == 0) s"${s * s} * xor(3 * $rx, $ry) AS d"
        else s"d + ${s * s} * xor(3 * $rx, $ry) AS d"
      s"""h${i + 1} AS (SELECT $keep,
         |  $dExpr,
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - y ELSE y END) ELSE x END AS x,
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - x ELSE x END) ELSE y END AS y
         |FROM $prev)""".stripMargin
    }
    val fin = s"hfin AS (SELECT $keep, d AS hd FROM h$bits)"
    ((steps :+ fin).mkString(",\n"), "hfin")
  }
}

/** `graft_hilbert_d(x, y)`: [[HilbertCurve.xy2d]] as a codegen'd binary
  * expression — one static call inside the generated projection, so the
  * layout key costs the same as the Z interleave's shift/mask tree and
  * never breaks whole-stage codegen. */
case class HilbertD(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_d"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertCurve.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HilbertCurve.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutFunctions {
  /** Column API for [[HilbertD]]. Operands are cast to LongType so the
    * Hilbert clustered writer accepts the same integral inputs as the
    * Z-order twin (whose shift/mask tree widens implicitly) — the two
    * `ParquetSink` clustered-write entry points share one input
    * contract. */
  def hilbertD(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(HilbertD(
      GraftBridge.expression(x.cast("long")),
      GraftBridge.expression(y.cast("long")), bits))
}
