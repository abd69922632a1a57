package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` over longs with a HARD buffer bound: the group's buffer
  * stops growing at `cap + 1` elements, so a pathological hot key (a
  * boilerplate shingle shared by millions of documents at 100 TB) costs
  * O(cap) aggregation memory instead of building a multi-GB list that a
  * downstream `size(...) <= cap` filter would only then discard — the df
  * cap applied DURING the build, not after it (the r18-ADVICE
  * "guard bounds the fan-out only indirectly" lesson, applied to the
  * posting-list restructure's one unbounded spot).
  *
  * Contract: for groups with at most `cap` input rows the result is the
  * COMPLETE sorted list — bit-identical to
  * `sort_array(collect_list(child))` regardless of partitioning (merges
  * concatenate and the final sort normalizes order). For saturated groups
  * (> cap rows) the result is SOME (cap + 1)-element subset in sorted
  * order: only its SIZE is meaningful, callers must drop those groups
  * with `size(ds) <= cap` — which is exactly the df-cap filter the
  * posting-list consumers already apply. Nulls are skipped (collect_list
  * semantics). */
case class SaturatingCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if cap > 0 => TypeCheckResult.TypeCheckSuccess
    case LongType =>
      TypeCheckResult.TypeCheckFailure(s"cap must be positive, got $cap")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_sat_collect needs bigint, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sat_collect"

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    // small initial capacity: most keys hold a handful of postings; the
    // buffer can only ever grow to cap + 1
    new ArrayBuffer[Long](8)

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (buf.length <= cap && i < other.length) {
      buf += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    val a = buf.toArray
    java.util.Arrays.sort(a)
    UnsafeArrayData.fromPrimitiveArray(a)
  }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) buf += bb.getLong
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SaturatingCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SaturatingCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SaturatingCollectLong =
    copy(child = newChild)
}

object SaturatingCollectLong {
  /** Column API: bounded sorted posting list of a bigint column. */
  def satCollect(c: Column, cap: Int): Column =
    GraftBridge.column(
      SaturatingCollectLong(GraftBridge.expression(c), cap).toAggregateExpression())
}
