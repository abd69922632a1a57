package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.model.OrderedUpdateEvent
import graft.operators.{InventoryFold, InventoryParity}
import graft.streaming.{InventoryStream, Scd2Interval}

/** Batch ≡ stream identity for the SCD2 temporal table: the REAL events
  * table replayed through MemoryStream micro-batches (split by event
  * order, the changelog-offset contract) reconstructs EXACTLY the oracled
  * batch `inventory_scd2` result — closed intervals as append-only facts,
  * the open interval as a last-write-wins upsert per key. */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("micro-batched replay of the real events table reconstructs the " +
      "batch SCD2 table row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col

    val events = InventoryFold.asUpdateEvents(Tables.events(spark, d))
      .select(col("product_code").as("productCode"),
        col("event_order").as("eventOrder"), col("action"), col("delta"))
      .as[OrderedUpdateEvent].collect().sortBy(_.eventOrder)
    assert(events.nonEmpty)
    // three batches split on global event order — per-key order is
    // monotone across batches, the changelog-offset contract
    val batches = events.grouped(math.max(1, (events.length + 2) / 3)).toSeq

    val emitted = mutable.ArrayBuffer.empty[(Long, Scd2Interval)]
    val input = MemoryStream[OrderedUpdateEvent]
    val query = InventoryStream.scd2Stream(input.toDS())
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Scd2Interval], bid: Long) =>
        val rows = batch.collect()
        emitted.synchronized { emitted ++= rows.map(bid -> _) }
        ()
      }
      .start()
    try {
      batches.foreach { b => input.addData(b.toSeq); query.processAllAvailable() }
    } finally query.stop()

    // reconstruct: closed intervals append; the current row per key is the
    // LAST emitted (update-mode upsert, a compacted-topic reader's view)
    val ordered = emitted.synchronized { emitted.sortBy(_._1).map(_._2).toSeq }
    val closed = ordered.filter(!_.isCurrent)
    assert(closed.distinct.size === closed.size,
      "closed intervals are emitted exactly once — append-only facts")
    val currents = ordered.filter(_.isCurrent)
      .foldLeft(Map.empty[String, Scd2Interval])((m, r) => m + (r.productCode -> r))
    val streamed = (closed ++ currents.values)
      .map(r => (r.productCode, r.validFrom, r.validTo, r.invCount, r.isCurrent))
      .toSet

    val batch = InventoryParity.scd2.run(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(streamed === batch,
      s"stream-batch diff: extra=${(streamed -- batch).take(3)} " +
        s"missing=${(batch -- streamed).take(3)}")
  }
}
