package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InventoryFold, InventoryParity}

/** `inventory_scd2` semantics beyond the DuckDB oracle: (1) the interval
  * set TILES each key's history (strictly increasing, end = next start,
  * one open interval closed by the Long.MaxValue sentinel); (2) every
  * interval's state equals a by-hand incremental replay of the reference
  * INC/DEC/REP fold; (3) the final interval per key equals
  * `inventory_fold`'s state — the changelog row and its temporal
  * materialization agree by construction. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def history() = InventoryParity.scd2.run(spark, d).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getBoolean(4)))

  test("intervals tile each key's history with one sentinel-closed " +
      "open interval") {
    val byKey = history().groupBy(_._1)
    assert(byKey.nonEmpty)
    for ((k, rows) <- byKey) {
      val ordered = rows.sortBy(_._2).toSeq
      assert(ordered.map(_._2) === ordered.map(_._2).sorted.distinct,
        s"strictly increasing valid_from for $k")
      for (Seq(a, b) <- ordered.sliding(2) if ordered.length > 1)
        assert(a._3 === b._2, s"interval end meets next start for $k")
      assert(ordered.last._3 === Long.MaxValue,
        s"open interval closed by the sentinel for $k")
      assert(ordered.count(_._5) === 1 && ordered.last._5,
        s"exactly the last interval is current for $k")
    }
  }

  test("every interval's state equals the incremental reference fold, " +
      "and the final interval equals inventory_fold") {
    import org.apache.spark.sql.functions.col
    val events = InventoryFold.asUpdateEvents(Tables.events(spark, d))
      .select(col("product_code"), col("event_order"), col("action"),
        col("delta"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      var state = 0L
      es.sortBy(_._2).toSeq.map { case (_, ord, action, delta) =>
        state = action match {
          case "INC" => state + delta
          case "DEC" => state - delta
          case "REP" => delta.toLong
        }
        (k, ord) -> state
      }
    }.toMap
    val got = history()
    assert(got.length === events.length, "one interval per event")
    for ((k, from, _, count, _) <- got)
      assert(expected((k, from)) === count,
        s"replayed state at ($k, $from)")
    val finalFold = InventoryFold.query(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, rows) <- got.groupBy(_._1))
      assert(rows.maxBy(_._2)._4 === finalFold(k),
        s"final interval equals the fold for $k")
  }
}
