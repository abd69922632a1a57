package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Second batch of analytic coverage: pivot, CUBE grouping sets, and exact
  * (discrete) percentiles. */
object Analytics {

  /** Pivot order counts: one row per priority, one column per status. The
    * pivot values are declared explicitly — at scale an implicit pivot would
    * first run a distinct scan to discover them. Counts coalesce to 0 to
    * match the conditional-aggregation oracle. */
  val pivotOrders: QueryDef = QueryDef.sql(
    "pivot_orders",
    """SELECT o_orderpriority,
      |       CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
      |       CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
      |       CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("status_f"),
        coalesce(col("O"), lit(0L)).as("status_o"),
        coalesce(col("P"), lit(0L)).as("status_p"))
      .orderBy("o_orderpriority")
  }

  /** UNPIVOT (melt) — the inverse relational operator to [[pivotOrders]]:
    * the wide per-priority status counts back to (priority, status, n)
    * long form via the native `unpivot` (an Expand node — ×|columns| row
    * amplification inside the same stage, no shuffle and no join; the
    * only exchange in the plan is the pivot aggregation's own). The
    * melted `status` values are the source column names, which both
    * engines agree on by construction. */
  val unpivotOrders: QueryDef = QueryDef.sql(
    "unpivot_orders",
    """WITH wide AS (SELECT o_orderpriority,
      |       SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS status_f,
      |       SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS status_o,
      |       SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS status_p
      |FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'status_f' AS status, CAST(status_f AS BIGINT) AS n FROM wide
      |UNION ALL
      |SELECT o_orderpriority, 'status_o', CAST(status_o AS BIGINT) FROM wide
      |UNION ALL
      |SELECT o_orderpriority, 'status_p', CAST(status_p AS BIGINT) FROM wide
      |ORDER BY o_orderpriority, status""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("status_f"),
        coalesce(col("O"), lit(0L)).as("status_o"),
        coalesce(col("P"), lit(0L)).as("status_p"))
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("status_f"), col("status_o"), col("status_p")),
        "status", "n")
      .orderBy("o_orderpriority", "status")
  }

  /** Full CUBE over (status, priority): every grouping-set combination,
    * null keys labeled 'ALL'. */
  val cubeOrders: QueryDef = QueryDef.sql(
    "cube_orders",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |       COALESCE(o_orderpriority, 'ALL') AS priority,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"))
      .orderBy("status", "priority")
  }

  /** Exact discrete percentiles of order value per status: percentile_disc
    * returns an actual element (no interpolation), so the integer-cents
    * value hashes identically in both engines. */
  val percentilesByStatus: QueryDef = QueryDef.sql(
    "percentiles_by_status",
    """WITH o AS (SELECT o_orderstatus, CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents FROM orders)
      |SELECT o_orderstatus,
      |       CAST(quantile_disc(cents, 0.25) AS BIGINT) AS p25_cents,
      |       CAST(quantile_disc(cents, 0.5)  AS BIGINT) AS p50_cents,
      |       CAST(quantile_disc(cents, 0.95) AS BIGINT) AS p95_cents
      |FROM o GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderstatus"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)").cast("long").as("p25_cents"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").cast("long").as("p50_cents"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)").cast("long").as("p95_cents"))
      .orderBy("o_orderstatus")
  }

  /** Explicit GROUPING SETS (neither rollup nor cube): per-status and
    * per-priority totals in one pass. The DataFrame API only exposes
    * rollup/cube, so this runs through spark.sql — one aggregation with a
    * 2-way Expand, identical text in both engines. */
  val groupingSetsOrders: QueryDef = {
    val sql =
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin
    QueryDef.sql("grouping_sets_orders", sql) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  val all: Seq[QueryDef] = Seq(pivotOrders, unpivotOrders, cubeOrders,
    percentilesByStatus, groupingSetsOrders)
}
