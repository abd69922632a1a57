package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Temporal operators Spark has no single built-in for, expressed in their
  * scalable composable forms:
  *
  *  - **as-of join** (each event matched to the latest order at or before its
  *    timestamp, per key): union-tag + last-non-null carry-forward window.
  *    One shuffle-sort on (key, time) regardless of time-range skew — unlike
  *    a range-condition join, which explodes on wide time ranges. This is the
  *    standard kdb/Flink-style as-of formulation on a sorted merge.
  *  - **sessionization** (30-minute-gap sessions): gaps-and-islands — lag +
  *    running sum of break flags, then a per-(key, session) rollup. Two
  *    window passes over one (key, time) sort; no self-join.
  *
  * `events.ts` is normalized by [[Tables.events]] to canonical LongType
  * epoch-nanos at the load boundary (the physical parquet type has drifted
  * between TIMESTAMP(NANOS) and timestamp[us] across testdata generations);
  * all time arithmetic here stays in exact integer nanos and converts to
  * microsecond timestamps only at comparison/output boundaries (a double
  * round-trip would corrupt ns epochs — 1.7e18 exceeds double's 53-bit
  * integer range). The DuckDB oracles are timestamp-native (`INTERVAL`,
  * `epoch_ns`, `date_diff`) and run directly on the physical column.
  */
object Temporal {

  /** As-of join: events ⟕ latest order with o_orderdate <= ts, per
    * user_id = o_custkey key. Orders are first collapsed to one row per
    * (custkey, orderdate) — max orderkey — to make the match deterministic.
    * Inner semantics (events with no prior order drop), matching DuckDB's
    * ASOF JOIN, which is the oracle. */
  val asofJoin: QueryDef = QueryDef.sql(
    "asof_join_latest_order",
    """WITH o AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |           FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, o.o_orderkey
      |FROM events e
      |ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(
        col("user_id").as("k"),
        timestamp_micros(expr("ts div 1000")).as("t"),
        col("event_id"))
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(
        col("o_custkey").as("k"),
        col("o_orderdate").as("t"),
        col("o_orderkey"))
    // Tag and interleave both sides on (key, time); carry the last seen
    // orderkey forward. side=0 orders the order row BEFORE any event at the
    // exact same timestamp, so ties match (ts >= orderdate semantics).
    val tagged = ord
      .select(col("k"), col("t"), lit(0).as("side"), col("o_orderkey"), lit(null).cast("long").as("event_id"))
      .unionByName(ev
        .select(col("k"), col("t"), lit(1).as("side"), lit(null).cast("long").as("o_orderkey"), col("event_id")))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("matched", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("matched").isNotNull)
      .select(col("event_id"), col("matched").as("o_orderkey"))
      .orderBy("event_id")
  }

  /** 30-minute-gap sessionization of the event stream per user: session
    * index, event count, span in whole seconds, first/last event ids. */
  val sessionize: QueryDef = QueryDef.sql(
    "sessionize_events",
    """WITH x AS (SELECT user_id, event_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess
      |      FROM x)
      |SELECT user_id, sess,
      |       COUNT(*) AS n_events,
      |       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS span_sec,
      |       MIN(event_id) AS first_event,
      |       MAX(event_id) AS last_event
      |FROM s GROUP BY 1, 2 ORDER BY user_id, sess""".stripMargin) { (s, d) =>
    val gapNs = 30L * 60 * 1000000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1).otherwise(0))
      .withColumn("sess", sum(col("brk")).over(cum).cast("long"))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        count(lit(1)).as("n_events"),
        (expr("max(ts) div 1000000000") - expr("min(ts) div 1000000000")).as("span_sec"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy("user_id", "sess")
  }

  /** Interval/range join: click-to-purchase attribution — for each purchase
    * event, count the same user's clicks in the preceding hour. The range
    * predicate rides on the user-key equi-join, so this shuffles on the key
    * like any hash join and evaluates the band filter post-match; only a
    * join with NO equi component would degrade to a broadcast-nested-loop
    * (at 100 TB that variant wants time-bucket co-partitioning instead —
    * the same trick `asofJoin` avoids entirely). Exact integer-nanos
    * comparison both sides. */
  val rangeJoin: QueryDef = QueryDef.sql(
    "range_join_attribution",
    """SELECT p.event_id AS purchase_id, COUNT(c.event_id) AS n_clicks_1h
      |FROM events p
      |JOIN events c
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 1 HOUR
      | AND c.ts < p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val hourNs = 3600L * 1000000000L
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("cts"))
    p.join(c,
        col("cu") === col("pu") &&
          col("cts") >= col("pts") - hourNs && col("cts") < col("pts"))
      .groupBy(col("purchase_id"))
      .agg(count(col("click_id")).as("n_clicks_1h"))
      .orderBy("purchase_id")
  }

  /** The analytic window-function family over each customer's order history:
    * lag/lead navigation, first/last frame values, ordinal nth. All exact
    * BIGINTs; one shuffle-sort on (custkey, date, key). */
  val windowNavigation: QueryDef = QueryDef.sql(
    "window_navigation",
    """SELECT o_custkey, o_orderkey,
      |  COALESCE(LAG(o_orderkey)  OVER w, -1) AS prev_key,
      |  COALESCE(LEAD(o_orderkey) OVER w, -1) AS next_key,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_key,
      |  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
      |  COALESCE(NTH_VALUE(o_orderkey, 2) OVER w, -1) AS second_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    // nulls from lag/lead/nth coalesce to -1: a nullable int column lands as
    // float64 + NaN in the comparator's dataframe, breaking bit-exact hashing
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        coalesce(lag(col("o_orderkey"), 1).over(w), lit(-1L)).as("prev_key"),
        coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_key"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(full).as("last_key"),
        coalesce(nth_value(col("o_orderkey"), 2).over(w), lit(-1L)).as("second_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE-frame moving window: per user, the trailing-1-hour event count
    * and value sum at every event — a frame bounded by the ORDER BY value
    * (integer nanos), not row count, so irregular event spacing is handled
    * exactly. One shuffle-sort on (user, ts); the frame scan is
    * incremental within each partition. */
  val movingWindow: QueryDef = QueryDef.sql(
    "moving_window_events",
    """SELECT event_id,
      |       CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n,
      |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS BIGINT) AS trailing_cents
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
      |             RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-3600L * 1000000000L, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"),
        count(lit(1)).over(w).as("trailing_n"),
        sum(round(col("value") * 100).cast("long")).over(w).as("trailing_cents"))
      .orderBy("event_id")
  }

  /** Ordered FUNNEL analysis — the product-analytics staple (view →
    * click → purchase, each stage strictly AFTER the user's previous
    * stage in event time): per stage, users reached and the conversion
    * rate from the prior stage in exact milli. First-touch semantics:
    * stage k anchors at the user's EARLIEST qualifying event after the
    * stage-(k−1) anchor — the standard deterministic formulation (no
    * per-row path enumeration, so a user contributes once per stage).
    *
    * Scale shape: each stage is one event_type-filtered scan (the
    * predicate reaches the parquet scan) aggregated per user, then an
    * equi-join on user_id with the previous stage's |users|-row anchor
    * table — shuffles keyed by user_id throughout, stage tables shrink
    * monotonically, and the final report reduces three 1-row counts.
    * Stage depth is a constant (pipeline length), not data-driven. */
  val funnel: QueryDef = QueryDef.sql(
    "funnel_events",
    """WITH u AS (SELECT COUNT(DISTINCT user_id) AS s0 FROM events),
      |v AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type='view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type='click' AND e.ts > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type='purchase' AND e.ts > c.t2 GROUP BY e.user_id),
      |n AS (SELECT (SELECT COUNT(*) FROM v) AS s1, (SELECT COUNT(*) FROM c) AS s2,
      |             (SELECT COUNT(*) FROM p) AS s3, (SELECT s0 FROM u) AS s0)
      |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
      |       CAST(s1 AS BIGINT) AS users,
      |       CAST(CASE WHEN s0 > 0 THEN 1000*s1 // s0 ELSE 0 END AS BIGINT) AS conv_milli FROM n
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'click', CAST(s2 AS BIGINT),
      |       CAST(CASE WHEN s1 > 0 THEN 1000*s2 // s1 ELSE 0 END AS BIGINT) FROM n
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'purchase', CAST(s3 AS BIGINT),
      |       CAST(CASE WHEN s2 > 0 THEN 1000*s3 // s2 ELSE 0 END AS BIGINT) FROM n
      |ORDER BY stage""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val n = v.agg(count(lit(1)).as("s1"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("s2"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("s3"))))
      .crossJoin(broadcast(ev.agg(countDistinct(col("user_id")).as("s0"))))
    n.select(lit(1L).as("stage"), lit("view").as("stage_name"),
        col("s1").cast("long").as("users"),
        when(col("s0") > 0, expr("1000*s1 div s0")).otherwise(0L)
          .cast("long").as("conv_milli"))
      .union(n.select(lit(2L), lit("click"), col("s2").cast("long"),
        when(col("s1") > 0, expr("1000*s2 div s1")).otherwise(0L).cast("long")))
      .union(n.select(lit(3L), lit("purchase"), col("s3").cast("long"),
        when(col("s2") > 0, expr("1000*s3 div s2")).otherwise(0L).cast("long")))
      .orderBy("stage")
  }

  /** COHORT RETENTION — the other product-analytics staple: users
    * cohorted by the week of their first `signup`, then for each
    * following week the fraction still active (any event). Weeks are
    * exact integer epoch-day arithmetic (`day div 7`, offsets as
    * `(day − birth_day) div 7`) rather than calendar truncation — no
    * locale/week-start semantics for two engines to disagree on, and
    * offset 0 is by construction the signup week, so the cohort size IS
    * the offset-0 row. Events before a user's first signup are outside
    * the cohort window and excluded.
    *
    * Scale shape: birth table is one filtered scan aggregated per user;
    * the activity pass joins events to it on user_id (the natural
    * shuffle key) and collapses to distinct (user, cohort, offset)
    * BEFORE the per-cell count — the exchange after the join carries at
    * most users×weeks rows, not events. The cohort-size join is against
    * a |weeks|-row broadcast. */
  val retention: QueryDef = QueryDef.sql(
    "retention_cohorts",
    """WITH b AS (SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS bday
      |           FROM events WHERE event_type='signup' GROUP BY user_id),
      |a AS (SELECT DISTINCT e.user_id, b.bday // 7 AS cohort_week,
      |             (epoch_us(e.ts) // 86400000000 - b.bday) // 7 AS week_offset
      |      FROM events e JOIN b ON e.user_id = b.user_id
      |      WHERE epoch_us(e.ts) // 86400000000 >= b.bday),
      |coh AS (SELECT cohort_week, COUNT(*) AS cohort_users
      |        FROM a WHERE week_offset = 0 GROUP BY cohort_week)
      |SELECT a.cohort_week, a.week_offset,
      |       CAST(COUNT(*) AS BIGINT) AS active_users,
      |       CAST(coh.cohort_users AS BIGINT) AS cohort_users,
      |       CAST(1000*COUNT(*) // coh.cohort_users AS BIGINT) AS retention_milli
      |FROM a JOIN coh ON a.cohort_week = coh.cohort_week
      |GROUP BY a.cohort_week, a.week_offset, coh.cohort_users
      |ORDER BY a.cohort_week, a.week_offset""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("day", expr("ts div 86400000000000"))
    val b = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("day")).as("bday"))
    val a = ev.join(b, Seq("user_id"))
      .filter(col("day") >= col("bday"))
      .select(col("user_id"), expr("bday div 7").as("cohort_week"),
        expr("(day - bday) div 7").as("week_offset"))
      .distinct()
    val coh = a.filter(col("week_offset") === 0)
      .groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_users"))
    a.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(coh), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"),
        col("active_users").cast("long"),
        col("cohort_users").cast("long"),
        expr("1000*active_users div cohort_users").cast("long").as("retention_milli"))
      .orderBy("cohort_week", "week_offset")
  }

  /** WINDOWED ordered funnel — the `windowFunnel` semantics the
    * ClickHouse/product-analytics world names: per user, the deepest
    * view → click → purchase prefix completed WITHIN 24 hours of the
    * anchoring view (the plain [[funnel]] is deliberately unbounded — a
    * click a month later still converts there; this one expires). Every
    * view anchors a chain: the EARLIEST in-window click (greedy-minimal,
    * which maximizes the remaining purchase window, so existence under
    * the greedy chain ≡ existence under any chain), then any purchase
    * after that click and inside the anchor's window; the user's level
    * is the max over their anchors. Emits (user_id, level) for every
    * user with a view.
    *
    * Scale shape: two user-keyed range joins (anchor×clicks,
    * chained×purchases — the [[rangeJoin]] posture: equi-key on user
    * bounds the blow-up by per-user event counts) and two user-keyed
    * aggregates; nanos arithmetic exact (window = +86 400·10⁹). */
  val windowFunnel: QueryDef = QueryDef.sql(
    "window_funnel_events",
    """WITH a AS (SELECT user_id, ts AS ta FROM events WHERE event_type='view'),
      |c AS (SELECT a.user_id, a.ta, MIN(e.ts) AS tc FROM a JOIN events e
      |      ON e.user_id = a.user_id AND e.event_type='click'
      |         AND e.ts > a.ta AND e.ts <= a.ta + INTERVAL 24 HOUR
      |      GROUP BY a.user_id, a.ta),
      |p AS (SELECT c.user_id, c.ta FROM c JOIN events e
      |      ON e.user_id = c.user_id AND e.event_type='purchase'
      |         AND e.ts > c.tc AND e.ts <= c.ta + INTERVAL 24 HOUR
      |      GROUP BY c.user_id, c.ta),
      |lv AS (SELECT a.user_id,
      |          MAX(1 + CASE WHEN c.ta IS NOT NULL THEN 1 ELSE 0 END
      |                + CASE WHEN p.ta IS NOT NULL THEN 1 ELSE 0 END) AS level
      |       FROM a LEFT JOIN c ON a.user_id = c.user_id AND a.ta = c.ta
      |              LEFT JOIN p ON a.user_id = p.user_id AND a.ta = p.ta
      |       GROUP BY a.user_id)
      |SELECT user_id, CAST(level AS BIGINT) AS level FROM lv ORDER BY user_id""".stripMargin) { (s, d) =>
    val W = 86400L * 1000000000L // 24 h in the canonical epoch-nanos
    val ev = Tables.materialize(
      Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts")))
    val a = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("ta"))
    val c = a.as("a")
      .join(ev.as("e"), col("e.user_id") === col("a.user_id") &&
        col("e.event_type") === "click" &&
        col("e.ts") > col("a.ta") && col("e.ts") <= col("a.ta") + W)
      .groupBy(col("a.user_id").as("user_id"), col("a.ta").as("ta"))
      .agg(min(col("e.ts")).as("tc"))
    val p = c.as("c")
      .join(ev.as("e"), col("e.user_id") === col("c.user_id") &&
        col("e.event_type") === "purchase" &&
        col("e.ts") > col("c.tc") && col("e.ts") <= col("c.ta") + W)
      .groupBy(col("c.user_id").as("user_id"), col("c.ta").as("ta"))
      .agg(count(lit(1)).as("np"))
    a.join(c.select(col("user_id"), col("ta"), lit(1L).as("hasC")), Seq("user_id", "ta"), "left")
      .join(p.select(col("user_id"), col("ta"), lit(1L).as("hasP")), Seq("user_id", "ta"), "left")
      .groupBy(col("user_id"))
      .agg(max(lit(1L) + coalesce(col("hasC"), lit(0L)) +
        coalesce(col("hasP"), lit(0L))).as("level"))
      .select(col("user_id"), col("level").cast("long"))
      .orderBy("user_id")
  }

  val all: Seq[QueryDef] = Seq(asofJoin, sessionize, rangeJoin, windowNavigation,
    movingWindow, funnel, windowFunnel, retention)
}
