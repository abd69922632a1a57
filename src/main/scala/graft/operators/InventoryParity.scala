package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.model.Schemas

/** The remaining SURVEY.md §2 operator rows as batch queries, each with a
  * DuckDB oracle:
  *   row 2 — JSON deserialization (from_json with fixed schema, never inferred)
  *   row 3 — groupByKey (commutative per-key aggregation)
  *   row 5 — KTable→changelog (latest value per key)
  *   row 7 — JSON serialization of the output event (to_json)
  *   row 8 — tombstone/null filtering
  */
object InventoryParity {

  /** Row 8 + the events→inventory mapping itself: tombstones dropped, full
    * mapped update stream returned. */
  val tombstoneFilter: QueryDef = QueryDef.sql(
    "inventory_tombstone_filter",
    s"""WITH e AS (${InventoryFold.asUpdateEventsSql})
       |SELECT * FROM e ORDER BY event_order""".stripMargin) { (s, d) =>
    InventoryFold.asUpdateEvents(Tables.events(s, d)).orderBy("event_order")
  }

  /** Row 5: the changelog's latest value per key. max_by keeps this a plain
    * hash aggregation (map-side partial + final), no per-key sort — the
    * scalable "latest per key" at 100 TB vs. a row_number window. event_order
    * is globally unique, so max_by is deterministic. */
  val changelogLatest: QueryDef = QueryDef.sql(
    "inventory_changelog_latest",
    s"""WITH e AS (${InventoryFold.asUpdateEventsSql})
       |SELECT product_code,
       |       MAX(event_order) AS last_order,
       |       max_by(action, event_order) AS last_action,
       |       max_by(delta, event_order) AS last_delta
       |FROM e GROUP BY product_code ORDER BY product_code""".stripMargin) { (s, d) =>
    InventoryFold.asUpdateEvents(Tables.events(s, d))
      .groupBy(col("product_code"))
      .agg(
        max(col("event_order")).as("last_order"),
        max_by(col("action"), col("event_order")).as("last_action"),
        max_by(col("delta"), col("event_order")).as("last_delta"))
      .orderBy("product_code")
  }

  /** Row 3: commutative per-key aggregation (the subset of the fold that a
    * plain partial+final hash agg expresses — SURVEY.md §2.1). */
  val groupedSum: QueryDef = QueryDef.sql(
    "inventory_grouped_sum",
    s"""WITH e AS (${InventoryFold.asUpdateEventsSql})
       |SELECT product_code,
       |       COUNT(*) AS n_events,
       |       CAST(SUM(CASE WHEN action='INC' THEN delta ELSE 0 END) AS BIGINT) AS sum_inc,
       |       CAST(SUM(CASE WHEN action='DEC' THEN delta ELSE 0 END) AS BIGINT) AS sum_dec,
       |       CAST(SUM(CASE WHEN action='REP' THEN 1 ELSE 0 END) AS BIGINT) AS n_rep
       |FROM e GROUP BY product_code ORDER BY product_code""".stripMargin) { (s, d) =>
    InventoryFold.asUpdateEvents(Tables.events(s, d))
      .groupBy(col("product_code"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("action") === "INC", col("delta")).otherwise(0)).cast("long").as("sum_inc"),
        sum(when(col("action") === "DEC", col("delta")).otherwise(0)).cast("long").as("sum_dec"),
        sum(when(col("action") === "REP", 1).otherwise(0)).cast("long").as("n_rep"))
      .orderBy("product_code")
  }

  /** Row 2: JSON deserialization with a fixed schema (the reference's
    * JsonSerde). `props` carries {"k": <int>}; from_json with an explicit
    * StructType — never inference — mirrors the fixed-POJO wire contract. */
  val jsonExtract: QueryDef = QueryDef.sql(
    "inventory_json_extract",
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
      |FROM events WHERE props IS NOT NULL ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types._
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, d)
      .filter(col("props").isNotNull)
      .select(
        col("event_id"),
        from_json(col("props"), propsSchema).getField("k").as("prop_k"))
      .orderBy("event_id")
  }

  /** Rows 4+7: the fold's output re-serialized to the reference's JSON wire
    * shape {"count":N,"key":{"productCode":...}} (InventoryCountEvent with
    * the record key substituted — SURVEY.md §1.2 quirk note). Spark side is
    * a real to_json(struct(...)); the oracle string-builds the same compact
    * encoding. */
  val countJson: QueryDef = QueryDef.sql(
    "inventory_count_json",
    s"""WITH f AS (${InventoryFold.querySql.replace("ORDER BY product_code", "")})
       |SELECT product_code,
       |       '{"count":' || inv_count || ',"key":{"productCode":"' || product_code || '"}}'
       |         AS count_json
       |FROM f ORDER BY product_code""".stripMargin) { (s, d) =>
    InventoryFold.query(s, d)
      .select(
        col("product_code"),
        to_json(struct(
          col("inv_count").as("count"),
          struct(col("product_code").as("productCode")).as("key"))).as("count_json"))
      .orderBy("product_code")
  }

  /** SCD TYPE-2 MATERIALIZATION of the inventory changelog — the
    * warehouse-standard temporal-history table the KTable→changelog row
    * (§2 row 5) feeds in a real deployment: one row per STATE INTERVAL
    * `(product_code, inv_count, valid_from, valid_to, is_current)`, where
    * the state replays the reference fold's exact INC/DEC/REP semantics
    * (reference `InventoryUpdateEventUpdater`, kafka-streams-aggregate) at
    * EVERY event, not just the final one. REP's set-to-delta reset is
    * expressed without a per-event join: a running REP count per key
    * segments the event sequence, and the running sum of signed deltas
    * within (key, segment) starts from the segment's own REP row — so the
    * base IS the reset value. `valid_to` = the next event's order, with
    * the open interval's end rendered as Long.MaxValue rather than NULL —
    * the standard SCD2 "9999-12-31" sentinel, which keeps the as-of probe
    * a plain `valid_from <= t AND t < valid_to` range predicate AND keeps
    * the column non-null int64 in both engines (a nullable int64 coerces
    * to float64 in the driver's pandas compare — a hash hazard the
    * sentinel removes). `is_current` marks the open interval (exactly one
    * per key).
    *
    * Scale shape: two windows partitioned by product_code (+ segment) —
    * the per-key ordered walk IS SCD2's semantics, and per-key event
    * counts are the bounded quantity here (a key's history, not the
    * corpus). One hash exchange on the key, reused by both windows and
    * the lead; no global sort. The FINAL interval per key equals
    * `inventory_fold`'s state by construction — Scd2Spec pins that
    * differentially. */
  /** The SCD2 history derivation as DuckDB CTEs ending in
    * `h(product_code, valid_from, next_order, inv_count)` — ONE fragment
    * shared by the table query and the as-of probe so the fold semantics
    * cannot drift between them (the `asUpdateEventsSql` discipline, one
    * level up). */
  private val scd2HistoryCtes: String =
    s"""e AS (${InventoryFold.asUpdateEventsSql}),
       |s AS (SELECT product_code, event_order,
       |        SUM(CASE WHEN action='REP' THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY product_code ORDER BY event_order) AS seg,
       |        CASE WHEN action='REP' THEN delta
       |             WHEN action='INC' THEN delta ELSE -delta END AS signed
       |      FROM e),
       |h AS (SELECT product_code, event_order AS valid_from,
       |        LEAD(event_order) OVER (PARTITION BY product_code
       |          ORDER BY event_order) AS next_order,
       |        CAST(SUM(signed) OVER (PARTITION BY product_code, seg
       |          ORDER BY event_order) AS BIGINT) AS inv_count
       |      FROM s)""".stripMargin

  val scd2: QueryDef = QueryDef.sql(
    "inventory_scd2",
    s"""WITH $scd2HistoryCtes
       |SELECT product_code, valid_from,
       |       COALESCE(next_order, 9223372036854775807) AS valid_to,
       |       inv_count, (next_order IS NULL) AS is_current
       |FROM h ORDER BY product_code, valid_from""".stripMargin) { (s, d) =>
    scd2History(InventoryFold.asUpdateEvents(Tables.events(s, d)))
      .orderBy("product_code", "valid_from")
  }

  /** [[scd2]]'s interval table over an explicit updates frame — shared by
    * the registered query, the as-of probe, and `Scd2Spec`. */
  private[graft] def scd2History(updates: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("product_code")).orderBy(col("event_order"))
    updates
      .withColumn("seg",
        sum(when(col("action") === "REP", 1).otherwise(0)).over(wOrd))
      .withColumn("signed",
        when(col("action") === "REP", col("delta"))
          .when(col("action") === "INC", col("delta"))
          .otherwise(-col("delta")))
      .withColumn("inv_count",
        sum(col("signed")).over(Window
          .partitionBy(col("product_code"), col("seg"))
          .orderBy(col("event_order"))).cast("long"))
      .withColumn("next_order", lead(col("event_order"), 1).over(wOrd))
      .select(col("product_code"), col("event_order").as("valid_from"),
        coalesce(col("next_order"), lit(Long.MaxValue)).as("valid_to"),
        col("inv_count"), col("next_order").isNull.as("is_current"))
  }

  /** AS-OF PROBE over the SCD2 table — the query the sentinel interval end
    * was DESIGNED for (r16 verdict item 8): "inventory state as of t" is
    * the plain range predicate `valid_from <= t AND t < valid_to`, no
    * null-handling arm, because the open interval ends at Long.MaxValue.
    * The probe time is corpus-derived (half the max event_order — mid-
    * history, so keys genuinely differ from their final state) rather than
    * a magic literal; it joins in as a broadcast one-row scalar, adding no
    * exchange to the history build. Keys whose first event is after t are
    * correctly absent (no state existed). At 100 TB the same predicate
    * partition-prunes a `valid_to`-partitioned history table. */
  val scd2AsOf: QueryDef = QueryDef.sql(
    "inventory_scd2_asof",
    s"""WITH $scd2HistoryCtes,
       |hist AS (SELECT product_code, valid_from,
       |           COALESCE(next_order, 9223372036854775807) AS valid_to,
       |           inv_count
       |         FROM h),
       |t AS (SELECT MAX(event_order) // 2 AS as_of FROM e)
       |SELECT product_code, (SELECT as_of FROM t) AS as_of,
       |       inv_count, valid_from, valid_to
       |FROM hist
       |WHERE valid_from <= (SELECT as_of FROM t)
       |  AND valid_to > (SELECT as_of FROM t)
       |ORDER BY product_code""".stripMargin) { (s, d) =>
    val updates = InventoryFold.asUpdateEvents(Tables.events(s, d))
    // the probe-time branch re-reads events, but column-pruned to ONE
    // int64 column for a global max — not worth persisting the whole
    // updates frame (which at 100 TB would be corpus-sized) to avoid
    val t = updates.agg(expr("max(event_order) div 2").as("as_of"))
    scd2History(updates)
      .crossJoin(broadcast(t))
      .filter(col("valid_from") <= col("as_of") && col("valid_to") > col("as_of"))
      .select(col("product_code"), col("as_of"), col("inv_count"),
        col("valid_from"), col("valid_to"))
      .orderBy("product_code")
  }

  val all: Seq[QueryDef] =
    Seq(tombstoneFilter, changelogLatest, groupedSum, jsonExtract, countJson,
      scd2, scd2AsOf)
}
