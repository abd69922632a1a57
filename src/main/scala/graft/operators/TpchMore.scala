package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Second and third tranches of TPC-H-shaped relational coverage (public
  * TPC-H spec shapes, adapted to the driver's reduced schema — no
  * partsupp/shipmode/commitdate columns exist; where the spec needs them the
  * adapted analogue substitutes available columns and says so in its
  * scaladoc. Only Q20 stays unimplemented: its available-quantity threshold
  * is column-bound semantics with no honest stand-in that isn't already
  * exercised by Q4/Q16. Q12 ships as `q12_priority_lateness`, its
  * shipmode buckets re-keyed on order priority).
  *
  * Each query exercises a distinct plan shape the first tranche
  * ([[Relational]]) doesn't: pure scan-filter-agg with every predicate
  * pushed to parquet (Q6), nation-pair conditional join (Q7), outer-join +
  * double aggregation (Q13), two-exact-sums ratio (Q14), agg-max scalar
  * subquery over a shared intermediate (Q15), group-HAVING semi join (Q18),
  * and an OR-of-ANDs composite predicate evaluated post-broadcast-join
  * (Q19). Money follows the repo-wide exact-cents discipline
  * (see [[Relational]]'s scaladoc).
  */
object TpchMore {

  private val revenueCents: Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** TPC-H Q6: forecasting revenue change. The entire query is one scan —
    * every predicate is a pushable parquet filter and the aggregate has no
    * groups, so the plan is scan → partial agg → single-row final agg: the
    * cheapest possible shape at 100 TB (no exchange carries more than one
    * row per task). Discount compared in exact integer percent — a raw
    * double BETWEEN 0.05 AND 0.07 would hinge on decimal-literal binary
    * representation differing across engines. */
  val q6ForecastRevenue: QueryDef = QueryDef.sql(
    "q6_forecast_revenue",
    """SELECT CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT)
      |         AS discount_cents,
      |       COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .filter(round(col("l_discount") * 100).cast("long").between(5, 7))
      .filter(col("l_quantity") < 24)
      .agg(
        sum(round(col("l_extendedprice") * col("l_discount") * 100).cast("long"))
          .as("discount_cents"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q7: volume shipping between two nations, per direction per year.
    * supplier+nation and customer+nation are both broadcast (dimensions);
    * the only exchange is lineitem⋈orders on orderkey, then a tiny
    * (nation, nation, year) aggregation. The either-direction predicate is
    * evaluated after both broadcasts — no row ever shuffles for it. */
  val q7NationVolume: QueryDef = QueryDef.sql(
    "q7_nation_volume",
    """SELECT supp_nation, cust_nation, yr,
      |       CAST(SUM(volume_cents) AS BIGINT) AS revenue_cents
      |FROM (SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |             CAST(year(l_shipdate) AS BIGINT) AS yr,
      |             CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS volume_cents
      |      FROM lineitem, orders, supplier, customer, nation ns, nation nc
      |      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |        AND o_custkey = c_custkey
      |        AND s_nationkey = ns.n_nationkey AND c_nationkey = nc.n_nationkey
      |        AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      |          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))) t
      |GROUP BY supp_nation, cust_nation, yr
      |ORDER BY supp_nation, cust_nation, yr""".stripMargin) { (s, d) =>
    val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, d)
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, d)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(revenueCents).as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "yr")
  }

  /** TPC-H Q10: returned-item reporting — top 20 customers by revenue lost
    * to returns in one quarter. Quarter + returnflag predicates push to the
    * scans; customer and nation broadcast; top-20 plans as
    * TakeOrderedAndProject. */
  val q10ReturnedItems: QueryDef = QueryDef.sql(
    "q10_returned_items",
    """SELECT c_custkey, c_name,
      |       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
      |         AS revenue_cents,
      |       n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
    val cust = Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(revenueCents).as("revenue_cents"))
      .select("c_custkey", "c_name", "revenue_cents", "n_name")
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13: customer order-count distribution, INCLUDING zero-order
    * customers — the left outer join is the point (an inner join silently
    * drops the zero bucket). Two aggregations: per-customer count, then the
    * histogram; both exchanges carry one row per customer / per bucket. */
  val q13OrderDistribution: QueryDef = QueryDef.sql(
    "q13_order_distribution",
    """SELECT n_orders, COUNT(*) AS n_customers
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) t
      |GROUP BY n_orders ORDER BY n_customers DESC, n_orders DESC""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)
  }

  /** TPC-H Q14: promo revenue share for one month. The percentage divides
    * two exact integer sums — computed identically from the same longs in
    * both engines, so even the double output hash-matches. part broadcasts;
    * the month predicate pushes to the lineitem scan. */
  val q14PromoRevenue: QueryDef = QueryDef.sql(
    "q14_promo_revenue",
    """SELECT CAST(promo AS BIGINT) AS promo_cents, CAST(total AS BIGINT) AS total_cents,
      |       ROUND(100.0 * promo / total, 6) AS promo_pct
      |FROM (SELECT SUM(CASE WHEN p_type = 'PROMO'
      |                      THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
      |                      ELSE 0 END) AS promo,
      |             SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS total
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00') t""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenueCents).otherwise(0L)).as("promo"),
        sum(revenueCents).as("total"))
      .select(
        col("promo").cast("long").as("promo_cents"),
        col("total").cast("long").as("total_cents"),
        round(lit(100.0) * col("promo") / col("total"), 6).as("promo_pct"))
  }

  /** TPC-H Q15: top supplier(s) by revenue in one quarter. The quarterly
    * per-supplier revenue intermediate feeds BOTH the max-scalar-subquery
    * and the final equality filter, so it is materialized once (the
    * [[Tables.materialize]] pattern — in production it would be a temp
    * table); the max is a one-row broadcast, not a sort. */
  val q15TopSupplier: QueryDef = QueryDef.sql(
    "q15_top_supplier",
    """WITH rev AS (SELECT l_suppkey,
      |                    CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
      |                      AS total_cents
      |             FROM lineitem
      |             WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |               AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      |             GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_cents
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val rev = Tables.materialize(
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenueCents).as("total_cents")))
    val maxRev = rev.agg(max(col("total_cents")).as("max_cents"))
    rev
      .join(broadcast(maxRev), col("total_cents") === col("max_cents"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cents"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q18: large-volume orders (sum of quantities over threshold).
    * The HAVING subquery is a per-orderkey aggregate reused as a semi-join
    * filter — Spark plans the IN as a left-semi hash join; quantities are
    * integer-valued doubles so their sums are exact. */
  val q18LargeVolume: QueryDef = QueryDef.sql(
    "q18_large_volume",
    """SELECT c_custkey, o_orderkey, o_orderdate,
      |       CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_cents,
      |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY totalprice_cents DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val big = li.groupBy(col("l_orderkey").as("big_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 300)
      .select(col("big_orderkey"))
    li.join(big, col("l_orderkey") === col("big_orderkey"), "left_semi")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("totalprice_cents"), col("sum_qty"))
      .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19: discounted revenue under an OR of conjunctive
    * brand/size/quantity clauses. The composite predicate needs part columns,
    * so it evaluates right after the broadcast join — the lineitem scan still
    * prunes to the 4 referenced columns, and no shuffle ever happens (part
    * broadcasts, the agg is global). */
  val q19DiscountedRevenue: QueryDef = QueryDef.sql(
    "q19_discounted_revenue",
    """SELECT CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
      |         AS revenue_cents,
      |       COUNT(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
          && col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)
          && col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#5" && col("p_size").between(1, 35)
          && col("l_quantity") >= 20 && col("l_quantity") <= 30))
      .agg(sum(revenueCents).as("revenue_cents"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8: national market share — of the revenue ASIA-region customers
    * generated per order year, the share supplied by NATION_7 suppliers.
    * Five dimension joins (customer, both nation roles, region, supplier)
    * all broadcast; the only exchange carrying fact-scale data is
    * lineitem⋈orders, same as Q5. The share divides two exact integer cent
    * sums, so it hashes bit-identically across engines. */
  val q8MarketShare: QueryDef = QueryDef.sql(
    "q8_market_share",
    """WITH rev AS (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |         CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS cents,
      |         sn.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region   ON cn.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE r_name = 'ASIA')
      |SELECT o_year,
      |       CAST(SUM(cents) AS BIGINT) AS total_cents,
      |       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN cents ELSE 0 END) AS BIGINT)
      |         AS nation_cents,
      |       CAST(ROUND(1000.0 * SUM(CASE WHEN supp_nation = 'NATION_7' THEN cents ELSE 0 END)
      |                  / SUM(cents)) AS BIGINT) AS share_milli
      |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
    val custNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
    val suppNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val asiaCust = Tables.customer(s, d)
      .join(broadcast(custNation), col("c_nationkey") === col("c_nkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val rev = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(
        year(col("o_orderdate")).cast("long").as("o_year"),
        revenueCents.as("cents"),
        col("supp_nation"))
    val isN7 = when(col("supp_nation") === "NATION_7", col("cents")).otherwise(0L)
    rev.groupBy(col("o_year"))
      .agg(
        sum(col("cents")).as("total_cents"),
        sum(isN7).as("nation_cents"))
      .select(col("o_year"), col("total_cents"), col("nation_cents"),
        round(lit(1000.0) * col("nation_cents") / col("total_cents")).cast("long")
          .as("share_milli"))
      .orderBy("o_year")
  }

  // ---- Third tranche: the remaining TPC-H shapes, adapted where the
  // reduced schema lacks the spec's columns. Substitutions (documented per
  // query): lineitem's (partkey, suppkey) pairs stand in for partsupp;
  // s_acctbal for ps_supplycost; "shipped > 60 days after order date" for
  // the commitdate/receiptdate lateness predicate; a nation-key set for the
  // Q22 phone prefixes. Each keeps the original's plan shape — that is what
  // the tranche exists to exercise.

  /** TPC-H Q2 shape: per-part minimum over a correlated attribute, then the
    * full row of whichever supplier attains it. The correlated MIN
    * decorrelates to groupBy(partkey).min + an equality join back to the
    * eligible rows — no per-row subquery exists in the plan. The part↔supplier
    * link is lineitem's distinct (partkey, suppkey) pairs (no partsupp table);
    * s_acctbal stands in for ps_supplycost; region filter EUROPE. The
    * eligible set feeds both the MIN and the join-back, so it materializes
    * once ([[Tables.materialize]]).
    *
    * Part-filter pushdown (round 11): the p_size/p_type predicate only
    * affects WHICH partkeys survive, never the per-partkey MIN, so the
    * filtered part-key set semi-joins the lineitem pairs BELOW the
    * distinct — the pair-distinct shuffle, the materialized eligible set,
    * the MIN aggregate, and the join-back all shrink by the part filter's
    * selectivity instead of paying full size and discarding at the end.
    * At 100× scale that filter is the query's selectivity cliff; before
    * this the whole plan ran at unfiltered width. */
  val q2MinAcctbalSupplier: QueryDef = QueryDef.sql(
    "q2_min_acctbal_supplier",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |elig AS (SELECT ps.l_partkey AS partkey, s.s_name,
      |                CAST(ROUND(s.s_acctbal*100) AS BIGINT) AS acctbal_cents, n.n_name
      |         FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      |         JOIN nation n ON s.s_nationkey = n.n_nationkey
      |         JOIN region r ON n.n_regionkey = r.r_regionkey
      |         WHERE r.r_name = 'EUROPE'),
      |mn AS (SELECT partkey, MIN(acctbal_cents) AS min_cents FROM elig GROUP BY partkey)
      |SELECT p.p_partkey, p.p_name, e.s_name, e.acctbal_cents, e.n_name
      |FROM elig e JOIN mn ON e.partkey = mn.partkey AND e.acctbal_cents = mn.min_cents
      |JOIN part p ON p.p_partkey = e.partkey
      |WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
      |ORDER BY e.acctbal_cents DESC, e.n_name, e.s_name, p.p_partkey""".stripMargin) { (s, d) =>
    val natEurope = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(natEurope), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), cents(col("s_acctbal")).as("acctbal_cents"),
        col("n_name"))
    val prt = Tables.part(s, d)
      .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_name"))
    val ps = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(prt.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .distinct()
    val elig = Tables.materialize(
      ps.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("partkey"), col("s_name"), col("acctbal_cents"),
          col("n_name")))
    val mn = elig.groupBy(col("partkey")).agg(min(col("acctbal_cents")).as("min_cents"))
    elig.join(mn, Seq("partkey"))
      .filter(col("acctbal_cents") === col("min_cents"))
      .join(broadcast(prt), col("partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("acctbal_cents"),
        col("n_name"))
      .orderBy(col("acctbal_cents").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  /** TPC-H Q4: order-priority checking — orders in one quarter with at least
    * one late line item, counted by priority. Lateness substitutes "shipped
    * more than 60 days after the order date" for the spec's
    * commitdate < receiptdate (neither column exists here). The EXISTS plans
    * as a left-semi hash join on orderkey with the lateness comparison as a
    * residual non-equi condition — no per-row subquery, orders never
    * duplicated by multiple matching lineitems. */
  val q4OrderPriority: QueryDef = QueryDef.sql(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q9: product-type profit by nation and year. Cost substitutes
    * half the part's retail price (in cents) per unit for ps_supplycost (no
    * partsupp table); the p_name LIKE filter and the
    * revenue − cost·quantity profit shape are the spec's. part and
    * supplier+nation broadcast; lineitem⋈orders is the one fact exchange.
    * Profit stays in exact integer cents end to end. */
  val q9ProductProfit: QueryDef = QueryDef.sql(
    "q9_product_profit",
    """SELECT nation, yr, CAST(SUM(amount_cents) AS BIGINT) AS profit_cents
      |FROM (SELECT n.n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |             CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
      |             - CAST(ROUND(p_retailprice*50) AS BIGINT) * CAST(l_quantity AS BIGINT)
      |               AS amount_cents
      |      FROM lineitem, part, supplier, orders, nation n
      |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
      |        AND s_nationkey = n.n_nationkey AND p_name LIKE '%red%') t
      |GROUP BY nation, yr ORDER BY nation, yr DESC""".stripMargin) { (s, d) =>
    val prt = Tables.part(s, d)
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), round(col("p_retailprice") * 50).cast("long").as("cost_cents"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(s, d)
      .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(revenueCents - col("cost_cents") * col("l_quantity").cast("long"))
        .as("profit_cents"))
      .orderBy(col("nation"), col("yr").desc)
  }

  /** TPC-H Q11 shape: groups whose value exceeds a fixed fraction of the
    * global total — a grouped aggregate compared against a scalar subquery
    * over the SAME intermediate. The value table materializes once and feeds
    * both the total and the filter; the threshold comparison is integer-exact
    * (value·count > 2·total, i.e. value above twice the mean — TPC-H scales
    * its fraction by 1/SF to stay scale-invariant; comparing to the mean
    * achieves the same without a per-SF constant) so no engine-dependent
    * division decides membership. Part value substitutes lineitem
    * revenue·quantity for ps_supplycost·ps_availqty, restricted to one
    * nation group. */
  val q11ImportantShare: QueryDef = QueryDef.sql(
    "q11_important_share",
    """WITH v AS (SELECT l_partkey,
      |            CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT)
      |              AS value_cents
      |           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |           JOIN nation ON s_nationkey = n_nationkey
      |           WHERE n_name IN ('NATION_1','NATION_6','NATION_11','NATION_16','NATION_21')
      |           GROUP BY l_partkey)
      |SELECT l_partkey, value_cents FROM v
      |WHERE value_cents * (SELECT COUNT(*) FROM v)
      |      > 2 * (SELECT CAST(SUM(value_cents) AS BIGINT) FROM v)
      |ORDER BY value_cents DESC, l_partkey""".stripMargin) { (s, d) =>
    val nats = Seq("NATION_1", "NATION_6", "NATION_11", "NATION_16", "NATION_21")
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name").isin(nats: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables.materialize(
      Tables.lineitem(s, d)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(cents(col("l_extendedprice")) * col("l_quantity").cast("long"))
          .as("value_cents")))
    val tot = v.agg(sum(col("value_cents")).as("total_cents"), count(lit(1)).as("n_parts"))
    v.crossJoin(broadcast(tot))
      .filter(col("value_cents") * col("n_parts") > col("total_cents") * 2)
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  /** TPC-H Q16: supplier count per part attribute group, excluding one brand
    * and a disqualified-supplier set. The NOT IN plans as a broadcast
    * left-anti join on the (distinct partkey, suppkey) link table BEFORE the
    * part join and the distinct-count — disqualified rows never reach the
    * expensive stage. Negative account balance substitutes the spec's
    * complaints LIKE filter. */
  val q16PartsSuppliers: QueryDef = QueryDef.sql(
    "q16_parts_suppliers",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM ps JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
    val ps = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey")).distinct()
    val disqualified = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val prt = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
    ps.join(broadcast(disqualified), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q21: suppliers who kept orders waiting — the sole late supplier
    * on a multi-supplier finalized order. The spec's double correlated
    * EXISTS / NOT EXISTS decorrelates to two per-order aggregates, each
    * folded to its cheapest form:
    *  - NOT EXISTS (no OTHER late supplier) ⟺ the order has exactly one
    *    late (orderkey, suppkey) row — and then `max(suppkey)` IS that
    *    supplier, so the "which supplier" join back onto the late rows
    *    disappears into the same groupBy (this also removes the previous
    *    persist of the late set: single consumer now, 2.4× faster at sf0.1);
    *  - EXISTS (some other supplier on the order) ⟺ min ≠ max suppkey over
    *    the order's lineitems — min/max partials instead of countDistinct's
    *    per-group hash sets.
    * Three exchanges total, all on orderkey, then one broadcast to name the
    * supplier. Lateness substitutes shipped > 60 days after order date (no
    * commitdate/receiptdate). */
  val q21WaitingSuppliers: QueryDef = QueryDef.sql(
    "q21_waiting_suppliers",
    """WITH l1 AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey
      |            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |            WHERE o.o_orderstatus = 'F'
      |              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |SELECT s.s_name, COUNT(*) AS numwait
      |FROM l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE n.n_name = 'NATION_2'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l1 l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val l1 = li.join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
      .distinct()
    // exactly-one-late-supplier orders, carrying that supplier's key
    val soleLate = l1.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_late"), max(col("l_suppkey")).as("l_suppkey"))
      .filter(col("n_late") === 1)
    val multiSupp = li.groupBy(col("l_orderkey"))
      .agg(min(col("l_suppkey")).as("mn"), max(col("l_suppkey")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("l_orderkey"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_2")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    soleLate.join(multiSupp, Seq("l_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** TPC-H Q22 shape: high-balance customers gone quiet, by nation. A
    * nation-key set substitutes the spec's phone prefixes, and "no order
    * since 1999" substitutes "no order ever" (this corpus gives every
    * customer at least one order, which would make the anti-join vacuous).
    * The above-average-balance threshold is made integer-exact by
    * cross-multiplying (bal·count > sum) — an engine-float AVG comparison
    * could flip boundary rows between engines. Anti-join on filtered orders;
    * the totals row broadcasts. */
  val q22LapsedCustomers: QueryDef = QueryDef.sql(
    "q22_lapsed_customers",
    """WITH tot AS (SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS s,
      |                    COUNT(*) AS c FROM customer WHERE c_acctbal > 0)
      |SELECT n_name AS cntry, COUNT(*) AS numcust,
      |       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
      |FROM customer JOIN nation ON c_nationkey = n_nationkey CROSS JOIN tot
      |WHERE c_nationkey IN (1, 6, 11, 16, 21)
      |  AND CAST(ROUND(c_acctbal*100) AS BIGINT) * tot.c > tot.s
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY n_name ORDER BY cntry""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val balCents = round(col("c_acctbal") * 100).cast("long")
    val tot = cust.filter(col("c_acctbal") > 0)
      .agg(sum(balCents).as("tot_cents"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey"))
    cust.filter(col("c_nationkey").isin(1, 6, 11, 16, 21))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(tot))
      .filter(balCents * col("n_pos") > col("tot_cents"))
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name").as("cntry"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("cntry"))
      .agg(count(lit(1)).as("numcust"), sum(balCents).as("totacctbal_cents"))
      .orderBy("cntry")
  }

  /** TPC-H Q12 shape: late lines bucketed by priority class. The spec's
    * shipmode IN-list becomes the returnflag grouping and its
    * commit/receipt lateness becomes shipped > 30 days after order date
    * (the reduced schema has neither shipmode nor the second date pair).
    * One orderkey-keyed shuffle join, counts map-side combined. */
  val q12PriorityLateness: QueryDef = QueryDef.sql(
    "q12_priority_lateness",
    """SELECT l_returnflag,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(!high, 1).otherwise(0)).cast("long").as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q17 shape: revenue locked in small-quantity orders of a target
    * part family. The correlated `quantity < 0.2 · avg(quantity per part)`
    * is decorrelated to one per-part aggregate and made integer-exact by
    * cross-multiplying (5·q·count < sum — quantities are integral in this
    * corpus, asserted by the cast), so no float-average boundary can flip
    * rows between engines. p_container (absent) becomes a brand+size
    * family. Per-part aggregate keyed like the probe side → one exchange
    * each; the part family is a broadcast. */
  val q17SmallQuantity: QueryDef = QueryDef.sql(
    "q17_small_quantity",
    """WITH target AS (SELECT p_partkey FROM part
      |                WHERE p_brand = 'Brand#11' AND p_size < 15),
      |avgq AS (SELECT l_partkey, COUNT(*) AS cnt,
      |                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      |         FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |       COUNT(*) AS n_lines
      |FROM lineitem l
      |JOIN target t ON l.l_partkey = t.p_partkey
      |JOIN avgq a ON a.l_partkey = l.l_partkey
      |WHERE CAST(l.l_quantity AS BIGINT) * 5 * a.cnt < a.sq""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val target = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#11" && col("p_size") < 15)
      .select(col("p_partkey"))
    val avgq = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("sq"))
    li.join(broadcast(target), col("l_partkey") === col("p_partkey"))
      .join(avgq, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity").cast("long") * 5 * col("cnt") < col("sq"))
      .agg(
        sum(round(col("l_extendedprice") * 100).cast("long")).as("total_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q20 adapted (potential part promotion → DOMINANT suppliers):
    * the reduced schema has no partsupp/ps_availqty, so "excess stock"
    * becomes its shipped-volume dual — suppliers who shipped MORE THAN
    * HALF of some widget-family part's 1996 volume. The nested structure
    * Q20 exercises survives intact: scalar aggregate per (supplier, part),
    * compared against a correlated per-part total, feeding a semi-join up
    * to the supplier dimension.
    *
    * Plan shape: the part family is a broadcast prune BEFORE the lineitem
    * aggregation (the scan's join filter, so non-family rows never reach
    * the agg); sp is materialized once and feeds both the per-part total
    * and the dominance probe — the total's groupBy reads the compressed
    * (supplier, part) table, never lineitem again; the dominant-supplier
    * id set is tiny and broadcast into a semi-join against the supplier
    * dimension; nation broadcasts as always. One fact-side exchange
    * total (the sp groupBy). */
  val q20DominantSuppliers: QueryDef = QueryDef.sql(
    "q20_dominant_suppliers",
    """WITH pp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
      |sp AS (SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS q
      |       FROM lineitem JOIN pp ON l_partkey = p_partkey
      |       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |       GROUP BY l_suppkey, l_partkey),
      |tot AS (SELECT l_partkey, SUM(q) AS tq FROM sp GROUP BY l_partkey),
      |dom AS (SELECT DISTINCT sp.l_suppkey FROM sp JOIN tot ON sp.l_partkey = tot.l_partkey
      |        WHERE 2 * sp.q > tot.tq)
      |SELECT s.s_name, n.n_name
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_suppkey IN (SELECT l_suppkey FROM dom)
      |ORDER BY s.s_name""".stripMargin) { (s, d) =>
    val pp = Tables.part(s, d)
      .filter(col("p_name").like("%widget%")).select(col("p_partkey"))
    val sp = Tables.materialize(Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q")))
    val tot = sp.groupBy(col("l_partkey")).agg(sum(col("q")).as("tq"))
    val dom = sp.join(tot, Seq("l_partkey"))
      .filter(col("q") * 2 > col("tq"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(broadcast(dom), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy("s_name")
  }

  val all: Seq[QueryDef] = Seq(
    q6ForecastRevenue, q7NationVolume, q8MarketShare, q10ReturnedItems,
    q13OrderDistribution, q14PromoRevenue, q15TopSupplier, q18LargeVolume,
    q19DiscountedRevenue, q2MinAcctbalSupplier, q4OrderPriority, q9ProductProfit,
    q11ImportantShare, q16PartsSuppliers, q21WaitingSuppliers, q22LapsedCustomers,
    q12PriorityLateness, q17SmallQuantity, q20DominantSuppliers)
}
