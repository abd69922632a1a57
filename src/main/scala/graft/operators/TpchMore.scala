package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Second tranche of TPC-H-shaped relational coverage (public TPC-H spec
  * shapes, adapted to the driver's reduced schema — no partsupp/shipmode/
  * commitdate columns exist, so Q2/Q4/Q11/Q12/Q20/Q21 have no faithful
  * analogue and the remainder substitute available columns).
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

  val all: Seq[QueryDef] = Seq(
    q6ForecastRevenue, q7NationVolume, q8MarketShare, q10ReturnedItems,
    q13OrderDistribution, q14PromoRevenue, q15TopSupplier, q18LargeVolume,
    q19DiscountedRevenue)
}
