package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryDef, Tables}

/** Correlated-subquery coverage, run through the SQL entry path
  * (`spark.sql` over temp views) so Catalyst's subquery decorrelation is
  * exercised end-to-end: EXISTS / NOT EXISTS rewrite to left-semi /
  * left-anti hash joins, correlated scalar aggregates to a grouped join —
  * the same plans the DataFrame formulations elsewhere in this package
  * produce by hand. The SQL text is shared with the DuckDB oracle verbatim.
  */
object Subqueries {

  private def viewsFor(s: SparkSession, d: String): Unit = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
  }

  private def sqlQuery(name: String, sql: String): QueryDef =
    QueryDef.sql(name, sql) { (s, d) => viewsFor(s, d); s.sql(sql) }

  /** TPC-H Q4-flavored EXISTS: orders with at least one line shipped more
    * than 60 days after the order date, counted per priority. Decorrelates
    * to a left-semi join on o_orderkey. */
  val existsLateShipment: QueryDef = sqlQuery(
    "exists_late_shipment",
    """SELECT o_orderpriority, COUNT(*) AS n_late_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  /** NOT EXISTS (anti-join decorrelation): customers with no
    * partially-fulfilled order, counted per market segment. (The predicate
    * is on a rare status so the result is non-trivially non-empty at every
    * test scale — every customer in the synthetic data has ≥2 orders, so an
    * unconditioned NOT EXISTS would prove only that two empty sets hash
    * alike.) */
  val notExistsCustomers: QueryDef = sqlQuery(
    "not_exists_customers",
    """SELECT c_mktsegment, COUNT(*) AS n_without_partial
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)

  /** TPC-H Q17-flavored correlated scalar aggregate: revenue of lineitems
    * whose quantity is below one fifth of their part's average quantity.
    * Exact-integer form — `5·qty·count < sum` avoids the fractional average
    * so both engines compare identical BIGINTs. Decorrelates to one grouped
    * per-part aggregate joined back to the fact table. */
  val scalarSubqueryQ17: QueryDef = sqlQuery(
    "scalar_subquery_small_qty",
    """SELECT COUNT(*) AS n_small,
      |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem l1
      |WHERE CAST(l_quantity AS BIGINT) * 5 *
      |        (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      |      < (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
      |         FROM lineitem l3 WHERE l3.l_partkey = l1.l_partkey)""".stripMargin)

  /** IN-subquery (semi-join through a grouped having filter): orders from
    * the customers holding more than 15 orders. */
  val inSubqueryTopCustomers: QueryDef = sqlQuery(
    "in_subquery_big_customers",
    """SELECT o_orderstatus, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_custkey IN (SELECT o_custkey FROM orders
      |                    GROUP BY o_custkey HAVING COUNT(*) > 15)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)

  val all: Seq[QueryDef] = Seq(
    existsLateShipment, notExistsCustomers, scalarSubqueryQ17, inSubqueryTopCustomers)
}
