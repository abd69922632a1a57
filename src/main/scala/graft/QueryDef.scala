package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark plan plus (where SQL-expressible)
  * its DuckDB oracle. Column names/types must match between the two — the
  * driver sorts columns by name and hash-compares values (builder contract). */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
