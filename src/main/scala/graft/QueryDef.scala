package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark plan plus (where SQL-expressible)
  * its DuckDB oracle. Column names/types must match between the two — the
  * driver sorts columns by name and hash-compares values (builder contract).
  *
  * Two oracle forms:
  *  - `oracle`: a static SQL string over the driver's table views — the
  *    common case.
  *  - `oracleFor`: SQL GENERATED at Verify-dump time from (session, sfDir) —
  *    for serving paths whose oracle must reference train-once artifacts
  *    persisted under the warehouse dir (the path embeds a content key of
  *    the corpus, so it cannot be a compile-time literal). Verify runs the
  *    queries first (materializing the artifacts), then evaluates these. */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleFor: Option[(SparkSession, String) => String] = None)

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
  /** Oracle SQL computed against the live session + data dir at dump time
    * (artifact-referencing oracles — see [[QueryDef.oracleFor]]). */
  def sqlDynamic(name: String)(oracle: (SparkSession, String) => String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None, Some(oracle))
}
