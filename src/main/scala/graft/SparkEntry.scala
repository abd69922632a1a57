package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, ApproxAndSample, AudioDedup, Dedup, Graph, ImageDedup, InventoryFold, InventoryParity, Layout, MinHashLSH, Multimodal, QualityClassifier, Relational, Retrieval, ScalarFuncs, SimHash, Similarity, SkewJoin, Subqueries, Temporal, TextAnalysis, Tokenize, TpchMore, TrainingData, UnigramLM, VideoDedup}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered queries, grouped by module. Order is presentation-only. */
  def allQueries: Seq[QueryDef] = Seq(
    QueryDef.sql("inventory_fold", InventoryFold.querySql)(InventoryFold.query)
  ) ++ InventoryParity.all ++ Relational.all ++ TpchMore.all ++ Analytics.all ++ Subqueries.all ++
    ScalarFuncs.all ++ Temporal.all ++ SkewJoin.all ++ ApproxAndSample.all ++
    Dedup.all ++ ImageDedup.all ++ AudioDedup.all ++ VideoDedup.all ++ MinHashLSH.all ++ SimHash.all ++ Similarity.all ++
    TextAnalysis.all ++ TrainingData.all ++ QualityClassifier.all ++ Retrieval.all ++
    Multimodal.all ++ Tokenize.all ++ UnigramLM.all ++
    Layout.all ++ Graph.all ++ graft.sources.TextSources.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    InventoryFold.query(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** [[oracleSql]] plus the dynamic oracles resolved against the live
    * session + data dir (artifact-referencing serving paths — the SQL
    * embeds warehouse paths keyed by corpus content, so it only exists
    * once a session can compute them). Verify dumps THIS map. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    oracleSql ++ allQueries.flatMap(q =>
      q.oracleFor.map(gen => q.name -> gen(spark, sfDir))).toMap
}
