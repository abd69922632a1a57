package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch write path: partitioned (and optionally bucketed) parquet layout —
  * the storage posture every 100 TB table here assumes (SURVEY.md §2.1
  * "Scans"; the test tables are unpartitioned single files only because the
  * driver generates them that way).
  *
  *  - `partitionBy` columns become directory keys → partition pruning turns
  *    a predicate on them into a directory listing, skipping file IO
  *    entirely (verified by ParquetSinkSpec via the plan's partitionFilters).
  *  - bucketing co-locates join/agg keys at write time so later joins on
  *    the bucket key skip their shuffle (saveAsTable-only in Spark, hence
  *    kept behind a separate method — the bench tables are path-based).
  */
object ParquetSink {

  /** Write `df` partitioned by `cols`; returns the reloaded DataFrame. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): DataFrame = {
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Write `df` bucketed+sorted by `key` into `numBuckets` as a managed
    * table; joins between two tables bucketed the same way plan with zero
    * exchanges on the bucket key.
    *
    * Idempotent ACROSS JVMs, not just within a session: `mode("overwrite")`
    * only overwrites a table the *current catalog* knows about. A fresh JVM
    * with the default in-memory catalog has an empty catalog, but the
    * managed location (`<warehouse>/<table>`) may survive on disk from a
    * prior process — `saveAsTable` then throws `LOCATION_ALREADY_EXISTS`.
    * So: drop the catalog entry if present AND delete the stale location via
    * the Hadoop FS API before writing (the drop alone cannot remove a
    * directory the catalog never owned). ParquetSinkSpec covers both the
    * same-session rewrite and the orphaned-directory case. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }
}
