package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.{QueryDef, Tables}

/** Line-oriented text sources (JSON-lines, CSV) with EXPLICIT schemas — the
  * batch face of the reference's fixed-schema JSON discipline (SURVEY §1.2:
  * declared `StructType`s, never inference; an inferred schema re-scans the
  * data and silently drifts when a batch happens to miss a field).
  *
  * The registered queries are write → read-back round trips: the documents
  * table is exported once per (JVM, source dir) to JSON-lines / CSV under
  * the session's warehouse, then read back through the real
  * `spark.read.schema(...).json/csv` path and compared — field order,
  * quoting, escaping, and type round-tripping all on the line. The oracle
  * is the identity query over the same rows, so any wire-format corruption
  * hash-fails. At scale these sources are splittable line formats: a 100 TB
  * JSONL ingest parallelizes by byte range exactly like this one. */
object TextSources {

  /** doc schema as explicitly declared (no inference, mirrors parquet). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def exportDir(spark: SparkSession, dir: String, format: String): String = {
    val key = graft.operators.Dedup.dirKey(dir)
    val base = spark.conf.get("spark.sql.warehouse.dir")
    s"$base/graft_export_${format}_$key"
  }

  /** An export directory counts as complete only if the committer's
    * `_SUCCESS` marker landed — a crashed mid-job write leaves a partial
    * directory that a bare `exists` check would treat as reusable forever
    * (every later read silently truncated). A marker-less directory is
    * deleted and rebuilt: the state self-heals instead of wedging. */
  private[graft] def ensureComplete(
      spark: SparkSession, out: String)(write: => Unit): String = {
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
    if (fs.exists(p) && !fs.exists(marker)) fs.delete(p, true)
    if (!fs.exists(p)) write
    out
  }

  /** Write-once-then-reuse export (same once-per-JVM bootstrap contract as
    * the dedup stores: the unit of work under measurement is the READ). */
  private def ensureExport(spark: SparkSession, dir: String, format: String): String =
    ensureComplete(spark, exportDir(spark, dir, format)) {
      val out = exportDir(spark, dir, format)
      val w = Tables.documents(spark, dir).select(
        col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      format match {
        case "json" => w.write.json(out)
        case "csv" => w.write.option("header", "true").option("escape", "\"").csv(out)
      }
    }

  /** JSONL round trip: parquet → json-lines → schema-pinned read-back. */
  val jsonRoundTrip: QueryDef = QueryDef.sql(
    "source_json_roundtrip",
    """SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    s.read.schema(DocSchema).json(ensureExport(s, d, "json"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** CSV round trip: header + RFC-quoting, schema-pinned read-back. */
  val csvRoundTrip: QueryDef = QueryDef.sql(
    "source_csv_roundtrip",
    """SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    s.read.schema(DocSchema)
      .option("header", "true").option("escape", "\"")
      .csv(ensureExport(s, d, "csv"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Partition-pruned round trip: documents written `partitionBy(lang)`
    * (once per JVM+dir), read back with a partition-key predicate. The
    * predicate lands in the scan's partitionFilters — the read lists ONE
    * `lang=en/` directory and never opens the others, which at 100 TB is
    * the difference between scanning the corpus and scanning the slice
    * (ParquetSinkSpec asserts the pruned plan; this query puts the same
    * path under the driver's value-level oracle). */
  val partitionedPruned: QueryDef = QueryDef.sql(
    "source_partitioned_pruning",
    """SELECT doc_id, text, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents WHERE lang = 'en' ORDER BY doc_id""".stripMargin) { (s, d) =>
    val out = ensureComplete(s, exportDir(s, d, "bylang")) {
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"), col("lang"))
        .write.partitionBy("lang").parquet(exportDir(s, d, "bylang"))
    }
    s.read.parquet(out)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(jsonRoundTrip, csvRoundTrip, partitionedPruned)
}
