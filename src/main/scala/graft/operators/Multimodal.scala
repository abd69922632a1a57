package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** A multimodal record: opaque media bytes + typed metadata. In a real
  * pipeline `payload` holds image/audio/video bytes read from object storage;
  * here it is the document's UTF-8 bytes standing in as an opaque blob. */
final case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Features extracted from one media payload. */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    header_byte: Long,
    trailer_byte: Long,
    fake_width: Long,
    fake_height: Long)

/** Multimodal-column plumbing: binary payload column, batched decode /
  * feature-extract via mapPartitions (the JVM analogue of a vectorized
  * batch UDF — one buffer of records per call, amortizing per-batch setup
  * such as a decoder handle), typed output schema.
  *
  * STUB: this container has no image/audio codecs, so [[Multimodal.decodeStub]]
  * is a deterministic fake that "decodes" raw bytes into fake dimensions. The
  * Spark-side plumbing — binary column, partition-parallel batched UDF shape,
  * explicit schema, no driver collection — is real and is what the DuckDB
  * oracle checks (the fake is arithmetic on bytes, so it is SQL-expressible;
  * a real decoder would drop in behind the same signature).
  */
object Multimodal {

  val BatchSize = 64

  /** Deterministic fake decoder — replace with a real codec call in
    * production. Operates on raw bytes only. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    val head = if (n > 0) (r.payload(0) & 0xffL) else 0L
    val tail = if (n > 0) (r.payload(r.payload.length - 1) & 0xffL) else 0L
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = n,
      header_byte = head,
      trailer_byte = tail,
      fake_width = 32L + (head * 7L + n) % 480L,
      fake_height = 32L + (tail * 11L + n) % 480L)
  }

  /** documents → binary payload column → batched decode. */
  def features(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // Batch shape: decode in fixed-size chunks like a vectorized UDF —
        // a real decoder would init its handle once per batch here.
        it.grouped(BatchSize).flatMap { batch => batch.map(decodeStub) }
      }
  }

  /** Oracle-checked metadata extraction. Documents are ASCII (verified), so
    * byte positions and char positions coincide and the fake-decode is
    * expressible relationally in DuckDB. */
  val meta: QueryDef = QueryDef.sql(
    "multimodal_meta",
    """SELECT doc_id,
      |       CAST(length(text) AS BIGINT) AS n_bytes,
      |       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS header_byte,
      |       CAST(ascii(substr(text, length(text), 1)) AS BIGINT) AS trailer_byte,
      |       CAST(32 + (ascii(substr(text, 1, 1)) * 7 + length(text)) % 480 AS BIGINT) AS fake_width,
      |       CAST(32 + (ascii(substr(text, length(text), 1)) * 11 + length(text)) % 480 AS BIGINT) AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    features(s, Tables.documents(s, d)).toDF().orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(meta)
}
