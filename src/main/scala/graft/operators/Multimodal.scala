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
  * Two decode paths:
  *
  *  - **Real decode** ([[imageFeatures]] / `multimodal_decode`): BMP and
  *    PPM payloads are parsed by the pure-JVM [[MediaCodec]] — true header
  *    parsing, bottom-up row order, BGR byte order, row padding — and
  *    reduced to channel statistics. The oracle-checked query decodes
  *    fixture images RENDERED from the documents table (pixels derived
  *    deterministically from the text bytes), so DuckDB can predict the
  *    decoded statistics without a codec of its own; the position-weighted
  *    checksum makes a row-order or channel-order bug fail the oracle.
  *  - **Stub fallback** ([[decodeStub]] / `multimodal_meta`): payloads in
  *    formats this container cannot decode (video etc. need native codecs;
  *    JPEG graduated to the real path in round 9 — [[MediaCodec]] now
  *    carries a pure-JVM baseline decoder) keep the original deterministic
  *    byte-arithmetic fake — the plumbing contract for opaque media stays
  *    oracle-checked.
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
  /** Decoded-image statistics row (see [[MediaCodec]] for pos_hash). */
  final case class ImageFeatures(
      doc_id: Long,
      format: String,
      width: Long,
      height: Long,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      pos_hash: Long)

  /** FIXTURE: deterministic raster derived from a document — dimensions
    * from doc_id, pixel channels from the text bytes (pixel k reads char
    * k mod len: r = a, g = (3a+7)%256, b = (5a+11)%256), doc_id mod 3
    * choosing BMP / PPM / PNG. This stands in for reading image bytes
    * from object storage; the DECODER under test never sees these
    * formulas, only the encoded file (for PNG that means a real zlib
    * inflate and all five scanline unfilters on the way back). */
  /** Fixture byte source, shared by the image and audio renderers. The
    * DuckDB oracles read `ascii(substr(text, k+1, 1))` — the full code
    * point of the k-th CHARACTER — so the fixture contract is ASCII text
    * only, asserted here: on a UTF-16 surrogate or any non-ASCII char,
    * `charAt(...) & 0xff` would silently diverge from the oracle's value.
    * Empty text (mod-by-zero on `k % length`) falls back to a constant
    * mid-range sample instead of throwing; the synthetic corpus is
    * non-empty ASCII, so neither guard fires under the oracle. */
  private def fixtureByte(text: String, k: Int): Int =
    if (text.isEmpty) 64
    else {
      val c = text.charAt(k % text.length).toInt
      require(c < 128, s"fixture contract: ASCII text only, got code point $c")
      c
    }

  def renderFixture(docId: Long, text: String): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + (docId * 3) % 7).toInt
    val rgb = new Array[Byte](3 * w * h)
    var k = 0
    while (k < w * h) {
      val a = fixtureByte(text, k)
      rgb(3 * k) = a.toByte
      rgb(3 * k + 1) = ((3 * a + 7) % 256).toByte
      rgb(3 * k + 2) = ((5 * a + 11) % 256).toByte
      k += 1
    }
    docId % 3 match {
      case 0 => MediaCodec.encodeBmp(w, h, rgb)
      case 1 => MediaCodec.encodePpm(w, h, rgb)
      case _ => MediaCodec.encodePng(w, h, rgb)
    }
  }

  /** Batched REAL decode: payload bytes → [[MediaCodec.decode]] → channel
    * stats. Same partition-parallel mapPartitions shape as [[features]];
    * a payload the codec rejects surfaces as a null-format row rather than
    * failing the batch (callers route those to [[decodeStub]]). */
  def imageFeatures(spark: SparkSession,
      payloads: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { rec =>
          MediaCodec.decode(rec.payload) match {
            case Some(img) => ImageFeatures(rec.doc_id, img.format,
              img.width.toLong, img.height.toLong,
              img.width.toLong * img.height, img.sumR, img.sumG, img.sumB,
              img.posHash)
            case None => ImageFeatures(rec.doc_id, null, -1L, -1L, -1L,
              -1L, -1L, -1L, -1L)
          }
        }
      }
    }
  }

  /** Render fixture rasters from the documents table and REALLY decode
    * them: the oracle predicts the statistics from the fixture formulas,
    * the engine recovers them through full BMP/PPM parsing — header,
    * padding, row order, channel order all on the line. */
  val decodeQuery: QueryDef = QueryDef.sql(
    "multimodal_decode",
    """WITH p AS (SELECT doc_id, text, length(text) AS len,
      |                  8 + doc_id % 9 AS w, 8 + (doc_id * 3) % 7 AS h
      |           FROM documents),
      |px AS (SELECT doc_id, w, h,
      |              list_transform(generate_series(0, w*h - 1),
      |                 k -> ascii(substr(text, CAST(k % len AS INT) + 1, 1))) AS av
      |       FROM p)
      |SELECT doc_id,
      |       CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' ELSE 'png' END AS format,
      |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(w*h AS BIGINT) AS n_pixels,
      |       CAST(list_sum(av) AS BIGINT) AS sum_r,
      |       CAST(list_sum(list_transform(av, a -> (3*a + 7) % 256)) AS BIGINT) AS sum_g,
      |       CAST(list_sum(list_transform(av, a -> (5*a + 11) % 256)) AS BIGINT) AS sum_b,
      |       CAST(list_sum(list_transform(generate_series(1, w*h),
      |          k -> k * (av[CAST(k AS INT)] + 2*((3*av[CAST(k AS INT)]+7)%256)
      |                    + 3*((5*av[CAST(k AS INT)]+11)%256)))) AS BIGINT) AS pos_hash
      |FROM px ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => MediaRecord(id, renderFixture(id, text)) }
    imageFeatures(s, payloads).toDF().orderBy("doc_id")
  }

  /** FIXTURE: deterministic 8×8-block-constant grayscale mosaic — the
    * construction that makes a REAL lossy JPEG round-trip bit-exact, and
    * therefore DuckDB-oracle-checkable: a constant block's FDCT has only a
    * DC coefficient (ACs are exactly zero), DC = 8·(c−128), and at quality
    * 75 the DC quantizer step is exactly 8 ([[MediaCodec.scaledQuant]]) —
    * so quantization loses nothing and the decoder's IDCT returns every
    * pixel exactly. The ENCODED stream is a full baseline JPEG (markers,
    * canonical Huffman entropy coding, zigzag, byte stuffing) and the
    * decode path runs the full parser + Huffman + dequant + IDCT — only
    * the VALUES are engineered to survive, which is what lets the oracle
    * predict them from the mosaic formula. Non-flat content is pinned
    * separately by MediaCodecSpec's javax.imageio differential. */
  def renderJpegFixture(docId: Long, text: String): Array[Byte] = {
    val bw = (1 + docId % 3).toInt // blocks across: 1..3
    val bh = (1 + (docId * 5) % 2).toInt // blocks down: 1..2
    val w = 8 * bw; val h = 8 * bh
    val gray = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        gray(y * w + x) = fixtureByte(text, (y / 8) * bw + (x / 8)).toByte
        x += 1
      }
      y += 1
    }
    MediaCodec.encodeJpegGray(w, h, gray, quality = 75)
  }

  /** Render block-mosaic JPEGs from the documents table and REALLY decode
    * them — the JPEG face of `multimodal_decode`: the oracle predicts the
    * statistics from the mosaic formula, the engine recovers them through
    * the full baseline JPEG pipeline (marker parse, Huffman decode,
    * dequantization, IDCT). Grayscale ⇒ sum_r = sum_g = sum_b. */
  val jpegQuery: QueryDef = QueryDef.sql(
    "multimodal_jpeg",
    """WITH p AS (SELECT doc_id, text, length(text) AS len,
      |                  1 + doc_id % 3 AS bw, 1 + (doc_id * 5) % 2 AS bh
      |           FROM documents),
      |g AS (SELECT doc_id, bw, 8 * bw AS w, 8 * bh AS h,
      |             list_transform(generate_series(0, bw * bh - 1),
      |                i -> ascii(substr(text, CAST(i % len AS INT) + 1, 1))) AS bv
      |      FROM p)
      |SELECT doc_id, 'jpeg' AS format,
      |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(w * h AS BIGINT) AS n_pixels,
      |       CAST(64 * list_sum(bv) AS BIGINT) AS sum_r,
      |       CAST(64 * list_sum(bv) AS BIGINT) AS sum_g,
      |       CAST(64 * list_sum(bv) AS BIGINT) AS sum_b,
      |       CAST(list_sum(list_transform(generate_series(0, w * h - 1),
      |          k -> (k + 1) * 6 * bv[CAST((k // w // 8) * bw + (k % w) // 8 AS INT) + 1]))
      |         AS BIGINT) AS pos_hash
      |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => MediaRecord(id, renderJpegFixture(id, text)) }
    imageFeatures(s, payloads).toDF().orderBy("doc_id")
  }

  /** Decoded-audio statistics row (see [[MediaCodec.decodeAudio]]). */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_samples: Long,
      duration_micros: Long,
      sum_abs: Long,
      pos_hash: Long)

  /** FIXTURE: deterministic mono 16-bit PCM clip derived from a document —
    * rate and length from doc_id, sample k from the text bytes
    * (`(a·131 + 7k) % 4096 − 2048`, a signed ramp that exercises both
    * polarities). Same stand-in role as [[renderFixture]]. */
  def renderAudioFixture(docId: Long, text: String): Array[Byte] = {
    val rate = (8000 + (docId % 5) * 1000).toInt
    val n = (50 + docId % 30).toInt
    val samples = new Array[Short](n)
    var k = 0
    while (k < n) {
      val a = fixtureByte(text, k)
      samples(k) = ((a * 131 + 7 * k) % 4096 - 2048).toShort
      k += 1
    }
    MediaCodec.encodeWav(rate, samples)
  }

  /** Batched REAL audio decode: WAV bytes → [[MediaCodec.decodeAudio]] →
    * amplitude stats; rejected payloads surface as -1 rows, like
    * [[imageFeatures]]. */
  def audioFeatures(spark: SparkSession,
      payloads: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { rec =>
          MediaCodec.decodeAudio(rec.payload) match {
            case Some(a) => AudioFeatures(rec.doc_id, a.sampleRate.toLong,
              a.nSamples.toLong, a.durationMicros, a.sumAbs, a.posHash)
            case None => AudioFeatures(rec.doc_id, -1L, -1L, -1L, -1L, -1L)
          }
        }
      }
    }
  }

  /** Render fixture WAVs from the documents table and REALLY decode them:
    * the oracle predicts the statistics from the sample formulas, the
    * engine recovers them through full RIFF chunk walking and signed
    * little-endian PCM reads — the audio face of `multimodal_decode`. */
  val audioQuery: QueryDef = QueryDef.sql(
    "multimodal_audio",
    """WITH p AS (SELECT doc_id, text, length(text) AS len,
      |                  8000 + (doc_id % 5) * 1000 AS rate,
      |                  50 + doc_id % 30 AS n
      |           FROM documents),
      |s AS (SELECT doc_id, rate, n,
      |             list_transform(generate_series(0, n - 1),
      |                k -> (ascii(substr(text, CAST(k % len AS INT) + 1, 1)) * 131 + 7*k) % 4096 - 2048) AS sv
      |      FROM p)
      |SELECT doc_id,
      |       CAST(rate AS BIGINT) AS sample_rate,
      |       CAST(n AS BIGINT) AS n_samples,
      |       CAST(n * 1000000 // rate AS BIGINT) AS duration_micros,
      |       CAST(list_sum(list_transform(sv, x -> abs(x))) AS BIGINT) AS sum_abs,
      |       CAST(list_sum(list_transform(generate_series(1, n),
      |          k -> k * sv[CAST(k AS INT)])) AS BIGINT) AS pos_hash
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => MediaRecord(id, renderAudioFixture(id, text)) }
    audioFeatures(s, payloads).toDF().orderBy("doc_id")
  }

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

  val all: Seq[QueryDef] = Seq(meta, decodeQuery, audioQuery, jpegQuery)
}
