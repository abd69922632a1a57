package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** PERCEPTUAL audio dedup — the audio leg of the modality triangle
  * (text → `dedup_*`, image → `dedup_image_dhash`, audio → here), a
  * standard pass in speech/audio corpus pipelines where the same clip
  * recurs under different container metadata or trivial level tweaks.
  *
  * Recipe: envelope difference hash, the 1-D analogue of image dHash and
  * the shape of the published robust audio hashes (Haitsma & Kalker's
  * Philips fingerprint derives bits from energy DIFFERENCES across
  * frames for exactly this level-invariance). Decode the payload through
  * the REAL [[MediaCodec.decodeAudioPcm]] RIFF/PCM parser, resample the
  * rectified envelope |s_k| to 65 points with the same floor-division
  * nearest-neighbor rule as [[MediaCodec.resizeNearest]]
  * (point j reads sample (j·n)/65), then one bit per neighbor pair:
  * bit g = env(g) < env(g+1) — 64 bits carried as four 16-bit bands,
  * never assembled into one 64-bit value (bit 63 vs signed BIGINT, see
  * [[DHashBands]]).
  *
  * Near-dup detection and the per-doc report are [[ImageDedup.report]]
  * verbatim — the Manku 4×16 banding guarantees any pair within Hamming
  * ≤ 3 shares a band, so candidates come from per-band bucket joins and
  * `bit_count(xor)` verifies. A clip duplicated a million times costs
  * its count in the exact-group aggregate, never a pairwise blow-up.
  *
  * Plan shape at 100 TB: decode + hash is scan-local (one linear PCM
  * pass + 65 envelope reads per clip); only 4 × ~40 B band rows shuffle.
  * The fingerprint depends on the SAMPLES alone — container sample-rate
  * relabeling cannot split a duplicate group (spec-pinned).
  *
  * Oracle: DuckDB replays fixture formula → envelope resample → gradient
  * bits → banding join value-for-value, so a sign, index-origin, or
  * chunk-walk bug in the WAV decoder fails value-level. Reference scope:
  * kafka-streams-aggregate has no media analytics; this extends the
  * dedup family (SURVEY.md §2 extensions) to the audio column.
  */
object AudioDedup {

  /** Envelope points: 64 gradient bits need 65 samples of the envelope. */
  val Points = 65

  /** Envelope dHash of a PCM clip as four 16-bit bands; None-equivalent
    * (-1 bands) for empty clips upstream. */
  def afpBands(samples: Array[Int]): Array[Long] = {
    val n = samples.length
    val env = Array.tabulate(Points)(j => math.abs(samples((j * n) / Points)))
    Array.tabulate(4) { i =>
      var band = 0L
      var j = 0
      while (j < 16) {
        val g = 16 * i + j
        if (env(g) < env(g + 1)) band |= 1L << j
        j += 1
      }
      band
    }
  }

  /** Batched decode → envelope hash. Undecodable or empty payloads
    * surface as all-(-1) bands and join no band bucket downstream. */
  def fingerprints(spark: SparkSession,
      payloads: Dataset[MediaRecord]): Dataset[DHashBands] = {
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.grouped(Multimodal.BatchSize).flatMap { batch =>
        batch.map { rec =>
          MediaCodec.decodeAudioPcm(rec.payload) match {
            case Some((_, s)) if s.nonEmpty =>
              val b = afpBands(s)
              DHashBands(rec.doc_id, b(0), b(1), b(2), b(3))
            case _ => DHashBands(rec.doc_id, -1L, -1L, -1L, -1L)
          }
        }
      }
    }
  }

  /** Oracle: fixture formula → envelope → gradient bits, then the exact
    * banding replay shared with the image oracle. Sample k of clip
    * (n = 50 + doc_id mod 30) is (ascii·131 + 7k) mod 4096 − 2048;
    * envelope point j reads 1-based index (j·n)//65 + 1. */
  private def oracleSql: String = {
    val bandExprs = (0 until 4).map { i =>
      (0 until 16).map { j =>
        val g = 16 * i + j
        s"(CASE WHEN av[CAST(($g*n)//65 AS INT) + 1] < av[CAST((${g + 1}*n)//65 AS INT) + 1] THEN ${1L << j} ELSE 0 END)"
      }.mkString("(", " + ", s") AS b$i")
    }.mkString(",\n      |           ")
    s"""WITH p AS (SELECT doc_id, text, length(text) AS len,
      |                  50 + doc_id % 30 AS n
      |           FROM documents),
      |s AS (SELECT doc_id, n,
      |             list_transform(generate_series(0, n - 1),
      |                k -> abs((ascii(substr(text, CAST(k % len AS INT) + 1, 1)) * 131 + 7*k) % 4096 - 2048)) AS av
      |      FROM p),
      |fp AS (SELECT doc_id,
      |           $bandExprs
      |       FROM s),
      |${ImageDedup.reportTailSql("afp")}""".stripMargin
  }

  val query: QueryDef = QueryDef.sql("dedup_audio_fingerprint", oracleSql) { (s, d) =>
    import s.implicits._
    val payloads = Tables.fanOut(Tables.documents(s, d)
      .select(col("doc_id"), col("text"))).as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, Multimodal.renderAudioFixture(id, text)) }
    ImageDedup.report(fingerprints(s, payloads).toDF(), hashCol = "afp")
  }

  val all: Seq[QueryDef] = Seq(query)
}
