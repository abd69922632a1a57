package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioDedup, ImageDedup, MediaCodec, MediaRecord}

/** Perceptual audio dedup semantics: the same clip under a different
  * container sample-rate label must hash identically (the fingerprint is
  * a function of the samples alone), a mildly corrupted copy must surface
  * as a banded near-dup, and unrelated audio must pair with nothing. */
class AudioDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  /** Mixed-sign deterministic clip; n = 130 makes envelope point j read
    * exactly sample 2j, so a single-sample edit at an even index moves
    * one envelope point and at most two gradient bits. */
  private def clip(n: Int, seed: Int): Array[Short] =
    Array.tabulate(n)(k => (((k * 37 + seed) % 4001) - 2000).toShort)

  test("sample-rate relabel is fingerprint-invariant; near-copy dedups; unrelated does not") {
    import spark.implicits._
    val base = clip(130, 13)
    val fpAt = (rate: Int, s: Array[Short]) =>
      AudioDedup.afpBands(MediaCodec.decodeAudioPcm(MediaCodec.encodeWav(rate, s)).get._2)
    assert(fpAt(8000, base).sameElements(fpAt(16000, base)),
      "fingerprint must depend on samples only, not the container rate")

    // find a single-sample corruption measured at Hamming 1..MaxDist
    val h0 = fpAt(8000, base)
    val corrupted = (10 until 55).iterator.map { j =>
      val c = base.clone(); c(2 * j) = 32767.toShort; c
    }.find { c => val d = hamming(h0, fpAt(8000, c)); d >= 1 && d <= ImageDedup.MaxDist }
    assert(corrupted.isDefined, "no 1..3-bit corruption found")

    val payloads = Seq(
      MediaRecord(1L, MediaCodec.encodeWav(8000, base)),
      MediaRecord(2L, MediaCodec.encodeWav(16000, base)), // exact dup, relabeled
      MediaRecord(3L, MediaCodec.encodeWav(8000, corrupted.get)), // near dup
      MediaRecord(4L, MediaCodec.encodeWav(8000, clip(97, 1777)))) // unrelated
      .toDS()
    val rows = ImageDedup.report(
      AudioDedup.fingerprints(spark, payloads).toDF(), hashCol = "afp")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(1L)._1 === 1L && rows(1L)._2 === 2L, s"exact group wrong: $rows")
    assert(rows(2L)._1 === 1L, s"keep_id must be the min id: $rows")
    assert(rows(3L)._3 >= 2L, s"corrupted copy not near both twins: $rows")
    assert(rows(4L)._2 === 1L && rows(4L)._3 === 0L, s"unrelated paired: $rows")
  }

  test("empty clip degrades to the -1 sentinel and joins nothing") {
    import spark.implicits._
    val payloads = Seq(
      MediaRecord(1L, MediaCodec.encodeWav(8000, Array[Short]())),
      MediaRecord(2L, MediaCodec.encodeWav(8000, clip(130, 13)))).toDS()
    val fps = AudioDedup.fingerprints(spark, payloads).collect()
      .map(b => b.doc_id -> b).toMap
    assert(fps(1L).b0 === -1L && fps(1L).b3 === -1L)
    val rows = ImageDedup.report(
      AudioDedup.fingerprints(spark, payloads).toDF(), hashCol = "afp")
      .collect()
    assert(rows.map(_.getLong(0)).toSet === Set(2L), "sentinel row must be dropped")
  }
}
