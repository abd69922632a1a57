package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ImageDedup, MediaCodec, MediaRecord, VideoDedup}

/** Perceptual video dedup semantics — the verdict-r11 acceptance case
  * front and center: a RE-ENCODED clip (different JPEG quality, first
  * frame dropped) must dedup against its original through the pooled
  * signature, a one-block perturbation must surface as a banded near-dup,
  * unrelated clips must pair with nothing, majority pooling must ignore a
  * minority frame, and stride sampling must read only the strided frames
  * off the `idx1` index. */
class VideoDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val Bw = 3; private val Bh = 8
  private val W = 8 * Bw; private val H = 8 * Bh

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  /** One flat-block frame from a per-(blockRow, blockCol) value fn. */
  private def frame(v: (Int, Int) => Int, quality: Int): Array[Byte] = {
    val gray = new Array[Byte](W * H)
    for (y <- 0 until H; x <- 0 until W)
      gray(y * W + x) = v(y / 8, x / 8).toByte
    MediaCodec.encodeJpegGray(W, H, gray, quality)
  }

  private def clip(frames: Seq[Array[Byte]]): Array[Byte] =
    MediaCodec.encodeAviMjpeg(W, H, frames, fps = 10)

  /** Column-increasing mosaic (25-value gaps, safely above any DC
    * quantization round-off) with a small per-frame shift that never
    * reorders blocks — every frame of every quality has one dHash. */
  private def steady(f: Int)(r: Int, c: Int): Int = 30 + 25 * c + 3 * r + f

  test("re-encoded clip (quality change + dropped first frame) dedups " +
      "against its original; one-block perturbation is a near-dup; " +
      "unrelated clip pairs with nothing") {
    import spark.implicits._
    val orig = clip((0 until 6).map(f => frame(steady(f), quality = 75)))
    val reenc = clip((1 until 7).map(f => frame(steady(f), quality = 40)))
    // swap the c1/c2 ordering at block row 3 only: exactly the (y=3, x=5)
    // gradient bit flips in every frame -> pooled Hamming 1 from orig
    val perturbed = clip((0 until 6).map { f =>
      frame((r, c) =>
        if (r == 3 && c == 1) steady(f)(r, 2)
        else if (r == 3 && c == 2) steady(f)(r, 1)
        else steady(f)(r, c), quality = 75)
    })
    // column-DECREASING: the complement of `steady` at every boundary bit
    val unrelated = clip((0 until 6).map { f =>
      frame((r, c) => 30 + 25 * (2 - c) + 3 * r + f, quality = 75)
    })

    val bOrig = VideoDedup.clipBands(orig, stride = 1)
    val bReenc = VideoDedup.clipBands(reenc, stride = 1)
    val bPert = VideoDedup.clipBands(perturbed, stride = 1)
    assert(bOrig.sameElements(bReenc),
      s"re-encode must pool to the identical signature: " +
        s"${bOrig.toSeq} vs ${bReenc.toSeq}")
    assert(hamming(bOrig, bPert) === 1, s"perturbation must cost exactly " +
      s"the one flipped gradient bit: ${hamming(bOrig, bPert)}")

    val payloads = Seq(MediaRecord(1L, orig), MediaRecord(2L, reenc),
      MediaRecord(3L, perturbed), MediaRecord(4L, unrelated)).toDS()
    val rows = ImageDedup.report(
      VideoDedup.fingerprints(spark, payloads, _ => 1).toDF(), hashCol = "vhash")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(1L) === ((1L, 2L, 1L)),
      s"orig: exact group with the re-encode, near the perturbation: $rows")
    assert(rows(2L) === ((1L, 2L, 1L)), s"re-encode dedups to keep_id 1: $rows")
    assert(rows(3L)._3 >= 2L, s"perturbation near both twins: $rows")
    assert(rows(4L)._2 === 1L && rows(4L)._3 === 0L, s"unrelated paired: $rows")
  }

  test("majority pooling ignores a minority frame") {
    val odd = frame((r, c) => 30 + 25 * ((2 - c) % 3) + 3 * r, quality = 75)
    val five = clip((0 until 4).map(f => frame(steady(f), 75)) :+ odd)
    val four = clip((0 until 4).map(f => frame(steady(f), 75)))
    assert(VideoDedup.clipBands(five, 1).sameElements(VideoDedup.clipBands(four, 1)),
      "one dissenting frame in five must not move any pooled bit")
  }

  test("stride sampling reads only frames 0, s, 2s, ... off the idx1 index") {
    val p = (0 until 6).map(f => frame(steady(f), 75))
    val q = (0 until 6).map(f => frame((r, c) => 30 + 25 * ((2 - c) % 3) + 3 * r + f, 75))
    // even slots carry P, odd slots carry Q: stride 2 must see pure P
    val interleaved = clip((0 until 6).map(i => if (i % 2 == 0) p(i) else q(i)))
    val pureP = clip(Seq(p(0), p(2), p(4)))
    assert(VideoDedup.clipBands(interleaved, 2)
      .sameElements(VideoDedup.clipBands(pureP, 1)),
      "stride-2 signature must equal the even-frames-only pool")
    assert(!VideoDedup.clipBands(interleaved, 1)
      .sameElements(VideoDedup.clipBands(interleaved, 2)),
      "stride must actually change which frames vote")
  }

  test("unparseable container and truncated frame degrade to -1 sentinel") {
    val good = clip(Seq(frame(steady(0), 75)))
    assert(VideoDedup.clipBands("not an avi".getBytes, 1).forall(_ === -1L))
    assert(VideoDedup.clipBands(good.take(good.length / 2), 1).forall(_ === -1L))
  }
}
