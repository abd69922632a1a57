package graft

import org.scalatest.funsuite.AnyFunSuite

/** Waterfilling semantics of `sample_mixture_plan` on a fixture where a
  * language is genuinely short of its quota — the real corpus at test SFs
  * is surplus-everywhere, so redistribution is only dust there; this pins
  * the deficit path against hand arithmetic.
  *
  * Fixture: lang a = 10 tokens, b = 100, c = 90 → total 200, budget 100,
  * uniform quota 33. a keeps all 10 (deficient); keep1 = (10, 33, 33),
  * pooled deficit = 100 − 76 = 24, remaining capacity = (0, 67, 57),
  * extras = (0, 24·67 div 124, 24·57 div 124) = (0, 12, 11) →
  * planned = (10, 45, 44). */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("deficient language keeps all tokens; deficit redistributes by capacity") {
    import spark.implicits._
    def doc(id: Long, lang: String, nTokens: Int) =
      (id, (1 to nTokens).map(i => s"w$i").mkString(" "), lang, "srcX", nTokens.toLong)
    val docs = (Seq(doc(0, "a", 10)) ++
      Seq(doc(1, "b", 50), doc(2, "b", 50)) ++
      Seq(doc(3, "c", 30), doc(4, "c", 30), doc(5, "c", 30)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-mixture")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("sample_mixture_plan")(spark, tmp.toString)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val (aAvail, aQuota, aPlanned, aKeptDocs, aKeptTok, _) = got("a")
    assert((aAvail, aQuota, aPlanned) === ((10L, 33L, 10L)),
      "deficient language: planned = available, quota untouched")
    assert(aKeptDocs === 1L && aKeptTok === 10L, "keeps its whole corpus")
    assert((got("b")._1, got("b")._3) === ((100L, 45L)), s"b got ${got("b")}")
    assert((got("c")._1, got("c")._3) === ((90L, 44L)), s"c got ${got("c")}")
    // realization: kept prefix never exceeds the plan, fill ≤ 1000 milli
    for ((lang, (_, _, planned, _, keptTok, fill)) <- got) {
      assert(keptTok <= planned, s"$lang overfilled: $keptTok > $planned")
      assert(fill <= 1000L, s"$lang fill $fill")
    }
    // whole-document granularity: b's 50-token docs cannot fit its
    // 45-token plan, so b keeps NOTHING (the documented cost of document-
    // atomic realization — a production pipeline that must fill the quota
    // chunks oversized docs first, e.g. via pack_sequences); c fits
    // exactly one 30-token doc under its 44-token plan
    assert((got("b")._4, got("b")._5) === ((0L, 0L)), s"b kept ${got("b")}")
    assert((got("c")._4, got("c")._5) === ((1L, 30L)), s"c kept ${got("c")}")
    assert(got.values.map(_._5).sum === 40L)

    // the PACKED realization closes exactly this underfill: chunked at
    // ChunkTokens, every language whose corpus covers its plan fills to
    // within ChunkTokens of it (greedy prefix: the stop gap is smaller
    // than the next chunk), and b goes from 0 kept tokens to >= 32
    val packed = SparkEntry.queries("sample_mixture_packed")(spark, tmp.toString)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val ct = graft.operators.TrainingData.ChunkTokens.toLong
    for ((lang, (avail, planned, kept)) <- packed if avail >= planned)
      assert(kept > planned - ct, s"$lang: kept $kept vs planned $planned")
    assert(packed("a")._3 === 10L, "deficient lang still keeps everything")
    // greedy prefix (never skip-and-continue): b's exact kept depends on
    // the md5 chunk order, but it can no longer be ZERO — the stranding
    // the document-atomic form exhibits above
    assert(packed("b")._3 > 0L, s"b chunked-kept ${packed("b")}")
  }

  /** Temperature plan endpoints: α=1 is proportional sampling (quota ∝
    * avail exactly), α→0 (num=0) degenerates to the uniform waterfilling
    * target, and the registered α=3/10 weights equal the true integer
    * floor ⌊avail^0.3⌋ (checked against BigInt arithmetic, which has no
    * precision envelope to share bugs with the decimal path). */
  test("temperature mixture: α endpoints and exact α=3/10 weights") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5, size, split}
    def doc(id: Long, lang: String, nTokens: Int) =
      (id, (1 to nTokens).map(i => s"w$i").mkString(" "), lang, "srcX", nTokens.toLong)
    val docs = (Seq(doc(0, "a", 10)) ++
      Seq(doc(1, "b", 50), doc(2, "b", 50)) ++
      Seq(doc(3, "c", 30), doc(4, "c", 30), doc(5, "c", 30)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("nt"),
      md5(col("doc_id").cast("string")).as("r"))
    // avail: a=10, b=100, c=90; total=200, budget=100
    def planOf(num: Int, den: Int): Map[String, (Long, Long, Long, Long)] =
      graft.operators.TrainingData.temperaturePlan(t, num, den).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // α = 1: weight = avail, quota = budget·avail div total — proportional
    val prop = planOf(1, 1)
    assert(prop("a") === ((10L, 10L, 5L, 5L)),
      s"a: weight=avail, quota=100*10 div 200=5, no language deficient so " +
        s"planned=quota: ${prop("a")}")
    assert(prop("b") === ((100L, 100L, 50L, 50L)), s"b ${prop("b")}")
    assert(prop("c") === ((90L, 90L, 45L, 45L)), s"c ${prop("c")}")

    // α → 0 (num=0): every weight 1 → quota = budget div n_langs = the
    // uniform waterfilling target (MixtureSpec's hand-checked fixture)
    val unif = planOf(0, 1)
    assert(unif.values.forall(_._2 == 1L), s"uniform weights: $unif")
    assert(unif("a") === ((10L, 1L, 33L, 10L)), s"a ${unif("a")}")
    assert(unif("b")._4 === 45L && unif("c")._4 === 44L,
      s"matches sample_mixture_plan's redistribution: $unif")

    // α = 3/10: weight is the exact integer floor of avail^0.3
    val temp = planOf(3, 10)
    for ((lang, (avail, wt, _, planned)) <- temp) {
      val exact = Iterator.from(1).takeWhile(w =>
        BigInt(w).pow(10) <= BigInt(avail).pow(3)).max
      assert(wt === exact.toLong, s"$lang: floor($avail^0.3)=$exact got $wt")
      assert(planned <= avail, s"$lang overplanned")
    }
    // budget is never exceeded and monotone flattening holds: lowering α
    // from 1 shifts plan from the biggest language toward the smallest
    assert(temp.values.map(_._4).sum <= 100L)
    assert(temp("b")._4 < prop("b")._4 || temp("a")._4 >= prop("a")._4,
      s"temperature flattens vs proportional: $temp vs $prop")
  }

  /** Hand arithmetic for the epoch-capped upsampling plan on the same
    * fixture: total 200 = budget, target 66; caps 4·avail = (40, 400,
    * 360); keep1 = (40, 66, 66), surplus 28, room (0, 334, 294) →
    * extras (0, 14, 13) → planned (40, 80, 79). a realizes exactly 4
    * epochs; b and c realize a document-atomic tail below one epoch. */
  test("epoch mixture: upsampling capped at MaxEpochs, tail document-atomic") {
    import spark.implicits._
    def doc(id: Long, lang: String, nTokens: Int) =
      (id, (1 to nTokens).map(i => s"w$i").mkString(" "), lang, "srcX", nTokens.toLong)
    val docs = (Seq(doc(0, "a", 10)) ++
      Seq(doc(1, "b", 50), doc(2, "b", 50)) ++
      Seq(doc(3, "c", 30), doc(4, "c", 30), doc(5, "c", 30)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-epochs")
    docs.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("sample_mixture_epochs")(spark, tmp.toString)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // (avail, target, planned, full_epochs, kept, epochs_milli, fill_milli)
    assert(got("a") === ((10L, 66L, 40L, 4L, 40L, 4000L, 1000L)),
      s"a pinned at the 4-epoch cap and fully realized: ${got("a")}")
    assert((got("b")._1, got("b")._3, got("b")._4) === ((100L, 80L, 0L)),
      s"b downsampled below one epoch: ${got("b")}")
    assert(got("b")._5 === 50L && got("b")._7 === 625L,
      s"b's 50-token docs fill 50 of 80 (document-atomic): ${got("b")}")
    assert((got("c")._3, got("c")._5, got("c")._7) === ((79L, 60L, 759L)),
      s"c keeps two 30-token docs under its 79 plan: ${got("c")}")
    for ((lang, v) <- got) {
      assert(v._3 <= graft.operators.TrainingData.MaxEpochs * v._1,
        s"$lang planned past the epoch cap: $v")
      assert(v._5 <= v._3, s"$lang overfilled: $v")
    }
    assert(got.values.map(_._3).sum <= 200L, "plan never exceeds the budget")
  }

  /** ADVICE r11 (medium): a language whose avail^num overflows the
    * DECIMAL(38,0) envelope must fail LOUDLY — under non-ANSI Spark the
    * overflow yields NULL, every weight candidate's comparison goes
    * non-true, and a silent filter would drop the language from the plan
    * and the budget sums while DuckDB's HUGEINT raises. The plan now
    * raises on any language with no surviving candidate. */
  test("temperature plan raises loudly when avail^num exceeds DECIMAL(38,0)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // avail = 5e12 → avail^3 ≈ 1.25e38 > 10^38-1: out of the envelope
    val t = Seq((1L, "big", 5_000_000_000_000L), (2L, "small", 10L))
      .toDF("doc_id", "lang", "nt").withColumn("r", col("doc_id").cast("string"))
    val ex = intercept[Exception] {
      graft.operators.TrainingData.temperaturePlan(t, 3, 10).collect()
    }
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ msgs(e.getCause)
    assert(msgs(ex).exists(m => m.contains("temperaturePlan") || m.contains("38")),
      s"must name the overflow, got: ${msgs(ex).mkString(" | ")}")
    // in-envelope languages are untouched: full plan still has every lang
    val ok = Seq((1L, "x", 1000L), (2L, "y", 10L)).toDF("doc_id", "lang", "nt")
    val rows = graft.operators.TrainingData.temperaturePlan(ok, 3, 10)
      .select("lang").collect().map(_.getString(0)).toSet
    assert(rows === Set("x", "y"))
  }
}
