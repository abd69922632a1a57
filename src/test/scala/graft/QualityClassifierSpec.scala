package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** The trained quality classifier actually learns: eval accuracy must beat
  * the majority class by a real margin (a constant predictor scores the
  * majority rate; measured ~0.93 at this SF), predictions must use both
  * classes, and the scoring join must broadcast the vocabulary-sized
  * weight table. Value correctness vs DuckDB is the driver gate
  * (quality_nb_classify is fully oracled). */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = QualityClassifier.nbClassify.run(spark, dir)
  private lazy val rows = out.collect().map(r =>
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("learns the label: accuracy beats the majority class with margin") {
    val n = rows.length
    assert(n > 20, s"eval slice too small to judge: $n")
    val acc = rows.count(r => r._3 == r._5).toDouble / n
    val majority = math.max(rows.count(_._3 == 1L), rows.count(_._3 == 0L)).toDouble / n
    assert(acc >= 0.80, s"accuracy $acc below floor")
    assert(acc > majority + 0.05,
      s"accuracy $acc does not beat majority rate $majority — constant predictor?")
  }

  test("predictions are non-degenerate (both classes emitted)") {
    val preds = rows.map(_._5).toSet
    assert(preds == Set(0L, 1L), s"degenerate predictions: $preds")
  }

  test("filter agrees with the classifier on the eval slice and keeps only score >= 0") {
    val kept = QualityClassifier.classifierFilter.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(kept.values.forall(_ >= 0L), "filter must keep only non-negative scores")
    // same model, same arithmetic: every eval doc the classifier scored
    // non-negative is kept with the identical score; negatives are absent
    rows.foreach { case (id, _, _, score, _) =>
      if (score >= 0) assert(kept.get(id).contains(score),
        s"eval doc $id (score $score) missing or rescored in the filter output")
      else assert(!kept.contains(id), s"eval doc $id (score $score) wrongly kept")
    }
    // the filter really drops something, and keeps something
    assert(kept.nonEmpty)
    assert(rows.exists(_._4 < 0), "fixture must include dropped docs")
  }

  test("incremental store merge equals a full retrain, term for term") {
    import org.apache.spark.sql.functions._
    val merged = QualityClassifier.nbIncremental.run(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(5), r.getLong(6)))).toMap
    // one-shot counts over the whole corpus — what a full retrain would fit
    val full = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("lab", when(
        expr("(1000 * size(filter(w, x -> x IN ('the','a','value','key')))) div size(w)") <= 125,
        1L).otherwise(0L))
      .select(col("lab"), explode(col("w")).as("t"))
      .groupBy("t")
      .agg(sum(when(col("lab") === 1, 1L).otherwise(0L)).as("cg"),
        sum(when(col("lab") === 0, 1L).otherwise(0L)).as("cb"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(merged === full,
      "additive sufficient statistics must make the merge a bit-exact retrain")
    assert(merged.nonEmpty)
  }

  test("eval report's confusion cells equal the classify output cell by cell") {
    val ev = QualityClassifier.nbEval.run(spark, dir).collect().head
    val (tp, fp, fn, tn) = (ev.getLong(0), ev.getLong(1), ev.getLong(2), ev.getLong(3))
    assert(tp === rows.count(r => r._3 == 1L && r._5 == 1L))
    assert(fp === rows.count(r => r._3 == 0L && r._5 == 1L))
    assert(fn === rows.count(r => r._3 == 1L && r._5 == 0L))
    assert(tn === rows.count(r => r._3 == 0L && r._5 == 0L))
    assert(tp + fp + fn + tn === rows.length.toLong, "cells partition the slice")
    // milli metrics are the exact integer ratios of those cells
    assert(ev.getLong(4) === 1000 * (tp + tn) / (tp + fp + fn + tn), "accuracy")
    assert(ev.getLong(7) === 2000 * tp / (2 * tp + fp + fn), "f1")
    assert(ev.getLong(4) > ev.getLong(8), "beats the majority baseline")
  }

  test("calibration: good rate rises with the score bin") {
    val cal = QualityClassifier.nbCalibration.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(cal.length >= 3, s"too few bins: ${cal.length}")
    // every interior bin's score range lies inside its 1000-milli window
    for ((bin, _, _, lo, hi) <- cal if bin > -20 && bin < 20) {
      assert(lo >= bin * 1000 && hi < (bin + 1) * 1000, s"bin $bin holds [$lo,$hi]")
    }
    // ordinal signal, coarse: negative bins' pooled good rate strictly
    // below positive bins' pooled rate
    def pooled(p: Long => Boolean): Option[Long] = {
      val xs = cal.filter(c => p(c._1))
      val n = xs.map(_._2).sum
      if (n == 0) None else Some(1000 * xs.map(_._3).sum / n)
    }
    val neg = pooled(_ < 0)
    val pos = pooled(_ > 0)
    assert(neg.exists(nr => pos.exists(_ > nr)),
      s"calibration lost the ordinal signal: neg=$neg pos=$pos")
  }

  test("threshold sweep: cumulative-from-the-top invariants and agreement " +
      "with the calibration bins") {
    val cal = QualityClassifier.nbCalibration.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sw = QualityClassifier.nbThresholdSweep.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(sw.map(_._1).toSet === cal.keySet, "one sweep row per populated bin")
    val allDocs = cal.values.map(_._1).sum
    val allGood = cal.values.map(_._2).sum
    // lowest edge = the keep-everything cut
    val bottom = sw.head
    assert(bottom._3 === allDocs && bottom._4 === allGood,
      s"lowest threshold keeps the whole eval slice: $bottom")
    assert(bottom._5 === 1000L && bottom._7 === 1000L,
      "keep-all row reports yield=1000 and recall=1000")
    // kept counts are the exact suffix sums of the calibration bins,
    // strictly decreasing as the cut rises; ratios recompute
    for ((bin, thr, nKept, tp, yld, prec, rec) <- sw) {
      assert(thr === bin * 1000, "threshold is the bin lower edge")
      val expKept = cal.filter(_._1 >= bin).values.map(_._1).sum
      val expTp = cal.filter(_._1 >= bin).values.map(_._2).sum
      assert(nKept === expKept && tp === expTp, s"suffix sums at bin $bin")
      assert(yld === 1000L * nKept / allDocs, s"yield at bin $bin")
      assert(prec === 1000L * tp / nKept, s"precision at bin $bin")
      assert(rec === 1000L * tp / math.max(allGood, 1L), s"recall at bin $bin")
    }
    assert(sw.map(_._3).toSeq === sw.map(_._3).toSeq.sorted.reverse,
      "n_kept monotone non-increasing in the threshold")
    // the sweep earns its keep: some interior cut trades yield for
    // precision vs the keep-all baseline
    assert(sw.exists(r => r._6 > bottom._6 && r._5 < 1000L),
      s"some cut must beat baseline precision: ${sw.toSeq}")
  }

  test("scoring joins the weight table via broadcast") {
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab-sized weight table must broadcast:\n$plan")
  }
}
