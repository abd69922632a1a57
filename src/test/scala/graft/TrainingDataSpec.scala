package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData

/** Invariants for the curation operators beyond their DuckDB oracles:
  * packing conservation/bounds, contamination plan shape (the corpus side
  * must never shuffle for the eval join), and repetition-signal sanity.
  * Runs on the sf0.001 tables. */
class TrainingDataSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("pack_sequences: offsets bounded, bins dense, tokens conserved per shard") {
    val out = TrainingData.packSequences.run(spark, dir).collect()
    val budget = TrainingData.PackBudget
    out.foreach { r =>
      val off = r.getAs[Long]("bin_offset")
      assert(off >= 0 && off < budget, s"offset $off outside [0, $budget)")
    }
    // per shard: doc offsets must chain (each doc starts where the previous
    // ended, mod budget) and bin ids must be non-decreasing in doc order
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("bin_id") === cum / budget, s"bin drift in $src")
        assert(r.getAs[Long]("bin_offset") === cum % budget, s"offset drift in $src")
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("contamination_ngram: eval slice excluded, ratios bounded, broadcast plan") {
    val df = TrainingData.contamination.run(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 != 0L, "eval docs must not be scored")
      val m = r.getAs[Long]("contam_milli")
      assert(m >= 0 && m <= 1000, s"contam_milli $m outside [0,1000]")
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_shingles"))
    }
    // the corpus-side shingle join must broadcast the eval set — a sort-merge
    // join here would shuffle the full corpus shingle table at scale
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("repetition signals: top bigram really is the max, fractions consistent") {
    val out = TrainingData.repetition.run(spark, dir).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val nt = r.getAs[Long]("n_tokens")
      val c = r.getAs[Long]("top_bigram_count")
      assert(c >= 1, "every multi-token doc has at least one bigram")
      assert(c <= nt - 1, "bigram count cannot exceed n_tokens - 1")
      val dup = r.getAs[Long]("dup_token_milli")
      assert(dup >= 0 && dup < 1000)
    }
    // spot-check one doc against a driver-side count
    val one = Tables.documents(spark, dir).filter(col("doc_id") === 0)
      .select("text").head().getString(0).split(" ")
    val bigrams = one.sliding(2).map(_.mkString(" ")).toSeq
    val expectMax = bigrams.groupBy(identity).map { case (bg, o) => (o.size, bg) }
    val best = expectMax.toSeq.sortBy { case (c, bg) => (-c, bg) }.head
    val got = out.find(_.getAs[Long]("doc_id") == 0L).get
    assert(got.getAs[String]("top_bigram") === best._2)
    assert(got.getAs[Long]("top_bigram_count") === best._1.toLong)
  }

  test("salted domain quota ≡ single-window rank, incl. an adversarial mega-domain") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // mega-domain: one source holding ~95% of the corpus — the exact shape
    // that makes the single-window form a one-hot-task scale-killer
    val docs = ((0 until 1900).map(i => (i.toLong, s"megacorp", s"doc $i text ${i % 7}")) ++
      (0 until 100).map(i => ((10000 + i).toLong, s"tail${i % 5}", s"tail doc $i"))
    ).toDF("doc_id", "source", "text")
    val single = docs
      .select(col("doc_id"), col("source"),
        row_number().over(
          Window.partitionBy(col("source")).orderBy(md5(col("text")), col("doc_id")))
          .cast("long").as("rnk"))
      .filter(col("rnk") <= TrainingData.DomainQuota)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val salted = TrainingData.domainQuotaOn(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === single, "two-phase quota must reproduce ranks exactly")
    // and phase 1 must genuinely bound what reaches the per-source window:
    // with salts=1 the phases collapse to the single window (degenerate case)
    val degenerate = TrainingData.domainQuotaOn(docs, salts = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(degenerate === single)
  }
}
