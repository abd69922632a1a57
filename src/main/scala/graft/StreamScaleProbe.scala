package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-side decade receipt (r19 verdict item 6's suggested shape):
  * drive the batch bodies of two ingest loops over the FULL 10× ProbeGen
  * corpus, one micro-batch per probe copy, and print per-batch seconds.
  * The claim under test is the incremental contract — per-batch cost is
  * O(batch + store probe), NOT O(corpus ingested so far) — measured, not
  * argued: if any loop's per-batch time grew with the accumulated store,
  * the curve would slope; flat is the receipt.
  *
  * Loops driven (the heaviest and the simplest of the family):
  *  - `ingestBatchSpans`: span-grain audit + distinct-hash store append.
  *    Copy 0 seeds the store with the ENTIRE sf0.1 corpus's distinct span
  *    hashes, so batches 1..9 each probe a corpus-scale store — exactly
  *    the daily-ingest posture at 100 TB.
  *  - `ingestBatch` (exact token-set dedup): copies are verbatim twins,
  *    so batch 0 emits survivors and every later batch must drop ALL its
  *    rows against the store — the all-duplicate worst case for the
  *    anti-join probe.
  *
  * Usage: runMain graft.StreamScaleProbe <probeDir> <workDir> [copies=10]
  * Prints one JSON line: {"spans_secs":[...], "exact_secs":[...]}. */
object StreamScaleProbe {
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val probeDir = args.headOption.getOrElse("/tmp/probe10x")
    val workDir = args.lift(1).getOrElse("/tmp/stream_scale_probe")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)

    val docs = Tables.documents(spark, probeDir)
    def copyBatch(c: Int) =
      docs.filter(col("doc_id") >= c * Off && col("doc_id") < (c + 1) * Off)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val spanSecs = (0 until copies).map { c =>
      timed(graft.streaming.StreamingOps.ingestBatchSpans(
        copyBatch(c), s"$workDir/span_store", s"$workDir/span_out", c.toLong))
    }
    val exactSecs = (0 until copies).map { c =>
      timed(graft.streaming.StreamingOps.ingestBatch(
        copyBatch(c), s"$workDir/fp_store", s"$workDir/fp_out"))
    }
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"""{"spans_secs":${arr(spanSecs)},"exact_secs":${arr(exactSecs)},"copies":$copies,"probe":"$probeDir"}""")
    spark.stop()
  }
}
