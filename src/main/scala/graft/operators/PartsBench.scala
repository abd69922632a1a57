package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev tool (r21): time the component stages of the shingle-family pipeline
  * in isolation through the noop sink (guide §1.4), so optimization targets
  * the stage that actually burns the time. Not part of the driver surface.
  * Usage: runMain graft.operators.PartsBench <sfDir> */
object PartsBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val b = sys.env.get("GRAFT_OBJ_AGG_FALLBACK").fold(b0)(v =>
      b0.config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var cpuMs = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuMs += t.taskMetrics.executorCpuTime / 1000000L
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clearCaches(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    def time(label: String)(mk: => DataFrame): Unit = {
      // interleaved A/B on the object-agg fallback threshold: alternate
      // default(128) / high within one JVM so ambient drift cancels
      noop(mk); clearCaches() // warm
      val runs = (1 to 8).map { i =>
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          if (i % 2 == 1) "128" else "4194304")
        cpuMs = 0L
        val t0 = System.nanoTime()
        noop(mk)
        val w = (System.nanoTime() - t0) / 1e9
        clearCaches()
        (w, cpuMs)
      }
      val a = runs.zipWithIndex.collect { case (r, i) if i % 2 == 0 => r._1 }
      val b = runs.zipWithIndex.collect { case (r, i) if i % 2 == 1 => r._1 }
      println(f"[parts] $label%-28s def128 min=${a.min}%.3fs med=${a.sorted.apply(a.size / 2)}%.3f | high min=${b.min}%.3fs med=${b.sorted.apply(b.size / 2)}%.3f")
    }
    val docs = Tables.documents(spark, sfDir)

    // stage 1: tokenize + shingle explode + xxhash (inlined copy of
    // Dedup.shingles — the private production form)
    def sh = Tables.fanOut(docs)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1), size(col("w")) - 2),
        i => concat_ws(" ",
          element_at(col("w"), i),
          element_at(col("w"), i + 1),
          element_at(col("w"), i + 2))))).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("sid"))
    time("shingles")(sh)
    // stage 2: posting-table build (satCollect aggregate)
    def post = sh.groupBy(col("sid"))
      .agg(graft.functions.SaturatingCollectLong.satCollect(col("doc_id"), Dedup.MaxShingleDf).as("ds"))
      .withColumn("n", size(col("ds")))
      .filter(col("n") <= Dedup.MaxShingleDf)
    time("posting build")(post)
    // stage 3: direct pair expansion + count, over an in-memory cached post
    time("pairs over cached post") {
      val p = Tables.materialize(post)
      p.count() // fill cache
      p.filter(col("n") >= 2)
        .select(col("ds"), posexplode(col("ds")))
        .select(col("col").as("d1"),
          explode(slice(col("ds"), col("pos") + lit(2), size(col("ds")))).as("d2"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("i"))
    }
    // stage 4: card
    time("card over cached post") {
      val p = Tables.materialize(post)
      p.count()
      p.select(explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    }
    // full query
    time("containment full")(Dedup.containment.run(spark, sfDir))

    // span-window hash cost: md5 (current) vs xxhash64 over the same
    // positioned window stream (the hash never reaches a query output —
    // only hash-equality of windows matters downstream)
    def spanStream(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Tables.fanOut(docs)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= Dedup.SpanWindow)
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(1), size(col("w")) - (Dedup.SpanWindow - 1))).as("i"))
        .select(col("doc_id"),
          h(concat_ws(" ", slice(col("w"), col("i"), lit(Dedup.SpanWindow)))).as("h"))
    time("span md5")(spanStream(md5))
    time("span xxhash64")(spanStream(c => xxhash64(c)))
    time("span md5 posting")(spanStream(md5)
      .groupBy(col("h")).agg(count(lit(1)).as("c")))
    time("span xxh posting")(spanStream(c => xxhash64(c))
      .groupBy(col("h")).agg(count(lit(1)).as("c")))
    spark.stop()
  }
}
