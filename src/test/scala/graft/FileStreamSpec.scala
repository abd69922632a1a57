package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** File-based streaming source coverage: the same fold pipeline driven by
  * `readStream.parquet` over a directory instead of Kafka/MemoryStream —
  * the deployment shape for replaying archived event logs (and the natural
  * 100 TB backfill path: the checkpointed query processes each new file
  * exactly once, `maxFilesPerTrigger` bounds per-batch input). */
class FileStreamSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("parquet file stream drives the grouped-sum pipeline incrementally") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-filestream")
    // batch 1: write some ordered update events as parquet
    val b1 = Seq(
      graft.model.OrderedUpdateEvent("p", 1, "INC", 5),
      graft.model.OrderedUpdateEvent("q", 2, "INC", 2)).toDS()
    b1.coalesce(1).write.parquet(inDir.resolve("b1").toString)
    // file source reads a flat dir; move the part file up
    val part1 = Files.list(inDir.resolve("b1")).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part1, inDir.resolve("data1.parquet"), StandardCopyOption.ATOMIC_MOVE)

    val schema = implicitly[org.apache.spark.sql.Encoder[graft.model.OrderedUpdateEvent]].schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString)
      .as[graft.model.OrderedUpdateEvent]
    val results = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    val q = graft.streaming.InventoryStream.foldStream(stream)
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.KeyedCount], _: Long) =>
        b.collect().foreach(kc => results.put(kc.productCode, kc.count.get)); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(results.get("p") === 5 && results.get("q") === 2)
      // batch 2: a later file folds into the SAME state (REP replaces, INC adds)
      val b2 = Seq(
        graft.model.OrderedUpdateEvent("p", 3, "REP", 9),
        graft.model.OrderedUpdateEvent("q", 4, "INC", 1)).toDS()
      b2.coalesce(1).write.parquet(inDir.resolve("b2").toString)
      val part2 = Files.list(inDir.resolve("b2")).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part2, inDir.resolve("data2.parquet"), StandardCopyOption.ATOMIC_MOVE)
      q.processAllAvailable()
      assert(results.get("p") === 9, "REP must replace prior file's state")
      assert(results.get("q") === 3, "INC must accumulate across files")
    } finally q.stop()
  }
}
