package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.InventoryStream

/** Pins the Kafka wire-path contract without a broker (SURVEY.md §2 row 1;
  * reference app wiring KafkaStreamsInventoryCountApplication.java:67-69 +
  * application.yml:3-7 topic bindings):
  *
  *  1. the reader/writer option maps that [[InventoryStream.kafkaPipeline]]
  *     passes verbatim carry the reference's topics and offset policy;
  *  2. [[InventoryStream.decode]] analyzes and evaluates against the exact
  *     column shape the Spark Kafka source emits (binary key/value +
  *     topic/partition/offset/timestamp) — the one seam a MemoryStream of
  *     string columns does not cover;
  *  3. if spark-sql-kafka is ever on the classpath, the unresolved
  *     streaming plan must resolve and carry the kafka source with the
  *     subscribe options — skipped cleanly in this container (no jar). */
class KafkaWiringSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("source/sink option maps mirror the reference topic bindings") {
    val src = InventoryStream.kafkaSourceOptions("broker:9092")
    assert(src("kafka.bootstrap.servers") === "broker:9092")
    assert(src("subscribe") === "inventory-update-events")
    assert(src("startingOffsets") === "earliest") // KStreams fresh-group default
    val sink = InventoryStream.kafkaSinkOptions("broker:9092")
    assert(sink("kafka.bootstrap.servers") === "broker:9092")
    assert(sink("topic") === "inventory-count-events")
    assert(sink.contains("checkpointLocation"), "exactly-once needs a checkpoint")
  }

  test("decode consumes the Kafka source's exact wire schema (binary key/value)") {
    // the fixed schema of spark-sql-kafka's source relation
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    def rec(k: String, v: String, off: Long) = Row(
      if (k == null) null else k.getBytes("UTF-8"),
      if (v == null) null else v.getBytes("UTF-8"),
      "inventory-update-events", 0, off, new java.sql.Timestamp(0L), 0)
    val wire = spark.createDataFrame(
      java.util.Arrays.asList(
        rec("""{"productCode":"p1"}""", """{"delta":7,"key":{"productCode":"p1"},"action":"INC"}""", 0L),
        rec("""{"productCode":"p1"}""", null, 1L), // tombstone
        rec(null, """{"delta":1,"key":null,"action":"INC"}""", 2L)), // null key
      kafkaSchema)
    val decoded = InventoryStream.decode(wire).collect()
    assert(decoded.length === 1)
    assert(decoded.head.productCode === "p1")
    assert(decoded.head.action === "INC")
    assert(decoded.head.delta === 7)
    assert(decoded.head.eventOrder === 0L)
  }

  test("kafka source plan resolves with the subscribe options (needs the jar)") {
    val loaded =
      try Some(spark.readStream.format("kafka")
        .options(InventoryStream.kafkaSourceOptions("broker:9092")).load())
      catch {
        // DataSource.lookupDataSource throws when the provider is absent
        case _: ClassNotFoundException => None
        case e: Exception if e.getMessage != null &&
          (e.getMessage.contains("Failed to find") ||
           e.getMessage.contains("DATA_SOURCE_NOT_FOUND")) => None
      }
    loaded match {
      case None =>
        cancel("spark-sql-kafka is not on the classpath in this container " +
          "(plan contract pinned; re-runs automatically where the jar exists)")
      case Some(df) =>
        val cols = df.schema.fieldNames.toSet
        // decode() consumes exactly these — the source must provide them
        assert(Set("key", "value", "partition", "offset").subsetOf(cols))
        val plan = df.queryExecution.logical.toString
        assert(plan.toLowerCase.contains("kafka"), plan)
    }
  }
}
