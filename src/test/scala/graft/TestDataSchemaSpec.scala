package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift tripwire for the driver-generated testdata (TESTDATA.md).
  *
  * Motivation (round 9→10): the driver regenerated `events.parquet` with
  * `ts` as timestamp[us] where it had been TIMESTAMP(NANOS) — and the
  * whole 5-query temporal family failed analysis at every scale factor,
  * scattered across bench `errors` and missing correctness rows. One
  * schema change should produce ONE named failure pointing at the table
  * and column that moved; that is this spec.
  *
  * Two layers:
  *  1. the PHYSICAL schema of each table, as this round's code was
  *     verified against it (a superset-tolerant check would defeat the
  *     tripwire — drift must fail);
  *  2. the NORMALIZED contract [[Tables]] promises downstream operators
  *     (`events.ts` is always LongType epoch-nanos, whatever the file
  *     carries), which is what query bodies actually rely on.
  */
class TestDataSchemaSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SharedSpark.spark

  // Physical schemas as (name, type, nullable-irrelevant). `ts`-like
  // columns read as TimestampNTZType because the pandas parquet writer
  // emits timestamp[us] with isAdjustedToUTC=false.
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  for ((table, cols) <- expected.toSeq.sortBy(_._1))
    test(s"physical schema of $table.parquet is unchanged") {
      val got = Tables.t(spark, dir, table).schema
        .map(f => f.name -> f.dataType)
      assert(got === cols,
        s"\nTESTDATA DRIFT: $table.parquet no longer matches the schema this " +
          s"round was verified against.\n  got:      $got\n  expected: $cols\n" +
          "If the driver regenerated the testdata, update `expected` here AND " +
          "re-check every operator reading the moved column (round 9's ts " +
          "regeneration broke 5 queries; Tables.events now absorbs that one).")
    }

  test("Tables.events normalizes ts to LongType epoch-nanos") {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === LongType,
      "downstream temporal operators do exact integer-nanos arithmetic")
    // spot-check the value against an independent reading: DuckDB's
    // epoch_ns === unix_micros(ts)*1000 for the same row. Here we pin the
    // round-trip: nanos div 1000 → timestamp_micros must re-encode the
    // original wall-clock second for the earliest event (generator epoch
    // 2024-01-01, TESTDATA.md).
    val minTs = df.agg(org.apache.spark.sql.functions.min("ts")).head.getLong(0)
    assert(minTs % 1000 === 0L, "timestamp[us] source: sub-micro part must be 0")
    assert(minTs >= 1704067200L * 1000000000L,
      s"earliest event $minTs predates the generator epoch 2024-01-01")
  }
}
