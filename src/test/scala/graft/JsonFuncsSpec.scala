package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScalarFuncs

/** The JSON extraction API family, value-level: `json_funcs_orders`
  * serves every output from ONE schema-pinned `from_json` parse (the
  * round-18 parse-once posture — the re-parsing APIs cost ~45% of the
  * query for columns the struct already held), so the path and tuple
  * APIs are pinned HERE instead: on the registered query's own document
  * shape, `get_json_object` and `json_tuple` must agree field-for-field
  * with the struct extraction, missing-path null included. */
class JsonFuncsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("get_json_object and json_tuple agree with from_json struct " +
      "extraction on the registered document shape (missing path → null " +
      "through all three APIs)") {
    val doc = to_json(struct(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("st"),
      struct(col("o_custkey").as("ck"), col("o_orderpriority").as("pr")).as("cust"),
      array(col("o_orderkey"), col("o_custkey")).as("ids")))
    val schema = "STRUCT<k: BIGINT, st: STRING, cust: STRUCT<ck: BIGINT, pr: STRING>, ids: ARRAY<BIGINT>, nope: STRING>"
    val parsed = from_json(col("j"),
      org.apache.spark.sql.types.DataType.fromDDL(schema)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    val rows = Tables.orders(spark, d)
      .withColumn("j", doc)
      .withColumn("p", parsed)
      .select(
        col("p.st").as("struct_st"),
        col("p.cust.pr").as("struct_pr"),
        col("p.nope").as("struct_missing"),
        get_json_object(col("j"), "$.st").as("path_st"),
        get_json_object(col("j"), "$.cust.pr").as("path_pr"),
        get_json_object(col("j"), "$.nope").as("path_missing"),
        json_tuple(col("j"), "st", "nope").as(Seq("tuple_st", "tuple_missing")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(3), "path API: top-level field")
      assert(r.getString(0) === r.getString(6), "tuple API: top-level field")
      assert(r.getString(1) === r.getString(4), "path API: nested field")
      assert(r.isNullAt(2) && r.isNullAt(5) && r.isNullAt(7),
        "missing path must be NULL through struct, path, and tuple APIs")
    }
  }

  test("registered query: every column recovers its source input exactly " +
      "(the identity oracle, asserted engine-side too)") {
    val out = ScalarFuncs.jsonFuncs.run(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(1) === r.getString(4), "status_path === status_tuple")
      assert(r.getLong(3) === r.getLong(5), "custkey_arr === custkey_struct")
      assert(r.isNullAt(6), "missing_path is null from the parse")
    }
  }
}
