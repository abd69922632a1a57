package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("salted join is row-identical to the plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side hits one hot key
    val big = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 50}" else "hot", i))
      .toDF("key", "v")
    val small = (0 until 50).map(i => (s"k$i", s"dim$i")).toDF("key", "name")
      .union(Seq(("hot", "dimHot")).toDF("key", "name"))
    val plain = big.join(small, Seq("key"))
      .select("key", "v", "name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(big, small, "key", saltFactor = 8)
      .select("key", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 10000, "every big row finds its dimension match")
  }

  test("salt spreads the hot key across buckets") {
    import spark.implicits._
    val big = (1 to 1000).map(i => ("hot", i)).toDF("key", "v")
    val counts = big
      .withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("key"),
            org.apache.spark.sql.functions.col("v")),
          org.apache.spark.sql.functions.lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(counts.length === 8, "all 8 salt buckets populated")
    assert(counts.max < 1000 * 0.3, "no bucket holds a straggler share")
  }
}
