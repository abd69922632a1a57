package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join split (spark.sql.adaptive.skewJoin.enabled, on by default in
  * every graft session) can't apply, e.g. a shuffled join feeding a
  * same-keyed aggregation, or a skewed key known at plan time.
  *
  * Mechanics: the big side appends a deterministic per-row salt in
  * [0, saltFactor); the small side is exploded `saltFactor`× so every
  * (key, salt) bucket finds its match. The hot key's rows spread over
  * `saltFactor` shuffle partitions instead of one straggler task, at the
  * price of replicating the small side — the classic skew/replication
  * trade. Result is row-identical to the unsalted join (verified by
  * SkewJoinSpec). */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, salted `saltFactor` ways.
    * The salt derives from xxhash64 of the big side's full row — content-
    * deterministic (stable across retries/replays, unlike rand() or
    * partition-id-based salts) and uniform even when one key dominates. */
  def salted(big: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val bigCols = big.columns
    val rowHash: Column = xxhash64(bigCols.map(col).toIndexedSeq: _*)
    val b = big.withColumn("__salt", pmod(rowHash, lit(saltFactor)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Driver-checked proof of row-identity: the brand-revenue rollup through
    * the salted join must hash-equal the plain-join oracle. (The join key is
    * renamed so both sides share `key` as required by [[salted]].) */
  val saltedBrandRevenue: QueryDef = QueryDef.sql(
    "skew_salted_join",
    """SELECT p_brand,
      |       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
    // project BEFORE salting (guide §2.3, r21): [[salted]]'s row hash covers
    // every column of the frame it is given, so passing the full lineitem
    // forced an 11-column scan (ReadSchema carried all of lineitem) plus an
    // 11-column xxhash64 per row just to derive the salt. Only the join key
    // and the two aggregated measures are ever consumed — the projected form
    // scans 3 columns and hashes 3, and the salt stays content-deterministic
    // (a pure function of the row's consumed columns). The join RESULT is
    // salt-independent by [[salted]]'s row-identity contract, so the oracle
    // is untouched.
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey").as("key"), col("l_extendedprice"), col("l_discount"))
    val pt = Tables.part(s, d)
      .select(col("p_partkey").as("key"), col("p_brand"))
    salted(li, pt, "key", saltFactor = 8)
      .groupBy(col("p_brand"))
      .agg(
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  val all: Seq[QueryDef] = Seq(saltedBrandRevenue)
}
