package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Sketch aggregates and sampling — the operations that keep 100 TB
  * interactive: HyperLogLog++ distinct counts and quantile sketches run in
  * one pass with O(1) state per group (vs. the exact two-phase expand of
  * COUNT(DISTINCT)), and seeded samples cut input before the expensive
  * stages. Sketch outputs are engine-specific (HLL registers / GK summaries
  * differ from DuckDB's), so these verify by spec-checked error bounds
  * against the exact answers (ApproxSpec), not by value-hash oracle; the
  * driver records the rows-only check. */
object ApproxAndSample {

  /** HLL++ distinct part/supplier counts + quantile-sketch percentiles per
    * return flag, one pass, no expand. */
  val approxAggregates: QueryDef = QueryDef.noOracle("approx_aggregates") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("n_parts_approx"),
        approx_count_distinct(col("l_suppkey")).as("n_supps_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price_approx"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Seeded Bernoulli sample (TABLESAMPLE equivalent): deterministic for a
    * fixed seed + partitioning; the driver check is rows-only. */
  val bernoulliSample: QueryDef = QueryDef.noOracle("sample_bernoulli") { (s, d) =>
    Tables.orders(s, d)
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("o_orderstatus")
  }

  /** Stratified sample with per-stratum fractions (sampleBy): the
    * class-balancing primitive for training-data curation — downsample the
    * dominant stratum, keep the rare ones whole. */
  val stratifiedSample: QueryDef = QueryDef.noOracle("sample_stratified") { (s, d) =>
    Tables.orders(s, d)
      .stat.sampleBy("o_orderstatus", Map("O" -> 0.05, "F" -> 0.5, "P" -> 1.0), 42L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("o_orderstatus")
  }

  val all: Seq[QueryDef] = Seq(approxAggregates, bernoulliSample, stratifiedSample)
}
