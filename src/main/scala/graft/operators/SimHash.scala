package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** SimHash document fingerprinting: each distinct token contributes ±1 to 64
  * bit-position counters (sign chosen by the token's hash bit); the sign of
  * each counter becomes one bit of a 64-bit fingerprint. Near-identical token
  * sets → near-identical fingerprints (small Hamming distance).
  *
  * Plan shape: explode → 64-column conditional-sum aggregation (map-side
  * partial agg, codegen'd) → bit assembly. Group-level output (fingerprint,
  * member count, representative) keeps the result bounded even when many
  * documents collide. Engine-native xxhash64 → no DuckDB oracle; DedupSpec
  * checks the fingerprint's similarity-preservation property differentially.
  */
object SimHash {

  val Bits = 64

  /** doc_id → 64-bit simhash of its distinct-token set. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val tok = Tables.fanOut(docs)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val sums = (0 until Bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")
    }
    val bitCols = (0 until Bits).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    tok.groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), bitCols.reduce(_ + _).as("simhash"))
  }

  /** Grouped fingerprint output: one row per distinct simhash. */
  val query: QueryDef = QueryDef.noOracle("dedup_simhash") { (s, d) =>
    fingerprints(Tables.documents(s, d))
      .groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .orderBy("keep_id")
  }

  /** Near-dup pairs at Hamming distance ≤ `maxDist`, via band-partitioned
    * candidate generation: split the 64-bit fingerprint into `maxDist + 1`
    * 16-bit bands — any pair within distance `maxDist` must agree exactly on
    * at least one band (pigeonhole), so the quadratic all-pairs comparison
    * collapses to per-band bucket joins, then `bit_count(a XOR b)` verifies
    * the exact distance. The standard web-scale simhash dedup layout
    * (Manku et al., WWW'07). */
  def nearDuplicates(fpsIn: org.apache.spark.sql.DataFrame, maxDist: Int = 3): org.apache.spark.sql.DataFrame = {
    // both sides of the band self-join read the fingerprint table — without
    // materialization the 64-column aggregation runs twice
    val fps = Tables.materialize(fpsIn)
    val bands = maxDist + 1
    require(64 % bands == 0, s"64 bits must split evenly into $bands bands")
    val width = 64 / bands
    val banded = fps.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map(b => struct(
        lit(b).as("band"),
        shiftright(col("simhash"), b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("bh"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("d1", "d2")
      .orderBy("d1", "d2")
  }

  val nearDupQuery: QueryDef = QueryDef.noOracle("dedup_simhash_neardup") { (s, d) =>
    nearDuplicates(fingerprints(Tables.documents(s, d)))
  }

  /** md5-keyed SimHash twin, fully DuckDB-oracled — the same
    * oracle-the-algorithm move as `dedup_minhash_lsh_md5`: the production
    * fingerprint stays on engine-native xxhash64 ([[fingerprints]], 64
    * bits); this twin runs the IDENTICAL weighted-bit-voting construction
    * (per-token ±1 votes per bit position, sign-of-sum becomes the bit,
    * zero-sum ties vote 0 — the exact `> 0` rule the native column
    * expressions encode) on a 16-bit hash parsed from the first 4 hex
    * digits of md5(token), integer-exact end to end, so DuckDB replays
    * vote sums, bit assembly, and the grouped keep-min output at value
    * level. Bit width is the only parameter that changed — 16 bits keeps
    * the oracle's per-bit expression list readable and costs nothing the
    * algorithm cares about (accidental 16-bit collisions just merge
    * groups, identically on both sides). */
  val Md5Bits = 16

  val queryMd5: QueryDef = QueryDef.sql(
    "dedup_simhash_md5", {
      val hv = "list_sum(list_transform(generate_series(1, 4), " +
        "k -> CAST(strpos('0123456789abcdef', substr(h, k, 1)) - 1 AS BIGINT) * (CAST(1 AS BIGINT) << ((4-k)*4))))"
      val sums = (0 until Md5Bits).map(j =>
        s"SUM(CASE WHEN (hv >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(",\n      |             ")
      val bits = (0 until Md5Bits).map(j =>
        s"(CASE WHEN b$j > 0 THEN CAST(1 AS BIGINT) << $j ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      |            FROM documents),
      |h AS (SELECT doc_id, md5(t) AS h FROM tok),
      |hv AS (SELECT doc_id, $hv AS hv FROM h),
      |votes AS (SELECT doc_id,
      |             $sums
      |          FROM hv GROUP BY doc_id),
      |fp AS (SELECT doc_id, $bits AS simhash FROM votes)
      |SELECT simhash, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM fp GROUP BY simhash ORDER BY keep_id""".stripMargin
    }) { (s, d) =>
    val tok = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .withColumn("hv", conv(substring(md5(col("t")), 1, 4), 16, 10).cast("long"))
    val sums = (0 until Md5Bits).map { j =>
      sum(when(shiftright(col("hv"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")
    }
    val bitCols = (0 until Md5Bits).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    tok.groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), bitCols.reduce(_ + _).as("simhash"))
      .groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .orderBy("keep_id")
  }

  val all: Seq[QueryDef] = Seq(query, nearDupQuery, queryMd5)
}
