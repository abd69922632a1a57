package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over the embeddings table (`embedding: Array[Float]`).
  *
  * Float discipline for oracle parity: cast float→double per element (exact),
  * then fold products left-to-right — `aggregate(zip_with(...))` in Spark and
  * `list_sum(list_transform(list_zip(...)))` in DuckDB produce bit-identical
  * doubles (verified empirically; DuckDB's builtin list_dot_product instead
  * accumulates in float32 and does NOT match). Cosine = dot/(nrmA*nrmB) with
  * the same parenthesization on both sides.
  */
object Similarity {

  /** vec_id, e (array<double>), nrm (double) — norm computed once per row.
    * dot/norm use the codegen'd [[graft.functions.DotProduct]] expression:
    * bit-identical to the HOF aggregate(zip_with(...)) form (sequential f64
    * fold) but a fused primitive loop inside whole-stage codegen. */
  private def withNorm(embeddings: DataFrame): DataFrame = {
    val e = transform(col("embedding"), x => x.cast("double"))
    Tables.fanOut(embeddings)
      .select(col("vec_id"), e.as("e"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dotProduct(col("e"), col("e"))))
  }

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  /** Brute-force exact cosine top-k: the correctness baseline. The query set
    * (vec_id < 10) broadcasts against the full corpus — one corpus scan, no
    * shuffle until the per-query top-k, which is a tiny window over
    * |queries|·|corpus| scored rows pre-filtered per partition. At 100 TB the
    * corpus side stays partition-parallel; only k rows per query per
    * partition would need to survive (Spark's TakeOrderedAndProject-style
    * pattern via the rnk filter). */
  val knnBruteForce: QueryDef = QueryDef.sql(
    "knn_cosine_bruteforce",
    """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |                  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
      |           FROM embeddings),
      |q AS (SELECT * FROM n WHERE vec_id < 10),
      |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |             list_sum(list_transform(list_zip(q.e, c.e), x -> x[1]*x[2])) / (q.nrm * c.nrm) AS cos
      |      FROM q, n c WHERE q.vec_id <> c.vec_id),
      |r AS (SELECT query_id, neighbor_id, cos,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      |      FROM s)
      |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, ROUND(cos, 6) AS cosine
      |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    val n = withNorm(Tables.embeddings(s, d))
    val q = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qnrm"))
    val scored = n.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "rnk")
  }

  /** All-pairs cosine ≥ threshold (embedding near-dup detection). All-pairs
    * is the exactness baseline; [[knnLshBucketed]] is the scale path that
    * avoids the quadratic cross join. */
  val cosinePairs: QueryDef = QueryDef.sql(
    "embedding_cosine_pairs",
    """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |                  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
      |           FROM embeddings)
      |SELECT a.vec_id AS id1, b.vec_id AS id2,
      |       ROUND(list_sum(list_transform(list_zip(a.e, b.e), x -> x[1]*x[2])) / (a.nrm * b.nrm), 6) AS cosine
      |FROM n a, n b
      |WHERE a.vec_id < b.vec_id
      |  AND list_sum(list_transform(list_zip(a.e, b.e), x -> x[1]*x[2])) / (a.nrm * b.nrm) >= 0.4
      |ORDER BY id1, id2""".stripMargin) { (s, d) =>
    val n = withNorm(Tables.embeddings(s, d))
    val a = n.select(col("vec_id").as("id1"), col("e").as("e1"), col("nrm").as("n1"))
    val b = n.select(col("vec_id").as("id2"), col("e").as("e2"), col("nrm").as("n2"))
    a.crossJoin(b)
      .filter(col("id1") < col("id2"))
      .withColumn("cos", dot(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.4)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cosine"))
      .orderBy("id1", "id2")
  }

  /** Sign-bit LSH bucketing (random hyperplanes): the approximate scale path.
    * Hyperplane components come from a seeded integer LCG (deterministic,
    * engine-independent); each vector gets a `nBits`-bit signature; vectors
    * are compared only within identical signature buckets. Engine-verified by
    * SimilaritySpec (recall vs. the brute-force baseline) — no DuckDB oracle
    * because the candidate set, not the math, is the approximation. */
  def lshSignature(e: Column, nBits: Int = 16, dim: Int = 64): Column = {
    // LCG over (bit, dim) index — same constants as glibc's rand: exact
    // integer arithmetic, reproducible anywhere.
    def plane(bit: Int, j: Int): Double = {
      val x = (1103515245L * (bit * dim + j) + 12345L) & 0x7fffffffL
      x.toDouble / 0x7fffffffL.toDouble - 0.5
    }
    val bits = (0 until nBits).map { bit =>
      val planeVec = typedlit((0 until dim).map(j => plane(bit, j)))
      val proj = graft.functions.VectorFunctions.dotProduct(e, planeVec)
      when(proj >= 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k via LSH buckets: score only pairs whose signatures match on
    * at least one of the 4 bands (4×4-bit). Quadratic work collapses to
    * per-bucket cardinality. */
  val knnLshBucketed: QueryDef = QueryDef.noOracle("knn_cosine_lsh") { (s, d) =>
    val n = withNorm(Tables.embeddings(s, d))
      .withColumn("sig", lshSignature(col("e")))
    // 4 bands of 4 bits each: candidates agree on >=1 band.
    val banded = n.select(col("vec_id"), col("e"), col("nrm"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), (shiftright(col("sig"), b * 4) % 16).as("bh"))): _*)).as("bb"))
      .select(col("vec_id"), col("e"), col("nrm"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = banded.join(
        broadcast(banded.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("e").as("qe"),
            col("nrm").as("qnrm"), col("band"), col("bh"))),
        Seq("band", "bh"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qe"), col("qnrm"), col("e"), col("nrm"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "rnk")
  }

  /** IVF (inverted-file) ANN: the coarse-quantizer scale path. K centroids
    * partition the corpus into inverted lists (each vector is assigned to
    * its nearest centroid); a query exactly scores only the lists of its
    * `nprobe` nearest centroids, cutting scored candidates from |corpus| to
    * ~|corpus|·nprobe/K. Centroids here are a deterministic hash-ranked
    * sample of the corpus selected with orderBy(hash).limit(K) — planned as
    * TakeOrderedAndProject (per-partition heap + driver merge, no global
    * sort); a trained k-means codebook would drop into the same broadcast
    * table. Assignment is a broadcast nested loop over K rows per vector —
    * linear in |corpus|·K, embarrassingly parallel, no shuffle until the
    * per-vector argmax window (K rows per key). Engine-verified by
    * SimilaritySpec (recall vs. brute force; exact cosines on candidates). */
  def knnIvf(embeddings: DataFrame, k: Int = 5, numCentroids: Int = 16,
      nprobe: Int = 8): DataFrame = {
    val n = withNorm(embeddings)
    val cents = n
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(numCentroids)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cnrm"))
    // nearest-centroid rank per vector: K scored rows per key, tiny window
    def ranked(src: DataFrame, idCol: String): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("csim").desc, col("cid"))
      src.crossJoin(broadcast(cents))
        .withColumn("csim", dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
        .withColumn("crnk", row_number().over(w))
    }
    val lists = ranked(n, "vec_id").filter(col("crnk") === 1)
      .select(col("vec_id"), col("e"), col("nrm"), col("cid"))
    val probes = ranked(
        n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qnrm"))
          .withColumnRenamed("qe", "e").withColumnRenamed("qnrm", "nrm"), "query_id")
      .filter(col("crnk") <= nprobe)
      .select(col("query_id"), col("e").as("qe"), col("nrm").as("qnrm"), col("cid"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    lists.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "rnk")
  }

  val knnIvfQuery: QueryDef = QueryDef.noOracle("knn_cosine_ivf") { (s, d) =>
    knnIvf(Tables.embeddings(s, d))
  }

  val all: Seq[QueryDef] = Seq(knnBruteForce, cosinePairs, knnLshBucketed, knnIvfQuery)
}
