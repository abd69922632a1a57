package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryDef

/** HYBRID RETRIEVAL — reciprocal-rank fusion (RRF) of the engine's two
  * retrieval legs: the lexical ranking (`text_bm25_perquery` — each query's
  * OWN term set and ranking since round 13; the round-12 form broadcast one
  * corpus-derived lexical list to every query) and the dense ranking
  * (`knn_cosine_bruteforce`). RRF is the standard serving-side fusion
  * (Cormack, Clarke & Buettcher, SIGIR'09: score = Σ 1/(k + rank),
  * k = 60): it needs no score calibration between legs — only ranks — and
  * a document surfaced by EITHER leg alone can win the fused list, which
  * is the property that makes hybrid search beat each leg (lexical catches
  * exact-term matches dense embeddings smear; dense catches paraphrases
  * lexical misses). RrfHybridSpec pins that single-leg winners take #1 in
  * both directions, with per-query lexical lists.
  *
  * Exactness: rank-only inputs make the fusion fully integer —
  * `1000000 div (60 + rank)` per contributing leg (the published 1/(k+r)
  * scaled to keep every digit in BIGINT), absent legs contribute exactly
  * 0 — so the fused list is hash-compared against a DuckDB oracle that
  * REPLAYS BOTH LEGS from the raw tables (the two inputs' own full oracle
  * statements ride along as derived tables: the fusion's oracle re-derives
  * per-query BM25 and the cosine top-k rather than trusting the engine's
  * rank tables).
  *
  * Scale shape: the input is inherently tiny — per query, at most
  * k_lex + k_dense candidate rows (the legs' own serving tails already
  * bounded them), so the fusion costs a full-outer join keyed
  * (query_id, doc_id) and the bounded-heap [[graft.plans.TopKPerGroup]]
  * tail. The expensive work lives in the legs, which are each already
  * plan-audited (and serve from the train-once BM25 index artifacts);
  * fusing N queries adds O(N·k) rows of integer arithmetic. */
object Retrieval {

  /** RRF constant — the SIGIR'09 default, shared by both dialects. */
  val RrfK = 60

  /** Fuse a per-query lexical ranking (query_id, doc_id, lex_rank) with a
    * per-query dense ranking (query_id, doc_id, dense_rank): union
    * semantics via full-outer join keyed (query_id, doc_id) — a query
    * present in only one leg still fuses — exact-integer RRF scores,
    * top-`topK` per query through the bounded-heap operator, ranks rebuilt
    * without a window (the [[Similarity.topKRanked]] array_sort recipe,
    * integer flavor). Absent legs surface as rank 0 — the report
    * distinguishes "missing" from any real rank, and the score term is
    * exactly 0. */
  private[graft] def rrfFuse(lex: DataFrame, den: DataFrame, topK: Int): DataFrame = {
    val fused = lex.join(den, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).cast("long").as("lex_rank"),
        coalesce(col("dense_rank"), lit(0L)).cast("long").as("dense_rank"),
        (coalesce(expr(s"1000000 div ($RrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfK + dense_rank)"), lit(0L)))
          .cast("long").as("rrf_score"))
    graft.GraftExtensions.register(fused.sparkSession)
    graft.plans.TopKPerGroup(fused, Seq(col("query_id")),
        col("rrf_score"), col("doc_id"), topK)
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(
        negate(col("rrf_score")).as("neg_score"),
        col("doc_id").as("doc_id"),
        col("lex_rank").as("lex_rank"),
        col("dense_rank").as("dense_rank"),
        col("rrf_score").as("rrf_score")))).as("ranked"))
      .select(col("query_id"), posexplode(col("ranked")).as(Seq("i", "s")))
      .select(col("query_id"), col("s.doc_id").as("doc_id"),
        col("s.lex_rank").as("lex_rank"),
        col("s.dense_rank").as("dense_rank"),
        col("s.rrf_score").as("rrf_score"),
        (col("i") + 1).cast("long").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** A leg's oracle SQL, failing with an actionable message if a future
    * refactor makes the leg sqlDynamic/no-oracle (this is read at registry
    * construction, so a bare .get would crash EVERY run — advisor
    * round 12). */
  private def legOracle(q: QueryDef): String = q.oracle.getOrElse(
    throw new IllegalStateException(
      s"retrieval_rrf_hybrid composes ${q.name}'s oracle SQL; that leg no " +
        "longer carries a static oracle — re-derive the fusion oracle"))

  /** Registered fusion over the two already-oracled rank tables, top-10
    * per query. The Spark side consumes the registered legs VERBATIM
    * (`bm25PerQuery.run`, `knnBruteForce.run`) — the fusion is downstream
    * of the same plans the legs' own rows are checked on. */
  val rrfHybrid: QueryDef = QueryDef.sql(
    "retrieval_rrf_hybrid", {
      val lexSql = legOracle(graft.operators.TextAnalysis.bm25PerQuery)
      val denSql = legOracle(graft.operators.Similarity.knnBruteForce)
      s"""WITH lex AS (SELECT query_id, doc_id, rnk AS lex_rank FROM ($lexSql)),
        |den AS (SELECT query_id, neighbor_id AS doc_id, rnk AS dense_rank
        |        FROM ($denSql)),
        |f AS (SELECT COALESCE(a.query_id, b.query_id) AS query_id,
        |             COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |             COALESCE(a.lex_rank, 0) AS lex_rank,
        |             COALESCE(b.dense_rank, 0) AS dense_rank,
        |             (CASE WHEN a.lex_rank IS NOT NULL THEN 1000000 // (${RrfK} + a.lex_rank) ELSE 0 END
        |            + CASE WHEN b.dense_rank IS NOT NULL THEN 1000000 // (${RrfK} + b.dense_rank) ELSE 0 END) AS rrf_score
        |      FROM lex a FULL OUTER JOIN den b
        |        ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |                  ORDER BY rrf_score DESC, doc_id) AS rnk FROM f)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id,
        |       CAST(lex_rank AS BIGINT) AS lex_rank,
        |       CAST(dense_rank AS BIGINT) AS dense_rank,
        |       CAST(rrf_score AS BIGINT) AS rrf_score, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin
    }) { (s, d) =>
    val lex = graft.operators.TextAnalysis.bm25PerQuery.run(s, d)
      .select(col("query_id"), col("doc_id"), col("rnk").as("lex_rank"))
    val den = graft.operators.Similarity.knnBruteForce.run(s, d)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("dense_rank"))
    rrfFuse(lex, den, topK = 10)
  }

  /** RETRIEVAL QUALITY EVAL — the serving-side counterpart of
    * `knn_ivf_recall_sweep`: measure, as a relational operator with an
    * oracle, how each retrieval leg and the fusion perform against a
    * ground truth, so "is hybrid helping" is a checked number instead of a
    * slogan. Relevance is the label column (the `knn_cosine_filtered` /
    * `knn_hard_negatives` convention): for query q, relevant = other
    * vectors sharing label(q). Per query the report gives n_rel and
    * hits + exact-integer milli-recall for the lexical list (its serving
    * top-20), the dense list (top-5), and the fused list (top-10) — each
    * leg evaluated on EXACTLY the list it serves, list lengths and all.
    * Every number is a count or a floor-divided milli ratio — hash-exact.
    *
    * On this synthetic corpus the lexical leg dominates (document tokens
    * correlate with the label; the random-ish embeddings do not) — the
    * eval reports it rather than assuming the published hybrid>legs
    * folklore, which is the point of having the measurement.
    *
    * Scale shape: the legs pay their own already-audited serving cost;
    * everything downstream is bounded by |queries| × list length (≤ 35
    * rows per query here). The three lists are tagged and unioned so the
    * corpus label table is joined ONCE (broadcast of the tiny list side);
    * wall time is driver-job latency over ~a dozen sequential stages, the
    * `dedup_clusters` scheduling-bound class — on a real cluster each
    * stage carries real data and the overhead amortizes away. */
  val rrfEval: QueryDef = QueryDef.sql(
    "retrieval_rrf_eval", {
      val lexSql = legOracle(graft.operators.TextAnalysis.bm25PerQuery)
      val denSql = legOracle(graft.operators.Similarity.knnBruteForce)
      s"""WITH lex0 AS (SELECT query_id, doc_id, rnk AS lex_rank FROM ($lexSql)),
        |den0 AS (SELECT query_id, neighbor_id AS doc_id, rnk AS dense_rank FROM ($denSql)),
        |f AS (SELECT COALESCE(a.query_id, b.query_id) AS query_id,
        |             COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |             (CASE WHEN a.lex_rank IS NOT NULL THEN 1000000 // ($RrfK + a.lex_rank) ELSE 0 END
        |            + CASE WHEN b.dense_rank IS NOT NULL THEN 1000000 // ($RrfK + b.dense_rank) ELSE 0 END) AS rrf_score
        |      FROM lex0 a FULL OUTER JOIN den0 b
        |        ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
        |fr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |                   ORDER BY rrf_score DESC, doc_id) AS rnk FROM f),
        |fused AS (SELECT query_id, doc_id FROM fr WHERE rnk <= 10),
        |q AS (SELECT vec_id AS query_id, label AS qlabel FROM embeddings WHERE vec_id < 10),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |relc AS (SELECT q.query_id, COUNT(*) AS n_rel FROM q JOIN lab
        |           ON lab.label = q.qlabel AND lab.vec_id <> q.query_id GROUP BY q.query_id),
        |lh AS (SELECT l.query_id, COUNT(*) AS c FROM lex0 l JOIN q ON l.query_id = q.query_id
        |         JOIN lab ON lab.vec_id = l.doc_id AND lab.label = q.qlabel GROUP BY l.query_id),
        |dh AS (SELECT l.query_id, COUNT(*) AS c FROM den0 l JOIN q ON l.query_id = q.query_id
        |         JOIN lab ON lab.vec_id = l.doc_id AND lab.label = q.qlabel GROUP BY l.query_id),
        |rh AS (SELECT l.query_id, COUNT(*) AS c FROM fused l JOIN q ON l.query_id = q.query_id
        |         JOIN lab ON lab.vec_id = l.doc_id AND lab.label = q.qlabel GROUP BY l.query_id)
        |SELECT CAST(q.query_id AS BIGINT) AS query_id,
        |       CAST(relc.n_rel AS BIGINT) AS n_rel,
        |       CAST(COALESCE(lh.c, 0) AS BIGINT) AS lex_hits,
        |       CAST(COALESCE(dh.c, 0) AS BIGINT) AS dense_hits,
        |       CAST(COALESCE(rh.c, 0) AS BIGINT) AS rrf_hits,
        |       CAST(1000 * COALESCE(lh.c, 0) // GREATEST(relc.n_rel, 1) AS BIGINT) AS lex_recall_milli,
        |       CAST(1000 * COALESCE(dh.c, 0) // GREATEST(relc.n_rel, 1) AS BIGINT) AS dense_recall_milli,
        |       CAST(1000 * COALESCE(rh.c, 0) // GREATEST(relc.n_rel, 1) AS BIGINT) AS rrf_recall_milli
        |FROM q JOIN relc ON q.query_id = relc.query_id
        |LEFT JOIN lh ON q.query_id = lh.query_id
        |LEFT JOIN dh ON q.query_id = dh.query_id
        |LEFT JOIN rh ON q.query_id = rh.query_id
        |ORDER BY q.query_id""".stripMargin
    }) { (s, d) =>
    // each serving list feeds the fusion AND the hit count — materialize
    // or the corpus-scale leg plans re-execute per consumer; ONE cached
    // union (not one materialize per leg) keeps the driver-job count down,
    // the binding cost of this scheduling-bound query
    val both = graft.Tables.materialize(
      graft.operators.TextAnalysis.bm25PerQuery.run(s, d)
        .select(col("query_id"), col("doc_id"), col("rnk"), lit("lex").as("leg"))
        .unionByName(graft.operators.Similarity.knnBruteForce.run(s, d)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rnk"), lit("dense").as("leg"))))
    val lex = both.filter(col("leg") === "lex")
      .select(col("query_id"), col("doc_id"), col("rnk").as("lex_rank"))
    val den = both.filter(col("leg") === "dense")
      .select(col("query_id"), col("doc_id"), col("rnk").as("dense_rank"))
    val fused = rrfFuse(lex, den, topK = 10).select(col("query_id"), col("doc_id"))
    val lab = graft.Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val q = lab.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    val relc = lab.join(broadcast(q),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    // ONE label-lookup pass for all three lists: tag and union the (tiny)
    // serving lists, join the corpus label table once, and split the hit
    // counts back out as conditional sums
    val tagged = lex.select(col("query_id"), col("doc_id"), lit("lex").as("leg"))
      .unionByName(den.select(col("query_id"), col("doc_id"), lit("dense").as("leg")))
      .unionByName(fused.select(col("query_id"), col("doc_id"), lit("rrf").as("leg")))
    val hits = lab.join(broadcast(tagged.join(q, Seq("query_id"))),
        col("vec_id") === col("doc_id") && col("label") === col("qlabel"))
      .groupBy(col("query_id"))
      .agg(sum(when(col("leg") === "lex", 1L).otherwise(0L)).as("lex_hits"),
        sum(when(col("leg") === "dense", 1L).otherwise(0L)).as("dense_hits"),
        sum(when(col("leg") === "rrf", 1L).otherwise(0L)).as("rrf_hits"))
    q.select(col("query_id"))
      .join(relc, Seq("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("lex_hits"), lit(0L)).as("lex_hits"),
        coalesce(col("dense_hits"), lit(0L)).as("dense_hits"),
        coalesce(col("rrf_hits"), lit(0L)).as("rrf_hits"))
      .select(col("query_id"), col("n_rel"), col("lex_hits"), col("dense_hits"),
        col("rrf_hits"),
        expr("1000 * lex_hits div greatest(n_rel, 1)").as("lex_recall_milli"),
        expr("1000 * dense_hits div greatest(n_rel, 1)").as("dense_recall_milli"),
        expr("1000 * rrf_hits div greatest(n_rel, 1)").as("rrf_recall_milli"))
      .orderBy("query_id")
  }

  val all: Seq[QueryDef] = Seq(rrfHybrid, rrfEval)
}
