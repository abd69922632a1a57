package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Iterative graph analytics beyond the connected-components family in
  * [[Dedup]]: PageRank over a link graph, in FIXED-POINT integer
  * arithmetic so every iteration is bit-exact and the oracle can replay
  * the whole power iteration.
  *
  * The graph is derived relationally from the documents table (node =
  * doc_id, out-degree 1 + id % 3, targets (id·17 + 7j + 1) mod N — the
  * deterministic stand-in for a real link/citation/reference edge table,
  * which a production caller passes in directly).
  *
  * Fixed-point discipline: ranks are scaled by 10⁹ and every divide is a
  * floor integer division — contribution c(u) = r(u) div deg(u), update
  * r'(v) = (15·(10⁹ div N) + 85·Σ c) div 100 (damping 0.85). No doubles
  * exist anywhere, so 5 chained iterations stay hash-identical across
  * engines — the property float PageRank can never give an oracle.
  *
  * Shape at 100 TB: the edge table is built once and persisted; each
  * iteration is one co-partitioned join (edges ⋈ ranks on src — both hash
  * on the join key) plus one groupBy(dst) — the O(iterations)-shuffle
  * pattern of distributed PageRank, with only the N-row rank table
  * re-shuffled per round, never the edge set. The whole 5-round chain is
  * ONE lazy plan: no driver-side collect between rounds. */
object Graph {

  val Scale = 1000000000L
  val Iterations = 5

  val pagerank: QueryDef = QueryDef.sql(
    "graph_pagerank",
    """WITH n AS (SELECT COUNT(*) AS n FROM documents),
      |nodes AS (SELECT doc_id AS v FROM documents),
      |e AS (SELECT doc_id AS src, 1 + doc_id % 3 AS deg,
      |             unnest(list_transform(generate_series(0, doc_id % 3),
      |                j -> (doc_id * 17 + 7*j + 1) % n.n)) AS dst
      |      FROM documents CROSS JOIN n),
      |r0 AS (SELECT v, 1000000000 // n.n AS r FROM nodes CROSS JOIN n),
      |r1 AS (SELECT nodes.v,
      |         (15 * (1000000000 // n.n) + 85 * COALESCE(SUM(r0.r // e.deg), 0)) // 100 AS r
      |       FROM nodes CROSS JOIN n
      |            LEFT JOIN e ON e.dst = nodes.v
      |            LEFT JOIN r0 ON r0.v = e.src
      |       GROUP BY nodes.v, n.n),
      |r2 AS (SELECT nodes.v,
      |         (15 * (1000000000 // n.n) + 85 * COALESCE(SUM(r1.r // e.deg), 0)) // 100 AS r
      |       FROM nodes CROSS JOIN n
      |            LEFT JOIN e ON e.dst = nodes.v
      |            LEFT JOIN r1 ON r1.v = e.src
      |       GROUP BY nodes.v, n.n),
      |r3 AS (SELECT nodes.v,
      |         (15 * (1000000000 // n.n) + 85 * COALESCE(SUM(r2.r // e.deg), 0)) // 100 AS r
      |       FROM nodes CROSS JOIN n
      |            LEFT JOIN e ON e.dst = nodes.v
      |            LEFT JOIN r2 ON r2.v = e.src
      |       GROUP BY nodes.v, n.n),
      |r4 AS (SELECT nodes.v,
      |         (15 * (1000000000 // n.n) + 85 * COALESCE(SUM(r3.r // e.deg), 0)) // 100 AS r
      |       FROM nodes CROSS JOIN n
      |            LEFT JOIN e ON e.dst = nodes.v
      |            LEFT JOIN r3 ON r3.v = e.src
      |       GROUP BY nodes.v, n.n),
      |r5 AS (SELECT nodes.v,
      |         (15 * (1000000000 // n.n) + 85 * COALESCE(SUM(r4.r // e.deg), 0)) // 100 AS r
      |       FROM nodes CROSS JOIN n
      |            LEFT JOIN e ON e.dst = nodes.v
      |            LEFT JOIN r4 ON r4.v = e.src
      |       GROUP BY nodes.v, n.n)
      |SELECT v AS doc_id, CAST(r AS BIGINT) AS rank_fp
      |FROM r5 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val nodes = docs.select(col("doc_id").as("v"))
    // edge table: built once, persisted, reused by all iterations
    val edges = Tables.materialize(docs.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        (lit(1L) + col("doc_id") % 3).as("deg"),
        explode(transform(sequence(lit(0), (col("doc_id") % 3).cast("int")),
          j => (col("doc_id") * 17 + j.cast("long") * 7 + 1) % col("n"))).as("dst")))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("v"), expr("CAST(1000000000 AS BIGINT) div n").as("r"))
    for (_ <- 1 to Iterations) {
      // `div` everywhere: Spark's `/` on longs is a DOUBLE divide, which
      // would break the bit-exactness the fixed-point form exists for
      val sums = edges.join(ranks, edges("src") === ranks("v"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, nodes("v") === sums("dst"), "left")
        .crossJoin(broadcast(n))
        .select(col("v"), expr(
          "(15 * (CAST(1000000000 AS BIGINT) div n) + 85 * coalesce(s, CAST(0 AS BIGINT))) div 100"
        ).as("r"))
    }
    ranks.select(col("v").as("doc_id"), col("r").cast("long").as("rank_fp"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(pagerank)
}
