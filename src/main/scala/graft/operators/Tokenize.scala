package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.{GraftBpe, TextFunctions}
import graft.{QueryDef, Tables}

/** Tokenizer-true token counting over the documents table: the greedy
  * longest-match subword tokenizer of [[graft.functions.GraftBpe]] (fixed
  * public Norvig n-gram vocab) replacing the whitespace proxy in both the
  * counting query and the sequence-packing query — pack bins are only as
  * real as their token counts, and a whitespace count undercounts long words
  * by the exact amount a subword tokenizer would split them.
  *
  * Scale shape: both queries are single codegen'd projections per document
  * (the count is a per-row trie walk, [[graft.functions.BpeTokenCount]]);
  * packing adds the one shard-keyed window [[TrainingData.packOn]] already
  * pays. Nothing here shuffles on anything coarser than `source`.
  *
  * Oracle shape: DuckDB has no procedural tokenizer, so the oracle runs the
  * SAME greedy rule as a recursive CTE — longest vocab prefix per step via a
  * correlated MAX over the vocab relation — over the corpus's DISTINCT words
  * (tokenization is per-word, so tokenize the vocabulary once and join back,
  * not once per occurrence; the vocab VALUES list is generated from
  * [[GraftBpe.Vocab]] so engine and oracle cannot drift).
  */
object Tokenize {

  /** `(VALUES ('tion'),('nthe'),…)` from the one true vocab list. */
  private val vocabValues: String =
    GraftBpe.Vocab.map(v => s"('$v')").mkString(",")

  /** Shared oracle prefix: per-doc greedy subword counts as CTE `agg`. */
  private val bpeCte: String =
    s"""WITH RECURSIVE vocab(v) AS (VALUES $vocabValues),
       |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |dw AS (SELECT DISTINCT w FROM words),
       |step(w, pos, toks) AS (
       |  SELECT w, 1, 0 FROM dw
       |  UNION ALL
       |  SELECT s.w,
       |         s.pos + COALESCE((SELECT MAX(length(v.v)) FROM vocab v
       |                           WHERE v.v = substr(s.w, s.pos, length(v.v))), 1),
       |         s.toks + 1
       |  FROM step s WHERE s.pos <= length(s.w)),
       |wtok AS (SELECT w, toks FROM step WHERE pos > length(w)),
       |agg AS (SELECT wo.doc_id, SUM(t.toks) AS bpe
       |        FROM words wo JOIN wtok t ON wo.w = t.w GROUP BY 1)""".stripMargin

  /** Whitespace vs tokenizer-true counts side by side, plus the
    * chars-per-token compression ratio every corpus audit tracks. */
  val tokenCountBpe: QueryDef = QueryDef.sql(
    "text_token_count_bpe",
    s"""$bpeCte
       |SELECT d.doc_id,
       |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS ws_tokens,
       |       CAST(a.bpe AS BIGINT) AS bpe_tokens,
       |       CAST(ROUND(1000.0 * length(d.text) / a.bpe) AS BIGINT) AS chars_per_bpe_milli
       |FROM documents d JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"),
        round(lit(1000.0) * length(col("text")) /
          TextFunctions.bpeTokenCount(col("text"))).cast("long").as("chars_per_bpe_milli"))
      .orderBy("doc_id")
  }

  /** [[TrainingData.packSequences]] under real token counts: same
    * concat-and-chunk pack, bins budgeted in subword tokens. */
  val packSequencesBpe: QueryDef = QueryDef.sql(
    "pack_sequences_bpe",
    s"""$bpeCte,
       |t AS (SELECT d.doc_id, d.source, a.bpe AS nt FROM documents d JOIN agg a USING (doc_id)),
       |c AS (SELECT doc_id, source, nt,
       |             COALESCE(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |      FROM t)
       |SELECT doc_id, source, CAST(nt AS BIGINT) AS n_tokens,
       |       CAST(FLOOR(off / ${TrainingData.PackBudget}.0) AS BIGINT) AS bin_id,
       |       CAST(off % ${TrainingData.PackBudget} AS BIGINT) AS bin_offset
       |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    TrainingData.packOn(Tables.documents(s, d),
      TextFunctions.bpeTokenCount(col("text")))
  }

  val all: Seq[QueryDef] = Seq(tokenCountBpe, packSequencesBpe)
}
