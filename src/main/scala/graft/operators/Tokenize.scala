package graft.operators

import org.apache.spark.sql.SparkSession
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

  /** TOKENIZER FERTILITY by language — the standard tokenizer-equity
    * audit for multilingual corpora (reported in the XLM-R and BLOOM
    * papers as subword tokens per word): languages a tokenizer's vocab
    * serves poorly pay more tokens for the same text, which inflates
    * their effective training cost and shrinks their effective context.
    * Per language: document count, whitespace words, subword tokens,
    * chars, fertility (1000·bpe div words, milli) and compression
    * (1000·chars div bpe, milli) — all exact integers.
    *
    * Scale shape: one codegen'd per-row trie-walk projection (the
    * [[graft.functions.BpeTokenCount]] expression), then a |langs|-row
    * aggregate — the cheapest possible corpus pass; nothing shuffles
    * anything coarser than the language key. */
  val fertility: QueryDef = QueryDef.sql(
    "tokenizer_fertility",
    s"""$bpeCte
       |SELECT d.lang,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS ws_tokens,
       |       CAST(SUM(a.bpe) AS BIGINT) AS bpe_tokens,
       |       CAST(SUM(length(d.text)) AS BIGINT) AS n_chars,
       |       CAST(1000 * SUM(a.bpe) // SUM(len(string_split(d.text, ' '))) AS BIGINT) AS fertility_milli,
       |       CAST(1000 * SUM(length(d.text)) // SUM(a.bpe) AS BIGINT) AS compression_milli
       |FROM documents d JOIN agg a USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        TextFunctions.bpeTokenCount(col("text")).as("bpe"),
        length(col("text")).cast("long").as("nc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("nc")).as("n_chars"))
      .select(col("lang"), col("n_docs").cast("long"),
        col("ws_tokens").cast("long"), col("bpe_tokens").cast("long"),
        col("n_chars").cast("long"),
        expr("1000 * bpe_tokens div ws_tokens").cast("long").as("fertility_milli"),
        expr("1000 * n_chars div bpe_tokens").cast("long").as("compression_milli"))
      .orderBy("lang")
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

  /** BPE MERGE TRAINING — learn the first `numMerges` merge rules from the
    * corpus itself (Sennrich et al. 2016, arXiv:1508.07909), the
    * counterpart of [[GraftBpe]]'s fixed public vocab: real pipelines
    * train the tokenizer ON the corpus they curate. Classic formulation:
    * iterate on the WORD-FREQUENCY table, not the corpus — one
    * map-side-combined groupBy collapses 100 TB of text to a
    * vocabulary-sized (word, freq) table, and every Lloyd-like iteration
    * after that is pair-count → global argmax → merge application over
    * that table alone (the reason BPE training is tractable at corpus
    * scale). Per iteration: adjacent symbol pairs explode (≤ word-length ×
    * vocab rows), a freq-weighted count (one exchange, map-side combined),
    * argmax via TakeOrderedAndProject (per-partition heap, driver merge —
    * only ONE row reaches the driver per iteration), and the merge applied
    * as a codegen'd left-to-right `aggregate` fold (leftmost-first, rescan
    * after merge — standard greedy semantics). The eager localCheckpoint is
    * BATCHED every [[CheckpointEvery]] merges (the CC-loop discipline,
    * fc56d62): between checkpoints the next argmax just replays ≤2 extra
    * codegen'd folds over the vocabulary-sized table — far cheaper than an
    * extra eager action per iteration — while the lineage never grows past
    * a 3-deep nested HOF.
    *
    * RUNNER-UP FOLDING (round-9 verdict item 3): each argmax collects the
    * top THREE pairs, and the runner-up merge is applied in the SAME pass
    * when the sequential argmax would provably pick it next anyway:
    * (a) the winner is not a self-pair (l1 ≠ r1 — a self-merge's residual
    * creations like (AA, A) are bounded only by the winner's own count),
    * (b) the runner-up shares no symbol with the winner (its count is then
    * exactly unchanged by the first merge — a merge only creates
    * adjacencies involving the new symbol and only destroys ones involving
    * l1/r1), and (c) its count strictly exceeds the third pair's (every
    * other pair after the first merge is bounded by that third count:
    * unaffected pairs trivially, created pairs (X, l1r1) by their
    * pre-merge (X, l1) count). Under (a)–(c) the runner-up is the unique
    * post-merge argmax regardless of tie-breaks, so folding it is
    * result-identical to the sequential loop — TokenizeSpec's independent
    * sequential trainer pins that equality. Frequent pairs in real corpora
    * are usually disjoint, so this halves the driver round-trips.
    *
    * Deterministic end to end: exact BIGINT pair counts, ties broken
    * (count DESC, left, right). Iterative global-argmax training is not
    * SQL-expressible in one query → no DuckDB oracle by documented
    * contract; TokenizeSpec pins the full merge table against an
    * independent local reimplementation. */
  /** Eager-checkpoint cadence in [[trainMerges]]: lineage depth between
    * checkpoints is at most this many nested merge folds. */
  val CheckpointEvery = 3

  /** One greedy leftmost-first merge pass as a codegen'd fold expression;
    * composes — mergeExpr(mergeExpr(syms, m1), m2) is two sequential
    * passes. Shared by the trainer and the trained-merge serving query so
    * apply semantics cannot drift from training semantics. */
  private[graft] def mergeExpr(syms: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Distinct corpus words with frequency and the character symbol list —
    * the working table both the trainer and the serving query start from. */
  private def wordSyms(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    Tables.fanOut(docs)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      // Spark's split keeps the empty match at end-of-word (its limit<=0
      // semantics differ from Java's): drop the phantom empty symbol
      .select(col("w"), filter(split(col("w"), "(?!^)"),
        x => length(x) > 0).as("syms"), col("freq"))

  def trainMerges(docs: org.apache.spark.sql.DataFrame, numMerges: Int = 16)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    var vocab = wordSyms(docs)
      .select(col("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    var sinceCheckpoint = 0
    var rank = 1
    while (rank <= numMerges && !exhausted) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(
            element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(3).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l1, r1, c1) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l1, r1, c1))
        var expr = mergeExpr(col("syms"), l1, r1)
        var applied = 1
        if (rank + 1 <= numMerges && top.length >= 2) {
          val (l2, r2, c2) = (top(1).getString(0), top(1).getString(1), top(1).getLong(2))
          val c3 = if (top.length >= 3) top(2).getLong(2) else 0L
          if (l1 != r1 && l2 != l1 && l2 != r1 && r2 != l1 && r2 != r1 && c2 > c3) {
            merges += ((rank + 1, l2, r2, c2))
            expr = mergeExpr(expr, l2, r2)
            applied = 2
          }
        }
        vocab = vocab.select(expr.as("syms"), col("freq"))
        sinceCheckpoint += applied // cadence counts MERGES: fold depth stays bounded
        if (sinceCheckpoint >= CheckpointEvery) {
          vocab = vocab.localCheckpoint(true)
          sinceCheckpoint = 0
        }
        rank += applied
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "left", "right", "pair_count")
      .select(col("merge_rank").cast("long").as("merge_rank"),
        col("left"), col("right"), col("pair_count"))
      .orderBy("merge_rank")
  }

  /** Registered surface serves the TRAINED MERGE TABLE from a train-once
    * [[graft.sources.ModelStore]] artifact keyed on the documents-corpus
    * content (round 14) — the production posture for any trainer (the NB
    * fit, the IVF codebook, the BM25 index follow the same contract):
    * tokenizers are trained once per corpus snapshot and the merge table is
    * THE artifact everything downstream loads. Training stays engine-side
    * ([[trainMerges]], iterative global argmax — not SQL-expressible, the
    * documented no_oracle contract) and remains spec-differentialed:
    * TokenizeSpec pins the full merge table against an independent
    * sequential reimplementation, calling [[trainMerges]] directly. */
  /** THE merge-table artifact accessor — the single site holding the tag,
    * the keying table, and the build, so the registered trainer output and
    * the serving query's collected merges cannot fork (review round 14). */
  private def mergesArtifact(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    graft.sources.ModelStore.getOrBuild(s, d, "documents.parquet", "bpe_merges") {
      trainMerges(Tables.documents(s, d))
    }.orderBy("merge_rank")

  val bpeTrainMerges: QueryDef = QueryDef.noOracle("bpe_train_merges") { (s, d) =>
    mergesArtifact(s, d)
  }

  /** The trained merge table collected driver-side for the apply query —
    * ≤ numMerges rows, the trainer's own driver contract. */
  private def trainedMerges(s: SparkSession, d: String): Seq[(String, String)] =
    mergesArtifact(s, d).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** TRAINED-MERGE SERVING — apply `bpe_train_merges`' learned rules to
    * the corpus vocabulary: the missing half of the BPE family's
    * train→serve loop (the unigram family already has it —
    * `unigram_train_vocab` → `unigram_segment`; until round 14 the BPE
    * serving queries tokenized with the FIXED public vocab while the
    * trained merges served nothing). Sennrich apply semantics = replay
    * the merges IN RANK ORDER, each a greedy leftmost-first pass with
    * rescan — the EXACT [[mergeExpr]] fold the trainer itself ran, so a
    * word that appeared in training segments precisely as training left
    * it. Per distinct word: the piece list, piece count, and corpus
    * frequency.
    *
    * Scale shape: the merge table is vocabulary-of-merges-sized (≤ 16
    * rows, read driver-side — the trainer's own argmax contract); the
    * apply is K composed codegen folds over the DISTINCT-WORD table (the
    * same tokenize-the-vocabulary-once discipline as the fixed-vocab
    * oracle), localCheckpoint'ed every [[CheckpointEvery]] merges to
    * bound expression depth (the trainer's cadence). Nothing here touches
    * the corpus beyond the one word-count pass.
    *
    * Fully DuckDB-oracled (closing the BPE family's serving-oracle gap):
    * the oracle is GENERATED at dump time from the persisted artifact —
    * one recursive CTE per learned merge, each folding that merge
    * leftmost-first over the previous stage's symbol lists with the
    * identical last-element/rescan rule — so engine apply, artifact
    * content, AND rank order all hash-check against an independent
    * replay. */
  val bpeSegmentTrained: QueryDef = QueryDef.sqlDynamic("bpe_segment_trained") { (s, d) =>
    val merges = trainedMerges(s, d)
    def lit(x: String) = "'" + x.replace("'", "''") + "'"
    val stages = merges.zipWithIndex.map { case ((l, r), i) =>
      val prev = if (i == 0) "w0" else s"seg$i"
      s"""step${i + 1}(w, pos, acc) AS (
         |  SELECT w, 1, CAST([] AS VARCHAR[]) FROM $prev
         |  UNION ALL
         |  SELECT s.w, s.pos + 1,
         |         CASE WHEN len(s.acc) > 0 AND s.acc[-1] = ${lit(l)}
         |                   AND p.syms[s.pos] = ${lit(r)}
         |              THEN list_slice(s.acc, 1, len(s.acc) - 1) || [${lit(l + r)}]
         |              ELSE s.acc || [p.syms[s.pos]] END
         |  FROM step${i + 1} s JOIN $prev p ON p.w = s.w
         |  WHERE s.pos <= len(p.syms)),
         |seg${i + 1} AS MATERIALIZED (SELECT s.w, s.acc AS syms FROM step${i + 1} s
         |          JOIN $prev p ON p.w = s.w WHERE s.pos = len(p.syms) + 1)""".stripMargin
    }
    val last = if (merges.isEmpty) "w0" else s"seg${merges.size}"
    s"""WITH RECURSIVE words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wf AS MATERIALIZED (SELECT w, COUNT(*) AS freq FROM words WHERE length(w) > 0 GROUP BY w),
       |w0 AS MATERIALIZED (SELECT w, list_transform(generate_series(1, length(w)),
       |                                i -> substr(w, CAST(i AS INT), 1)) AS syms
       |       FROM wf),
       |${stages.mkString(",\n")}${if (stages.nonEmpty) "," else ""}
       |fin AS (SELECT f.w, f.freq, g.syms FROM wf f JOIN $last g ON g.w = f.w)
       |SELECT w AS word, CAST(freq AS BIGINT) AS freq,
       |       CAST(len(syms) AS BIGINT) AS n_pieces,
       |       array_to_string(syms, ' ') AS pieces
       |FROM fin ORDER BY word""".stripMargin
  } { (s, d) =>
    val merges = trainedMerges(s, d)
    var df = wordSyms(Tables.documents(s, d)).localCheckpoint(true)
    var sinceCheckpoint = 0
    for ((l, r) <- merges) {
      df = df.select(col("w"), mergeExpr(col("syms"), l, r).as("syms"), col("freq"))
      sinceCheckpoint += 1
      if (sinceCheckpoint >= CheckpointEvery) {
        df = df.localCheckpoint(true)
        sinceCheckpoint = 0
      }
    }
    df.select(col("w").as("word"), col("freq").cast("long").as("freq"),
        size(col("syms")).cast("long").as("n_pieces"),
        concat_ws(" ", col("syms")).as("pieces"))
      .orderBy("word")
  }

  val all: Seq[QueryDef] = Seq(tokenCountBpe, packSequencesBpe, fertility,
    bpeTrainMerges, bpeSegmentTrained)
}
