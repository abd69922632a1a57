package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** UNIGRAM-LM tokenizer training — the second published subword-trainer
  * family (Kudo, ACL'18; SentencePiece's default), complementing the
  * merge-based family `bpe_train_merges` covers: where BPE grows a vocab
  * bottom-up by greedy pair merges, the unigram trainer starts from an
  * over-complete substring seed and SHRINKS it — alternating EM
  * (re-segment the corpus under current piece scores, re-estimate scores
  * from the segmentation counts) with pruning — until the target size.
  * This engine's rendition is the deterministic integer-exact core of
  * that recipe:
  *
  *  - Seed: every substring of length ≤ [[MaxPieceLen]] of the corpus's
  *    distinct words, counted by word frequency; single characters are
  *    mandatory forever (any word stays segmentable), multi-char pieces
  *    capped at [[SeedCap]] by (count DESC, piece ASC).
  *  - E-step: VITERBI segmentation of every distinct word — not sampled
  *    lattice EM; the hard-EM variant is deterministic and published as
  *    SentencePiece's inference rule. Scores are the fixed-point
  *    milli-log2 of add-one-smoothed counts (the [[QualityClassifier.ml2]]
  *    construction on the driver side), so every comparison is exact
  *    BIGINT. The tie rule is total: maximize score, then FEWEST pieces,
  *    then lexicographically smallest piece list — each criterion is
  *    prefix-decomposable, so the forward DP carrying
  *    (−score, n_pieces, pieces) per prefix and taking `array_min` of the
  *    ≤ [[MaxPieceLen]] candidates is exactly the global argmin.
  *  - M-step + prune: counts from the Viterbi explode; zero-count
  *    multi-char pieces drop, survivors rank (count DESC, piece ASC),
  *    and each round keeps at most half the multis (never below the
  *    target) — the ~geometric shrink schedule of the published trainer.
  *
  * Spark shape: the corpus-scale work is ONE token count (explode +
  * map-side-combined groupBy). Everything after runs on the DISTINCT-WORD
  * table — the vocabulary-sized object EM actually iterates on — with the
  * segmentation DP as a codegen'd `aggregate` fold over a LITERAL score
  * map (vocab ≤ [[SeedCap]] + alphabet by construction, so the expression
  * stays bounded; a million-piece production vocab would swap the literal
  * for a broadcast-map `mapPartitions`, same DP). Per round the driver
  * collects one vocabulary-sized count aggregate — the model IS its
  * counts, the same sufficient-statistics posture as the NB classifier —
  * never corpus rows. Iterative EM is not one SQL statement, so the
  * TRAINER is spec-verified against an independent local reimplementation
  * (the `bpe_train_merges` contract); the SERVING path below is fully
  * DuckDB-oracled from the persisted artifact.
  */
object UnigramLM {

  val MaxPieceLen = 4
  val SeedCap = 96

  /** Multi-char pieces kept in the FINAL vocab, on top of the mandatory
    * alphabet (single chars are never prunable — every word must stay
    * segmentable — so the budget that EM actually allocates is the
    * multi-char one; sizing the target as total-vocab would let a large
    * alphabet silently prune every learned piece). */
  val TargetMultis = 16
  val EmRounds = 3

  /** Driver-side fixed-point milli-log2 — the exact integer function
    * [[QualityClassifier.ml2]] renders in SQL: 1000·⌊log2 x⌋ +
    * (x − 2^e)·1000 div 2^e, x ≥ 1. */
  def ml2i(x: Long): Long = {
    require(x >= 1, s"ml2i domain: $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    1000L * e + ((x - (1L << e)) * 1000L) / (1L << e)
  }

  /** Piece score under add-one smoothing over a vocab of `size` pieces
    * with `total` segmented-count mass: ml2(c+1) − ml2(total+size) ≤ 0. */
  def scoreOf(cnt: Long, total: Long, size: Int): Long =
    ml2i(cnt + 1) - ml2i(total + size)

  /** Viterbi segmentation of word column `w` under a literal score map:
    * array<string> of the (max score, fewest pieces, lex-least) pieces.
    * Forward DP; prefix k's best rides entry k+1 of the fold accumulator
    * as (ms = −score, n, ps), compared by Spark's struct ordering via
    * `array_min` — null candidates (piece not in vocab / prefix shorter
    * than the piece) are filtered before the min. Falls back to the whole
    * word as one piece when a character is outside the vocab (cannot
    * happen for a vocab trained on the same corpus). */
  private[graft] def segExpr(w: Column, scores: Map[String, Long]): Column = {
    val scoreMap = map(scores.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val init = array(struct(lit(0L).as("ms"), lit(0).as("n"),
      array().cast("array<string>").as("ps")))
    val dp = aggregate(sequence(lit(1), length(w)), init, (acc, i) => {
      val cands = (1 to MaxPieceLen).map { l =>
        val ll = lit(l)
        val piece = w.substr(i - ll + 1, ll)
        val sc = element_at(scoreMap, piece)
        when(i >= ll && sc.isNotNull, {
          val prev = element_at(acc, (i - ll + 1).cast("int"))
          struct((prev.getField("ms") - sc).as("ms"),
            (prev.getField("n") + 1).as("n"),
            concat(prev.getField("ps"), array(piece)).as("ps"))
        })
      }
      concat(acc, array(array_min(filter(array(cands: _*), c => c.isNotNull))))
    })
    val best = element_at(dp, (length(w) + 1).cast("int"))
    coalesce(best.getField("ps"), array(w))
  }

  /** Distinct words of the corpus with frequency — the vocabulary-sized
    * table EM iterates on. */
  private def wordTable(docs: DataFrame): DataFrame =
    Tables.fanOut(docs)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Full trainer: seed → [[EmRounds]] × (Viterbi E-step, count M-step,
    * prune) → final vocab (rank, piece, count, score_milli, is_char),
    * ranked (count DESC, piece ASC). */
  def trainVocab(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordTable(docs).localCheckpoint(true)
    // seed counts: every ≤ MaxPieceLen substring, weighted by word freq
    val subs = words.select(col("freq"),
        explode(flatten(transform(sequence(lit(1), length(col("w"))), i =>
          transform(sequence(lit(1),
            least(lit(MaxPieceLen), length(col("w")) - i + 1)), l =>
            col("w").substr(i, l))))).as("p"))
      .groupBy(col("p")).agg(sum(col("freq")).as("cnt"))
    val singlesSeed = subs.filter(length(col("p")) === 1)
      .as[(String, Long)].collect()
    val multisSeed = subs.filter(length(col("p")) > 1)
      .orderBy(col("cnt").desc, col("p")).limit(SeedCap)
      .as[(String, Long)].collect()
    var vocab: Seq[(String, Long)] = (singlesSeed ++ multisSeed).toSeq
      .sortBy { case (p, c) => (-c, p) }

    for (r <- 1 to EmRounds) {
      val total = vocab.map(_._2).sum
      val scores = vocab.map { case (p, c) =>
        p -> scoreOf(c, total, vocab.size) }.toMap
      val counts = words
        .select(col("freq"), explode(segExpr(col("w"), scores)).as("p"))
        .groupBy(col("p")).agg(sum(col("freq")).as("cnt"))
        .as[(String, Long)].collect().toMap
      val singles = vocab.filter(_._1.length == 1)
        .map { case (p, _) => p -> counts.getOrElse(p, 0L) }
      val multis = vocab.filter(_._1.length > 1)
        .flatMap { case (p, _) => counts.get(p).map(p -> _) }
        .sortBy { case (p, c) => (-c, p) }
      val keep =
        if (r == EmRounds) TargetMultis
        else math.max(TargetMultis, multis.size / 2)
      vocab = (singles ++ multis.take(keep)).sortBy { case (p, c) => (-c, p) }
    }
    val total = vocab.map(_._2).sum
    val size = vocab.size
    vocab.zipWithIndex.map { case ((p, c), i) =>
      (i + 1L, p, c, scoreOf(c, total, size), p.length == 1)
    }.toDF("rank", "piece", "count", "score_milli", "is_char")
  }

  private val ArtifactTag = "unigram_v24"

  /** The trained vocab as a train-once [[graft.sources.ModelStore]]
    * artifact — training runs once per corpus content; the trainer query
    * and the serving query both read the parquet table afterwards. */
  private def vocabArtifact(s: SparkSession, d: String): DataFrame =
    graft.sources.ModelStore.getOrBuild(s, d, "documents.parquet", ArtifactTag) {
      trainVocab(Tables.documents(s, d))
    }

  /** Registered trainer — the `bpe_train_merges` contract: iterative EM is
    * not one SQL statement, so no DuckDB oracle; UnigramLMSpec pins the
    * full vocab table against an independent local reimplementation. */
  val train: QueryDef = QueryDef.noOracle("unigram_train_vocab") { (s, d) =>
    vocabArtifact(s, d).orderBy("rank")
  }

  /** SERVING: segment the corpus with the trained vocab — per doc, word
    * count, piece count, exact-milli fertility, and the full segmented
    * text ('·' inside words, ' ' between; word order rebuilt from the
    * explode position without a window). ORACLE-CHECKED end to end: the
    * DuckDB oracle reads the persisted vocab artifact and re-derives every
    * segmentation by enumerating ALL piece decompositions per distinct
    * word (recursive CTE) and applying the same total tie rule
    * (score DESC, n ASC, pieces ASC) — an independent engine agreeing on
    * every fused byte of seg_text is the strongest check the trainer's
    * serving path can get. Scale shape: the DP runs on DISTINCT words
    * (vocabulary-sized), broadcast back to one corpus-scale explode. */
  val segment: QueryDef = QueryDef.sqlDynamic("unigram_segment") { (s, d) =>
    val path = graft.sources.ModelStore.fsPath(s, d, "documents.parquet", ArtifactTag)
    s"""WITH RECURSIVE
      |v AS (SELECT piece, score_milli FROM read_parquet('$path/*.parquet')),
      |-- empty words (double/leading/trailing spaces) are excluded on BOTH
      |-- engines: the Spark side filters length(w) > 0 below, so the oracle
      |-- must too or a multi-spaced doc would diverge (advisor round 12)
      |w AS (SELECT w FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
      |                     FROM documents) WHERE length(w) > 0),
      |seg AS (
      |  SELECT w.w, 0 AS pos, CAST([] AS VARCHAR[]) AS ps, CAST(0 AS BIGINT) AS s FROM w
      |  UNION ALL
      |  SELECT seg.w, seg.pos + length(v.piece), list_append(seg.ps, v.piece),
      |         seg.s + v.score_milli
      |  FROM seg JOIN v ON v.piece = substr(seg.w, seg.pos + 1, length(v.piece))
      |  WHERE seg.pos < length(seg.w)
      |),
      |done AS (SELECT w, ps, s, len(ps) AS n FROM seg WHERE pos = length(w)),
      |best AS (SELECT w, ps, n FROM (
      |          SELECT *, ROW_NUMBER() OVER (PARTITION BY w
      |                      ORDER BY s DESC, n ASC, ps ASC) AS r FROM done)
      |         WHERE r = 1),
      |dw AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
      |       FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |pw AS (SELECT dw.doc_id, dw.i, array_to_string(best.ps, chr(183)) AS segw, best.n
      |       FROM dw JOIN best ON best.w = dw.ws[CAST(dw.i AS INT)])
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |       CAST(SUM(n) AS BIGINT) AS n_pieces,
      |       CAST(1000 * SUM(n) // COUNT(*) AS BIGINT) AS fertility_milli,
      |       string_agg(segw, ' ' ORDER BY i) AS seg_text
      |FROM pw GROUP BY doc_id ORDER BY doc_id""".stripMargin
  } { (s, d) =>
    val vocab = vocabArtifact(s, d)
      .select(col("piece"), col("score_milli"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(s, d)
    val seg = wordTable(docs)
      .select(col("w"), segExpr(col("w"), vocab).as("ps"))
      .select(col("w"), array_join(col("ps"), "·").as("segw"),
        size(col("ps")).cast("long").as("n"))
    val dw = Tables.fanOut(docs)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
      .filter(length(col("w")) > 0)
    dw.join(broadcast(seg), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("n")).cast("long").as("n_pieces"),
        expr("1000 * sum(n) div count(1)").cast("long").as("fertility_milli"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("i"), col("segw")))),
          x => x.getField("segw"))).as("seg_text"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(train, segment)
}
