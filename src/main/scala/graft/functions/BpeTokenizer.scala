package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic greedy longest-match subword tokenizer over a FIXED PUBLIC
  * vocabulary — the "tokenizer-true" token counter behind
  * `text_token_count_bpe` / `pack_sequences_bpe`.
  *
  * Vocabulary: the most frequent English letter n-grams from Peter Norvig's
  * published Google-Books corpus counts ("English Letter Frequency Counts:
  * Mayzner Revisited", norvig.com/mayzner.html) — top 10 quadgrams, top 20
  * trigrams, top 50 bigrams — plus an implicit single-character fallback, so
  * every string tokenizes totally. Rule: scan each whitespace-delimited word
  * left to right; at each position take the LONGEST vocab entry that matches
  * (4 > 3 > 2), else consume one character; tokens never cross a space and
  * the space itself is a separator, not a token. This is the greedy
  * WordPiece-style decode shape (longest-match-first over a closed vocab),
  * chosen over learned BPE merges because it is reproducible from a table
  * anyone can rebuild from the public counts — the determinism matters more
  * than the exact merge order for pack-budget fidelity.
  *
  * The count runs as a single per-row trie walk (no per-position substring
  * allocation), exposed as a native Catalyst expression so it stays inside
  * whole-stage codegen — same posture as [[DotProduct]]. The DuckDB oracle
  * expresses the identical rule as a recursive CTE over the corpus's
  * distinct words (longest-prefix via MAX(length) over the vocab relation),
  * so both engines tokenize from the same table.
  */
object GraftBpe {

  /** Norvig top-10 English quadgrams. */
  val Quadgrams: Seq[String] = Seq(
    "tion", "nthe", "ther", "that", "ofth", "fthe", "thes", "with", "inth", "atio")

  /** Norvig top-20 English trigrams. */
  val Trigrams: Seq[String] = Seq(
    "the", "and", "ing", "her", "hat", "his", "tha", "ere", "for", "ent",
    "ion", "ter", "was", "you", "ith", "ver", "all", "wit", "thi", "tio")

  /** Norvig top-50 English bigrams. */
  val Bigrams: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur")

  val Vocab: Seq[String] = Quadgrams ++ Trigrams ++ Bigrams

  val MaxEntryLen = 4

  /** Flat char trie over [[Vocab]] (lowercase ASCII letters only, which is
    * all the published n-gram tables contain). Node = int offset into
    * `trie`; slot = 26 child pointers + 1 terminal flag. Depth ≤ 4 and
    * ~80 entries keep it a few KB — effectively a lookup table the JIT
    * keeps hot. Non-letter characters can never match an entry, so the
    * walk rejects them in one branch. */
  private val Fanout = 27 // 26 children + terminal flag at index 26
  private val trie: Array[Int] = {
    val buf = scala.collection.mutable.ArrayBuffer.fill(Fanout)(0)
    for (entry <- Vocab) {
      var node = 0
      for (c <- entry) {
        val slot = node + (c - 'a')
        if (buf(slot) == 0) {
          buf(slot) = buf.length / Fanout
          buf ++= Array.fill(Fanout)(0)
        }
        node = buf(slot) * Fanout
      }
      buf(node + 26) = 1
    }
    buf.toArray
  }

  /** Longest vocab entry matching at `pos` in `[pos, end)`, or 1 (the
    * single-char fallback). */
  private def matchLen(s: String, pos: Int, end: Int): Int = {
    var node = 0
    var best = 1
    var i = pos
    val stop = math.min(end, pos + MaxEntryLen)
    while (i < stop) {
      val c = s.charAt(i)
      if (c < 'a' || c > 'z') return best
      val child = trie(node + (c - 'a'))
      if (child == 0) return best
      node = child * Fanout
      i += 1
      if (trie(node + 26) == 1) best = i - pos
    }
    best
  }

  /** Greedy token count of one word segment `[from, until)`. */
  private def countWord(s: String, from: Int, until: Int): Long = {
    var pos = from
    var n = 0L
    while (pos < until) {
      pos += matchLen(s, pos, until)
      n += 1L
    }
    n
  }

  /** Greedy subword token count of a whole document: sum over its
    * space-delimited words. Called from generated code ([[BpeTokenCount]]).
    * Consecutive/leading/trailing spaces contribute zero-length segments,
    * i.e. no tokens — matching `string_split`'s empty-string words in the
    * oracle, which also tokenize to zero. */
  def countDoc(u: UTF8String): Long = {
    val s = u.toString
    var start = 0
    var total = 0L
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        total += countWord(s, start, i)
        start = i + 1
      }
      i += 1
    }
    total
  }
}

/** `bpe_token_count(text)`: [[GraftBpe.countDoc]] as a codegen'd unary
  * expression — one static call inside the generated projection, no lambda
  * interpretation, no whole-stage-codegen break (a higher-order
  * `aggregate(transform(split(...)))` tree computing the same thing would
  * fall out of codegen and interpret two lambdas per character). */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    GraftBpe.countDoc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftBpe.countDoc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Column API for [[BpeTokenCount]]. */
  def bpeTokenCount(text: Column): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(text)))
}
