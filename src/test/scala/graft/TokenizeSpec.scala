package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{GraftBpe, TextFunctions}
import graft.operators.Tokenize

/** Differential suite for the greedy subword tokenizer: the trie-walking
  * Catalyst expression vs an independent substring-set reference
  * implementation (written here, not shared with main code), plus the edge
  * cases the trie walk has to get right. */
class TokenizeSpec extends AnyFunSuite with Matchers {
  private val spark = SharedSpark.spark
  import spark.implicits._

  /** Reference greedy longest-match: naive substring + Set lookups. */
  private val vset = GraftBpe.Vocab.toSet
  private def refWord(w: String): Long = {
    var pos = 0; var n = 0L
    while (pos < w.length) {
      val step = (4 to 2 by -1).find(l =>
        pos + l <= w.length && vset(w.substring(pos, pos + l))).getOrElse(1)
      pos += step; n += 1
    }
    n
  }
  private def refDoc(text: String): Long =
    text.split(" ", -1).map(refWord).sum

  test("expression matches the reference on the sf0.001 corpus") {
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"), TextFunctions.bpeTokenCount(col("text")).as("n"))
      .as[(String, Long)].collect()
    rows should not be empty
    for ((text, n) <- rows) n shouldBe refDoc(text)
  }

  test("tokenizer_fertility aggregates match the reference tokenizer per language") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("lang"), col("text")).as[(String, String)].collect()
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val ws = ds.map(_._2.split(" ", -1).length.toLong).sum
      val bpe = ds.map(d => refDoc(d._2)).sum
      val nc = ds.map(_._2.length.toLong).sum
      lang -> ((ds.length.toLong, ws, bpe, nc, 1000 * bpe / ws, 1000 * nc / bpe))
    }
    val got = SparkEntry.queries("tokenizer_fertility")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    got.keySet shouldBe expected.keySet
    for ((lang, e) <- expected) got(lang) shouldBe e
    // fertility is the signal: every language pays ≥ 1 token per word
    for ((_, (_, ws, bpe, _, fert, _)) <- got) {
      bpe should be >= ws
      fert should be >= 1000L
    }
  }

  test("bpe_train_merges matches an independent local trainer on the sf0.001 corpus") {
    // Reference trainer: plain Scala collections over the collected corpus —
    // word-freq map, adjacent pair counts, (count DESC, left, right) argmax,
    // leftmost-first merge with rescan-after-merge. Nothing shared with the
    // DataFrame implementation except the algorithm definition.
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect()
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w.map(_.toString).toList -> g.length.toLong }
    def applyMerge(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = syms
      while (rest.nonEmpty) {
        rest match {
          case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
          case a :: tail => out += a; rest = tail
          case Nil => ()
        }
      }
      out.toList
    }
    val expected = (1 to 16).flatMap { rank =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, freq) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + freq)
      }
      if (counts.isEmpty) None
      else {
        // Tie-break strings by UTF-8 byte order (Spark's binary collation),
        // not Java's UTF-16 compareTo — they diverge for supplementary-plane
        // code points, and the engine side sorts with Spark's ordering.
        def u8(s: String): Seq[Int] = s.getBytes("UTF-8").toSeq.map(_ & 0xff)
        import scala.math.Ordering.Implicits._
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, u8(l), u8(r)) }
        vocab = vocab.toSeq.map { case (syms, freq) => applyMerge(syms, l, r) -> freq }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        Some((rank.toLong, l, r, cnt))
      }
    }
    val got = Tokenize.bpeTrainMerges.run(spark, "/root/testdata/sf0.001")
      .collect().map(row => (row.getLong(0), row.getString(1), row.getString(2), row.getLong(3)))
    assert(got.toSeq === expected)
    assert(got.length === 16, "corpus must support 16 merges")
  }

  test("edge cases: empty, single char, pure vocab words, overlap traps") {
    val cases = Seq(
      "",            // zero words -> zero tokens
      "a",           // single-char fallback
      "the",         // exact trigram
      "tion",        // exact quadgram
      "thether",     // greedy: "the"? no - "theth" -> "ther"? position 0 matches quad "ther"? "thet" no; tri "the" yes -> the|ther = 2
      "xyzzy",       // nothing matches: 5 single chars
      "THE",         // uppercase never matches (vocab is lowercase): 3
      "a  b",        // double space: empty middle word contributes 0
      " lead", "trail ", // leading/trailing space
      "that4u")      // digit breaks the walk mid-word
    val df = cases.toDF("text")
      .select(col("text"), TextFunctions.bpeTokenCount(col("text")).as("n"))
    for ((text, n) <- df.as[(String, Long)].collect())
      withClue(s"text='$text'") { n shouldBe refDoc(text) }
    // and a couple of hand-computed anchors, independent of refDoc
    refDoc("the") shouldBe 1
    refDoc("tion") shouldBe 1
    refDoc("xyzzy") shouldBe 5
    refDoc("THE") shouldBe 3
    refDoc("") shouldBe 0
  }

  test("bpe_segment_trained applies the learned merges rank-ordered, " +
      "leftmost-first — matches an independent local apply on sf0.001") {
    val d = "/root/testdata/sf0.001"
    def applyMerge(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
        case a :: tail => out += a; rest = tail
        case Nil => ()
      }
      out.toList
    }
    val merges = Tokenize.bpeTrainMerges.run(spark, d) // differential-pinned above
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty, "fixture must have learned merges")
    val texts = Tables.documents(spark, d).select("text").as[String].collect()
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
    val freq = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = freq.keys.map { w =>
      val pieces = merges.foldLeft(w.map(_.toString).toList) {
        case (syms, (l, r)) => applyMerge(syms, l, r)
      }
      w -> ((freq(w), pieces.length.toLong, pieces.mkString(" ")))
    }.toMap
    val got = Tokenize.bpeSegmentTrained.run(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === expected.keySet, "one row per distinct word")
    for ((w, e) <- expected) assert(got(w) === e, s"segmentation of '$w'")
    // and at least one multi-char piece actually formed (the serving query
    // is not just echoing character splits)
    assert(got.values.exists(_._3.split(" ").exists(_.length > 1)),
      "trained merges must produce multi-character pieces on this corpus")
  }

  test("greedy is longest-match-first, not leftmost-merge") {
    // "ofthe": quad "ofth" beats tri+bi splits -> of|th? NO: greedy at pos 0
    // takes "ofth" (4), remainder "e" -> 2 tokens.
    refDoc("ofthe") shouldBe 2
    val n = Seq("ofthe").toDF("text")
      .select(TextFunctions.bpeTokenCount(col("text"))).as[Long].head()
    n shouldBe 2L
  }

  test("graft_bpe_count is registered as a SQL function") {
    GraftExtensions.register(spark)
    spark.sql("SELECT graft_bpe_count('the tokenizer') AS n")
      .as[Long].head() shouldBe refDoc("the tokenizer")
  }

  test("pack_sequences_bpe: bins respect the budget and offsets chain") {
    val out = Tokenize.packSequencesBpe.run(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "n_tokens", "bin_id", "bin_offset")
      .as[(Long, String, Long, Long, Long)].collect()
    out should not be empty
    out.foreach { case (_, _, nt, bin, off) =>
      nt should be > 0L
      bin should be >= 0L
      off should (be >= 0L and be < 512L)
    }
    // per source: offset of doc k = cumulative tokens of docs before it
    out.groupBy(_._2).values.foreach { docs =>
      var cum = 0L
      for ((_, _, nt, bin, off) <- docs.sortBy(_._1)) {
        bin shouldBe cum / 512
        off shouldBe cum % 512
        cum += nt
      }
    }
  }

  test("bpe count stays inside whole-stage codegen") {
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextFunctions.bpeTokenCount(col("text")).as("n"))
      .queryExecution.executedPlan.toString
    // the `*(n)` star prefix marks a WholeStageCodegen subtree; the count
    // must sit inside one, not fall back to an interpreted Project
    plan should include regex """\*\(\d+\) Project \[graft_bpe_count"""
  }
}
