package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Byte-pair-encoding tokenizer: a real learned merge table, not a
  * token-count heuristic — the subword vocabulary construction of
  * Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of Rare
  * Words with Subword Units", ACL) that GPT-2/RoBERTa-family
  * tokenizers build on.
  *
  * Split of labor, Spark-first:
  *  - [[train]] runs the corpus-scale part distributed — ONE
  *    map-side-combinable word-count aggregate plus a bounded
  *    TakeOrdered — then learns merges driver-side from the counted
  *    dictionary ([[trainMerges]]). BPE training state is the word
  *    frequency dict, whose distinct-word size is corpus-sublinear
  *    (Heaps' law) and capped by `maxWords`; every public BPE trainer
  *    works from exactly this dict, so nothing corpus-sized ever
  *    reaches the driver.
  *  - encoding runs per-row inside whole-stage codegen via the native
  *    `graft_bpe_count` expression ([[graft.plans.BpeCount]]) holding
  *    a broadcast-style reference to one [[BpeEncoder]] per plan.
  *
  * Pre-tokenization uses the SAME engine-portable character classes as
  * the heuristic [[TextFns.bpeTokenCount]] (letter runs, single
  * digits, single punctuation marks), so learned counts are comparable
  * with the heuristic's and both sides of the `text_stats` oracle
  * stay consistent.
  */
object Bpe {

  /** End-of-word terminal symbol (Sennrich §3.2's '·' marker, spelled
    * as GPT-style "&lt;/w&gt;"): lets the table learn word-final merges
    * without crossing word boundaries.
    */
  val EndOfWord = "</w>"

  /** Pre-token pattern — identical classes to the heuristic count. */
  val PreTokenRegex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  private val preTokenPattern = java.util.regex.Pattern.compile(PreTokenRegex)

  private[graft] def preTokenize(text: String): Iterator[String] = {
    val m = preTokenPattern.matcher(text)
    new Iterator[String] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = { val g = m.group(); has = m.find(); g }
    }
  }

  /** Learn `numMerges` merges from a word-frequency dictionary — the
    * Sennrich et al. 2016 algorithm with incremental pair-count
    * maintenance (only words containing the merged pair are revisited
    * per iteration). Ties break deterministically: highest count, then
    * lexicographically smallest pair. Stops early when no pair occurs
    * twice (merging a count-1 pair can never help compression).
    */
  def trainMerges(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    val words: Array[mutable.ArrayBuffer[String]] = wordCounts.map { case (w, _) =>
      // split by CODE POINT, not UTF-16 Char: a per-Char split would
      // turn astral code points (emoji, CJK-ext) into lone-surrogate
      // symbols, which do not survive the UTF-8 round trip through
      // the serialized-merges literal (unpaired surrogates become
      // '?'), so the distributed encoder would silently never apply
      // those merges and diverge from this trainer
      val cps = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      mutable.ArrayBuffer(cps: _*) += EndOfWord
    }.toArray
    val counts = wordCounts.map(_._2).toArray
    val pairCounts = mutable.Map.empty[(String, String), Long]
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[Int]]

    def tally(i: Int, sign: Long): Unit = {
      val sym = words(i)
      var j = 0
      while (j < sym.length - 1) {
        val p = (sym(j), sym(j + 1))
        val c = pairCounts.getOrElse(p, 0L) + sign * counts(i)
        if (c <= 0L) { pairCounts.remove(p); pairWords.get(p).foreach(_.remove(i)) }
        else {
          pairCounts(p) = c
          // membership only grows on the +1 pass: the -1 pass runs just
          // before word i is rewritten, and a pair kept alive by OTHER
          // words must not re-list word i — the imminent merge may
          // remove the pair from i, and a stale membership would make
          // every later merge of p re-tally a word that no longer
          // contains it (wasted work that accretes on Zipf dictionaries)
          if (sign > 0L) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
          else pairWords.get(p).foreach(_.remove(i))
        }
        j += 1
      }
    }
    words.indices.foreach(tally(_, 1L))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < numMerges && pairCounts.nonEmpty) {
      val (best, bestCount) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
      if (bestCount < 2L) step = numMerges // nothing left worth merging
      else {
        merges += best
        val affected = pairWords.getOrElse(best, mutable.Set.empty).toArray
        affected.foreach { i =>
          tally(i, -1L)
          words(i) = mergePair(words(i), best._1, best._2)
          tally(i, 1L)
        }
        pairCounts.remove(best)
        pairWords.remove(best)
        step += 1
      }
    }
    merges.toSeq
  }

  /** Replace every non-overlapping adjacent (a, b) left-to-right. */
  private def mergePair(sym: mutable.ArrayBuffer[String], a: String,
                        b: String): mutable.ArrayBuffer[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < sym.length) {
      if (j < sym.length - 1 && sym(j) == a && sym(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += sym(j); j += 1 }
    }
    out
  }

  /** Distributed trainer: word counts from one aggregate over the
    * corpus (partial-aggregated map-side; the shuffle carries one row
    * per DISTINCT word), the `maxWords` most frequent words collected
    * (deterministic count-then-word TakeOrdered — Zipf puts virtually
    * all pair mass in the head), merges learned driver-side.
    */
  def train(docs: DataFrame, textCol: Column, numMerges: Int = 256,
            maxWords: Int = 65536): Seq[(String, String)] = {
    val top = docs
      .select(explode(regexp_extract_all(textCol, lit(PreTokenRegex), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainMerges(top, numMerges)
  }

  /** Wire format for passing a merge table through a foldable string
    * literal: one `a<space>b` pair per newline. Symbols never contain
    * whitespace (pre-tokens exclude it; merges only concatenate).
    */
  def serializeMerges(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString("\n")

  def parseMerges(s: String): Seq[(String, String)] =
    if (s.isEmpty) Seq.empty
    else s.split('\n').toSeq.map { line =>
      val i = line.indexOf(' ')
      require(i > 0, s"malformed merge line: '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }
}

/** Greedy lowest-rank-first BPE encoder over a learned merge table —
  * the standard apply-merges-in-training-order rule every BPE
  * implementation shares, so a given (merges, text) pair has exactly
  * one token sequence.
  *
  * Thread-safe; repeated words hit a bounded concurrent memo (Zipf:
  * the head of the word distribution dominates occurrences, so the
  * memo converts per-occurrence O(len·merges) work into a map probe).
  */
final class BpeEncoder(val merges: Seq[(String, String)]) extends Serializable {

  private val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, Integer.valueOf(i)) }
    m
  }

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val MemoCap = 100000

  /** Token count of one pre-token (word) under the merge table. */
  def countWord(w: String): Int = {
    val cached = memo.get(w)
    if (cached != null) return cached.intValue()
    val n = encodeWord(w).length
    if (memo.size() < MemoCap) memo.put(w, Integer.valueOf(n))
    n
  }

  /** Full BPE segmentation of one word (chars + end-of-word marker,
    * merges applied lowest rank first, left-to-right within a rank).
    */
  def encodeWord(w: String): Vector[String] = {
    // code-point split — must mirror trainMerges exactly, or symbols
    // for astral code points never match the merge table
    var sym: Vector[String] = w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector :+ Bpe.EndOfWord
    var done = false
    while (!done && sym.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < sym.length - 1) {
        val r = ranks.get((sym(j), sym(j + 1)))
        if (r != null && r.intValue() < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        val (a, b) = (sym(bestAt), sym(bestAt + 1))
        // merge ALL occurrences of this pair (training merged all at once)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i < sym.length - 1 && sym(i) == a && sym(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.result()
      }
    }
    sym
  }

  /** Learned-BPE token count of a whole text (sum over pre-tokens). */
  def countTokens(text: String): Int = {
    var n = 0
    Bpe.preTokenize(text).foreach(w => n += countWord(w))
    n
  }
}
