package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003 — the MOSS algorithm): hash every character k-gram of
  * the input, then from each window of `w` consecutive gram hashes
  * select the minimum (rightmost position on ties). The selected set
  * is ~2/(w+1) of the grams, position-robust (an insertion shifts
  * positions but reselects the same hashes), and carries the paper's
  * guarantee: any substring match of length ≥ w + k − 1 between two
  * documents produces at least one SHARED fingerprint — so
  * fingerprint-set intersection is a sound detector for partial
  * overlap, where whole-doc hashing ([[graft.functions.TextFns
  * .fingerprint]]) only catches exact duplicates and token-k-gram
  * spans ([[graft.operators.Dedup.duplicatePassages]]) pay a
  * gram-exploded shuffle.
  *
  * Output: one long per selected fingerprint, encoded
  * `hash * 2^27 + pos` (gram hash < 2^31 from the mod-(2^31−1)
  * rolling hash; 0-based gram position < 2^27 — documents beyond
  * 2^27−1 = 134M grams are refused loudly rather than silently
  * mis-encoded), ascending by position. The whole computation is ONE
  * map-side pass per document — candidate generation for overlap
  * detection needs no shuffle until the (already ~2/(w+1)-sampled)
  * fingerprints meet on an equi-join.
  *
  * Gram hash: polynomial rolling hash over Unicode code points,
  * `h = fold(h * 257 + cp) mod (2^31 − 1)` — deliberately
  * engine-portable arithmetic (the DuckDB oracle restates it as a
  * `list_reduce` fold and the window selection as a windowed MIN; see
  * the winnow_fps oracle), unlike xxhash64 which no other engine
  * reproduces. Window selection here is the direct per-window argmin
  * (O(n·w), w is single-digit); the oracle's windowed-MIN-over-
  * encoded-keys restatement is the same semantics through different
  * machinery, which is exactly what makes the hash gate meaningful.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1 && k <= 64, s"graft_winnow k must be in [1, 64], got $k")
  require(w >= 1 && w <= 1024, s"graft_winnow w must be in [1, 1024], got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires a string column, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(a: Any): Any =
    WinnowFingerprints.compute(a.asInstanceOf[UTF8String], k, w)

  // One static call — the shared implementation stays a single JIT
  // target for both the interpreted and whole-stage-codegen paths
  // (the staticInvoke pattern), and the two paths cannot drift.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.WinnowFingerprints.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  final val Mod: Long = 2147483647L // 2^31 - 1 (Mersenne prime)
  final val Base: Long = 257L
  final val PosBits: Int = 27
  final val PosMask: Long = (1L << PosBits) - 1L

  /** Selected fingerprints of `text`, encoded `hash << 27 | pos`,
    * ascending by position. Empty array when the text has fewer than
    * `k` code points.
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = codePoints(text)
    val n = cps.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    require(n <= PosMask,
      s"graft_winnow: document has $n grams, beyond the 2^$PosBits-1 position " +
        "encoding — split the document (doc_chunks) before fingerprinting")
    // rolling gram hashes: h(p+1) = (h(p) - cp(p)·Base^(k-1))·Base + cp(p+k)
    val h = new Array[Long](n)
    var bk1 = 1L
    var i = 1
    while (i < k) { bk1 = bk1 * Base % Mod; i += 1 }
    var acc = 0L
    i = 0
    while (i < k) { acc = (acc * Base + cps(i)) % Mod; i += 1 }
    h(0) = acc
    var p = 1
    while (p < n) {
      acc = ((acc - cps(p - 1) * bk1) % Mod + Mod) % Mod
      acc = (acc * Base + cps(p + k - 1)) % Mod
      h(p) = acc
      p += 1
    }
    // per-window rightmost-min selection over full windows (a doc
    // shorter than one window degenerates to a single global window)
    val selected = new Array[Boolean](n)
    var nSel = 0
    val lastStart = math.max(0, n - w)
    var t = 0
    while (t <= lastStart) {
      val end = math.min(t + w - 1, n - 1)
      var best = t
      var q = t + 1
      while (q <= end) {
        if (h(q) <= h(best)) best = q // rightmost on ties
        q += 1
      }
      if (!selected(best)) { selected(best) = true; nSel += 1 }
      t += 1
    }
    val out = new Array[Long](nSel)
    var j = 0
    p = 0
    while (p < n) {
      if (selected(p)) { out(j) = (h(p) << PosBits) | p.toLong; j += 1 }
      p += 1
    }
    new GenericArrayData(out)
  }

  private def codePoints(text: UTF8String): Array[Int] = {
    val s = text.toString
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    if (j == out.length) out else java.util.Arrays.copyOf(out, j)
  }
}
