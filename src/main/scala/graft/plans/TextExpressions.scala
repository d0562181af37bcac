package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash signature of a token array in ONE codegen'd pass —
  * the structural upgrade for
  * [[graft.operators.Dedup.simhashSignaturesOfTokens]]'s former
  * explode → hash → two-level groupBy pipeline: that shape shuffles
  * every (doc, distinct-token) row twice and runs a 64-column SUM
  * aggregate; this computes the identical signature as a pure
  * map-side projection — zero exchanges, zero aggregate state, the
  * whole signature stage disappears into the scan's codegen stage.
  *
  * Bit semantics (identical to the aggregate formulation, which
  * weighted each distinct token by its count c — per-occurrence ±1
  * summation is the same number): token hash = `xxhash64(token)`
  * (XXH64, seed 42 — the SAME hash the SQL function computes, via the
  * same static kernel), bit k of the signature is 1 iff the count of
  * occurrences with hash-bit k set exceeds half the occurrences
  * (2·ones > n ⇔ Σ±1 > 0; ties → 0).
  *
  * Null/empty contract: null array → null; EMPTY array → null (the
  * aggregate pipeline dropped zero-token docs via explode — null here
  * lets callers filter identically); null ELEMENTS are skipped — a
  * deliberate divergence from the aggregate formulation, which counted
  * an exploded null token as an occurrence at `xxhash64(null)` (= the
  * seed). `TextFns.tokens` never emits null elements, so the two agree
  * on every engine-produced input; callers feeding hand-built arrays
  * with nulls get the skip semantics.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash64 requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](64)
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
        var k = 0
        while (k < 64) { ones(k) += ((h >>> k) & 1L).toInt; k += 1 }
        cnt += 1
      }
      i += 1
    }
    if (cnt == 0) null
    else {
      var sh = 0L
      var k = 0
      while (k < 64) { if (2 * ones(k) > cnt) sh |= 1L << k; k += 1 }
      sh
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ones = ctx.freshName("ones")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val sh = ctx.freshName("sh")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int[] $ones = new int[64];
         |int $cnt = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $k = 0; $k < 64; $k++) { $ones[$k] += (int)(($h >>> $k) & 1L); }
         |    $cnt++;
         |  }
         |}
         |if ($cnt == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sh = 0L;
         |  for (int $k = 0; $k < 64; $k++) {
         |    if (2 * $ones[$k] > $cnt) $sh |= 1L << $k;
         |  }
         |  ${ev.value} = $sh;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Full MinHash signature (m 64-bit minima over word k-shingles) of a
  * token array in ONE codegen'd pass — the same structural upgrade as
  * [[SimHash64]] for [[graft.operators.Dedup.minhashCandidatesOfTokens]]'s
  * signature stage: the former shape exploded every shingle into a
  * (doc, hash) row and ran an m-column MIN aggregate (one exchange of
  * all shingle occurrences, m aggregate buffers per doc); this folds
  * each doc map-side — zero exchanges, the signature is a projection.
  *
  * Bit identity with the aggregate formulation:
  *  - shingles: space-joined k-windows over the token array; docs
  *    shorter than k yield ONE whole-doc shingle (empty docs: the
  *    empty string) — exactly `TextFns.wordShinglesOf`;
  *    `UTF8String.concatWs` skips null elements like `array_join`.
  *  - hash i of shingle s: `xxhash64(i, xxhash64(s))` ≡
  *    `hashLong(hashUTF8String(s, 42), hashInt(i, 42))` — the i-seed
  *    prefixes are constants, precomputed once per operator instance.
  *  - MIN over shingle occurrences (duplicates can't change a min).
  */
case class MinHashSig(child: Expression, shingleLen: Int, numHashes: Int)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
  import org.apache.spark.unsafe.types.UTF8String

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  // hashInt(i, 42) prefixes — shared across rows, serialization-safe
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = shingleLen
    val winLen = if (n < k) n else k
    val nWin = if (n < k) 1 else n - k + 1
    val sigs = Array.fill(numHashes)(Long.MaxValue)
    val parts = new Array[UTF8String](winLen)
    var w = 0
    while (w < nWin) {
      var j = 0
      while (j < winLen) {
        parts(j) = if (arr.isNullAt(w + j)) null else arr.getUTF8String(w + j)
        j += 1
      }
      val h = XXH64.hashUTF8String(UTF8String.concatWs(sep, parts: _*), 42L)
      var i = 0
      while (i < numHashes) {
        val hi = XXH64.hashLong(h, seeds(i))
        if (hi < sigs(i)) sigs(i) = hi
        i += 1
      }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
      val sepRef = ctx.addReferenceObj("mhSep", sep, utf8)
      val n = ctx.freshName("n")
      val winLen = ctx.freshName("winLen")
      val nWin = ctx.freshName("nWin")
      val sigs = ctx.freshName("sigs")
      val parts = ctx.freshName("parts")
      val w = ctx.freshName("w")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val hi = ctx.freshName("hi")
      s"""
         |int $n = $a.numElements();
         |int $winLen = ($n < $shingleLen) ? $n : $shingleLen;
         |int $nWin = ($n < $shingleLen) ? 1 : $n - $shingleLen + 1;
         |long[] $sigs = new long[$numHashes];
         |java.util.Arrays.fill($sigs, Long.MAX_VALUE);
         |$utf8[] $parts = new $utf8[$winLen];
         |for (int $w = 0; $w < $nWin; $w++) {
         |  for (int $j = 0; $j < $winLen; $j++) {
         |    $parts[$j] = $a.isNullAt($w + $j) ? null : $a.getUTF8String($w + $j);
         |  }
         |  long $h = $xxh.hashUTF8String($utf8.concatWs($sepRef, $parts), 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $hi = $xxh.hashLong($h, $seedsRef[$i]);
         |    if ($hi < $sigs[$i]) $sigs[$i] = $hi;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Per-doc token multiset statistics (total, distinct, top frequency)
  * in ONE map-side pass — the third signature-stage fold (after
  * [[SimHash64]] and [[MinHashSig]]): the repetition-quality metrics
  * (`text_repetition`) formerly exploded every token/bigram occurrence
  * into rows and ran TWO two-level groupBy pipelines (four exchanges);
  * `graft_tok_stats(arr)` computes the same (n, d, top) struct per doc
  * inside the scan, and the Gopher-style ratios become plain column
  * arithmetic over it.
  *
  * Semantics match the aggregate formulation exactly: n = non-null
  * element count, d = distinct element count (string equality), top =
  * max multiplicity; EMPTY (or all-null) array → NULL (explode dropped
  * those docs). The heavy lifting lives in an interpreted kernel
  * invoked from codegen — a per-row hash map is not worth inlining,
  * but the call keeps the surrounding stage inside whole-stage
  * codegen.
  */
case class TokenStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_tok_stats requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("d", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tok_stats"

  override def nullSafeEval(input: Any): Any =
    TokenStatsKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.plans.TokenStatsKernel.compute($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStatsKernel {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.ArrayData

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Long]()
    var total = 0L
    var top = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // copy: getUTF8String may point into reused row buffers
        val t = arr.getUTF8String(i).clone()
        val c = counts.merge(t, 1L, (x, y) => x + y)
        if (c > top) top = c
        total += 1L
      }
      i += 1
    }
    if (total == 0L) null
    else new GenericInternalRow(Array[Any](total, counts.size.toLong, top))
  }
}

/** Linear margin of the hashed-feature quality classifier
  * ([[graft.operators.QualityClassifier]]) in ONE codegen'd pass:
  * bias + Σ_tokens weights[uint32(md5(token)[0:4]) mod d]. The
  * composed form chains five expressions per TOKEN (cast → md5 →
  * hex substring → conv(16,10) → element_at) inside an interpreted
  * HOF fold — every token round-trips through a 32-char hex string
  * and a string-parsing base conversion. Here the digest's first
  * four bytes index the weight array directly; no hex string ever
  * exists, and the fold runs inside whole-stage codegen.
  *
  * Bucket identity with the portable convention: the first 8 md5 hex
  * digits AS a uint32 are exactly the first 4 digest bytes read
  * big-endian, so buckets — and, since the fold order and the
  * 0.0-seed + bias-outside convention are preserved, the margin
  * DOUBLE — are bit-identical to the composed form (property-tested;
  * the DuckDB oracle restates the hex route).
  *
  * Null contract (matches the composed fold, which null-poisons the
  * accumulator through `element_at`): null array → null; null
  * ELEMENT → null. Empty array → bias.
  */
case class HashedMargin(child: Expression, weights: Array[Double],
                        bias: Double) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) =>
        if (weights.nonEmpty) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_hashed_margin requires a non-empty weight vector")
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hashed_margin requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hashed_margin"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = HashedMargin.digestLocal.get()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val dg = md.digest(arr.getUTF8String(i).getBytes)
      sum += weights(HashedMargin.bucketOf(dg, weights.length))
      i += 1
    }
    bias + sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("weights", weights, "double[]")
      val md = ctx.addMutableState("java.security.MessageDigest", "qmMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e);
                |}""".stripMargin)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dg = ctx.freshName("dg"); val sum = ctx.freshName("sum")
      val cls = "graft.plans.HashedMargin"
      s"""
         |int $n = $a.numElements();
         |double $sum = 0.0D;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  byte[] $dg = $md.digest($a.getUTF8String($i).getBytes());
         |  $sum += $w[$cls.bucketOf($dg, $w.length)];
         |}
         |if (!${ev.isNull}) { ${ev.value} = $bias + $sum; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedMargin =
    copy(child = newChild)
}

object HashedMargin {
  private[plans] val digestLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** uint32 of the first four digest bytes (big-endian — the value of
    * the first 8 lowercase-hex digits), mod d. Called from generated
    * code — must stay a static-forwardable method on this object.
    */
  def bucketOf(digest: Array[Byte], d: Int): Int =
    ((((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)) % d).toInt
}

/** Occurrence count of a token phrase inside a token array in ONE
  * codegen'd pass — the native engine of
  * [[graft.queries.Retrieval.phraseCount]]. The composed
  * higher-order form (`size(filter(sequence(...), i ->
  * slice(toks, i, m) === phrase))`) is semantically right but Spark
  * evaluates HOF lambdas interpreted AND `slice` allocates a fresh
  * m-element array per candidate position — at corpus scale that is
  * ~|doc| small allocations per (doc, phrase) pair in the hottest
  * loop. This expression compares elements in place: zero
  * allocations, whole-stage codegen, same sliding-window overlap-
  * counted semantics.
  *
  * Value contract (bit-identical to the composed form on null-free
  * arrays, spec-asserted): matches may overlap; an m-token phrase has
  * `n − m + 1` candidate positions (0 when m > n); an EMPTY phrase
  * vacuously matches at all n + 1 positions (the composed form and
  * the DuckDB `list_filter(range(...))` restatement agree). Null
  * array inputs → null; null ELEMENTS never match (`TextFns.tokens`
  * emits none).
  */
case class PhraseCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_phrase_count requires two array<string> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_phrase_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = p.numElements()
    var cnt = 0
    var s = 0
    while (s + m <= n) {
      var ok = true
      var j = 0
      while (ok && j < m) {
        ok = !x.isNullAt(s + j) && !p.isNullAt(j) &&
          x.getUTF8String(s + j).equals(p.getUTF8String(j))
        j += 1
      }
      if (ok) cnt += 1
      s += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt"); val ok = ctx.freshName("ok")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $cnt = 0;
         |for (int $s = 0; $s + $m <= $n; $s++) {
         |  boolean $ok = true;
         |  for (int $j = 0; $ok && $j < $m; $j++) {
         |    $ok = !$a.isNullAt($s + $j) && !$b.isNullAt($j) &&
         |      $a.getUTF8String($s + $j).equals($b.getUTF8String($j));
         |  }
         |  if ($ok) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PhraseCount =
    copy(left = newLeft, right = newRight)
}
