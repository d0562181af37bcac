package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Native byte-level feature primitives over BINARY payloads — the
  * production upgrade for [[graft.operators.Media.imageFeatures]]'s
  * former `hex()` + per-byte `substr`/`conv` unpack, which at real
  * pixel counts (MB payloads) is O(bytes) interpreted string slicing
  * per row. These emit tight primitive loops via `doGenCode`, so the
  * "drop dark images" filter path stays inside whole-stage codegen
  * with zero intermediate allocations beyond the output.
  */

/** Sum of UNSIGNED byte values of a binary column (the numerator of
  * mean brightness). Empty input → 0.
  */
case class UnsignedByteSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_byte_sum requires a binary argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_byte_sum"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var s = 0L
    var i = 0
    while (i < b.length) { s += (b(i) & 0xff); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $a.length; $i++) { $acc += ($a[$i] & 0xff); }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnsignedByteSum =
    copy(child = newChild)
}

/** 8-bin histogram of unsigned byte values (bin = value >>> 5, i.e.
  * 32-wide bins) as `array<int>` — matches the expression-composed
  * `transform(sequence(0,7), bin -> size(filter(...)))` shape
  * cell-for-cell, in one pass instead of eight.
  */
case class ByteHistogram8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_byte_hist8 requires a binary argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_byte_hist8"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Int](8)
    var i = 0
    while (i < b.length) { counts((b(i) & 0xff) >>> 5) += 1; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val counts = ctx.freshName("counts")
      s"""
         |int[] $counts = new int[8];
         |for (int $i = 0; $i < $a.length; $i++) { $counts[($a[$i] & 0xff) >>> 5]++; }
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram8 =
    copy(child = newChild)
}

/** 64-bit difference hash (dHash) of a decoded interleaved pixel
  * buffer — the perceptual image fingerprint of the LAION-style
  * image-dedup pipeline (resize small → grayscale → compare each
  * pixel to its right neighbor → one bit per comparison). Bit
  * k = y·(w−1)+x is set iff gray(x+1, y) > gray(x, y), with
  * gray = ⌊Σ channels / c⌋ (integer mean — portable to any SQL
  * oracle). Gradient SIGNS survive brightness/contrast shifts and
  * recompression, which is exactly what byte-equality and histogram
  * features don't — dHash changes little under the edits that make
  * two images "the same picture".
  *
  * Contract: the input must already be resized so (w−1)·h = 64 (the
  * canonical 9×8); anything else — or a truncated buffer — is null
  * (decode-or-drop, the Media family convention). One tight
  * primitive pass via `doGenCode`, same codegen discipline as the
  * sibling byte features: fingerprinting a 100 TB image corpus is a
  * map-only projection with zero exchanges.
  */
case class DHash64(pxCol: Expression, wCol: Expression,
                   hCol: Expression, cCol: Expression)
    extends QuaternaryExpression {

  override def first: Expression = pxCol
  override def second: Expression = wCol
  override def third: Expression = hCol
  override def fourth: Expression = cCol

  override def checkInputDataTypes(): TypeCheckResult =
    if (pxCol.dataType == BinaryType && wCol.dataType == IntegerType &&
        hCol.dataType == IntegerType && cCol.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_dhash64(pixels binary, width int, height int, channels int) — got " +
        Seq(pxCol, wCol, hCol, cCol).map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dhash64"

  override def nullSafeEval(p: Any, wA: Any, hA: Any, cA: Any): Any = {
    val px = p.asInstanceOf[Array[Byte]]
    val w = wA.asInstanceOf[Int]; val h = hA.asInstanceOf[Int]
    val c = cA.asInstanceOf[Int]
    if (c <= 0 || w < 2 || (w - 1) * h != 64 || px.length < w * h * c) null
    else {
      var fp = 0L; var k = 0; var y = 0
      while (y < h) {
        var x = 0
        while (x < w - 1) {
          var s0 = 0; var s1 = 0; var ch = 0
          val o0 = (y * w + x) * c; val o1 = o0 + c
          while (ch < c) { s0 += px(o0 + ch) & 0xff; s1 += px(o1 + ch) & 0xff; ch += 1 }
          if (s1 / c > s0 / c) fp |= (1L << k)
          k += 1; x += 1
        }
        y += 1
      }
      fp
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, w, h, c) => {
      val fp = ctx.freshName("fp"); val k = ctx.freshName("k")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val s0 = ctx.freshName("s0"); val s1 = ctx.freshName("s1")
      val ch = ctx.freshName("ch"); val o0 = ctx.freshName("o0")
      s"""
         |if ($c <= 0 || $w < 2 || ($w - 1) * $h != 64 || $p.length < $w * $h * $c) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $fp = 0L; int $k = 0;
         |  for (int $y = 0; $y < $h; $y++) {
         |    for (int $x = 0; $x < $w - 1; $x++) {
         |      int $s0 = 0; int $s1 = 0;
         |      int $o0 = ($y * $w + $x) * $c;
         |      for (int $ch = 0; $ch < $c; $ch++) {
         |        $s0 += $p[$o0 + $ch] & 0xff; $s1 += $p[$o0 + $c + $ch] & 0xff;
         |      }
         |      if ($s1 / $c > $s0 / $c) $fp |= (1L << $k);
         |      $k++;
         |    }
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): DHash64 =
    copy(pxCol = newFirst, wCol = newSecond, hCol = newThird,
      cCol = newFourth)
}

/** 64-bit audio fingerprint of a decoded sample array — the acoustic
  * sibling of [[DHash64]], the one-band simplification of the Philips
  * robust hash (Haitsma & Kalker 2002: sign of energy differences
  * between consecutive frames survives transcoding, resampling, and
  * level shifts — exactly what sample-byte equality doesn't). The
  * array splits into 65 contiguous windows w(i) = ⌊i·65/n⌋ (every
  * window non-empty for n ≥ 65); window energy e_w = Σ|v_i| (integer —
  * portable to any SQL oracle); bit k is set iff e_{k+1} > e_k.
  * Inputs with n < 65 (windows would alias) or null samples are null —
  * the decode-or-drop convention of the Media family. One tight
  * primitive pass via `doGenCode`: fingerprinting a 100 TB audio
  * corpus is a map-only projection with zero exchanges.
  */
case class AudioHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_audiohash64(samples array<int>) — got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audiohash64"

  override def nullSafeEval(s: Any): Any = {
    val arr = s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < 65) null
    else {
      val e = new Array[Long](65)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val v = arr.getInt(i).toLong
        e(((i.toLong * 65L) / n).toInt) += (if (v < 0) -v else v)
        i += 1
      }
      var fp = 0L; var k = 0
      while (k < 64) {
        if (e(k + 1) > e(k)) fp |= (1L << k)
        k += 1
      }
      fp
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n"); val e = ctx.freshName("e")
      val i = ctx.freshName("i"); val v = ctx.freshName("v")
      val k = ctx.freshName("k"); val fp = ctx.freshName("fp")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $s.numElements();
         |if ($n < 65) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $e = new long[65];
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n && !$bad; $i++) {
         |    if ($s.isNullAt($i)) { $bad = true; } else {
         |      final long $v = (long) $s.getInt($i);
         |      $e[(int) (((long) $i * 65L) / $n)] += ($v < 0L ? -$v : $v);
         |    }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $fp = 0L;
         |    for (int $k = 0; $k < 64; $k++) {
         |      if ($e[$k + 1] > $e[$k]) $fp |= (1L << $k);
         |    }
         |    ${ev.value} = $fp;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioHash64 =
    copy(child = newChild)
}
