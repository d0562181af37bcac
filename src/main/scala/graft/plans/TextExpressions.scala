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
  * lets callers filter identically); null elements are skipped.
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
