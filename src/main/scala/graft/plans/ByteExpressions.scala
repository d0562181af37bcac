package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
