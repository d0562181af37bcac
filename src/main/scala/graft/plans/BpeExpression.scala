package graft.plans

import graft.functions.{Bpe, BpeEncoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Learned-BPE token count as a native expression:
  * `graft_bpe_count(text, merges)` where `merges` is a foldable
  * string literal in [[Bpe.serializeMerges]] wire format (the trained
  * table rides the plan like a broadcast literal — one
  * [[BpeEncoder]] per plan, referenced from generated code).
  *
  * Codegen shape: the row loop stays inside whole-stage codegen; the
  * per-row work is ONE virtual call into the shared encoder (whose
  * hot path is a memo probe per word — Zipf head words dominate), the
  * same reference-object pattern Spark's own regexp expressions use
  * for their compiled patterns.
  */
case class BpeCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_count requires a string text column, got ${left.dataType.simpleString}")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bpe_count requires a foldable string merge table")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val encoder: BpeEncoder =
    new BpeEncoder(Bpe.parseMerges(
      Option(right.eval(null)).map(_.toString).getOrElse("")))

  override def nullSafeEval(text: Any, merges: Any): Any =
    encoder.countTokens(text.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj("bpeEncoder", encoder, classOf[BpeEncoder].getName)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = $enc.countTokens($text.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeCount =
    copy(left = newLeft, right = newRight)
}
