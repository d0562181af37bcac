package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleaved Z-order (Morton) address of 2–4 rank-space keys —
  * the clustering key behind multi-dimensional data layout
  * ([[graft.operators.Layout]]). Interleaving gives every dimension
  * equal significance in the sort order, so range-partitioning by the
  * z-address co-locates rows that are close in ALL dimensions at once:
  * a file pruned by min/max on any ONE clustered column stays prunable
  * after adding more (the Delta/Iceberg OPTIMIZE ZORDER layout rule,
  * built on the Morton 1966 curve).
  *
  * Semantics: each child is masked to its low `63/n` bits (callers
  * normalize to rank space first — [[graft.operators.Layout.zOrderKey]]
  * does the affine min→max map); result bit `i*n + c` is bit `i` of
  * child `c`, so child 0 holds the least-significant slot of each
  * group. Any null child → null. Codegen emits one constant-bound
  * primitive loop — no allocation, stays inside whole-stage codegen.
  */
case class ZInterleave(children: Seq[Expression]) extends Expression {

  private val n = children.size
  private val bitsPer = 63 / math.max(n, 1)
  private val mask = (1L << bitsPer) - 1L

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 2 || n > 4)
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder takes 2 to 4 long arguments, got $n")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder requires long arguments, got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_zorder"

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](n)
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v == null) return null
      vals(c) = v.asInstanceOf[Long] & mask
      c += 1
    }
    var z = 0L
    var i = 0
    while (i < bitsPer) {
      var j = 0
      while (j < n) {
        z |= ((vals(j) >>> i) & 1L) << (i * n + j)
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val i = ctx.freshName("i")
    val vs = children.indices.map(c => ctx.freshName(s"v$c"))
    val loads = evals.zip(vs).map { case (e, v) =>
      s"long $v = ${e.value} & ${mask}L;"
    }.mkString("\n")
    val interleave = vs.zipWithIndex.map { case (v, c) =>
      s"$z |= (($v >>> $i) & 1L) << ($i * $n + $c);"
    }.mkString("\n")
    val nullGuard =
      if (nullable) evals.filter(_.isNull != FalseLiteral)
        .map(e => s"${e.isNull}").mkString(" || ")
      else ""
    val compute =
      s"""
         |$loads
         |long $z = 0L;
         |for (int $i = 0; $i < $bitsPer; $i++) {
         |$interleave
         |}
         |${ev.value} = $z;
       """.stripMargin
    val code =
      if (nullGuard.isEmpty)
        code"""
           |${evals.map(_.code).mkString("\n")}
           |long ${ev.value} = 0L;
           |$compute
         """
      else
        code"""
           |${evals.map(_.code).mkString("\n")}
           |boolean ${ev.isNull} = $nullGuard;
           |long ${ev.value} = 0L;
           |if (!${ev.isNull}) {
           |$compute
           |}
         """
    if (nullGuard.isEmpty) ev.copy(code = code, isNull = FalseLiteral)
    else ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZInterleave =
    copy(children = newChildren)
}

/** Bucket index of a double against a sorted boundary array (binary
  * search, upper-bound semantics: bucket = count of boundaries ≤ x) —
  * the skew-robust rank map for Z-order clustering
  * ([[graft.operators.Layout.clusterByZOrderQuantile]]): affine
  * min→max normalization collapses under skew (one hot value owns
  * most of the rank space), while quantile boundaries give every
  * bucket equal row mass by construction. Boundaries ride in the
  * expression (driver-computed via approxQuantile — O(buckets)
  * doubles, never the data); duplicates (degenerate quantiles on
  * heavy skew) are handled by the upper-bound rule. Null → null.
  */
case class BucketIndex(child: Expression, boundaries: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bucket requires a double argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bucket"

  @transient private lazy val bounds: Array[Double] = boundaries.toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Double]
    // upper bound: first index with bounds(i) > x
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bucketBounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0; int $hi = $bRef.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($bRef[$mid] <= $x) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIndex =
    copy(child = newChild)
}
