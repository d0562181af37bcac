package graft.plans

import java.math.BigInteger
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact arbitrary-precision integer SUM over canonical decimal
  * strings — the one aggregation Spark's type system cannot express:
  * the reference stores uint256 balances as NUMERIC(78,0)
  * (`schema.sql:49`) and SUMs them (top-100 total holdings), but 78
  * digits overflow Spark's Decimal(38) and `sum(cast(... as
  * decimal(38,0)))` silently nulls out on a 40-digit whale.
  *
  * Shape: a [[TypedImperativeAggregate]] over a `java.math.BigInteger`
  * buffer. That keeps the 100 TB properties that matter for an
  * aggregate —
  *  - partial aggregation (map-side combine): Spark plans typed
  *    imperative aggregates with Partial/Final split, so each input
  *    partition reduces to ONE serialized BigInteger before the
  *    shuffle; shuffle volume is O(groups), never O(rows);
  *  - mergeable buffers: `merge` is BigInteger addition, associative
  *    and commutative, so AQE/skew splits are safe;
  *  - compact state: `serialize` is two's-complement bytes (≤ 33 bytes
  *    for uint256 sums), not the decimal string.
  *
  * Input contract: canonical decimal strings (optional leading `-`,
  * no leading zeros beyond "0" itself — the ingest boundary
  * guarantees this shape for balances); null inputs are skipped like
  * SQL SUM. Output is the exact sum as a decimal string ("0" for an
  * all-null/empty group — totals are counts of things, not SQL
  * NULL-propagating measures).
  */
case class SumBigUInt(child: Expression,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BigInteger] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sum_uint requires a string (decimal digits) argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sum_uint"

  override def createAggregationBuffer(): BigInteger = BigInteger.ZERO

  override def update(buffer: BigInteger, input: InternalRow): BigInteger = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.add(new BigInteger(v.asInstanceOf[UTF8String].toString))
  }

  override def merge(buffer: BigInteger, other: BigInteger): BigInteger =
    buffer.add(other)

  override def eval(buffer: BigInteger): Any =
    UTF8String.fromString(buffer.toString)

  override def serialize(buffer: BigInteger): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): BigInteger = new BigInteger(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SumBigUInt =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumBigUInt =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SumBigUInt =
    copy(child = newChild)
}
