package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012) — the
  * bounded-state alternative to an exact `groupBy(item).count()` whose
  * shuffle carries one row PER DISTINCT ITEM. At 100 TB vocabulary
  * scale (billions of distinct tokens), exact top-K pays a
  * full-vocabulary exchange to answer a question about ~50 items; MG
  * reduces each map partition to AT MOST `capacity` (item, weight)
  * pairs — fixed state, one tiny final merge.
  *
  * Guarantees (N = rows scanned, m = capacity): every item with true
  * frequency > N/m is present in the summary, and each reported weight
  * is within N/m below its true frequency. Merging two summaries sums
  * weights pointwise, then subtracts the (m+1)-th largest weight from
  * all and drops the non-positive — the bound is preserved under
  * merge, so Partial/Final planning and AQE skew splits stay safe.
  *
  * This is a CANDIDATE GENERATOR, not an answer: the exact-top-K
  * composition ([[graft.operators.HeavyHitters.exactTopK]]) recounts
  * the ≤ m candidates exactly in one cheap semi-joined pass and
  * CHECKS the guarantee (k-th confirmed count > N/m) before claiming
  * exactness — approximation that moves cost, never the answer,
  * like the Bloom stage in [[graft.operators.Decontam]].
  *
  * Buffer: open-addressed via a plain mutable.HashMap[String, Long];
  * the decrement-all eviction is amortized O(1) per update (each
  * decrement pass is paid for by the `capacity` inserts before it).
  * Output: map<string, bigint> of surviving items → lower-bound
  * weights.
  */
case class MisraGriesSketch(child: Expression, capacityExpr: Expression,
                            override val mutableAggBufferOffset: Int = 0,
                            override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = capacityExpr

  private lazy val capacity: Int = {
    val v = capacityExpr.eval(null)
    require(v != null, "graft_mg capacity must be a non-null literal")
    v.asInstanceOf[Number].intValue()
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_mg requires a string item column, got ${child.dataType.simpleString}")
    else if (!capacityExpr.foldable ||
      (capacityExpr.dataType != IntegerType && capacityExpr.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        "graft_mg capacity must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    MGKernel.update(buf, v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    MGKernel.merge(buf, other, capacity)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val items = buf.toArray.sortBy(_._1) // stable output order
    ArrayBasedMapData(
      items.map(kv => UTF8String.fromString(kv._1): Any),
      items.map(_._2: Any))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesSketch =
    copy(child = newLeft, capacityExpr = newRight)
}

/** The Misra–Gries update/merge rules, shared by the
  * [[MisraGriesSketch]] aggregate and the streaming keyed-state
  * surface ([[graft.streaming.Incremental.heavyHittersStream]]) — a
  * streaming run IS repeated mergeable-summary merging, so both
  * surfaces carry identical bounds by construction.
  */
object MGKernel {

  /** One occurrence of `item` into `buf` under the MG rule. */
  def update(buf: mutable.HashMap[String, Long], item: String,
             capacity: Int): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1L)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None => // decrement-all eviction (amortized by prior inserts)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(buf.remove)
    }

  /** Merge `other` into `buf` (Agarwal et al. 2012): pointwise sums,
    * then subtract the (m+1)-th largest weight and drop non-positive. */
  def merge(buf: mutable.HashMap[String, Long],
            other: scala.collection.Map[String, Long], capacity: Int): Unit = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      val weights = buf.values.toArray
      java.util.Arrays.sort(weights)
      val cut = weights(weights.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(buf.remove)
    }
  }
}
