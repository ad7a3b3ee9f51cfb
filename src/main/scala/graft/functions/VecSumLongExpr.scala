package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Buffer: element-wise running long sums (empty until the first row). */
final class VecSumLongBuffer(var sums: Array[Long], var seen: Boolean)

/** Native element-wise long-array SUM aggregate — the exact-integer
  * sibling of [[VecMeanExpr]] for replicate-vector folds: each input
  * row carries a fixed-length `array<long>` (e.g. the 100 Poisson
  * bootstrap weights of q_bootstrap_ci) and the aggregate returns the
  * element-wise sums. All arithmetic is Long, so the result is exact
  * and order-independent — safe for oracle hashing.
  *
  * Same execution story as VecMeanExpr: ObjectHashAggregate with
  * map-side partial aggregation; one array-width row per partition
  * reaches the exchange regardless of corpus size. Null arrays are
  * skipped; the first array seen fixes the length; longer later arrays
  * truncate to it (LawsSpec pins ≡ the explode+groupBy form).
  */
case class VecSumLongExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumLongBuffer]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum_long requires array<bigint>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): VecSumLongBuffer =
    new VecSumLongBuffer(Array.emptyLongArray, seen = false)

  override def update(b: VecSumLongBuffer, input: InternalRow): VecSumLongBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (!b.seen) {
        b.sums = a.toLongArray()
        b.seen = true
      } else {
        val s = b.sums
        val m = math.min(s.length, a.numElements())
        var i = 0
        while (i < m) { s(i) += a.getLong(i); i += 1 }
      }
    }
    b
  }

  override def merge(x: VecSumLongBuffer, y: VecSumLongBuffer): VecSumLongBuffer = {
    if (!x.seen) y
    else if (!y.seen) x
    else {
      val s = x.sums
      val m = math.min(s.length, y.sums.length)
      var i = 0
      while (i < m) { s(i) += y.sums(i); i += 1 }
      x
    }
  }

  override def eval(b: VecSumLongBuffer): Any =
    new GenericArrayData(b.sums)

  override def serialize(b: VecSumLongBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 8 * b.sums.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(if (b.seen) 1.toByte else 0.toByte)
    buf.putInt(b.sums.length)
    var i = 0
    while (i < b.sums.length) { buf.putLong(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumLongBuffer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val seen = buf.get() == 1.toByte
    val len = buf.getInt
    val sums = new Array[Long](len)
    var i = 0
    while (i < len) { sums(i) = buf.getLong; i += 1 }
    new VecSumLongBuffer(sums, seen)
  }

  override def withNewMutableAggBufferOffset(off: Int): VecSumLongExpr =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VecSumLongExpr =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): VecSumLongExpr =
    copy(child = newChild)
  override def prettyName: String = "vec_sum_long"
}

object VecSumLongExpr {
  def vecSumLong(c: Column): Column =
    ColumnBridge.column(
      VecSumLongExpr(ColumnBridge.expression(c)).toAggregateExpression())
}
