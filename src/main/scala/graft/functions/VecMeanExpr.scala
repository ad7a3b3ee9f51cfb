package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Buffer: element-wise running sums + row count. */
final class VecMeanBuffer(var sums: Array[Double], var n: Long)

/** Native element-wise vector-mean aggregate (A1) — the hot-path form of
  * [[graft.ops.WindowMean.VecMean]].
  *
  * The typed-`Aggregator`-via-`udaf()` form pays an ExpressionEncoder
  * round trip per input row: ArrayData → boxed `Seq[Double]` → `.toArray`
  * (two allocations + 8 boxes per frame). This `TypedImperativeAggregate`
  * reads the `ArrayData` directly (`toDoubleArray` — one primitive copy)
  * and mutates a primitive buffer; profiled ~2× on the windowed-mean
  * pipeline queries. Same ObjectHashAggregate execution, same map-side
  * partial aggregation, same one-narrow-row-per-(window, partition)
  * shuffle — the scale story is unchanged, only the per-row constant
  * drops.
  *
  * Semantics are IDENTICAL to the Aggregator (LawsSpec cross-checks
  * bit-for-bit): null arrays skipped; the first array seen fixes the
  * length, longer later arrays truncate to it; in-order index summation
  * so results are associativity-exact for integer-valued doubles.
  */
case class VecMeanExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  // demanded explicitly: the SQL registration path has no Column-layer
  // cast, and toDoubleArray on an int-array ArrayData would either
  // throw or silently reinterpret bytes
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_mean requires array<double>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): VecMeanBuffer =
    new VecMeanBuffer(Array.emptyDoubleArray, 0L)

  override def update(b: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (b.n == 0L) {
        b.sums = a.toDoubleArray()
        b.n = 1L
      } else {
        val s = b.sums
        val m = math.min(s.length, a.numElements())
        var i = 0
        while (i < m) { s(i) += a.getDouble(i); i += 1 }
        b.n += 1L
      }
    }
    b
  }

  override def merge(x: VecMeanBuffer, y: VecMeanBuffer): VecMeanBuffer = {
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      val s = x.sums
      val m = math.min(s.length, y.sums.length)
      var i = 0
      while (i < m) { s(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
  }

  override def eval(b: VecMeanBuffer): Any = {
    if (b.n == 0L) new GenericArrayData(Array.emptyDoubleArray)
    else {
      val out = new Array[Double](b.sums.length)
      var i = 0
      while (i < out.length) { out(i) = b.sums(i) / b.n; i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(b: VecMeanBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + 8 * b.sums.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(b.n)
    buf.putInt(b.sums.length)
    var i = 0
    while (i < b.sums.length) { buf.putDouble(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong
    val len = buf.getInt
    val sums = new Array[Double](len)
    var i = 0
    while (i < len) { sums(i) = buf.getDouble; i += 1 }
    new VecMeanBuffer(sums, n)
  }

  override def withNewMutableAggBufferOffset(off: Int): VecMeanExpr =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VecMeanExpr =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): VecMeanExpr =
    copy(child = newChild)
  override def prettyName: String = "vec_mean"
}

object VecMeanExpr {
  def vecMean(c: Column): Column =
    ColumnBridge.column(
      VecMeanExpr(ColumnBridge.expression(c.cast("array<double>")))
        .toAggregateExpression())
}
