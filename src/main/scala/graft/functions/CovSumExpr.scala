package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Buffer: flattened d×d exact micro sums + the vector length. */
final class CovSumBuffer(var sums: Array[Long], var dim: Int)

/** Native exact covariance-sum aggregate: per input vector x, adds
  * floor(x_i·x_j·10⁶ + 0.5) (an exact long) into a flattened d×d
  * buffer — the uncentered second-moment matrix in micro units, the
  * input to the PCA power iteration (`q_pca_project`).
  *
  * The column-layer alternative (explode the d² index pairs, or a
  * nested `transform` building a d²-long array per row) either shuffles
  * n·d² rows or allocates a 4096-element array per row through the
  * interpreted HOF path. This aggregate does the d² multiply-adds in a
  * tight primitive loop per row and exchanges ONE d²-long partial per
  * partition (map-side combine, the [[VecMeanExpr]] execution shape) —
  * at any corpus size the shuffle is d² longs per partition, and long
  * adds are associative so the result is bit-exact under any merge
  * order (the DuckDB oracle recomputes the identical sums relationally).
  *
  * First vector fixes d; later vectors truncate to it (the VecMeanExpr
  * contract); null vectors are skipped.
  */
case class CovSumMicroExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovSumBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cov_sum_micro requires array<double>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): CovSumBuffer =
    new CovSumBuffer(Array.emptyLongArray, 0)

  override def update(b: CovSumBuffer, input: InternalRow): CovSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (b.dim == 0) {
        b.dim = a.numElements()
        b.sums = new Array[Long](b.dim * b.dim)
      }
      val d = math.min(b.dim, a.numElements())
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = a.getDouble(i); i += 1 }
      val s = b.sums
      i = 0
      while (i < d) {
        val xi = x(i)
        val row = i * b.dim
        var j = 0
        while (j < d) {
          s(row + j) += math.floor(xi * x(j) * 1e6 + 0.5).toLong
          j += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(x: CovSumBuffer, y: CovSumBuffer): CovSumBuffer = {
    if (x.dim == 0) y
    else if (y.dim == 0) x
    else if (x.dim == y.dim) {
      val s = x.sums
      var i = 0
      while (i < s.length) { s(i) += y.sums(i); i += 1 }
      x
    } else {
      // Mixed-dimension partitions: a flat element-wise add of a
      // d1×d1 and a d2×d2 row-major matrix would misalign rows and
      // silently corrupt the second moments — remap by (row, col)
      // over the common top-left block instead (the d×d analogue of
      // the 1-D truncate-to-first contract).
      val d = math.min(x.dim, y.dim)
      val s = x.sums
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) {
          s(i * x.dim + j) += y.sums(i * y.dim + j)
          j += 1
        }
        i += 1
      }
      x
    }
  }

  override def eval(b: CovSumBuffer): Any = new GenericArrayData(b.sums)

  override def serialize(b: CovSumBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.sums.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(b.dim)
    var i = 0
    while (i < b.sums.length) { buf.putLong(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): CovSumBuffer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dim = buf.getInt
    val sums = new Array[Long](dim * dim)
    var i = 0
    while (i < sums.length) { sums(i) = buf.getLong; i += 1 }
    new CovSumBuffer(sums, dim)
  }

  override def withNewMutableAggBufferOffset(off: Int): CovSumMicroExpr =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CovSumMicroExpr =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(
      newChild: Expression): CovSumMicroExpr = copy(child = newChild)
  override def prettyName: String = "cov_sum_micro"
}

object CovSumMicroExpr {
  def covSumMicro(c: Column): Column =
    ColumnBridge.column(
      CovSumMicroExpr(ColumnBridge.expression(c.cast("array<double>")))
        .toAggregateExpression())
}
