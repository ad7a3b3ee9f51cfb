package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Buffer: the k smallest DISTINCT hash values seen so far. */
final class KmvBuffer(val mins: java.util.TreeSet[java.lang.Long])

/** KMV (k-minimum-values / bottom-k theta) distinct-count sketch as a
  * native `TypedImperativeAggregate`: one pass, O(k) memory per
  * partial, mergeable by set-union-and-trim — the sketch family used
  * for corpus vocabulary estimation where a full `count(distinct)`
  * shuffle of every token is not affordable. Returns the SORTED array
  * of the k smallest distinct hashes; the caller derives the
  * estimator (k−1)/U(k) (Bar-Yossef et al. 2002) and keeps the kth
  * value as the mergeable theta.
  *
  * DETERMINISTIC: the k minimum distinct
  * values of a fixed hash are a pure function of the input SET, so the
  * result is identical across partitionings, retries, and engines — a
  * DuckDB oracle reproduces it with `ORDER BY h LIMIT k` over distinct
  * hashes (q_vocab_kmv), which keeps the repo's hash-gate invariant
  * even for an "approximate" operator.
  *
  * Map-side partials each hold ≤ k longs, so the exchange carries one
  * k-array per partition per group — at 100 TB the token stream never
  * shuffles, only sketches do.
  */
case class KmvSketchExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType if k >= 2 => TypeCheckResult.TypeCheckSuccess
      case LongType =>
        TypeCheckResult.TypeCheckFailure(s"kmv_sketch requires k >= 2, got $k")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"kmv_sketch requires a bigint hash input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KmvBuffer =
    new KmvBuffer(new java.util.TreeSet[java.lang.Long]())

  private def insert(b: KmvBuffer, h: Long): Unit = {
    val m = b.mins
    if (m.size < k) { m.add(h); () }
    else if (h < m.last()) {
      if (m.add(h)) { m.remove(m.last()); () }
    }
  }

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(x: KmvBuffer, y: KmvBuffer): KmvBuffer = {
    val it = y.mins.iterator()
    while (it.hasNext) insert(x, it.next())
    x
  }

  override def eval(b: KmvBuffer): Any = {
    val out = new Array[Long](b.mins.size)
    val it = b.mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.mins.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(b.mins.size)
    val it = b.mins.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.mins.add(buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(off: Int): KmvSketchExpr =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvSketchExpr =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchExpr =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketchExpr {
  /** Sorted k smallest distinct values of a bigint hash column. */
  def kmv(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchExpr(ColumnBridge.expression(hash.cast("long")), k)
        .toAggregateExpression())
}
