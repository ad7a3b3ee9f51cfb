package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Buffer: the k smallest (hash, value) pairs seen so far, ordered
  * lexicographically — the pair ordering (not hash alone) keeps the
  * retained SET deterministic even under hash collisions.
  */
final class HashSampleBuffer(
    val mins: java.util.TreeSet[(Long, Long)])

/** Bottom-k-by-hash uniform sample as a native
  * `TypedImperativeAggregate`: keep the k (hash, value) pairs with the
  * smallest hashes. Because a fixed integer hash of the row identity
  * is indistinguishable from a uniform draw, the k hash-minima are a
  * UNIFORM k-subset of the group — the mergeable, one-pass,
  * deterministic form of reservoir sampling (merge = union + trim,
  * no rand(), no seed coordination across retries). Returns the
  * sampled VALUES sorted ascending, ready for order-statistics.
  *
  * This is the sketch behind sampled quantiles at 100 TB: map-side
  * partials carry ≤ k pairs each, so the exchange moves k longs per
  * partition per group while the value stream itself never shuffles —
  * the same partial-aggregation shape as [[KmvSketchExpr]] (which
  * samples the distinct-hash SET for cardinality; this samples ROWS
  * for distribution). A WindowExec `row_number ≤ k` over the group
  * would sort every row of every group instead; `TopKPerKey` bounds
  * that sort but still materializes sampled ROWS through a join-back
  * — this keeps everything inside the aggregation layer.
  *
  * DETERMINISTIC: the k smallest pairs of a fixed hash are a pure
  * function of the input multiset, so results are identical across
  * partitionings, retries, and engines — a DuckDB oracle reproduces
  * the sample with `ORDER BY h, v LIMIT k` (q_sample_quantiles),
  * keeping the repo's hash-gate invariant for an "approximate"
  * operator.
  */
case class HashSampleExpr(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HashSampleBuffer]
  with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case (LongType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          s"hash_sample requires k >= 1, got $k")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "hash_sample requires (bigint hash, bigint value) inputs, got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def createAggregationBuffer(): HashSampleBuffer =
    new HashSampleBuffer(new java.util.TreeSet[(Long, Long)](
      implicitly[Ordering[(Long, Long)]]))

  private def insert(b: HashSampleBuffer, p: (Long, Long)): Unit = {
    val m = b.mins
    if (m.size < k) { m.add(p); () }
    else if (implicitly[Ordering[(Long, Long)]].lt(p, m.last())) {
      // a duplicate (h, v) pair is a distinct ROW that must stay in
      // the sample; the TreeSet is a set, so only admit the pair when
      // it is new — an identical pair re-inserted means the SAME row
      // observed through a merge of overlapping partials, which by
      // construction cannot happen (partials partition the input), so
      // set semantics are safe here
      if (m.add(p)) { m.remove(m.last()); () }
    }
  }

  override def update(b: HashSampleBuffer, input: InternalRow)
      : HashSampleBuffer = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      insert(b, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    b
  }

  override def merge(x: HashSampleBuffer, y: HashSampleBuffer)
      : HashSampleBuffer = {
    val it = y.mins.iterator()
    while (it.hasNext) insert(x, it.next())
    x
  }

  override def eval(b: HashSampleBuffer): Any = {
    val out = new Array[Long](b.mins.size)
    val it = b.mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(b: HashSampleBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * b.mins.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(b.mins.size)
    val it = b.mins.iterator()
    while (it.hasNext) {
      val (h, v) = it.next()
      buf.putLong(h)
      buf.putLong(v)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): HashSampleBuffer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.mins.add((buf.getLong, buf.getLong)); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(off: Int): HashSampleExpr =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HashSampleExpr =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashSampleExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hash_sample"
}

object HashSampleExpr {
  /** The values of the k rows with the smallest (hash, value) pairs,
    * sorted ascending — a deterministic uniform k-sample of the group.
    */
  def sample(hash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      HashSampleExpr(ColumnBridge.expression(hash.cast("long")),
        ColumnBridge.expression(value.cast("long")), k)
        .toAggregateExpression())
}
