package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a native
  * `TypedImperativeAggregate`: `depth × width` long counters, one md5
  * per item with the digest's four 32-bit chunks as the per-row hash
  * functions. One pass, O(depth·width) state per partial, merged by
  * element-wise add — the heavy-hitter / frequency-estimation sketch
  * for a token stream whose exact `groupBy(token)` vocabulary shuffle
  * is not affordable; at 100 TB only fixed-size counter arrays cross
  * the exchange.
  *
  * DETERMINISTIC and engine-reproducible: the cell layout is a pure
  * function of the input MULTISET (adds commute), and the hash rows
  * are md5-hex substrings — so a DuckDB oracle rebuilds the identical
  * estimates with `substr(md5(t), j*8+1, 8)` arithmetic and the
  * estimate column stays inside the repo's hash gate. Estimates are
  * one-sided: est ≥ true count always (CmsSketchSpec pins both).
  */
case class CmsSketchExpr(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if depth >= 1 && depth <= 4 && width >= 2 =>
        TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires 1 <= depth <= 4 (md5 has 4 chunks) and " +
          s"width >= 2, got depth=$depth width=$width")
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires a string input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  // one MessageDigest per thread: update() runs single-threaded per
  // task, but the expression instance may be shared across task threads
  @transient private lazy val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val m = md5Local.get()
      m.reset()
      val dg = m.digest(v.asInstanceOf[UTF8String].getBytes)
      var j = 0
      while (j < depth) {
        // digest bytes 4j..4j+3 big-endian == hex chars j*8+1..j*8+8,
        // the exact value `conv(substr(md5(t), j*8+1, 8), 16, 10)`
        // (Spark) / `('0x' || substr(md5(t), j*8+1, 8))::bigint`
        // (DuckDB) parse — cross-engine parity by construction
        val chunk = ((dg(4 * j) & 0xffL) << 24) |
          ((dg(4 * j + 1) & 0xffL) << 16) |
          ((dg(4 * j + 2) & 0xffL) << 8) |
          (dg(4 * j + 3) & 0xffL)
        buf(j * width + (chunk % width).toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): CmsSketchExpr =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CmsSketchExpr =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchExpr =
    copy(child = newChild)
  override def prettyName: String = "cms_sketch"
}

object CmsSketchExpr {
  /** depth×width counter array (row-major) over a string column. */
  def cms(item: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsSketchExpr(ColumnBridge.expression(item.cast("string")),
        depth, width).toAggregateExpression())

  /** Point estimate: min over rows of the item's cell — the same
    * md5-chunk arithmetic as the update path, expressed in builtins so
    * probing stays codegen'd and the DuckDB oracle can mirror it.
    */
  def estimate(item: Column, sketch: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { j =>
      val chunk = conv(substring(md5(item), j * 8 + 1, 8), 16, 10)
        .cast("long")
      element_at(sketch,
        (lit(j * width) + chunk % width + 1).cast("int"))
    }: _*)
}
