package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash kernels for the fingerprint hot path (r15, guide §4).
  *
  * The `functions`-only formulation in [[graft.dedup.Dedup.simhash64Df]]
  * paid, per exploded token row, two md5 HEX STRING materializations
  * plus 64 `substring` + `instr` probes (one per fingerprint bit), then
  * aggregated 64 separate `sum` columns per doc. Both halves are
  * replaced here with the same bits computed the cheap way:
  *
  *  - [[SimhashSigExpr]] packs all `nBits` per-token votes into ONE
  *    long, read directly from the md5 digest BYTES (vote bit b = the
  *    high bit of hex nibble b%32, i.e. bit 7/3 of digest byte b%32/2 —
  *    no hex string, no substring, no probe). One compiled call per row
  *    from generated code (the TextExprs pattern).
  *  - [[SimhashFpAgg]] folds the packed votes per group with a plain
  *    int[nBits] counter buffer (ObjectHashAggregate, map-side partial
  *    merge like [[VecSumLongExpr]]) and evaluates straight to the
  *    fingerprint long: bit b set iff 2·count_b > n, the exact integer
  *    form of "the ±1 vote sum is positive".
  *
  * Semantics are pinned bit-for-bit to the SQL probe form (DedupSpec
  * cross-checks both widths), so the DuckDB oracle parity of
  * q_simhash / q_simhash_pairs is unchanged: md5 is md5, whichever
  * side of the hex encoding the bit is read from.
  *
  * Counter width: exact Int counts (buffer nBits × 4 bytes). A packed
  * 8-per-long / 8-bit-lane buffer would be 8× smaller but silently
  * wraps at 255 distinct tokens per doc — an overflow class this
  * corpus already exceeds; Int lanes cannot overflow before a single
  * document would need ≥ 2³¹ DISTINCT tokens, beyond any row Spark can
  * hold.
  */
object SimhashExprs {

  def sig(token: Column, nBits: Int): Column =
    ColumnBridge.column(SimhashSigExpr(ColumnBridge.expression(token), nBits))

  def fp(sig: Column, nBits: Int): Column =
    ColumnBridge.column(SimhashFpAgg(ColumnBridge.expression(sig), nBits)
      .toAggregateExpression())

  def doc(text: Column, nBits: Int): Column =
    ColumnBridge.column(SimhashDocExpr(ColumnBridge.expression(text), nBits))
}

/** Whole-document SimHash in one compiled pass — the r15 q_simhash_pairs
  * end state. The fingerprint is a PURE PER-ROW FUNCTION of the
  * document text (votes over its distinct tokens), so the explode →
  * shuffle-by-doc → aggregate pipeline (even with the native
  * [[SimhashSigExpr]]/[[SimhashFpAgg]] kernels) pays an Exchange and a
  * hash-aggregate per self-join side for structure the computation
  * never needed. This expression tokenizes (space-split, empty tokens
  * kept — `split(text, ' ')` semantics), dedups, votes and folds in a
  * single pass per row: scan-side map, ZERO shuffles at any corpus
  * size. Equivalence to the exploded SQL probe form is pinned in
  * DedupSpec (identical md5-nibble votes, identical 2·count > n fold);
  * null text yields null, and callers filter nulls to match the
  * exploded form, which dropped those docs.
  */
case class SimhashDocExpr(child: Expression, nBits: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  @transient private lazy val local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def accumulate(counts: Array[Int], digest: Array[Byte],
                         from: Int, until: Int): Unit = {
    var b = from
    while (b < until) {
      val p = b - from
      val by = digest(p >> 1)
      val bit = if ((p & 1) == 0) (by >> 7) & 1 else (by >> 3) & 1
      counts(b) += bit
      b += 1
    }
  }

  def compute(t: UTF8String): Long = {
    val md = local.get()
    val str = t.toString
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](nBits)
    var n = 0
    var start = 0
    val len = str.length
    // split(text, " ") with regex limit -1: a token between every pair
    // of spaces, empty tokens (leading/consecutive/trailing) kept
    while (start <= len) {
      var end = str.indexOf(' ', start)
      if (end < 0) end = len
      val tok = str.substring(start, end)
      if (seen.add(tok)) {
        n += 1
        val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        md.reset()
        accumulate(counts, md.digest(bytes), 0, math.min(nBits, 32))
        if (nBits > 32) {
          md.reset()
          md.update('1'.toByte)
          accumulate(counts, md.digest(bytes), 32, nBits)
        }
      }
      start = end + 1
    }
    var fp = 0L
    var i = 0
    while (i < nBits) {
      if (2L * counts(i) > n) fp |= 1L << i
      i += 1
    }
    fp
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashDoc", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashDocExpr =
    copy(child = newChild)
  override def prettyName: String = s"simhash_doc$nBits"
}

/** Packed per-token SimHash votes: bit b of the result = the high bit
  * of hex nibble b%32 of md5(token) (b < 32) or md5('1' || token)
  * (b ≥ 32) — exactly `instr('89abcdef', substring(md5(...), b%32+1, 1))
  * > 0` without materializing the hex string. nBits ≤ 32 computes one
  * digest, wider forms two (the engine-portable 64-bit construction the
  * DuckDB oracle rebuilds).
  */
case class SimhashSigExpr(child: Expression, nBits: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  // MessageDigest is stateful and the referenced expression object is
  // shared across an executor's task threads under codegen — one
  // instance per thread, reset per call
  @transient private lazy val local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // high bit of hex nibble p (0-indexed) of a digest: even p = high
  // nibble of byte p/2 (bit 7), odd p = low nibble (bit 3)
  private def packBits(sig0: Long, digest: Array[Byte], from: Int,
                       until: Int): Long = {
    var sig = sig0
    var b = from
    while (b < until) {
      val p = b - from
      val by = digest(p >> 1)
      val bit = if ((p & 1) == 0) (by >> 7) & 1 else (by >> 3) & 1
      sig |= bit.toLong << b
      b += 1
    }
    sig
  }

  def compute(t: UTF8String): Long = {
    val md = local.get()
    val bytes = t.getBytes
    md.reset()
    var sig = packBits(0L, md.digest(bytes), 0, math.min(nBits, 32))
    if (nBits > 32) {
      md.reset()
      md.update('1'.toByte)
      sig = packBits(sig, md.digest(bytes), 32, nBits)
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashSig", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSigExpr =
    copy(child = newChild)
  override def prettyName: String = s"simhash_sig$nBits"
}

/** Per-bit vote counts + group size (empty until the first row). */
final class SimhashVoteBuffer(val counts: Array[Int], var n: Long)

/** SimHash fingerprint aggregate over packed per-token vote longs:
  * counts bit b's set-votes per group, evaluates to the fingerprint
  * long with bit b set iff 2·count_b > n (≡ the ±1 vote sum positive —
  * integer-exact, order-independent, oracle-hash safe). Replaces 64
  * separate `sum(when(instr(...)))` aggregate columns with one native
  * aggregate: ObjectHashAggregate, map-side partials, one long per doc
  * reaching the exchange.
  */
case class SimhashFpAgg(
    child: Expression,
    nBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SimhashVoteBuffer]
    with UnaryLike[Expression] {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires bigint input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): SimhashVoteBuffer =
    new SimhashVoteBuffer(new Array[Int](nBits), 0L)

  override def update(b: SimhashVoteBuffer, input: InternalRow): SimhashVoteBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val sig = v.asInstanceOf[Long]
      b.n += 1L
      val c = b.counts
      var i = 0
      while (i < nBits) { c(i) += ((sig >>> i) & 1L).toInt; i += 1 }
    }
    b
  }

  override def merge(x: SimhashVoteBuffer, y: SimhashVoteBuffer): SimhashVoteBuffer = {
    x.n += y.n
    val cx = x.counts
    val cy = y.counts
    var i = 0
    while (i < nBits) { cx(i) += cy(i); i += 1 }
    x
  }

  override def eval(b: SimhashVoteBuffer): Any = {
    var fp = 0L
    var i = 0
    while (i < nBits) {
      if (2L * b.counts(i) > b.n) fp |= 1L << i
      i += 1
    }
    fp
  }

  override def serialize(b: SimhashVoteBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 * nBits).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(b.n)
    var i = 0
    while (i < nBits) { buf.putInt(b.counts(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): SimhashVoteBuffer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong
    val counts = new Array[Int](nBits)
    var i = 0
    while (i < nBits) { counts(i) = buf.getInt; i += 1 }
    new SimhashVoteBuffer(counts, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashFpAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashFpAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashFpAgg =
    copy(child = newChild)
  override def prettyName: String = s"simhash_fp$nBits"
}
