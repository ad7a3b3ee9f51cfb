package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) for exact substring dedup — the
  * position-independent chunking that makes Lee-et-al-style duplicated-
  * substring detection distributable: a Karp–Rabin rolling hash over a
  * `w`-char window cuts the text wherever `h % p == 0`, so IDENTICAL
  * substrings produce IDENTICAL interior cut positions no matter where
  * in which document they occur (the rsync/LBFS anchoring insight).
  * Fixed-stride windows cannot do this: a copy at an arbitrary byte
  * offset samples different windows on each side and never matches.
  *
  * One pass per row, O(1) per char (subtract-first incremental update:
  * `h ← (h − c_out·b^(w−1))·b + c_in`, exact in int64 — with b=131,
  * w=8 the intermediate is bounded by ~8.1e16), compiled into
  * whole-stage codegen via `ctx.addReferenceObj` like the TextExprs
  * scorers. The hash is EXACT integer algebra (no modulus until the
  * cut test), so an oracle can reproduce every boundary from the
  * per-position polynomial Σ code·b^k — see q_substring_dedup's SQL.
  *
  * ASCII corpora hash identically to any chars-as-code-points engine;
  * non-BMP input would diverge from code-point engines (UTF-16 units)
  * and is out of oracle scope. High UTF-16 code units can also wrap
  * the int64 polynomial — Java wrap is deterministic, so the CHUNKING
  * stays stable and content-defined either way; only the cross-engine
  * oracle parity is ASCII-scoped.
  */
object CdcExprs {

  def cdcChunks(text: Column, w: Int, base: Long, modP: Long): Column =
    ColumnBridge.column(
      CdcChunksExpr(ColumnBridge.expression(text), w, base, modP))
}

/** Chunks `child` by the rolling-hash rule above; returns
  * `array<struct<start:int, chunk:string>>` where `start` is the
  * 0-based char offset and the chunks partition the text exactly
  * (concat == input, starts are the running length sum). A cut is
  * emitted after 0-based position i (boundary at i+1) when the window
  * [i−w+1, i] hash is ≡ 0 (mod p) and the boundary is interior
  * (0 < i+1 < length). Empty input yields one empty chunk, matching
  * the `[0] ++ cuts` construction the oracle SQL uses.
  */
case class CdcChunksExpr(child: Expression, w: Int, base: Long, modP: Long)
    extends UnaryExpression {
  require(w >= 2 && base >= 2 && modP >= 2, s"bad CDC params ($w,$base,$modP)")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  // b^(w-1), the weight of the outgoing char in the subtract-first update
  private val bTop: Long = {
    var p = 1L; var k = 0
    while (k < w - 1) { p *= base; k += 1 }
    p
  }

  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val n = str.length
    val cuts = new java.util.ArrayList[Integer]()
    cuts.add(0)
    if (n >= w) {
      var h = 0L
      var i = 0
      while (i < w) { h = h * base + str.charAt(i); i += 1 }
      if (h % modP == 0 && w < n) cuts.add(w)
      while (i < n) {
        h = (h - str.charAt(i - w) * bTop) * base + str.charAt(i)
        if (h % modP == 0 && i + 1 < n) cuts.add(i + 1)
        i += 1
      }
    }
    val m = cuts.size()
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      val st = cuts.get(k).intValue()
      val en = if (k + 1 < m) cuts.get(k + 1).intValue() else n
      out(k) = InternalRow(st, UTF8String.fromString(str.substring(st, en)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcChunks", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}
