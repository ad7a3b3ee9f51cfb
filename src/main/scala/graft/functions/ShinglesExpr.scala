package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object ShinglesExpr {
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(text), n))
}

/** Distinct word n-gram shingles in one compiled pass (r15, guide §4) —
  * ≡ `array_distinct(transform(sequence(0, greatest(size(toks)-n, 0)),
  * i => array_join(slice(toks, i+1, n), " ")))` with
  * `toks = split(text, " ")`, which is interpreted per row (HOF lambdas
  * never enter codegen; measured 1.4 s per 5k-doc pass at sf0.1, and
  * the verify joins compute it on BOTH sides).
  *
  * Key identity making the one-pass form cheap: tokens are the
  * split-on-space segments of the text, and n consecutive tokens
  * re-joined with single spaces reconstruct the EXACT substring of the
  * text between those token boundaries — so each shingle is a
  * substring slice, no token array and no join ever materialize.
  * First-occurrence order is preserved exactly like `array_distinct`;
  * with fewer than n+1 tokens the single shingle is the whole text
  * (the `greatest(..., 0)` degenerate case). DedupSpec pins
  * equivalence to the HOF form (kept as `Dedup.shinglesHof`),
  * including empty/consecutive/trailing-space edge cases.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(t: UTF8String): GenericArrayData = {
    val str = t.toString
    val len = str.length
    // token boundaries: starts(i) = start of token i; token i ends at
    // starts(i+1) - 1 (the space) or len
    val starts = new scala.collection.mutable.ArrayBuffer[Int](16)
    starts += 0
    var p = str.indexOf(' ')
    while (p >= 0) { starts += p + 1; p = str.indexOf(' ', p + 1) }
    val tcount = starts.length
    val out = new java.util.LinkedHashSet[String]()
    if (tcount <= n) {
      // fewer than n+1 tokens: the single degenerate shingle is the
      // whole text (all tokens joined = the original string)
      out.add(str)
    } else {
      var i = 0
      while (i <= tcount - n) {
        val end = if (i + n < tcount) starts(i + n) - 1 else len
        out.add(str.substring(starts(i), end))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = s"shingles$n"
}
