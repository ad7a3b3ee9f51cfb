package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd scalar expression.
  *
  * The decontamination / set-exclusion shape at 100 TB: a benchmark (or
  * deny-list) too big for a broadcast hash JOIN still fits as a Bloom
  * filter (~10 bits/key vs ~100+ bytes/key), so the corpus-side scan
  * filters DOWN to the false-positive fraction before the exact verify
  * join — the exchange carries fp-rate × corpus instead of the corpus.
  * No false negatives, so pre-filter + exact verify ≡ exact anti-join
  * (BloomDecontamSpec pins the equivalence; the DuckDB oracle checks
  * the final set bit-for-bit).
  */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires string input, got ${child.dataType.simpleString}")

  def compute(s: UTF8String): Boolean = bf.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomExprs {
  def mightContain(c: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bf))

  /** Distributed Bloom-filter build over a string column: per-partition
    * filters merged by OR — one treeAggregate, no row ever leaves its
    * partition. Only the FILTER (bits) returns to the driver, same
    * driver-state order as a k-means centroid fetch. Items are inserted
    * as UTF-8 bytes and probed the same way in [[BloomMightContain]],
    * so put/probe parity never depends on engine string internals.
    */
  def build(df: DataFrame, column: String,
            expectedItems: Long, fpp: Double): BloomFilter =
    df.select(column).rdd
      .map(_.getString(0))
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (f, s) => { f.putBinary(s.getBytes(StandardCharsets.UTF_8)); f },
        (a, b) => a.mergeInPlace(b))
}
