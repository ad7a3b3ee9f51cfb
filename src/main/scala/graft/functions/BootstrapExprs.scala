package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType}

/** Native Poisson-bootstrap weight kernel: `doc_id → array<long>` of
  * `4·blocks` replicate weights. Semantics are EXACTLY the SQL/HOF
  * form the oracle runs —
  * `md5(concat(doc_id, '|', block))` per 4-replicate block, the 32-hex
  * digest split into four 32-bit dyadic uniforms (digest bytes in hex
  * order), each pushed through the unrolled inverse Poisson(1) CDF
  * with the shared decimal-literal cutoffs — but computed on digest
  * BYTES with zero hex-string materialization and one ThreadLocal
  * MessageDigest, where the HOF lambda chain runs interpreted
  * substring+conv per draw (measured ~0.5 s of the q_bootstrap_ci
  * sf0.1 time; this kernel ~0.1 s). QueryInvariantsSpec re-derives
  * every draw from an independent MD5 mirror.
  */
case class BootstrapWeightsExpr(
    child: Expression, blocks: Int, cuts: Seq[Double])
  extends UnaryExpression {

  require(blocks >= 1 && cuts.nonEmpty)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bootstrap_weights requires bigint, got ${child.dataType.simpleString}")

  @transient private lazy val cutsArr: Array[Double] = cuts.toArray

  def compute(id: Long): GenericArrayData = {
    val md = BootstrapWeightsExpr.digest.get()
    val out = new Array[Long](blocks * 4)
    val idStr = java.lang.Long.toString(id)
    var blk = 0
    while (blk < blocks) {
      md.reset()
      val dg = md.digest(
        (idStr + "|" + blk).getBytes(StandardCharsets.US_ASCII))
      var j = 0
      while (j < 4) {
        val u = (((dg(4 * j) & 0xffL) << 24) |
          ((dg(4 * j + 1) & 0xffL) << 16) |
          ((dg(4 * j + 2) & 0xffL) << 8) |
          (dg(4 * j + 3) & 0xffL)) / 4294967296.0
        var k = 0
        var w = cutsArr.length.toLong
        while (k < cutsArr.length && w == cutsArr.length.toLong) {
          if (u < cutsArr(k)) w = k.toLong
          k += 1
        }
        out(blk * 4 + j) = w
        j += 1
      }
      blk += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bootstrapWeights", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BootstrapWeightsExpr =
    copy(child = newChild)
  override def prettyName: String = "bootstrap_weights"
}

object BootstrapWeightsExpr {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def bootstrapWeights(id: Column, blocks: Int, cuts: Seq[Double]): Column =
    ColumnBridge.column(
      BootstrapWeightsExpr(ColumnBridge.expression(id), blocks, cuts))
}
