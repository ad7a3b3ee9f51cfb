package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The `functions`-only formulation (`aggregate(zip_with(a, b, _*_))`)
  * is correct but interpreted: higher-order functions never enter
  * whole-stage codegen, so at 100 TB every dot product pays lambda
  * dispatch per element. These expressions generate a tight primitive
  * loop via `doGenCode` (with an interpreted `eval` fallback) and are
  * drop-in replacements used by [[graft.sim.Similarity]].
  *
  * Float-exactness contract (the DuckDB oracle depends on it): all
  * accumulations run in index order, exactly like the in-order fold of
  * `aggregate(...)` — same doubles, bit for bit.
  *
  * Null semantics: null array → null result (standard null-intolerant
  * binary expression); mismatched lengths → null (mirrors zip_with's
  * null-padding folding to null). Array ELEMENTS are assumed non-null
  * (embedding columns decoded from parquet floats). Zero-norm edge:
  * cosine of a zero vector is NaN (IEEE 0/0), where the dot/(norm*norm)
  * column formulation would raise DIVIDE_BY_ZERO under ANSI mode —
  * NaN is the right "undefined" for a similarity score.
  */
object VectorExprs {
  // inputs cast to array<double> at the Column layer (a no-op when
  // already double) — the expressions themselves demand exact types
  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(d(a)), ColumnBridge.expression(d(b))))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(d(a)), ColumnBridge.expression(d(b))))

  def norm(a: Column): Column =
    ColumnBridge.column(NormL2(ColumnBridge.expression(d(a))))

  /** Index of the max-dot-product centroid (first index wins ties) —
    * the IVF cell assignment kernel. One native call per row looping
    * centroids × dim; the `least(struct(-dot, idx), …)` column form
    * unrolls one struct expression per centroid, which at
    * corpus-scaled cell counts (hundreds) compiles into a JIT-hostile
    * giant method.
    */
  def argmaxDot(vec: Column, centroids: Seq[Array[Double]]): Column =
    ColumnBridge.column(ArgMaxDot(ColumnBridge.expression(d(vec)),
      centroids.map(_.toSeq)))

  /** Two-level coarse-quantized assignment (see [[ArgMaxDotGrouped]]);
    * `groups` pairs each non-empty coarse vector with its fine-member
    * global indexes, ascending on both levels.
    */
  def argmaxDotGrouped(vec: Column,
                       groups: Seq[(Array[Double], Seq[Int])],
                       centroids: Seq[Array[Double]]): Column =
    ColumnBridge.column(ArgMaxDotGrouped(ColumnBridge.expression(d(vec)),
      groups.map(_._1.toSeq), groups.map(_._2),
      centroids.map(_.toSeq)))
}

/** Two-level (coarse-quantized) IVF cell assignment — the 100 TB form
  * of [[ArgMaxDot]]. Flat assignment is n·cells dot products, and with
  * cells ∝ n (the constant-occupancy rule) that is QUADRATIC in corpus
  * size — measured ×11.8 wall clock for ×4 vectors at the 128k-vector
  * decade. The classic fix (FAISS's coarse quantizer): group the
  * `cells` fine centroids under ⌊√cells⌋ seeded coarse vectors; per row
  * argmax over the coarse level first, then argmax over only that
  * group's fine members — n·(√k + k/√k) dots, n^1.5 overall with
  * constant per-cell occupancy preserved.
  *
  * Determinism contract (the DuckDB oracle mirrors every clause):
  * dots accumulate in index order; ties break to the FIRST index at
  * both levels; `groups` holds only NON-empty (coarseVec, ascending
  * fine-member global indexes) pairs in ascending original coarse
  * order, so a row can never land in a memberless group. Returns the
  * GLOBAL fine-centroid index, identical domain to [[ArgMaxDot]].
  */
case class ArgMaxDotGrouped(
    child: Expression,
    coarse: Seq[Seq[Double]],
    members: Seq[Seq[Int]],
    centroids: Seq[Seq[Double]])
    extends UnaryExpression with ArrayDoubleInputs {
  require(coarse.length == members.length && members.forall(_.nonEmpty),
    "coarse/members must be parallel and non-empty")
  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  @transient private lazy val co: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val me: Array[Array[Int]] =
    members.map(_.toArray).toArray
  @transient private lazy val ce: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  def compute(x: ArrayData): Int = {
    val v = x.toDoubleArray()
    def dot(c: Array[Double]): Double = {
      val m = math.min(v.length, c.length)
      var acc = 0.0; var i = 0
      while (i < m) { acc += v(i) * c(i); i += 1 }
      acc
    }
    var bg = 0; var bgd = Double.NegativeInfinity
    var g = 0
    while (g < co.length) {
      val dg = dot(co(g))
      if (dg > bgd) { bgd = dg; bg = g }
      g += 1
    }
    val ms = me(bg)
    var best = ms(0); var bd = Double.NegativeInfinity
    var j = 0
    while (j < ms.length) {
      val dc = dot(ce(ms(j)))
      if (dc > bd) { bd = dc; best = ms(j) }
      j += 1
    }
    best
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argmaxDotGrouped", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArgMaxDotGrouped = copy(child = newChild)
  override def prettyName: String = "argmax_dot_grouped"
}

case class ArgMaxDot(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with ArrayDoubleInputs {
  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  def compute(x: ArrayData): Int = {
    val v = x.toDoubleArray()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(v.length, cent.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += v(i) * cent(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argmaxDot", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArgMaxDot =
    copy(child = newChild)
  override def prettyName: String = "argmax_dot"
}

private[functions] trait ArrayDoubleInputs extends Expression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires array<double> inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ArrayDoubleInputs {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0.0; var i = 0
      val n = x.numElements()
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
      |if ($x.numElements() != $y.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  double acc = 0.0;
      |  int n = $x.numElements();
      |  for (int i = 0; i < n; i++) {
      |    acc += $x.getDouble(i) * $y.getDouble(i);
      |  }
      |  ${ev.value} = acc;
      |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot/(sqrt(Σa²)·sqrt(Σb²)), one pass, in index order —
  * bit-identical to dot(a,b)/(norm(a)*norm(b)) over the HOF forms.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ArrayDoubleInputs {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = x.numElements()
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
      |if ($x.numElements() != $y.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  double dot = 0.0, na = 0.0, nb = 0.0;
      |  int n = $x.numElements();
      |  for (int i = 0; i < n; i++) {
      |    double xi = $x.getDouble(i); double yi = $y.getDouble(i);
      |    dot += xi * yi; na += xi * xi; nb += yi * yi;
      |  }
      |  ${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
      |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

case class NormL2(child: Expression)
    extends UnaryExpression with ArrayDoubleInputs {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) { val xi = x.getDouble(i); acc += xi * xi; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      |double acc = 0.0;
      |int n = $x.numElements();
      |for (int i = 0; i < n; i++) {
      |  double xi = $x.getDouble(i);
      |  acc += xi * xi;
      |}
      |${ev.value} = java.lang.Math.sqrt(acc);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormL2 =
    copy(child = newChild)
}
