package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the covariance-sum aggregate behind q_pca_project:
  * [[CovSumMicroExpr]] must reproduce the relational second-moment
  * derivation (explode (i, j) index pairs → per-pair floor micro
  * product → long sum) exactly, under any partitioning/merge order —
  * long adds are associative, so a repartitioned input must produce
  * the identical flattened matrix. Random vectors include negatives,
  * zeros, and magnitudes past 1 to exercise the floor's sign behavior.
  */
class CovSumExprSpec extends SparkSpec {
  private val rnd = new scala.util.Random(43)
  private val dim = 8
  private def randVec(): Seq[Double] =
    Seq.fill(dim)(math.floor((rnd.nextDouble() * 6 - 3) * 1e4) / 1e4)

  private def refCov(vs: Seq[Seq[Double]]): Seq[Long] = {
    val out = new Array[Long](dim * dim)
    vs.foreach { v =>
      for (i <- 0 until dim; j <- 0 until dim)
        out(i * dim + j) += math.floor(v(i) * v(j) * 1e6 + 0.5).toLong
    }
    out.toSeq
  }

  test("cov_sum_micro == relational floor-micro outer-product sums, " +
      "identical under repartitioning") {
    import spark.implicits._
    val vs = (0 until 500).map(_ => randVec())
    val expected = refCov(vs)
    for (parts <- Seq(1, 7)) {
      val got = vs.toDF("v").repartition(parts)
        .agg(CovSumMicroExpr.covSumMicro(col("v")).as("cs"))
        .head.getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("cov_sum_micro skips nulls and truncates longer later vectors " +
      "to the first-seen length") {
    import spark.implicits._
    val first = Seq(1.0, 2.0)
    val longer = Seq(3.0, 4.0, 5.0) // 5.0 column must be ignored
    val rows: Seq[Option[Seq[Double]]] =
      Seq(Some(first), None, Some(longer))
    val got = rows.toDF("v").coalesce(1)
      .agg(CovSumMicroExpr.covSumMicro(col("v")).as("cs"))
      .head.getSeq[Long](0)
    val expected = refCovOf(Seq(first, longer.take(2)), 2)
    assert(got == expected)
  }

  test("merge aligns mixed-dimension partials by (row, col), never by " +
      "flat offset") {
    // a 2×2 partial merged with a 3×3 partial: the common top-left
    // block must add cell-for-cell; a flat add would smear the 3×3
    // buffer's row boundaries across the 2×2 layout
    val agg = CovSumMicroExpr(org.apache.spark.sql.catalyst.expressions
      .Literal.create(null, org.apache.spark.sql.types
        .ArrayType(org.apache.spark.sql.types.DoubleType)))
    val small = new CovSumBuffer(Array(1L, 2L, 3L, 4L), 2)
    val big = new CovSumBuffer(
      Array(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L), 3)
    val m1 = agg.merge(
      new CovSumBuffer(small.sums.clone(), 2),
      new CovSumBuffer(big.sums.clone(), 3))
    assert(m1.dim == 2 &&
      m1.sums.toSeq == Seq(11L, 22L, 43L, 54L)) // +row0=(10,20), row1=(40,50)
    val m2 = agg.merge(
      new CovSumBuffer(big.sums.clone(), 3),
      new CovSumBuffer(small.sums.clone(), 2))
    assert(m2.dim == 3 && m2.sums.toSeq ==
      Seq(11L, 22L, 30L, 43L, 54L, 60L, 70L, 80L, 90L))
  }

  private def refCovOf(vs: Seq[Seq[Double]], d: Int): Seq[Long] = {
    val out = new Array[Long](d * d)
    vs.foreach { v =>
      for (i <- 0 until d; j <- 0 until d)
        out(i * d + j) += math.floor(v(i) * v(j) * 1e6 + 0.5).toLong
    }
    out.toSeq
  }
}
