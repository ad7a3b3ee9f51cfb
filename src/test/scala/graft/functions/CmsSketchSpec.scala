package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-Min Sketch: the counter grid is a pure function of the input
  * multiset (partitioning-invariant merge), row sums conserve the
  * stream length, and point estimates are one-sided — est ≥ true
  * count always, exact when a row is collision-free, over-counting
  * under forced collisions (tiny width) but never under.
  */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 16

  private val stream: Seq[String] =
    Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(7)("gamma") ++
      (0 until 40).map(i => s"tail${i % 13}")

  test("grid is partitioning-invariant; row sums == stream length") {
    val grids = Seq(1, 5, 32).map { parts =>
      stream.toDF("t").repartition(parts)
        .agg(CmsSketchExpr.cms($"t", depth, width).as("sk"))
        .as[Seq[Long]].head()
    }
    assert(grids.distinct.size == 1, "grid depends on partitioning")
    val g = grids.head
    assert(g.size == depth * width)
    for (j <- 0 until depth)
      assert(g.slice(j * width, (j + 1) * width).sum == stream.size,
        s"row $j does not conserve the stream length")
  }

  test("estimates are one-sided: est >= exact for every token") {
    val df = stream.toDF("t")
    val sk = df.agg(CmsSketchExpr.cms($"t", depth, width).as("sk"))
    val out = df.groupBy($"t").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .select($"t", $"exact",
        CmsSketchExpr.estimate($"t", $"sk", depth, width).as("est"))
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (t, exact, est) =>
      assert(est >= exact, s"$t: est=$est < exact=$exact")
    }
    // 16 distinct tokens into width 16 with depth 4: the heavy token's
    // estimate stays exact unless all four rows collide — sanity-check
    // the big counts are not wildly inflated
    val alpha = out.find(_._1 == "alpha").get
    assert(alpha._3 < alpha._2 + stream.size / 2)
  }

  test("estimate matches a by-hand rebuild of the cells") {
    val df = stream.toDF("t")
    val grid = df.agg(CmsSketchExpr.cms($"t", depth, width).as("sk"))
      .as[Seq[Long]].head()
    def chunk(tok: String, j: Int): Int = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val v = ((dg(4 * j) & 0xffL) << 24) | ((dg(4 * j + 1) & 0xffL) << 16) |
        ((dg(4 * j + 2) & 0xffL) << 8) | (dg(4 * j + 3) & 0xffL)
      (v % width).toInt
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    for (tok <- exact.keys) {
      val byHand = (0 until depth).map(j => grid(j * width + chunk(tok, j))).min
      val est = df.limit(1)
        .select(CmsSketchExpr.estimate(lit(tok),
          typedLit(grid), depth, width))
        .as[Long].head()
      assert(est == byHand, tok)
    }
  }
}
