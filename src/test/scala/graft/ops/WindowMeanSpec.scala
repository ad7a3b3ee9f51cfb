package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowMeanSpec extends SparkSpec {
  import spark.implicits._

  test("VecMean equals hand-computed element-wise mean") {
    val rows = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),
      (1L, Seq(3.0, 4.0, 5.0)),
      (2L, Seq(10.0, 20.0, 30.0)))
    val df = rows.toDF("k", "v")
    val out = df.groupBy($"k").agg(WindowMean.vecMean($"v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(2.0, 3.0, 4.0))
    assert(out(2L) == Seq(10.0, 20.0, 30.0))
  }

  test("VecMean matches the posexplode+avg formulation") {
    val rows = (0 until 100).map(i =>
      (i % 7L, Seq.tabulate(5)(j => (i * 31 + j * 17 % 13).toDouble)))
    val df = rows.toDF("k", "v")
    val agg = df.groupBy($"k").agg(WindowMean.vecMean($"v").as("mean_peaks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val long = WindowMean.posexplodeMean(df, Seq($"k"), $"v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(agg.keySet == long.keySet)
    for (k <- agg.keySet; (a, b) <- agg(k).zip(long(k)))
      assert(math.abs(a - b) < 1e-9, s"key $k")
  }

  test("native VecMeanExpr ≡ typed Aggregator (exact, integer values)") {
    // integer-valued doubles: sums are exact below 2^53, so the compare
    // is bit-exact regardless of partial-merge arrival order
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i =>
      (i % 13L, Seq.fill(6)((rnd.nextInt(20001) - 10000).toDouble)))
    val df = rows.toDF("k", "v").repartition(5)
    val native = df.groupBy($"k").agg(WindowMean.vecMean($"v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val typed = df.groupBy($"k").agg(WindowMean.vecMeanTyped($"v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(native == typed)
  }

  test("native VecMeanExpr serialize/deserialize round-trips the buffer") {
    val e = graft.functions.VecMeanExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    val b = new graft.functions.VecMeanBuffer(Array(1.5, -2.25, 1e9), 7L)
    val rt = e.deserialize(e.serialize(b))
    assert(rt.n == 7L && rt.sums.toSeq == Seq(1.5, -2.25, 1e9))
  }

  test("property: VecMean merge is partition-invariant (integer values)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(30)
      val vs = List.fill(n)(List.fill(4)((rnd.nextInt(2001) - 1000).toDouble))
      // direct mean (exact: integer-valued doubles)
      val expected = (0 until 4).map(j => vs.map(_(j)).sum / vs.size)
      // via the Aggregator over an arbitrary 3-way partition merge
      val (p1, rest) = vs.splitAt(vs.size / 3)
      val (p2, p3) = rest.splitAt(rest.size / 2)
      def fold(p: List[List[Double]]) =
        p.foldLeft(WindowMean.VecMean.zero)((b, a) =>
          WindowMean.VecMean.reduce(b, a.toSeq))
      val merged = WindowMean.VecMean.merge(
        WindowMean.VecMean.merge(fold(p1), fold(p2)), fold(p3))
      val got = WindowMean.VecMean.finish(merged)
      assert(got.size == 4)
      for ((g, e) <- got.zip(expected)) assert(g == e)
    }
  }
}
