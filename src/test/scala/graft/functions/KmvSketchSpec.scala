package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KMV sketch: deterministic bottom-k distinct semantics — the result
  * must EQUAL the k smallest distinct hashes regardless of
  * partitioning (the merge path), and the estimator must land near the
  * true cardinality.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv == sorted distinct take-k, any partitioning; estimator close") {
    val k = 64
    // 10k values over a 3k-distinct domain, scrambled with a fixed LCG
    val vals = (0 until 10000).map(i => ((i * 2654435761L) % 3000) * 977L)
    val expected = vals.distinct.sorted.take(k)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(KmvSketchExpr.kmv(col("h"), k).as("mins"))
        .as[Seq[Long]].head()
      assert(got == expected, s"parts=$parts")
    }
    // (k-1)/U(k) with U scaled over the value range ~ true distinct;
    // just sanity-bound the estimator against the retained theta
    val kth = expected(k - 1)
    val est = (k - 1).toDouble * (3000L * 977L).toDouble / kth
    assert(math.abs(est - 3000) / 3000 < 0.35, s"est=$est")
  }

  test("kmv per group + fewer-than-k groups keep all distinct values") {
    val df = Seq(("a", 10L), ("a", 10L), ("a", 7L), ("b", 5L), ("b", 9L))
      .toDF("g", "h")
    val out = df.groupBy($"g").agg(KmvSketchExpr.kmv($"h", 4).as("mins"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a") == Seq(7L, 10L)) // duplicate 10 collapsed
    assert(out("b") == Seq(5L, 9L))
  }
}
