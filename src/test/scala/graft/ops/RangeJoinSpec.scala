package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval: containment semantics, boundaries, no dups") {
    val pts = Seq((1L, 0.0), (2L, 4.9), (3L, 5.0), (4L, 9.99), (5L, 10.0),
      (6L, 42.0)).toDF("p_id", "x")
    val ivs = Seq((10L, 0.0, 5.0), (20L, 5.0, 10.0), (30L, 4.0, 11.0))
      .toDF("iv_id", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "x", "lo", "hi", 5.0)
      .select($"p_id", $"iv_id").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 10L),              // lo inclusive
      (2L, 10L), (2L, 30L),   // overlapping intervals both match
      (3L, 20L), (3L, 30L),   // hi exclusive for 10, lo inclusive for 20
      (4L, 20L), (4L, 30L),
      (5L, 30L)))             // 10.0 outside [5,10) but inside [4,11)
    // no duplicate (point, interval) pairs from multi-cell intervals
    val all = RangeJoin.pointInInterval(pts, ivs, "x", "lo", "hi", 5.0)
      .select($"p_id", $"iv_id").collect()
    assert(all.length == all.distinct.length)
  }
}
