package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Resample.gridInterpolate against hand-computed fixtures: linear
  * interpolation, exact-hit grid points, duplicate-timestamp
  * tie-breaks, and the no-extrapolation boundary rule.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Double, Long, Double)], step: Long) =
    Resample.gridInterpolate(
        rows.toDF("k", "tss", "id", "v"),
        col("k"), col("tss"), col("id"), col("v"), step)
      .as[(Long, Long, Double)].collect().toSeq
      .map(r => (r._1, r._2) -> r._3).toMap

  test("linear interpolation between bracketing observations") {
    // key 1: obs at t=5 (v=10) and t=25 (v=30); grid step 10 → g=10, 20
    val out = run(Seq((1L, 5.0, 1L, 10.0), (1L, 25.0, 2L, 30.0)), 10L)
    assert(out((1L, 10L)) == 10.0 + 20.0 * 5.0 / 20.0) // 15.0
    assert(out((1L, 20L)) == 10.0 + 20.0 * 15.0 / 20.0) // 25.0
    assert(out.size == 2)
  }

  test("exact-hit grid point returns the observation value") {
    val out = run(Seq((1L, 10.0, 1L, 7.0), (1L, 30.0, 2L, 9.0)), 10L)
    assert(out((1L, 10L)) == 7.0) // grid == obs ts → prev_v exactly
    assert(out((1L, 20L)) == 8.0)
    // t=30 is the LAST observation: no strictly-later next → dropped
    assert(!out.contains((1L, 30L)))
  }

  test("duplicate timestamps break ties by id, deterministically") {
    // two obs at t=10 (ids 1,2) — prev must be id=2 (greatest id);
    // two obs at t=30 (ids 3,4) — next must be id=3 (least id)
    val out = run(Seq(
      (1L, 10.0, 1L, 100.0), (1L, 10.0, 2L, 200.0),
      (1L, 30.0, 3L, 300.0), (1L, 30.0, 4L, 400.0)), 20L)
    assert(out((1L, 20L)) == 200.0 + (300.0 - 200.0) * 10.0 / 20.0) // 250
  }

  test("no extrapolation; keys too narrow for the grid emit nothing") {
    val out = run(Seq(
      (1L, 11.0, 1L, 1.0), (1L, 19.0, 2L, 2.0), // span inside one step
      (2L, 5.0, 3L, 1.0)), 10L)                 // single observation
    assert(out.isEmpty)
  }
}
