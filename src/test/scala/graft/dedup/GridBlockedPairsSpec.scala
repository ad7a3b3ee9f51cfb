package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The grid-decomposed within-block pair join behind `q_jaro_link`
  * (`PipelineQueries.gridBlockedPairs`): a hot blocking key must spread
  * across cap²-bounded cells WITHOUT changing the pair set. Laws:
  *
  *  1. pair set ≡ the naive block self-join (lossless, exactly-once) —
  *     on a synthetic corpus with one block far above the cap;
  *  2. the join's shuffle keys on the CELL coordinates (blk, cx, cy),
  *     not the block alone — the property that actually de-skews a hot
  *     block at scale (same blk rows land on many reducers);
  *  3. no cartesian/nested-loop fallback.
  */
class GridBlockedPairsSpec extends SparkSpec {

  // one hot block ("the": 90 names ≫ cap=16) + two cold blocks — the
  // shape the decomposition exists for
  private def names() = {
    import spark.implicits._
    val rows =
      (0 until 90).map(i => (f"the name$i%03d", (i % 5) + 1L, "the")) ++
      (0 until 7).map(i => (f"cold a$i%02d", 1L, "cold")) ++
      (0 until 3).map(i => (f"tiny b$i%02d", 2L, "tiny"))
    rows.toDF("nm", "support", "blk")
  }

  private val cap = 16

  test("grid pair set == naive block self-join pair set, exactly once") {
    val n = names()
    val grid = graft.queries.PipelineQueries.gridBlockedPairs(n, cap)
      .select("name_a", "name_b", "n_a", "n_b")
    val a = n.select(col("nm").as("name_a"), col("support").as("n_a"),
      col("blk"))
    val b = n.select(col("nm").as("name_b"), col("support").as("n_b"),
      col("blk").as("blk_b"))
    val naive = a.join(b,
        col("blk") === col("blk_b") && col("name_a") < col("name_b"))
      .select("name_a", "name_b", "n_a", "n_b")
    val g = grid.collect().map(_.toSeq).toSeq
    assert(g.size == g.distinct.size, "pair emitted more than once")
    assert(g.toSet == naive.collect().map(_.toSeq).toSet)
    // sanity: the hot block really is multi-chunk at this cap
    assert(g.size == 90 * 89 / 2 + 7 * 6 / 2 + 3 * 2 / 2)
  }

  test("join shuffles on the cell coordinates, no nested-loop fallback") {
    val p = graft.queries.PipelineQueries.gridBlockedPairs(names(), cap)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    // both sides replicate via explode and the equi-join keys carry the
    // chunk coordinates — grep the join condition for cx/cy
    assert(p.contains("Generate explode"), s"no grid replication:\n$p")
    assert("Join.*\\bcx#\\d+".r.findFirstIn(p).isDefined &&
      "Join.*\\bcy#\\d+".r.findFirstIn(p).isDefined,
      s"cell coords not join keys:\n$p")
  }

  test("cap ≥ block size degenerates to single-cell (no replication blowup)") {
    val n = names()
    val grid = graft.queries.PipelineQueries.gridBlockedPairs(n, 4096)
    assert(grid.count() == 90 * 89 / 2 + 7 * 6 / 2 + 3 * 2 / 2)
  }
}
