package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("asofLeft: latest right at-or-before per key, nulls before first") {
    val left = Seq(
      ("a", ts(5), 1L), ("a", ts(10), 2L), ("a", ts(11), 3L),
      ("a", ts(25), 4L),
      ("b", ts(10), 5L),                  // key b has a later checkpoint only
      ("c", ts(99), 6L))                  // key c has no checkpoints at all
      .toDF("k", "ts", "lid")
    val right = Seq(
      ("a", ts(10), 100L), ("a", ts(20), 200L),
      ("b", ts(50), 300L))
      .toDF("k", "ts", "rid")
    val out = AsofJoin.asofLeft(left, right, Seq("k"), "ts", Seq("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty)               // before any right row
    assert(out(2L).contains(100L))        // equal ts is INCLUSIVE
    assert(out(3L).contains(100L))
    assert(out(4L).contains(200L))        // latest, not first
    assert(out(5L).isEmpty)               // right exists but only later
    assert(out(6L).isEmpty)               // key with no right rows
  }
}
