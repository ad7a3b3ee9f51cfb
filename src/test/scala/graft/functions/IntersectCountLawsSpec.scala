package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the native one-pass [[IntersectCountExpr]] to
  * `size(array_intersect(a, b))` — the construction it replaces in the
  * verify filters — on adversarial inputs: duplicates (intersect
  * dedupes), null elements (count once iff present in both), empties,
  * and null arrays (result null).
  */
class IntersectCountLawsSpec extends SparkSpec {
  import spark.implicits._

  test("intersect_count ≡ size(array_intersect) on random arrays with " +
    "duplicates") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      def arr() = Seq.fill(rnd.nextInt(30))(
        s"w${rnd.nextInt(20)}")
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id",
        StringSim.intersectCount($"a", $"b").as("n"))
      .as[(Long, Int)].collect().toMap
    val want = df.select($"id",
        size(array_intersect($"a", $"b")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == want)
  }

  test("intersect_count: empties, null elements, null arrays") {
    val df = Seq(
      (1L, Some(Seq[Option[String]]()), Some(Seq[Option[String]](Some("x")))),
      (2L, Some(Seq[Option[String]](Some("x"), None, Some("x"))),
        Some(Seq[Option[String]](None, Some("x")))),
      (3L, Some(Seq[Option[String]](None)), Some(Seq[Option[String]](Some("y")))),
      (4L, None, Some(Seq[Option[String]](Some("x")))),
      (5L, Some(Seq[Option[String]](Some("x"))), None)
    ).toDF("id", "a", "b")
    val got = df.select($"id",
        StringSim.intersectCount($"a", $"b").as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else Int.box(r.getInt(1)))).toMap
    val want = df.select($"id",
        size(array_intersect($"a", $"b")).as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else Int.box(r.getInt(1)))).toMap
    assert(got == want)
  }
}
