package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE trainer semantics against a hand-computed fixture, pinning the
  * classic greedy left-to-right merge application (a run "aaaa" under
  * merge (a,a) becomes [aa, aa] — non-overlapping, both pairs merge).
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("merge table matches hand-computed BPE on a fixture corpus") {
    // word counts: aaaa ×2, ab ×3
    val docs = Seq("aaaa aaaa", "ab ab ab").toDF("text")
    val out = BpeTrainer.train(docs, col("text"), merges = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    // step 1: (a,a) has 3 adjacencies in aaaa ×2 = 6 > (a,b)=3
    //   → aaaa becomes [aa, aa] (both pairs of the run merge)
    // step 2: (a,b)=3 > (aa,aa)=2 → ab becomes [ab]
    // step 3: only (aa,aa)=2 remains
    assert(out == Seq((1, "a", "a", 6L), (2, "a", "b", 3L),
      (3, "aa", "aa", 2L)))
  }

  test("merge supply exhausts cleanly before the requested round count") {
    val docs = Seq("xy xy").toDF("text")
    val out = BpeTrainer.train(docs, col("text"), merges = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    // one merge collapses xy to a single symbol; no pairs remain
    assert(out == Seq((1, "x", "y", 2L)))
  }
}
