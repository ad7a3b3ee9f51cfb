package graft.dedup

import java.nio.file.Files

import graft.SparkSpec

/** Losslessness law for q_prefix_join's AllPairs prefix filter: on
  * seeded RANDOM corpora (small vocab → heavy shingle collisions, doc
  * lengths spanning the <8-token edge, planted perturbed near-dups),
  * the prefix-filtered result must equal the brute-force all-pairs
  * Jaccard≥τ set computed independently in plain Scala. Guards the
  * theorem implementation (prefix length, global (df, shingle) order,
  * ceil-at-integer-boundary behavior) beyond the one driver corpus the
  * oracle gate sees.
  */
class PrefixJoinLawsSpec extends SparkSpec {

  /** Plain-Scala mirror of Dedup.shingles(text, 8): distinct 8-token
    * windows from index sequence 0..max(len−8, 0), slices truncated at
    * the end like Spark's `slice`.
    */
  private def shingles8(text: String): Set[String] = {
    val toks = text.split(" ", -1)
    (0 to math.max(toks.length - 8, 0))
      .map(i => toks.slice(i, i + 8).mkString(" ")).toSet
  }

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def bruteForce(docs: Seq[(Long, String)], tau: Double)
      : Set[(Long, Long, Double)] = {
    val sh = docs.map { case (id, t) => id -> shingles8(t) }
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      inter = (sa intersect sb).size.toDouble
      j = r6(inter / (sa.size + sb.size - inter))
      if j >= tau
    } yield (ia, ib, j)).toSet
  }

  private def bruteForceContainment(docs: Seq[(Long, String)], tau: Double)
      : Set[(Long, Long, Double)] = {
    val sh = docs.map { case (id, t) => id -> shingles8(t) }
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia != ib
      c = r6((sa intersect sb).size.toDouble / sa.size)
      if c >= tau
    } yield (ia, ib, c)).toSet
  }

  test("asymmetric containment prefix filter is lossless: equals " +
      "brute-force ordered pairs with planted quotes") {
    // the asymmetric theorem: C(A→B) >= τ forces sharing one of A's
    // p = n_a − ⌈τ·n_a⌉ + 1 rarest shingles even though B never prunes;
    // planted quotes (doc = a slice of a longer doc) are the pairs
    // where symmetric Jaccard is small but containment is 1.0
    val rng = new scala.util.Random(0xBEEF)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    for (corpus <- 1 to 3) {
      val base = (0L until 30L).map { id =>
        val len = 1 + rng.nextInt(40)
        id -> Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      }
      // planted quotes: slices of longer docs (containment 1 in the
      // host, diluted Jaccard), plus one exact copy
      val quotes = base.filter(_._2.split(" ").length >= 20).take(5)
        .zipWithIndex.map { case ((id, t), i) =>
          val toks = t.split(" ", -1)
          val sliceLen = if (i == 0) toks.length else 10 + rng.nextInt(8)
          val start = rng.nextInt(math.max(toks.length - sliceLen, 0) + 1)
          (200L + id) -> toks.slice(start, start + sliceLen).mkString(" ")
        }
      val docs = base ++ quotes
      val dir = Files.createTempDirectory(s"graft_ct_$corpus").toString
      import spark.implicits._
      docs.toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      val got = graft.SparkEntry.queries("q_containment")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = bruteForceContainment(docs, 0.5)
      assert(want.exists(_._3 == 1.0),
        s"corpus $corpus planted no full-containment quote")
      assert(got == want,
        s"corpus $corpus: lost=${(want diff got).take(5)} " +
          s"extra=${(got diff want).take(5)}")
    }
  }

  test("prefix filter is lossless: equals brute-force all-pairs on " +
      "seeded random corpora with planted near-dups") {
    val rng = new scala.util.Random(0xC0FFEE)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    for (corpus <- 1 to 3) {
      val base = (0L until 40L).map { id =>
        val len = 1 + rng.nextInt(30) // includes <8-token docs
        id -> Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      }
      // planted near-dups: copies with one token perturbed (and one
      // exact copy), the pairs the filter must never lose
      val dups = base.take(8).zipWithIndex.map { case ((id, t), i) =>
        val toks = t.split(" ", -1).toVector
        val mut =
          if (i == 0 || toks.length < 2) toks
          else toks.updated(rng.nextInt(toks.length),
            vocab(rng.nextInt(vocab.size)))
        (100L + id) -> mut.mkString(" ")
      }
      val docs = base ++ dups
      val dir = Files.createTempDirectory(s"graft_pj_$corpus").toString
      import spark.implicits._
      docs.toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      val got = graft.SparkEntry.queries("q_prefix_join")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = bruteForce(docs, 0.6)
      assert(want.nonEmpty, s"corpus $corpus planted no qualifying pairs")
      assert(got == want,
        s"corpus $corpus: lost=${(want diff got).take(5)} " +
          s"extra=${(got diff want).take(5)}")
    }
  }
}
