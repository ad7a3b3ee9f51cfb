package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.BloomExprs

/** The Bloom pre-filter is an exact-preserving optimization: no false
  * negatives means pre-filter + exact verify ≡ the plain anti-join, on
  * any input and at any false-positive rate.
  */
class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),  // shares 5-gram w/ bench
    (2L, "one two three four five six seven"),    // clean
    (3L, "alpha beta gamma delta epsilon other"), // shares 5-gram w/ bench
    (4L, "totally unrelated words in this doc"),  // clean
    (5L, "short doc")                             // < n tokens, still a span
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "never matched benchmark line here")
  ).toDF("doc_id", "text")

  test("bloom decontaminate ≡ exact anti-join on fixture") {
    val got = Dedup.bloomDecontaminate(
        corpus, $"doc_id", $"text", bench, $"doc_id", $"text", n = 5)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 4L, 5L))
  }

  test("no false negatives: every inserted digest probes true") {
    val digests = bench
      .select(explode(Dedup.shingles($"text", 5)).as("sh"))
      .select(md5($"sh").as("g")).distinct()
    val bf = BloomExprs.build(digests, "g", 1L << 12, 0.05)
    val misses = digests
      .filter(!BloomExprs.mightContain($"g", bf)).count()
    assert(misses == 0)
  }

  test("equivalence holds at an aggressive fp rate on real documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter($"doc_id" % 20 =!= 0)
    val evalSet = docs.filter($"doc_id" % 20 === 0)
    // fpp 0.5: half the probes false-positive — the exact verify must
    // absorb all of them
    val viaBloom = Dedup.bloomDecontaminate(train, $"doc_id", $"text",
        evalSet, $"doc_id", $"text", n = 5, expectedSpans = 64, fpp = 0.5)
      .as[Long].collect().toSet
    val flagged = Dedup.spanOverlap(train, $"doc_id", $"text",
        evalSet, $"doc_id", $"text", n = 5)
      .select($"doc_id").as[Long].collect().toSet
    val exact = train.select($"doc_id").as[Long].collect().toSet -- flagged
    assert(viaBloom == exact)
  }
}
