package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counting: whitespace and BPE-ish") {
    val df = Seq("hello world foo", "one2three, four!").toDF("text")
    val n = df.select(TextAnalysis.tokenCount($"text")).as[Int].collect()
    assert(n.toSeq == Seq(3, 2))
    val bpe = df.filter($"text".startsWith("one"))
      .select(TextAnalysis.bpeTokens($"text")).as[Seq[String]].head()
    assert(bpe == Seq("one2three", ",", " ", "four", "!"))
  }

  test("quality metrics") {
    val df = Seq((1L, "the cat sat, happily!")).toDF("id", "text")
    val q = TextAnalysis.withQuality(df, $"text").collect().head
    assert(q.getAs[Int]("n_tokens") == 4)
    assert(q.getAs[Int]("n_chars_m") == 21)
    assert(q.getAs[Int]("punct_count") == 2) // comma + bang
    assert(q.getAs[Double]("stopword_ratio") == 0.25) // "the"
  }

  test("language id: obvious markers win, zero hits -> und") {
    val df = Seq(
      "the cat is on a mat and it is happy",
      "der hund ist ein gutes tier und das weiss er",
      "le chat est sur la table et la chaise",
      "el gato es una mascota y los perros",
      "zzz qqq xyzzy").toDF("text")
    val langs = df.select(TextAnalysis.langId($"text")).as[String].collect()
    assert(langs.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "hello mars")).toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.fingerprint($"text"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("tfidf: hand-computed tf/df/idf on a 3-doc corpus") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana date")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, $"doc_id", $"text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // apple: df=2 → idf=ln(1.5); banana: df=2; cherry/date: df=1 → ln(3)
    assert(out((1L, "apple")) == (2L, 2L, 2.0 * StrictMath.log(3.0 / 2)))
    assert(out((2L, "apple")) == (1L, 2L, StrictMath.log(3.0 / 2)))
    assert(out((2L, "cherry")) == (1L, 1L, StrictMath.log(3.0)))
    assert(out((3L, "banana")) == (2L, 2L, 2.0 * StrictMath.log(3.0 / 2)))
    assert(out((3L, "date")) == (1L, 1L, StrictMath.log(3.0)))
    assert(out.size == 6) // (1,apple)(1,banana)(2,apple)(2,cherry)(3,banana)(3,date)
  }

  test("inverted index: sorted postings, df matches list length") {
    val docs = Seq(
      (10L, "x y"),
      (7L, "y z"),
      (3L, "y x x")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, $"doc_id", $"text")
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("x") == (2L, Seq(3L, 10L)))
    assert(out("y") == (3L, Seq(3L, 7L, 10L)))
    assert(out("z") == (1L, Seq(7L)))
    assert(out.forall { case (_, (df, p)) => df == p.size && p == p.sorted })
  }

  test("inverted index maxDf guard: degenerate stop-word term dropped " +
      "before its postings materialize; surviving terms identical") {
    // "the" appears in EVERY doc — the 100 TB stop-word degeneracy the
    // guard exists for; the rest are mid-frequency
    val docs = (0L until 200L).map(i =>
      (i, s"the tok${i % 7} rare$i")).toDF("doc_id", "text")
    val guarded = TextAnalysis
      .invertedIndex(docs, $"doc_id", $"text", maxDf = Some(50))
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(!guarded.contains("the"), "degenerate term must be dropped")
    // guarded output ≡ the unguarded form filtered to the cap
    val reference = TextAnalysis.invertedIndex(docs, $"doc_id", $"text")
      .filter($"df" <= 50)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(guarded == reference)
    assert(guarded("tok0") == (29L, (0L until 200L by 7).toSeq))
  }
}
