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
}
