package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextExprs

/** Native text expressions ≡ the builtin-HOF reference forms, on both a
  * hand-built multilingual fixture and the real documents table — the
  * equality that keeps the DuckDB oracle parity intact after swapping
  * the hot path to the one-pass native scorers.
  */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    "the cat sat of the mat and it is that",
    "der hund und die katze ist ein tier",
    "le chat et la souris est une histoire",
    "el gato y los perros es una historia",
    "的 是 了 在 我 有 什么",
    "una le est",                       // fr/es marker overlap
    "xyzzy plugh",                      // zero hits -> und
    "",                                 // empty doc
    "a  the   of",                      // multi-space runs
    "the the the und und le le la es es") // cross-language tie material

  private def docs = fixture.toDF("text")

  test("tokenSetCount ≡ size(filter(split, isin))") {
    val hof = size(filter(split($"text", " "),
      t => t.isin(TextAnalysis.Stopwords: _*)))
    val out = docs.select(
      TextExprs.tokenSetCount($"text", TextAnalysis.Stopwords).as("n"),
      hof.as("h")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("native langId ≡ HOF langId on fixture + real documents") {
    val fx = docs.select(TextAnalysis.langId($"text").as("a"),
      TextAnalysis.langIdHof($"text").as("b")).collect()
    fx.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))

    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = real.select(TextAnalysis.langId(col("text")).as("a"),
      TextAnalysis.langIdHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(cmp == 0)
  }

  test("nfcNormalize: composes marks, idempotent, already-NFC fast path") {
    // decomposed e + U+0301 composes; already-composed and plain ASCII
    // pass through the no-allocation fast path
    val in = Seq("e\u0301clair", "\u00e9clair", "plain ascii",
      "a\u030a", "")
    val rows = in.toDF("t")
      .select($"t", TextExprs.nfcNormalize($"t").as("n")).collect()
    rows.foreach { r =>
      val e = java.text.Normalizer.normalize(r.getString(0),
        java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == e, r.toString)
    }
    assert(rows(0).getString(1) == "\u00e9clair")
    assert(rows(3).getString(1) == "\u00e5")
    // idempotence: normalize(normalize(x)) == normalize(x)
    val twice = Seq("e\u0301 a\u030a mixed \u00e9").toDF("t")
      .select(TextExprs.nfcNormalize(
        TextExprs.nfcNormalize($"t")).as("n2"),
        TextExprs.nfcNormalize($"t").as("n1")).head()
    assert(twice.getString(0) == twice.getString(1))
    // the normalizeText pipeline strips zero-width + controls and
    // collapses whitespace runs around the composition
    val full = Seq(" a\u200B  b\u0301\tc\u0001  ").toDF("t")
      .select(TextAnalysis.normalizeText($"t").as("n")).head().getString(0)
    // b+U+0301 has no precomposed form, so NFC keeps the combining
    // mark attached while the tab and control collapse to spaces
    assert(full == "a b\u0301 c", s"got: ${full.map(_.toInt.toHexString)}")
  }

  test("native rollingFp ≡ HOF fold on fixture + real documents") {
    val fx = docs.select(TextAnalysis.rollingFingerprint($"text").as("a"),
      TextAnalysis.rollingFingerprintHof($"text").as("b")).collect()
    fx.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))

    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = real.select(
      TextAnalysis.rollingFingerprint(col("text")).as("a"),
      TextAnalysis.rollingFingerprintHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(cmp == 0)
  }

  test("native bpeTokenCount ≡ size(bpeTokens) on fixture + real documents") {
    val edge = (fixture ++ Seq("a!!b", "!!", "!a!", "a1b2", " x ", "...a...b"))
      .toDF("text")
    val fx = edge.select(TextExprs.bpeTokenCount($"text").as("a"),
      size(TextAnalysis.bpeTokens($"text")).as("b")).collect()
    fx.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))

    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = real.select(TextExprs.bpeTokenCount(col("text")).as("a"),
      size(TextAnalysis.bpeTokens(col("text"))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(cmp == 0)
  }

  test("rollingFp hand-check: h = ((0*31+c1)*31+c2)... mod 1e9+7") {
    val expected = "abc".foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    val got = Seq("abc").toDF("t")
      .select(TextExprs.rollingFp($"t")).as[Long].head()
    assert(got == expected)
  }

  test("scrubPii redacts emails and digit runs, leaves clean text alone") {
    val rows = Seq(
      "contact me at jane.doe+x@example.co.uk today",
      "call 555 123-4567 or (555) 7654321 now",
      "short 12345 stays",                // 5 digits — below the run bound
      "nothing to scrub here").toDF("text")
    val out = rows.select(TextAnalysis.scrubPii($"text")).as[String]
      .collect().toSeq
    assert(out(0) == "contact me at <EMAIL> today")
    // runs anchor on digits, so a leading "(" stays outside the match
    assert(out(1) == "call <NUMBER> or (<NUMBER> now")
    assert(out(2) == "short 12345 stays")
    assert(out(3) == "nothing to scrub here")
  }

  test("repetitionStats ≡ explode → groupBy → join form on fixture + real") {
    def explodeForm(df: org.apache.spark.sql.DataFrame) = {
      val toks = df.select($"doc_id", split($"text", " ").as("toks"))
      val bAgg = toks.filter(size($"toks") >= 2)
        .select($"doc_id", $"toks",
          explode(sequence(lit(1), size($"toks") - 1)).as("i"))
        .select($"doc_id", concat_ws(" ",
          element_at($"toks", $"i"),
          element_at($"toks", $"i" + 1)).as("bigram"))
        .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(max($"c").as("top_bigram"), sum($"c").as("n_bigrams"))
      val tAgg = toks.select($"doc_id", explode($"toks").as("tk"))
        .groupBy($"doc_id")
        .agg(countDistinct($"tk").as("n_distinct"),
          count(lit(1)).as("n_tokens"))
      bAgg.join(tAgg, "doc_id")
        .select($"doc_id", $"n_tokens", $"n_distinct", $"n_bigrams",
          $"top_bigram")
    }
    def nativeForm(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id",
          TextExprs.repetitionStats($"text").as("rs"))
        .filter($"rs.n_tokens" >= 2)
        .select($"doc_id", $"rs.n_tokens".cast("long").as("n_tokens"),
          $"rs.n_distinct".cast("long").as("n_distinct"),
          $"rs.n_bigrams".cast("long").as("n_bigrams"),
          $"rs.top_bigram".cast("long").as("top_bigram"))
    val fx = fixture.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (df <- Seq(fx, real)) {
      val n = nativeForm(df)
      val e = explodeForm(df)
      assert(n.count() == e.count())
      assert(n.except(e).isEmpty && e.except(n).isEmpty)
    }
  }

  test("termCounts ≡ explode → groupBy(doc, term).count on fixture + real") {
    def explodeForm(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", explode(split($"text", " ")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    def nativeForm(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", explode(TextExprs.termCounts($"text")).as("tc"))
        .select($"doc_id", $"tc.term".as("term"),
          $"tc.tf".cast("long").as("tf"))
    val fx = fixture.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (df <- Seq(fx, real)) {
      val n = nativeForm(df)
      val e = explodeForm(df)
      assert(n.count() == e.count())
      assert(n.except(e).isEmpty && e.except(n).isEmpty)
    }
  }

  test("tokenCount and tokenStats equal the split/array_distinct forms " +
    "on fixture edges and real docs") {
    val fx = Seq((1L, ""), (2L, " "), (3L, "a"), (4L, "a b"),
      (5L, "a  b"), (6L, "a b "), (7L, " a b"), (8L, "x y x y z x"),
      (9L, "é ü é"), (10L, "t t t t"))
      .toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    for (df <- Seq(fx, real)) {
      val got = df.select($"doc_id",
          TextExprs.tokenCount($"text").as("n"),
          TextExprs.tokenStats($"text").getField("n_tok").as("nt"),
          TextExprs.tokenStats($"text").getField("n_distinct").as("nd"))
        .as[(Long, Int, Int, Int)].collect()
        .map { case (a, b, c, d) => a -> (b, c, d) }.toMap
      val want = df.select($"doc_id",
          size(split($"text", " ")).as("n"),
          size(split($"text", " ")).as("nt"),
          size(array_distinct(split($"text", " "))).as("nd"))
        .as[(Long, Int, Int, Int)].collect()
        .map { case (a, b, c, d) => a -> (b, c, d) }.toMap
      assert(got == want)
    }
    // null text: both forms null
    val withNull = Seq((1L, Option("a b")), (2L, None)).toDF("doc_id", "text")
    assert(withNull.select(TextExprs.tokenCount($"text")).collect()
      .map(r => r.isNullAt(0)).toSeq == Seq(false, true))
  }

  test("native text exprs stay inside whole-stage codegen") {
    val plan = spark.range(5).select(
        TextExprs.langId(concat(lit("the x "), col("id")),
          TextAnalysis.LangMarkers).as("l"),
        TextExprs.rollingFp(col("id").cast("string")).as("f"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("lang_id")), plan)
  }
}
