package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID,
  * fingerprinting. All built from codegen'd built-ins (split/size/
  * transform/aggregate) — no UDFs — so they run inside whole-stage
  * codegen and scale linearly with document bytes; nothing here
  * shuffles.
  */
object TextAnalysis {

  /** Whitespace tokens. Single-space split keeps Spark and the DuckDB
    * oracle (`string_split(text, ' ')`) byte-identical; a BPE-ish
    * regex variant is [[bpeTokens]].
    */
  def tokens(text: Column): Column = split(text, " ")

  // r15: one-pass native byte scan (≡ size(split(text, " ")) — pinned
  // in TextExprsSpec); the split form materialized the token array via
  // Java regex just to count it
  def tokenCount(text: Column): Column =
    graft.functions.TextExprs.tokenCount(text)

  /** BPE-ish sub-word-ish tokenization: split on word/number/punct
    * boundaries (the regex family GPT-2's tokenizer pre-splits with).
    */
  def bpeTokens(text: Column): Column =
    filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), t => t =!= "")

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "in", "and", "is", "it", "that")

  /** Quality metrics (length / punctuation / stopword ratios) used for
    * corpus filtering.
    */
  def withQuality(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks)
    // native single-pass token-set count (≡ the size(filter(..isin..))
    // HOF form, which evaluates interpreted — TextExprsSpec pins equality)
    val stopHits = graft.functions.TextExprs.tokenSetCount(text, Stopwords)
    val punct = length(text) - length(regexp_replace(text, "[.,;:!?]", ""))
    df.withColumn("n_chars_m", length(text))
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        graft.util.Tables.r((length(text) - (nTok - 1)).cast("double") / nTok, 6))
      .withColumn("stopword_ratio",
        graft.util.Tables.r(stopHits.cast("double") / nTok, 6))
      .withColumn("punct_count", punct)
  }

  /** Marker-word sets per language for the n-gram/stopword language-ID
    * heuristic. Real-world lists; scoring is hit-count per set.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "es", "una", "y"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** Language ID: argmax of marker hits, ties and zero-hit docs → "und"
    * (undetermined), per BCP-47 convention. Native one-pass scorer
    * ([[graft.functions.LangIdExpr]]); [[langIdHof]] is the builtin-HOF
    * cross-check form.
    */
  def langId(text: Column): Column =
    graft.functions.TextExprs.langId(text, LangMarkers)

  /** HOF formulation of [[langId]] — 5 interpreted token-filters per doc;
    * kept as the semantic reference (TextExprsSpec: langId ≡ langIdHof).
    */
  def langIdHof(text: Column): Column = {
    val toks = tokens(text)
    // struct ordering = (score, -idx): max score wins, earliest language
    // in LangMarkers order breaks ties.
    val scored = LangMarkers.zipWithIndex.map { case ((lang, markers), idx) =>
      struct(
        size(filter(toks, t => t.isin(markers: _*))).as("score"),
        lit(-idx).as("nidx"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best("score") > 0, best("lang")).otherwise(lit("und"))
  }

  /** PII scrub for a training corpus: redact email addresses and
    * long digit runs (phone-ish) with typed placeholders. Pure
    * codegen'd regexp_replace — RE2-compatible patterns so any engine
    * (and the DuckDB oracle) applies the identical rewrite.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val DigitRunPattern = "[0-9][0-9 ()-]{6,}[0-9]"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      DigitRunPattern, "<NUMBER>")

  /** Corpus-ingest text normalization: zero-width characters removed
    * (U+200B/200C/200D and the BOM — copy-paste artifacts that break
    * exact dedup), Unicode NFC canonical composition (native codegen'd
    * expression, [[graft.functions.NfcNormalizeExpr]]), then every run
    * of C0 controls / spaces / DEL collapsed to a single space and the
    * result trimmed. Order matters: zero-width strip precedes NFC so a
    * zero-width char can't sit between a base char and its combining
    * mark; NFC precedes the collapse so composition sees original
    * codepoints.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      graft.functions.TextExprs.nfcNormalize(
        regexp_replace(text, "[\u200B\u200C\u200D\uFEFF]", "")),
      "[\\x00-\\x20\\x7F]+", " "))

  /** Document fingerprint: hash of the whitespace-normalized, lowercased
    * text. md5 so the DuckDB oracle reproduces it bit-for-bit.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Corpus-level TF-IDF: one row per (doc, term) with term frequency,
    * document frequency and tf·idf (idf = ln(N/df)). Unlike the other
    * ops in this object this is a corpus aggregation and shuffles —
    * but only pre-aggregated keys: tf shuffles (doc_id, term) with
    * map-side partials, df shuffles the vocabulary (term), and the
    * corpus size N joins in as a broadcast scalar, so nothing here
    * grows super-linearly at 100 TB.
    */
  def tfidf(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // tf is a row-local fact (all of a document's tokens live in its
    // row): the native one-pass term_counts kernel computes it inside
    // the scan, so the only shuffles left are the genuinely corpus-wide
    // ones — document frequency by term, and whatever the caller does
    // per doc downstream. The explode → groupBy(doc, term) form this
    // replaces shuffled every (doc, term) pair first, the largest
    // intermediate in the whole query.
    val tf = docs
      .select(id.as("doc_id"),
        explode(graft.functions.TextExprs.termCounts(text)).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
  }

  /** Inverted index: token → sorted posting list of the documents that
    * contain it, plus the document frequency.
    *
    * `maxDf` is the 100 TB guard: a head-of-vocabulary (stopword) term's
    * posting list grows with the corpus and would materialize an
    * unboundedly wide aggregation row. With `maxDf` set, document
    * frequencies are aggregated FIRST (counts only — always bounded),
    * terms over the cap are dropped, and posting lists are collected
    * only for surviving terms via a token-co-partitioned shuffle-hash
    * join — the degenerate term's postings are never built at all
    * (InvertedIndexGuard spec). Without it (fixture/spec use) the
    * single-agg form applies.
    */
  def invertedIndex(docs: DataFrame, id: Column, text: Column,
                    maxDf: Option[Int] = None): DataFrame = {
    // per-row array_distinct replaces the corpus-wide distinct(): a
    // document contributes each token once by construction, so the
    // (doc, token) dedup never needs its own shuffle
    val tok = docs.select(id.as("doc_id"),
      explode(array_distinct(tokens(text))).as("token"))
    maxDf match {
      case None =>
        tok.groupBy(col("token"))
          .agg(count(lit(1)).as("df"),
            sort_array(collect_list(col("doc_id"))).as("postings"))
      case Some(cap) =>
        val keep = tok.groupBy(col("token"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
        // keep is vocabulary-sized: shuffle-hash join on token, which
        // co-partitions with the collect aggregation's own exchange
        tok.join(keep.hint("shuffle_hash"), "token")
          .groupBy(col("token"))
          .agg(max(col("df")).as("df"),
            sort_array(collect_list(col("doc_id"))).as("postings"))
    }
  }

  /** Rolling (Rabin-Karp polynomial) fingerprint over the character
    * stream: h = fold(h*31 + code) mod 1e9+7 — the incremental-hash
    * family used for shingle windows; exact BIGINT arithmetic, so any
    * engine reproduces it. Native one-pass code-point fold
    * ([[graft.functions.RollingFpExpr]]); [[rollingFingerprintHof]] is
    * the builtin cross-check.
    */
  def rollingFingerprint(text: Column): Column =
    graft.functions.TextExprs.rollingFp(text)

  /** HOF formulation of [[rollingFingerprint]]: folds over
    * `split(text, "")` (one fragment per code point) rather than indexing
    * with `substr(i, 1)` — per-index substring is O(position) on UTF8
    * bytes, quadratic per document. Interpreted lambda per char; kept as
    * the semantic reference (TextExprsSpec: native ≡ HOF).
    */
  def rollingFingerprintHof(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => c =!= ""),
      lit(0L),
      (h, c) => (h * 31 + ascii(c)) % 1000000007L)
}
