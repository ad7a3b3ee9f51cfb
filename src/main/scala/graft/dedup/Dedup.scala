package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Deduplication operators for a training-data corpus (`documents`):
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Hash-function choice: md5 (not Spark's `hash`/`xxhash64`) wherever the
  * DuckDB oracle must reproduce values bit-for-bit; minhashes are
  * lexicographic minima of md5 hex strings, which every engine compares
  * identically.
  *
  * Scale design (100 TB corpus):
  *  - exact dedup = one hash-shuffle on a 32-byte key (group by digest,
  *    keep min id) — the grouping key is the md5, never the document text.
  *  - MinHash/LSH: per-doc signatures are a narrow map (no shuffle);
  *    candidate generation shuffles on *band signature* so only docs
  *    sharing a band collide — the O(n²) pair space is never materialized.
  *  - verification (exact Jaccard) runs only on LSH candidates.
  */
object Dedup {

  /** Word shingles (n-gram tokens joined by a space) as an array column.
    * Distinct-ified set form for Jaccard/minhash.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
  }

  /** Exact dedup: keep the lowest doc id per content digest.
    * Returns (dup_id, kept_id) for every row that would be removed.
    */
  def exactDuplicates(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val keyed = docs.select(id.as("doc_id"), md5(text).as("digest"))
    val w = Window.partitionBy(col("digest"))
    keyed
      .withColumn("kept_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") =!= col("kept_id"))
      .select(col("doc_id").as("dup_id"), col("kept_id"))
  }

  /** MinHash signature: for seed s, sig(s) = min over shingles of
    * md5(s || '|' || shingle) — a lexicographic min of hex strings, which
    * is a valid min-wise hash family and engine-portable.
    */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    array((0 until numHashes).map { s =>
      array_min(transform(shingles(text, n),
        sh => md5(concat(lit(s.toString), lit("|"), sh))))
    }: _*)

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * hashes; band key = md5 of the concatenated band. Docs sharing any
    * band key are candidates.
    * Returns (band_idx, band_key, doc_id) — group/self-join on
    * (band_idx, band_key) to get candidate pairs.
    */
  def lshBands(docs: DataFrame, id: Column, text: Column, n: Int,
               bands: Int, rowsPerBand: Int): DataFrame = {
    val sig = minhashSignature(text, n, bands * rowsPerBand)
    docs.select(id.as("doc_id"), sig.as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => md5(array_join(slice(col("sig"), b * rowsPerBand + lit(1),
            lit(rowsPerBand)), "")))).as(Seq("band_idx", "band_key")))
  }

  /** Candidate near-dup pairs from LSH: docs sharing ≥1 band. The
    * self-join shuffles on band key only — at 100 TB this is the step
    * that replaces the quadratic all-pairs compare.
    */
  def lshCandidatePairs(bandsDf: DataFrame): DataFrame = {
    val a = bandsDf.as("a")
    val b = bandsDf.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact shingle-set Jaccard for a pair DataFrame carrying both texts. */
  def jaccard(aText: Column, bText: Column, n: Int): Column = {
    val sa = shingles(aText, n)
    val sb = shingles(bText, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - size(array_intersect(sa, sb)))
  }

  /** SimHash fingerprint (16-bit, engine-portable): token hash bits come
    * from the high bit of each of the first 16 nibbles of md5(token);
    * fingerprint bit b = 1 iff the weighted vote over tokens is positive.
    */
  def simhash16(text: Column): Column = {
    val toks = array_distinct(TextAnalysis.tokens(text))
    val bitCols = (0 until 16).map { b =>
      // vote_b(token) = +1 if high bit of nibble b set (hex char in 8..f)
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc +
          when(instr(lit("89abcdef"),
            substring(md5(t), b + 1, 1)) > 0, 1).otherwise(-1))
      when(votes > 0, lit(1 << b)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming16(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
