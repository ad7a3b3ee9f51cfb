package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the merge
  * loop behind GPT-2-family vocabularies (Sennrich et al. 2016).
  *
  * The scale insight: after the initial corpus pass, BPE training never
  * touches the corpus again — it iterates on the WORD-FREQUENCY table
  * (distinct word, count), which is vocabulary-sized. So the 100 TB
  * corpus is read once (explode → count by word, the only corpus-scale
  * shuffle), and each merge round is: adjacent-symbol pair counts
  * weighted by word frequency (a vocab-sized explode + agg), top-1
  * merge to the driver (one row — the k-means-centroid pattern), and a
  * per-word symbol-array rewrite (a narrow map). The evolving vocab
  * table is persisted (MEMORY_AND_DISK) per round: each round's plan
  * references the previous round's cached table, so no round recomputes
  * earlier rounds, while lineage is retained — a lost cached block
  * (evicted executor, dynamic deallocation) recomputes through the
  * chain instead of killing the trained-vocab artifact, which callers
  * memoize for a whole session. For merge counts in the tens of
  * thousands the lineage chain itself gets deep — at that scale write
  * the vocab to reliable storage every few hundred rounds (the
  * duplicateClusters materializePath pattern) to re-root it.
  *
  * Merge application is the classic greedy left-to-right fold: scanning
  * symbols in order, a (p1,p2) adjacency merges when the accumulator's
  * LAST symbol is p1 and the next is p2 — so a run "a a a a" under
  * merge (a,a) becomes "aa aa", exactly the non-overlapping semantics
  * of reference BPE trainers. The fold is a builtin `aggregate` HOF —
  * interpreted, but it runs on the vocab table, never the corpus.
  *
  * @return the merge table (step, p1, p2, weight): merge `step` joined
  *         symbols p1+p2, which co-occurred adjacently with total
  *         corpus frequency `weight`
  */
object BpeTrainer {
  def train(docs: DataFrame, text: Column, merges: Int): DataFrame =
    trainWithVocab(docs, text, merges)._1

  /** [[train]] plus the post-merge vocabulary (word, cnt, syms) — the
    * artifact the APPLY side joins against: tokenizing a corpus with a
    * trained BPE never re-runs merges per document, it broadcasts the
    * vocab→symbols map (vocabulary-sized) onto the word stream.
    */
  def trainWithVocab(docs: DataFrame, text: Column,
                     merges: Int): (DataFrame, DataFrame) = {
    require(merges >= 1)
    val spark = docs.sparkSession
    val words = docs.select(explode(TextAnalysis.tokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // seed symbols = characters (split("", ...) keeps a "" element for
    // empty words — filter to the empty array instead)
    var vocab = words.select(col("w"), col("cnt"),
        filter(split(col("w"), ""), s => s =!= "").as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    // previous round's cached vocab: unpersisted (non-blocking) once the
    // current round's cache is materialized by the collect below, so the
    // session pins at most two vocab copies instead of one per merge round
    // (lineage retention still allows recompute on block loss)
    var prev: DataFrame = null
    while (step <= merges && !exhausted) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("cnt"), col("syms"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
        .select(element_at(col("syms"), col("i")).as("p1"),
          element_at(col("syms"), col("i") + 1).as("p2"), col("cnt"))
        .groupBy(col("p1"), col("p2")).agg(sum(col("cnt")).as("wt"))
        .orderBy(col("wt").desc, col("p1"), col("p2"))
        .limit(1).collect()
      if (prev != null) { prev.unpersist(false); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val r = top.head
        val (p1, p2, wt) = (r.getString(0), r.getString(1), r.getLong(2))
        out += ((step, p1, p2, wt))
        val fold = aggregate(
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), 1, 1),
          (acc, x) => when(element_at(acc, -1) === lit(p1) && x === lit(p2),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(p1 + p2))))
            .otherwise(concat(acc, array(x))))
        prev = vocab
        vocab = vocab.withColumn("syms", fold)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        step += 1
      }
    }
    (spark.createDataFrame(out.toSeq).toDF("step", "p1", "p2", "weight"),
      vocab)
  }
}
