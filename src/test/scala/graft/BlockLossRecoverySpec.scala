package graft

/** Regression pin for the session-long memoized artifacts (5-gram span
  * index, bigram-NLL tree, trained BPE vocab): losing every cached block
  * mid-session — an evicted executor, dynamic deallocation, or another
  * suite's deliberate wipe (DedupSpec's reliable-storage test) — must
  * mean "recompute through retained lineage", never a dead query. The
  * localCheckpoint formulation these caches originally used failed
  * exactly here: truncated lineage turned any block loss into
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND for every downstream query of the
  * session (observed as a cross-suite flake in round 6).
  */
class BlockLossRecoverySpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def run(q: String): Seq[String] =
    SparkEntry.queries(q)(spark, d).collect()
      .map(_.toString).sorted.toSeq

  test("memoized artifacts survive losing every cached block") {
    // one query per memoized artifact: span-digest index, bigram-NLL
    // tree, trained BPE vocab, and the iterative graph memos (whose
    // persisted levels must recompute through lineage — a checkpoint
    // formulation here dies exactly like the round-6 flake)
    // q_auc / q_welch_ttest exercise the cached scored-and-labeled
    // corpus memo the eval family shares (round 10) — the memo that
    // re-observed this flake when first written as a localCheckpoint
    // q_bm25 exercises the bm25_base memo — a parquet landing since
    // round 10 (its original localCheckpoint form died exactly here)
    // q_conformal runs THREE sequential actions over the scored memo
    // (bucket rollup → one-bucket refinement → coverage count), so a
    // block wipe between its passes is exactly the mid-query loss a
    // shrinking cluster produces; q_mcc and q_llr_colloc cover the
    // same memo's 2×2 fold and the bigram_counts parquet landing
    // q_rbo_overlap consumes the bm25_base memo through TopKPerKey +
    // two rank windows; q_hill_tail is a driver fold over a bounded
    // top-51 collect whose corpus pass must replay cleanly after the
    // wipe (round-10 verdict item 7 roster sweep)
    // r12 roster sweep (round-11 verdict item 8): the r11-rewritten
    // forms join the roster — q_winnowing (native WinnowExpr kernel;
    // zero-shuffle, must be cache-independent by construction), the
    // five two-level-IVF consumers (whose coarse-quantizer/centroid
    // memos must recompute through lineage), q_softdedup_weights
    // (rides the persisted docSpans5 index), and q_ppl_buckets (the
    // r12 two-level rank rewrite over the ngram-NLL memo)
    // r13 roster sweep (round-12 verdict item 5): the r12-touched memo
    // consumers — q_ppl_buckets/q_ngram_lm now share ONE ngram
    // doc-level NLL rollup (both already in the roster, re-swept on
    // the shared form), and the newly-parameterized paths join it:
    // q_simhash_pairs (the SimhashBands constant path through
    // Dedup.simhashBands), q_rrf_fusion (the bm25_base memo consumed
    // through two rankers + the fusion join), and q_linkage_clusters
    // (grid-blocked JW edges through the per-iteration CC
    // materializations of duplicateClusters)
    val qs = Seq("q_bloom_decontam", "q_ngram_lm", "q_bpe_apply",
      "q_pagerank", "q_bfs_hops", "q_dup_survivors", "q_auc",
      "q_welch_ttest", "q_bm25", "q_conformal", "q_mcc",
      "q_llr_colloc", "q_rbo_overlap", "q_hill_tail",
      "q_winnowing", "q_ann_ivf", "q_ann_ivf_probe", "q_kmeans_embed",
      "q_semdedup", "q_knn_graph", "q_softdedup_weights",
      "q_ppl_buckets", "q_simhash_pairs", "q_rrf_fusion",
      "q_linkage_clusters")
    val before = qs.map(q => q -> run(q)).toMap // materializes the caches
    // simulate total executor-storage loss
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    for (q <- qs)
      assert(run(q) == before(q), s"$q changed after block loss")
  }
}
