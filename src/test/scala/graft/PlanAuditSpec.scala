package graft

/** Executable plan-shape audit for the scale-critical queries: the
  * properties that make these plans survive a 100×/1000× scale-up are
  * asserted against the actual physical plans, not just claimed in
  * comments — a regression that reintroduces a cartesian product, drops
  * a broadcast hint, loses column pruning, or re-materializes the LSH
  * pipeline on both join sides fails CI here.
  */
class PlanAuditSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("no nested-loop/cartesian joins anywhere in the join-family plans") {
    for (q <- Seq("q_asof_join", "q_range_join", "q_embed_neardup",
        "q_ann_ivf", "q_ann_ivf_probe", "q_lsh_pairs", "q_jaccard_pairs")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoop") &&
        !p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q_scan_project: column-pruned parquet scan") {
    val p = plan("q_scan_project")
    // events has (event_id, ts, user_id, value, props) — props/user_id
    // must not be read for a 3-column projection
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("props"), s"unpruned scan:\n$p")
  }

  test("q1_agg: shipdate filter reaches the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"), s"filter not pushed:\n$p")
  }

  test("q3: dimension broadcast + top-k as TakeOrderedAndProject") {
    val p = plan("q3_top_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_topk: TakeOrderedAndProject, never a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort "), p)
  }

  test("q_window_mean: map-side partial vec_mean before one exchange") {
    val p = plan("q_window_mean")
    val partialIdx = p.indexOf("partial_vec_mean")
    assert(partialIdx >= 0, s"no map-side partial aggregation:\n$p")
    // partial agg must sit BELOW the exchange (later in the tree print)
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial agg not below the exchange:\n$p")
  }

  test("q_spectrum_calibrate: matrix built once, bitmap gates before it") {
    val p = plan("q_spectrum_calibrate")
    // exactly ONE synthSpectrum call site in the whole plan — the
    // stacked-Generate form duplicated the full matrix build into an
    // inferred filter (11× DuckDB in BENCH_r02)
    val hits = "synthSpectrumMatrix".r.findAllIn(p).size
    assert(hits == 1, s"matrix construction appears $hits times:\n$p")
    assert("Generate ".r.findAllIn(p).size == 2, p) // channel + point
  }

  test("q_lsh_pairs: bands materialized — documents scanned on no side") {
    val p = plan("q_lsh_pairs")
    assert(!p.contains("documents.parquet"),
      s"join side recomputes the shingle pipeline:\n$p")
  }

  test("q_priority_exists: lineitem pre-aggregated below an equi hash join") {
    val p = plan("q_priority_exists")
    // the EXISTS is answered from max(l_shipdate) per order: a partial
    // HashAggregate must collapse lineitem BEFORE any join, and the join
    // must be hash-based on the order key — no sort-merge, no
    // nested-loop fallback for the (now post-join) date predicate
    val joinIdx = math.max(p.indexOf("BroadcastHashJoin"),
      p.indexOf("ShuffledHashJoin"))
    assert(joinIdx >= 0, s"no hash join:\n$p")
    val aggIdx = p.indexOf("partial_max(l_shipdate")
    assert(aggIdx >= 0, s"lineitem not pre-aggregated:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q_topk_per_key: custom exec with one hash exchange, no window sort") {
    val p = plan("q_topk_per_key")
    assert(p.contains("TopKPerKey"), p)
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_span_dedup: exchanges carry md5 digests, never raw span text") {
    val p = plan("q_span_dedup")
    // every hash exchange keys on the fixed-width digest k or doc_id —
    // a raw 8-word span as a shuffle key is the 100 TB scale-killer
    assert(!p.contains("hashpartitioning(span"), s"raw-text shuffle key:\n$p")
    assert(p.contains("hashpartitioning(k#"), p)
    // the doc-keyed totals ⨝ unique-owner rollup (r11 join-free span
    // attribution: both sides ≈ one row per doc, still
    // corpus-proportional) stays a co-partitioned shuffle-hash join,
    // never broadcast
    assert(p.contains("ShuffledHashJoin"), s"doc rollup side not shuffled:\n$p")
  }

  test("q_substring_dedup: exchanges carry md5 digests, never chunk text") {
    val p = plan("q_substring_dedup")
    // CDC chunk text must never key a shuffle — only the 128-bit digest
    // k and doc_id partition the exchanges (the q_span_dedup rule)
    assert(!p.contains("hashpartitioning(chunk"),
      s"raw-chunk shuffle key:\n$p")
    assert(p.contains("hashpartitioning(k#"), p)
    // the occurrence-count side (≈ one row per distinct chunk) is
    // corpus-sized: co-partitioned shuffle-hash join, never broadcast
    assert(p.contains("ShuffledHashJoin"), s"occ side not shuffled:\n$p")
  }

  test("q_line_dedup: exchanges carry md5 digests, df side shuffle-hash") {
    val p = plan("q_line_dedup")
    // frequency groupBy and join-back key on the fixed-width digest —
    // a raw 4-word line as a shuffle key is the same 100 TB
    // scale-killer as raw spans in q_span_dedup
    assert(!p.contains("hashpartitioning(line"),
      s"raw-text shuffle key:\n$p")
    assert(p.contains("hashpartitioning(k#"), p)
    // the line-frequency side (≈ one row per distinct line) is
    // corpus-sized: co-partitioned shuffle-hash join, never broadcast
    assert(p.contains("ShuffledHashJoin"), s"df side not shuffled:\n$p")
  }

  test("q_contaminate_ratio: benchmark digest set broadcasts") {
    val p = plan("q_contaminate_ratio")
    // the eval-suite side must arrive as a broadcast probe — shuffling
    // the corpus-side token stream against it is the 100 TB mistake
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("hashpartitioning(sh"), s"raw shingle shuffle:\n$p")
  }

  test("q_bloom_decontam: bloom probe filters the scan, verify join shuffles") {
    val p = plan("q_bloom_decontam")
    // the membership probe must sit in a Filter BELOW the verify join —
    // that's the whole point: only the fp fraction reaches the exchange
    assert(p.contains("bloom_might_contain"), s"probe not in plan:\n$p")
    // benchmark digests arrive via the co-partitioned shuffle-hash join
    // (the 100 TB premise: too big to broadcast as a hash table)
    assert(p.contains("ShuffledHashJoin"), s"verify join not shuffled:\n$p")
  }

  test("q_ngram_lm: bigram pipeline materialized once, unigram side broadcast") {
    val p = plan("q_ngram_lm")
    // bi and biC are persisted: all three references (bi join-back, biC
    // bigram join, uniC unigram rollup over biC) must read the cache as
    // InMemoryTableScan — the round-5 plan recomputed the
    // scan→explode→agg tree once per reference instead. (The parquet
    // path string still appears in the print, inside the
    // InMemoryRelation recipe subtrees, so don't assert on it.)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      s"bigram pipeline not served from cache on every reference:\n$p")
    // the unigram rollup is explicitly broadcast so the (w1,w2)-keyed
    // join result never reshuffles onto w1
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_ann_batch: query table broadcast, custom top-k, no window sort") {
    val p = plan("q_ann_batch")
    // 5-row query side broadcasts onto the bucketed corpus; per-query
    // top-k runs through TopKPerKey, never a WindowExec partition sort
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
  }

  test("q_bpe_apply: trained vocab broadcasts onto the word stream") {
    val p = plan("q_bpe_apply")
    // the apply side is a broadcast hash join of the vocab→symbols map;
    // a sort-merge join here would shuffle the full word stream by word
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_kmv_distinct: sketch partials aggregate map-side") {
    val p = plan("q_kmv_distinct")
    // the token/span stream must collapse to k-long sketches BEFORE any
    // exchange — partial kmv_sketch below the shuffle
    assert(p.contains("partial_kmv_sketch"), s"no map-side partials:\n$p")
  }

  test("q_kmv_overlap: both sketch sides aggregate map-side; no " +
      "vocabulary materializes") {
    val p = plan("q_kmv_overlap")
    // the shingle stream collapses to k-long sketches BELOW the
    // exchange on both join inputs; the exact query's collect_set
    // vocabularies must not appear anywhere in this plan
    assert(p.contains("partial_kmv_sketch"), s"no map-side partials:\n$p")
    assert(!p.contains("collect_set"), s"full vocabulary crept in:\n$p")
  }

  test("q_sample_quantiles: sample partials aggregate map-side, " +
      "no window sort") {
    val p = plan("q_sample_quantiles")
    // the per-group uniform sample must ride the aggregation layer —
    // k pairs per map-side partial below ONE exchange, not a
    // WindowExec row_number sort of every group
    assert(p.contains("partial_hash_sample"), s"no map-side partials:\n$p")
    assert(!p.contains("Window"), s"window sort crept in:\n$p")
    assert(p.sliding(8).count(_ == "Exchange") <= 1, s"extra exchange:\n$p")
  }

  test("q_hll_distinct: register build partial-aggregates map-side") {
    val p = plan("q_hll_distinct")
    // groupBy(reg).max(rank) must show partial max BELOW the exchange —
    // each map task emits at most m=512 (reg, rank) pairs, so the
    // register shuffle is O(m) per partition at ANY corpus size
    assert(p.contains("partial_max") || p.contains("partial, [max") ||
      p.toLowerCase.contains("partial_max(rank"),
      s"no map-side register partials:\n$p")
    // raw span text must never be a partitioning key (only the 48-bit
    // hash and the 9-bit register index shuffle)
    assert(!p.contains("hashpartitioning(sp"), s"raw-span shuffle:\n$p")
  }

  test("q_partitioned_prune: partition filter prunes at planning time") {
    val p = plan("q_partitioned_prune")
    // the lang predicate must be a PartitionFilter on the scan (pruned
    // to the lang=en directories), never a post-scan row filter
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"), s"lang not a partition filter:\n$p")
  }

  test("q_curation_pipeline: digest-keyed shuffles, benchmark broadcast") {
    val p = plan("q_curation_pipeline")
    assert(!p.contains("BroadcastNestedLoop") &&
      !p.contains("CartesianProduct"), s"pathological join:\n$p")
    // line-frequency and dedup-window exchanges key on digests or ids;
    // raw line/span text must never be a partitioning key
    assert(!p.contains("hashpartitioning(line"), s"raw-line shuffle:\n$p")
    assert(!p.contains("hashpartitioning(sp"), s"raw-span shuffle:\n$p")
    // the benchmark span digest set arrives broadcast at the decontam
    // join, never shuffling the corpus span stream against it
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_cms_topk: grid partials map-side, sketch row broadcast") {
    val p = plan("q_cms_topk")
    // the token stream collapses to depth×width grids BEFORE any
    // exchange; the 1-row sketch reaches the probe side as a broadcast
    assert(p.contains("partial_cms_sketch"), s"no map-side partials:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"sketch not broadcast:\n$p")
  }

  test("q_stride / q_min_key: scalar probes broadcast, no global sort") {
    for (q <- Seq("q_stride", "q_ttl_surviving")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("GlobalLimit") || !p.contains("Sort "), s"$q:\n$p")
    }
  }

  test("q_scd2: one user_id exchange feeds all three window passes") {
    // hashpartitioning(user_id) satisfies the (user_id, event_type)
    // window's clustering too — a second exchange here would mean the
    // islands trick lost its single-shuffle property
    val p = plan("q_scd2")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 1, s"want exactly 1 hash exchange, got $n:\n$p")
    assert(!p.contains("Join"), s"scd2 must be join-free:\n$p")
  }

  test("q_range_window / q_anomaly_zscore: single exchange, join-free") {
    for (q <- Seq("q_range_window", "q_anomaly_zscore")) {
      val p = plan(q)
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(n == 1, s"$q: want exactly 1 hash exchange, got $n:\n$p")
      assert(!p.contains("Join"), s"$q must be join-free:\n$p")
    }
  }

  test("q_column_stats: pruned per-column aggs, no Expand inflation") {
    // each union branch scans exactly one column (pruned) and
    // two-level-aggregates it; the old single-scan Expand form
    // inflated every row 6× before the partials (1.9 s vs 0.5 s)
    val p = plan("q_column_stats")
    assert(!p.contains("Expand"), s"Expand-based distinct crept back:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 6, s"want 6 pruned scans, got $scans:\n$p")
  }

  test("q_triangles: wedge + closure joins are hash-based equi joins") {
    // the only nested-loop joins allowed are the final 1-row scalar
    // stat assembly (crossJoin of three single-row aggregates); the
    // corpus-scale wedge self-join and semi closure must be equi joins
    val p = plan("q_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftSemi"), s"no semi closure join:\n$p")
    val semiLine = p.linesIterator.find(_.contains("LeftSemi")).get
    assert(semiLine.contains("HashJoin") || semiLine.contains("SortMergeJoin"),
      s"closure join not hash-based:\n$semiLine")
  }

  test("q_compaction_plan: no cartesian, window over the manifest only") {
    val p = plan("q_compaction_plan")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    // the bin-assignment window must sit ABOVE the (source, lang)
    // aggregation — sorting the manifest, never the document corpus
    val winIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window not above the manifest aggregate:\n$p")
  }

  test("q_editdist_join: candidate join keys are md5 digests") {
    // the variant self-join must shuffle 128-bit digests, not raw
    // variant strings (the q_span_dedup rule), and the exact
    // levenshtein verify must sit above the join, not below it
    val p = plan("q_editdist_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("ShuffledHashJoin"), s"candidate join not hashed:\n$p")
  }

  test("q_concurrency: corpus-scale windows are bucket-partitioned") {
    // exactly one single-partition exchange is allowed — the
    // bucket-offset prefix scan over the hour-bucket table; the delta
    // running sum must be partitioned by bucket
    val p = plan("q_concurrency")
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    assert(singles <= 1, s"want ≤1 single-partition exchange, got $singles:\n$p")
    assert(p.contains("Window [") || p.contains("Window ("), p)
  }

  test("q_bucketed_join: join is exchange-free over bucketed scans") {
    // the whole point of the bucketed layout: the only hash exchange in
    // the plan is the post-join priority aggregation; the join itself
    // reads co-partitioned bucket scans (local per-bucket sorts remain
    // — Spark ≥3 doesn't trust written sort order, SPARK-28595 — but
    // no data crosses the network)
    val p = plan("q_bucketed_join")
    assert(p.contains("SortMergeJoin"), s"not a merge join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"want 1 exchange (the agg), got $exchanges:\n$p")
    assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
  }

  test("q_salted_join: dim replicated via explode before its join") {
    val p = plan("q_salted_join")
    assert(p.contains("Generate explode"), s"no explode replication:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_snapshot_peaks: per-serial argmax aggregates map-side, no sort") {
    val p = plan("q_snapshot_peaks")
    // the current-frame pick is a partial max_by before ONE exchange —
    // never a per-serial window sort of the whole stream
    assert(p.contains("partial_max_by") || p.contains("partial_maxby") ||
      (p.contains("max_by") && p.contains("HashAggregate")), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"want 1 exchange, got $exchanges:\n$p")
    assert(!p.contains("Window "), s"window sort crept in:\n$p")
  }

  test("q_snapshot_spectrum: latest frame via broadcast max-key, no sort") {
    val p = plan("q_snapshot_spectrum")
    // the snapshot moment is a 1-row broadcast max-key probe — never a
    // global range-sort (which would carry every row's synthesized
    // matrix through an exchange); power-cal joins broadcast
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort crept in:\n$p")
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("Sort ["),
      s"sort-based latest pick:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    // the max-key filter must gate the scan BEFORE the matrix is built:
    // the synth call appears exactly once outside the probe side
    assert("synthSpectrumMatrix".r.findAllIn(p).size <= 2, p)
  }

  test("r9 barrier queries: one corpus pass behind the stage barrier") {
    // q_rfm rolls events up once, q_concurrency sessionizes events
    // once — each behind a lazy localCheckpoint whose consumers all
    // read the barrier. A regression that drops the barrier
    // re-introduces parquet scans of the base table into the final
    // plan and fails here.
    for ((q, tbl) <- Seq(("q_rfm", "events"), ("q_concurrency", "events"))) {
      val p = plan(q)
      assert(p.contains("Scan ExistingRDD"),
        s"$q lost its stage barrier:\n$p")
      assert(!p.contains(s"$tbl.parquet"),
        s"$q re-scans $tbl around the barrier:\n$p")
    }
    // q_rrf_fusion's barrier is the bm25_base SESSION memo — since
    // round 10 a cache() with retained lineage (storage-loss-proof,
    // unlike the localCheckpoint it replaced: blocks lost → the
    // tokenize pass recomputes instead of killing the session), so
    // its four consumers read InMemoryTableScan; the only
    // documents.parquet occurrences are the cached plan's own subtree
    // printed INSIDE each InMemoryRelation, never a live re-scan
    val p = plan("q_rrf_fusion")
    assert(p.contains("InMemoryTableScan"),
      s"q_rrf_fusion lost the bm25_base cache:\n$p")
    // the cached plan itself: one documents pass, tokenize + project.
    // When another suite already warmed the memo, the cache manager
    // substitutes the InMemoryRelation into this fresh plan too (its
    // AQE recipe prints the scan once per plan section) — the cache
    // serving IS the one-pass property in that case.
    val inner = graft.queries.PipelineQueries.bm25BasePlan(spark, d)
      .queryExecution.executedPlan.toString
    if (inner.contains("InMemoryTableScan"))
      assert("InMemoryTableScan".r.findAllIn(inner).length == 1, inner)
    else
      assert("documents\\.parquet".r.findAllIn(inner).length == 1,
        s"bm25 base is not one corpus pass:\n$inner")
  }

  test("q_prefix_join: equi-joined candidates off one shingle barrier, " +
      "never all-pairs; consumers read the session memo") {
    // the UNDERLYING pair computation (what the memo lands once per
    // session): candidates from an equi join on the prefix token — a
    // cartesian/nested-loop anywhere is the all-pairs collapse the
    // prefix filter exists to avoid
    val inner = graft.queries.PipelineQueries
      .prefixJoinPairsForAudit(spark, d)
      .queryExecution.executedPlan.toString
    assert(!inner.contains("CartesianProduct") &&
      !inner.contains("BroadcastNestedLoop"), s"all-pairs join:\n$inner")
    // shingle arrays materialize once behind the barrier; rank, verify-a
    // and verify-b all read it instead of re-scanning documents
    assert(inner.contains("Scan ExistingRDD"),
      s"lost the shingle barrier:\n$inner")
    assert(!inner.contains("documents.parquet"),
      s"re-scans documents around the barrier:\n$inner")
    // the exposed query serves the memoized parquet landing: a plain
    // file scan of the artifact, never a recompute per consumer
    val p = plan("q_prefix_join")
    assert(p.contains("prefix_pairs-") && !p.contains("documents.parquet"),
      s"not serving the session memo:\n$p")
  }

  test("q_source_overlap: exchanges carry span digests, never raw spans") {
    val p = plan("q_source_overlap")
    // distinct + self-join key on the md5 digest h — a raw 8-word span
    // as a shuffle key is the q_span_dedup 100 TB scale-killer
    assert(!p.contains("hashpartitioning(span"),
      s"raw-text shuffle key:\n$p")
    // distinct exchanges key on (source, digest); the self-join keys on
    // the digest alone and is SHUFFLED-hash (r14: broadcasting the
    // corpus-sized distinct span table measured slower at sf0.1 and
    // cannot survive scale — the digest co-partition can)
    assert("hashpartitioning\\(source#\\d+, h#".r.findFirstIn(p).isDefined, p)
    assert("ShuffledHashJoin \\[h#".r.findFirstIn(p).isDefined, p)
  }

  test("q_lsh_recall: corpus joins are equi joins; nested loops only " +
      "combine the three 1-row aggregates") {
    val p = plan("q_lsh_recall")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // truth and funnel sides sit behind stage barriers (the band
    // equi-join's own shape is pinned by the q_lsh_pairs audit above)
    assert(p.contains("Scan ExistingRDD"), s"lost the stage barriers:\n$p")
    // the only nested loops are the scalar (count-row × count-row)
    // crossJoins assembling the single output row — every one sits
    // directly above single-partition aggregates, never corpus rows
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(nlj == 2, s"expected exactly the 2 scalar combines, got $nlj:\n$p")
  }

  test("q_rouge_pairs: gram stream never exists as rows — map kernels " +
      "in the row, one doc_id+1 join, zero aggregations") {
    val p = plan("q_rouge_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    // the per-doc gram multisets fold inside the row via the native
    // one-pass kernels; the clip reduces two maps per pair — so the
    // whole plan has NO aggregation operator and NO gram-keyed
    // exchange (the r9 shape shuffled the exploded gram stream twice
    // and self-joined it)
    assert(p.contains("gram_counts") && p.contains("map_clip_sum"),
      s"map kernels not in the plan:\n$p")
    assert(!p.contains("HashAggregate"),
      s"gram-level aggregation crept back:\n$p")
    // exactly one join: the consecutive-pair self-join of map rows
    assert("Join".r.findAllIn(p).size == 1, s"extra joins:\n$p")
    // the metric attach stays an explode, never a 2-row join
    assert(p.contains("Generate explode"), p)
  }

  test("q_bleu_pairs: shares the rouge map-kernel shape — gram maps " +
      "fold in the row, one doc_id+1 join, zero aggregations") {
    val p = plan("q_bleu_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("gram_counts") && p.contains("map_clip_sum"),
      s"map kernels not in the plan:\n$p")
    assert(!p.contains("HashAggregate"),
      s"gram-level aggregation crept back:\n$p")
    assert("Join".r.findAllIn(p).size == 1, s"extra joins:\n$p")
  }

  test("q_ndcg: in-row tf (no corpus-wide exchange), ONE TopKPerKey " +
      "prune for both rankings, rank window directly on the prune") {
    val p = plan("q_ndcg")
    // tf folds inside the row off the checkpointed base — the corpus
    // never shuffles on (doc_id, t); the only hash exchanges are the
    // 3-row df rollup, the (t, mode) prune, and the final per-term agg
    assert(!p.contains("hashpartitioning(doc_id"),
      s"corpus-wide tf exchange crept back:\n$p")
    // both rankings ride one mode-exploded prune + one rank window,
    // and the window reuses the prune's clustering (TopKPerKeyExec
    // propagates child partitioning) — no exchange between them
    val topk = "TopKPerKey 10".r.findAllMatchIn(p).map(_.start).toList
    val win = "Window \\[row_number".r.findAllMatchIn(p).map(_.start).toList
    assert(topk.size == 1 && win.size == 1,
      s"expected one prune + one rank window:\n$p")
    assert(win.head < topk.head, s"rank window below the prune:\n$p")
    val between = p.substring(win.head, topk.head)
    assert(!between.contains("Exchange"),
      s"survivors re-shuffled between prune and rank:\n$p")
    // the only nested loop is the 1-row corpus-stats broadcast (the
    // scalar st crossJoin this family shares with q_bm25)
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
    assert(p.contains("IdentityBroadcastMode"), p)
  }

  test("q_skipgrams: top-3 via TakeOrderedAndProject; pair pass is " +
      "join-free, window-free, exchange-free") {
    // the stop-word pick is a per-partition top-3 + 3-row merge — the
    // r9 shape's row_number over an UNPARTITIONED window planned a
    // single-partition WindowExec over the whole vocabulary
    val d3 = graft.queries.PipelineQueries.skipgramDrop3(spark, d)
      .queryExecution.executedPlan.toString
    assert(d3.contains("TakeOrderedAndProject"), d3)
    assert(!d3.contains("Window"), s"vocabulary window crept back:\n$d3")
    // the pair pass (behind the checkpoint in the final plan): the 3
    // collected stop-words gate a per-row array filter and neighbors
    // read adjacent slots in the same codegen stage — no join, no
    // window, and NO exchange until the downstream vocabulary² groupBy
    val p = graft.queries.PipelineQueries.skipgramLeadPairs(spark, d)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"token join crept back:\n$p")
    assert(!p.contains("Window"), s"window crept back:\n$p")
    // the only allowed exchange is parallelize()'s narrow round-robin
    // split unlock — no hash/single-partition shuffle in the pass
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange SinglePartition"), s"pair pass shuffles:\n$p")
  }

  test("q_image_dedup: payload bytes die at the decode stage — one " +
      "hash exchange of (media_id, ahash) partials") {
    val p = plan("q_image_dedup")
    // the only exchange is the ahash groupBy, keyed on the 8-byte hash;
    // BMP payloads must never be a shuffle key or cross an exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"want 1 exchange, got $exchanges:\n$p")
    assert(p.contains("hashpartitioning(ahash#"), p)
    assert(p.contains("partial_count") || p.contains("partial_min") ||
      p.contains("Partial"), s"no map-side partials:\n$p")
  }

  test("q_jaro_link: grid-blocked equi join — cell coords in the join " +
      "keys, no nested-loop fallback") {
    val p = plan("q_jaro_link")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    // the block join must key on the grid cell (blk, cx, cy) so a hot
    // leading token spreads across reducers (GridBlockedPairsSpec pins
    // the pair-set law; this pins the plan shape on the real query)
    assert(p.contains("Generate explode"), s"no grid replication:\n$p")
    assert("Join \\[blk#\\d+, cx#\\d+, cy#\\d+\\]".r.findFirstIn(p).isDefined ||
      ("cx#".r.findFirstIn(p).isDefined && "cy#".r.findFirstIn(p).isDefined),
      s"cell coords not in the join keys:\n$p")
  }

  test("q_containment: asymmetric prefix candidates off one shingle " +
      "barrier, equi joins only") {
    val p = plan("q_containment")
    // candidate generation must stay an equi join on the shingle token
    // (probe-side prefix vs full corpus stream) — a cartesian/nested
    // loop is the all-pairs collapse the asymmetric filter avoids
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"all-pairs join:\n$p")
    // shingle arrays materialize once; prefix, corpus stream and both
    // verify sides read the barrier instead of re-scanning documents
    assert(p.contains("Scan ExistingRDD"), s"lost the shingle barrier:\n$p")
    assert(!p.contains("documents.parquet"),
      s"re-scans documents around the barrier:\n$p")
  }

  test("q_linkage_clusters: survivorship is one aggregate over the " +
      "component map — no window sort, no nested loops") {
    val p = plan("q_linkage_clusters")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    // canonical-name pick is min(struct(-support, nm)) in the rollup,
    // never a per-cluster row_number window
    assert(!p.contains("Window"), s"window sort crept in:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("q_dsir_select: value-domain ln, broadcast log-ratio table, " +
      "TopKPerKey selection — no window, no corpus-side nested loops") {
    val p = plan("q_dsir_select")
    // the 256-row log-ratio table must arrive broadcast at the per-doc
    // join (shuffling the doc-bucket counts against it is the mistake),
    // and the per-source selection is the custom heap operator, never a
    // row_number window sort of the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), s"window sort crept in:\n$p")
    // the only nested-loop joins are the three 1-row scalar attaches
    // (target→bucket agg, target→totals, totals→log-ratio) — every one
    // builds a single-row side
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj <= 3, s"corpus-side nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the bucket aggregation over the token stream must appear ONCE:
    // exactly one exchange keyed on the bucket alone
    val bAgg = "Exchange hashpartitioning\\(b#\\d+, \\d+\\)".r
      .findAllIn(p).size
    assert(bAgg == 1, s"bucket agg ran $bAgg times:\n$p")
  }

  test("q_source_divergence: one vocab-bounded corpus rollup feeding a " +
      "≤256×|sources| collect; result is a local relation") {
    // the distributed half: exactly two exchanges — the (source, word)
    // count and the (source, bucket) fold — no joins, no windows, and
    // the md5 chain sits ABOVE the word-level aggregate (once per
    // distinct (source, word), never per token)
    val cp = queries.PipelineQueries.sourceBucketCounts(spark, d, 256)
      .queryExecution.executedPlan.toString
    assert(!cp.contains("Join") && !cp.contains("Window"), cp)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(cp).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$cp")
    // the bucket fold (partial_sum) sits ABOVE the word-level count
    // (partial_count), which sits ABOVE the explode: the md5 bucket is
    // computed in the word-agg's result projection — once per distinct
    // (source, word), never per token
    val bucketIdx = cp.indexOf("partial_sum")
    val wordAggIdx = cp.indexOf("partial_count")
    val explodeIdx = cp.indexOf("Generate explode")
    assert(bucketIdx >= 0 && wordAggIdx > bucketIdx &&
      explodeIdx > wordAggIdx,
      s"rollup levels out of order:\n$cp")
    // the pairwise JSD runs driver-side on the bounded collect — the
    // query result must be a pure local relation (no distributed work
    // re-runs when the result is consumed)
    val p = plan("q_source_divergence")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet"),
      s"value-domain work leaked back into the result plan:\n$p")
  }

  test("q_heaps_law: scan-side token mass + one corpus vocab exchange " +
      "into a 10-row collect; result is a local relation") {
    val cp = queries.PipelineQueries.heapsCurveInputs(spark, d, 100L)
      .queryExecution.executedPlan.toString
    // the token-mass branch must NOT explode (size(split()) on the scan
    // side) and the vocabulary branch is the only explode in the plan
    val generates = "Generate explode".r.findAllIn(cp).length
    assert(generates == 1, s"expected 1 explode, got $generates:\n$cp")
    assert(!cp.contains("CartesianProduct") &&
      !cp.contains("BroadcastNestedLoop"), cp)
    assert(!cp.contains("Window"), s"window sort crept in:\n$cp")
    // cumsums + OLS fit run driver-side on the 10-row collect
    val p = plan("q_heaps_law")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet"),
      s"fit work leaked back into the result plan:\n$p")
  }

  test("q_mrr: TopKPerKey prune, broadcast df, rank window only after " +
      "the prune") {
    val p = plan("q_mrr")
    assert(p.contains("TopKPerKey"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested loop is the 1-row stats attach
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj <= 1, s"corpus-side nested loop:\n$p")
    // the rank window must sit ABOVE the prune (earlier in the tree
    // print): a window below it would sort corpus-sized partitions
    val wIdx = p.indexOf("Window")
    val tkIdx = p.indexOf("TopKPerKey")
    assert(wIdx >= 0 && wIdx < tkIdx, s"window below the prune:\n$p")
  }

  test("q_kendall_tau: pairwise pass reads the bounded top-k " +
      "checkpoint, never re-runs the corpus subtree") {
    val p = plan("q_kendall_tau")
    // both self-join sides must read the ≤|terms|×10 landed frame
    assert(p.contains("Scan ExistingRDD"), s"lost the top-k barrier:\n$p")
    assert(!p.contains("documents.parquet"),
      s"re-runs the corpus subtree around the barrier:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_softdedup_weights: occurrence join-back pinned shuffle-hash " +
      "on the digest — the corpus-sized side is never broadcast") {
    val p = plan("q_softdedup_weights")
    assert(p.contains("ShuffledHashJoin"), s"join-back not shuffle-hash:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"corpus-sized side broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
  }

  test("q_pca_project: covariance via ONE native map-side-combined " +
      "aggregate; projection plan is scan+fold with no exchange") {
    // the covariance pass: partial cov_sum_micro must sit BELOW the
    // single exchange (one d²-long partial per partition crosses)
    val emb = graft.util.Tables.embeddings(spark, d)
      .select(org.apache.spark.sql.functions.col("embedding")
        .cast("array<double>").as("v"))
    val cp = emb.agg(graft.functions.CovSumMicroExpr
        .covSumMicro(org.apache.spark.sql.functions.col("v")))
      .queryExecution.executedPlan.toString
    val partialIdx = cp.indexOf("partial_cov_sum_micro")
    val exchangeIdx = cp.indexOf("Exchange SinglePartition")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial agg not below the exchange:\n$cp")
    // the projection result: per-row fold against the literal
    // eigenvector — a pure scan+project, nothing shuffles
    val p = plan("q_pca_project")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"projection plan shuffles:\n$p")
  }

  test("q_ece_calibration: one corpus pass to a 10-row aggregate; " +
      "result is a local relation") {
    val p = plan("q_ece_calibration")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet"),
      s"bucket work leaked back into the result plan:\n$p")
  }

  test("q_auc: negatives-below window is PARTITIONED BY source (never " +
      "a global single-partition sort); per-source finish reuses the " +
      "window's partitioning") {
    val p = plan("q_auc")
    assert(p.contains("windowspecdefinition(source#"),
      s"window not partitioned by source:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"global window detected:\n$p")
    // (source, qm) group exchange + source window exchange — and the
    // final groupBy(source) must NOT add a third (the window already
    // hash-partitioned by source)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
  }

  test("q_pr_curve: 9-threshold fan-out folds map-side — partial " +
      "aggregation sits below the single 9-key exchange") {
    val p = plan("q_pr_curve")
    val partialIdx = p.indexOf("partial_sum")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(t#")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"threshold counters not folded before the exchange:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("q_welch_ttest: pair expansion runs driver-side on the bounded " +
      "|sources|-row moment collect — the result is a local relation " +
      "(no join, no corpus re-scan)") {
    val p = plan("q_welch_ttest")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("Join") &&
      !p.contains("parquet"),
      s"pair work leaked back into the result plan:\n$p")
  }

  test("q_chi2_terms: vocabulary-sized exchange, scalar totals " +
      "broadcast, top-20 as TakeOrderedAndProject") {
    val p = plan("q_chi2_terms")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocabulary globally sorted:\n$p")
    // term counts fold map-side to one vocab exchange; the token
    // stream itself never shuffles
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
    assert(p.contains("hashpartitioning(term#"), p)
    // the only join is the 1-row totals broadcast
    assert(p.contains("BroadcastNestedLoopJoin") &&
      "Join".r.findAllIn(p).length ==
        "BroadcastNestedLoopJoin".r.findAllIn(p).length,
      s"unexpected non-scalar join:\n$p")
  }

  test("q_rocchio_expand: rel-term side broadcasts onto the vocabulary " +
      "rollup; top-15 as TakeOrderedAndProject; no cartesian beyond " +
      "the scalar stats row") {
    val p = plan("q_rocchio_expand")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocabulary globally sorted:\n$p")
    // the corpus-df side is the big side: the few-hundred-row rel-term
    // table must arrive broadcast, never shuffle the vocabulary twice
    assert(p.contains("BroadcastHashJoin"), s"rel terms not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_knn_graph: within-cell equi join off one materialized " +
      "assignment; edges through TopKPerKey; only the 1-row mutual " +
      "scalar joins nested-loop") {
    // the edge computation (behind the query's stage barrier): cell
    // equi join off the materialized assignment, TopKPerKey bounded
    // heaps — never a window sort or a cartesian
    val inner = graft.queries.PipelineQueries.knnEdgesPlan(
        graft.queries.PipelineQueries.knnAssignmentForAudit(spark, d))
      .queryExecution.executedPlan.toString
    assert(inner.contains("TopKPerKey"),
      s"edge selection not bounded-heap:\n$inner")
    assert(!inner.contains("CartesianProduct") &&
      !inner.contains("BroadcastNestedLoop") &&
      !inner.contains("Window"), s"edge plan degenerate:\n$inner")
    assert(inner.contains("Scan ExistingRDD"),
      s"assignment recomputed per side:\n$inner")
    // the published result: the ONLY nested-loop is the final 1-row
    // mutual_pairs broadcast scalar
    val p = plan("q_knn_graph")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1,
      s"unexpected nested-loop beyond the scalar join:\n$p")
  }

  test("q_psi_drift: event counters fold map-side to the 10-bucket " +
      "exchange; the published result is a local relation") {
    // the distributed rollup (what the driver-side finish collects)
    val inner = graft.queries.PipelineQueries.psiBucketCounts(spark, d)
      .queryExecution.executedPlan.toString
    val partialIdx = inner.indexOf("partial_sum")
    val exchangeIdx = inner.indexOf("Exchange hashpartitioning(bucket#")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"bucket counters not folded before the exchange:\n$inner")
    assert(!inner.contains("CartesianProduct") &&
      !inner.contains("SortMergeJoin"), s"scalar join degenerated:\n$inner")
    // the published frame: bounded driver-side finish (ECE pattern)
    val p = plan("q_psi_drift")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet"),
      s"PSI arithmetic leaked back into the result plan:\n$p")
  }

  test("q_jl_project: sample filter reaches the parquet scan; both " +
      "nested-loops are bounded; checksum folds map-side") {
    val p = plan("q_jl_project")
    // the pair self-join's BNLJ is bounded BECAUSE this filter is
    // pushed below it — 24 rows per side, not the corpus
    assert(p.contains("LessThan(vec_id,24)"),
      s"sample filter not pushed to the scan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // exactly two nested-loops are legitimate: the inequality pair
    // self-join over the 24-row sample, and the 1-row checksum join
    val bnl = "BroadcastNestedLoopJoin".r.findAllMatchIn(p).size
    assert(bnl <= 2,
      s"unexpected nested-loop beyond sample-pair + checksum:\n$p")
    // corpus-wide energy checksum: map-side partial_sum, one-row final
    assert(p.contains("partial_sum") && p.contains("SinglePartition"),
      s"checksum not a map-side partial fold:\n$p")
  }

  test("q_ks_test: per-cents counters fold map-side; argmax is " +
      "TakeOrderedAndProject; no join degeneration") {
    val p = plan("q_ks_test")
    val partialIdx = p.indexOf("partial_sum")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(c#")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"cents counters not folded before the exchange:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"argmax is not a top-1 TakeOrdered:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"scalar join degenerated:\n$p")
  }

  test("q_benford: order totals fold map-side to the 9-digit " +
      "exchange; the published result is a local relation") {
    val inner = graft.queries.PipelineQueries
      .benfordDigitCounts(spark, d)
      .queryExecution.executedPlan.toString
    val partialIdx = inner.indexOf("partial_count")
    val exchangeIdx = inner.indexOf("Exchange hashpartitioning(digit#")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"digit counters not folded before the exchange:\n$inner")
    val p = plan("q_benford")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet"),
      s"Benford arithmetic leaked back into the result plan:\n$p")
  }

  test("q_cusum: windows are PARTITIONED per series, small sides " +
      "broadcast, partitioning reused across window/agg stages") {
    val p = plan("q_cusum")
    assert(p.contains("windowspecdefinition(event_type#"),
      s"cusum window not partitioned by series:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"per-series join degenerated:\n$p")
    val nExchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(p).size
    assert(nExchanges <= 2,
      s"event_type partitioning not reused ($nExchanges exchanges):\n$p")
  }

  test("q_acf: per-series window carries all five leads in ONE sort; " +
      "mean side broadcast; no single-partition window") {
    val p = plan("q_acf")
    assert(p.contains("windowspecdefinition(event_type#"),
      s"lead window not partitioned by series:\n$p")
    assert(!p.contains("Exchange SinglePartition") ||
      p.indexOf("Exchange SinglePartition") >
        p.indexOf("windowspecdefinition"),
      s"global window detected:\n$p")
    // exactly one WindowExec: the five lead() columns must share one
    // (partition, sort) pass, not plan five window operators
    assert("Window ".r.findAllMatchIn(p).size == 1,
      s"lead columns split across window operators:\n$p")
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"per-series mean join degenerated:\n$p")
    val nEx = "Exchange hashpartitioning".r.findAllMatchIn(p).size
    assert(nEx <= 2,
      s"event_type partitioning not reused ($nEx exchanges):\n$p")
  }

  test("q_cohen_kappa: the 2x2 contingency folds map-side below one " +
      "source exchange; join-free") {
    val p = plan("q_cohen_kappa")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    val partialIdx = p.indexOf("partial_sum")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(source#")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"contingency counters not folded before the exchange:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"expected 1 exchange:\n$p")
  }

  test("q_brier: bin rollups fold map-side, the source-totals side is " +
      "broadcast, no join degeneration") {
    val p = plan("q_brier")
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"bin-to-totals join degenerated:\n$p")
    val partialIdx = p.indexOf("partial_sum")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"bin counters not folded before the exchange:\n$p")
    // every exchange is a <=50-row bin/source frame — the corpus pass
    // itself lives in the shared memo (InMemoryTableScan)
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size <= 4,
      s"unexpected exchange fan-out:\n$p")
  }

  test("q_sssp: the exposed query serves the memoized parquet landing " +
      "(file scan), never a per-consumer recompute") {
    val p = plan("q_sssp")
    assert(p.contains("sssp_dists-") && !p.contains("documents.parquet"),
      s"not serving the session memo:\n$p")
  }

  test("q_entropy_rate: reads the shared bigram-counts memo (no corpus " +
      "re-scan); vocabulary-sized equi joins only; mass folds map-side") {
    val p = plan("q_entropy_rate")
    assert(p.contains("bigram_counts-") && !p.contains("documents.parquet"),
      s"not serving the shared transition-table memo:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"transition-table join degenerated:\n$p")
    assert(p.contains("partial_sum") && p.contains("SinglePartition"),
      s"entropy mass not folded map-side:\n$p")
  }

  test("q_gini_tokens: the only single-partition window walks the " +
      "DISTINCT-COUNT domain — above the vocab rollup, never the " +
      "vocabulary itself") {
    val p = plan("q_gini_tokens")
    assert(p.contains("windowspecdefinition(c#"),
      s"window not on the count domain:\n$p")
    // vocab exchange (w) must sit BELOW the count-domain exchange (c),
    // which sits below the bounded single-partition window walk
    val wIdx = p.indexOf("hashpartitioning(w#")
    val cIdx = p.indexOf("hashpartitioning(c#")
    val spIdx = p.indexOf("Exchange SinglePartition")
    assert(wIdx >= 0 && cIdx >= 0 && spIdx >= 0 &&
      wIdx > cIdx && cIdx > spIdx,
      s"window walks an unbounded domain (w=$wIdx c=$cIdx sp=$spIdx):\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
  }

  test("q_good_turing: join-free — the c+1 neighbor and the totals " +
      "both come from ONE single-partition window that walks the " +
      "count domain above the digest-gram exchange") {
    val p = plan("q_good_turing")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert(p.contains("windowspecdefinition(c#"),
      s"window not on the count domain:\n$p")
    // gram exchange (fnv64 digests, g) below the count-domain
    // exchange (c), below the bounded single-partition window walk
    val gIdx = p.indexOf("hashpartitioning(g#")
    val cIdx = p.indexOf("hashpartitioning(c#")
    val spIdx = p.indexOf("Exchange SinglePartition")
    assert(gIdx >= 0 && cIdx >= 0 && spIdx >= 0 &&
      gIdx > cIdx && cIdx > spIdx,
      s"window walks an unbounded domain (g=$gIdx c=$cIdx sp=$spIdx):\n$p")
  }

  test("q_spearman: rank windows walk the BOUNDED joint-grid domains " +
      "(below the grid rollup), moment sums fold map-side, result is " +
      "one row") {
    val p = plan("q_spearman")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // both single-partition windows sit ABOVE the (x, y) grid exchange
    // — they walk the bounded value domains, never documents
    val gridIdx = p.indexOf("hashpartitioning(x#")
    assert(gridIdx >= 0 || p.indexOf("hashpartitioning(y#") >= 0,
      s"joint grid rollup missing:\n$p")
    assert(p.contains("windowspecdefinition(x#") ||
      p.contains("windowspecdefinition(y#") ||
      "WindowExec".r.findAllIn(p).nonEmpty, s"rank windows missing:\n$p")
    assert(p.contains("partial_sum"),
      s"moment sums not folded map-side:\n$p")
    assert(p.contains("SinglePartition"), p)
  }

  test("q_fleiss_kappa: one corpus rollup to the 5-row vote histogram; " +
      "the only nested loop is the 1-row totals combine") {
    val p = plan("q_fleiss_kappa")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1,
      s"expected exactly the 1-row totals combine:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"vote histogram not folded map-side:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"histogram-sized work picked a shuffle join:\n$p")
  }

  test("q_cross_perplexity: the |sources|² model sweep runs " +
      "driver-side on the bounded V²-grid collect — the result is a " +
      "local relation (the welch pattern)") {
    val p = plan("q_cross_perplexity")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("Join") &&
      !p.contains("parquet"),
      s"model sweep leaked back into the result plan:\n$p")
  }

  test("q_mcc: one fold over the cached memo — no join, map-side " +
      "partials, single row") {
    val p = plan("q_mcc")
    // assert on the plan ABOVE the memo (the InMemoryRelation prints
    // its own build subtree, which legitimately scans parquet)
    val above = p.split("InMemoryRelation").head
    assert(above.contains("InMemoryTableScan"),
      s"not serving the session memo:\n$p")
    assert(!above.contains("Join"), s"unexpected join:\n$above")
    assert(above.contains("partial_sum"),
      s"2x2 not folded map-side:\n$above")
  }

  test("q_llr_colloc: reads the shared bigram-counts memo; " +
      "vocabulary-sized joins only, top-20 as TakeOrdered") {
    val p = plan("q_llr_colloc")
    assert(p.contains("bigram_counts-") && !p.contains("documents.parquet"),
      s"not serving the shared transition-table memo:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"collocation table globally sorted:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_rbo_overlap: rank windows partition by term over the " +
      "TopKPerKey landing — no pair self-join, no single-partition " +
      "window, no cartesian") {
    val p = plan("q_rbo_overlap")
    assert(p.contains("TopKPerKey"), s"candidate prune missing:\n$p")
    assert(p.contains("windowspecdefinition(t#"),
      s"rank windows lost their term partitioning:\n$p")
    // every window is term-partitioned (the only SinglePartition
    // exchange is the bm25 family's 1-row corpus-stats scalar)
    assert(!p.contains("windowspecdefinition(specifiedwindowframe") &&
      "windowspecdefinition\\(".r.findAllIn(p)
        .size == "windowspecdefinition\\(t#".r.findAllIn(p).size,
      s"an unpartitioned window appeared:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the telescoped weight sum replaced kendall's pair self-join:
    // no join above the TopKPerKey landing (broadcasts below feed it)
    assert(!p.contains("SortMergeJoin"), s"pair join reappeared:\n$p")
  }

  test("q_hill_tail: count-descending TakeOrdered over the digest-gram " +
      "rollup; result is a local relation") {
    val p = plan("q_hill_tail")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("parquet"), p)
  }

  test("q_bootstrap_ci: percentile endpoints read the bounded 100-row " +
      "replicate collect — result is a local relation") {
    val p = plan("q_bootstrap_ci")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet"),
      s"replicate work leaked back into the result plan:\n$p")
  }

  test("q_dp_counts: one source rollup, noise per-row on the bounded " +
      "aggregate — no join, one exchange") {
    val p = plan("q_dp_counts")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly the source-census exchange:\n$p")
  }

  test("q_conformal: the rank-k search runs on bounded bucket " +
      "collects off the cached memo — result is a local relation, " +
      "no sort, no single-partition window anywhere") {
    val p = plan("q_conformal")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet") &&
      !p.contains("Sort"),
      s"order-statistic work leaked back into the result plan:\n$p")
  }

  test("q_shard_assign: per-row array argmax — no explode, no join; " +
      "the only exchange is the 16-row shard rollup") {
    val p = plan("q_shard_assign")
    assert(!p.contains("Generate") && !p.contains("Join"),
      s"shard sweep left the row:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly the shard-census exchange:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"census not folded map-side:\n$p")
  }

  test("q_curriculum: the rank window is PARTITIONED by source " +
      "(corpus-distributed) — never a single-partition window") {
    val p = plan("q_curriculum")
    assert(p.contains("windowspecdefinition(source#"),
      s"window lost its source partitioning:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition stage appeared:\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
  }

  test("q_token_dropout: pure per-row map — no exchange, no " +
      "generate, no join anywhere in the plan") {
    val p = plan("q_token_dropout")
    assert(!p.contains("Exchange") && !p.contains("Generate") &&
      !p.contains("Join"),
      s"augmentation is not a pure map:\n$p")
  }

  test("q_mmr_rerank: greedy rerank runs on the bounded shortlist " +
      "collect — the result is a local relation; the shortlist scan " +
      "itself is the audited q_cosine_topk TakeOrdered shape") {
    val p = plan("q_mmr_rerank")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet"),
      s"rerank work leaked back into the result plan:\n$p")
  }

  test("q_wasserstein / q_kruskal / q_cliffs_delta: pair sweep and " +
      "fold run driver-side on bounded collects — the result is a " +
      "local relation (the welch pattern)") {
    for (q <- Seq("q_wasserstein", "q_kruskal", "q_cliffs_delta")) {
      val p = plan(q)
      assert(p.contains("LocalTableScan"), s"$q:\n$p")
      assert(!p.contains("Exchange") && !p.contains("Join") &&
        !p.contains("parquet"),
        s"$q: bounded-domain work leaked back into the result plan:\n$p")
    }
  }

  test("q_isotonic_calibration: one bucket rollup, result is a local " +
      "relation (the ECE pattern)") {
    val p = plan("q_isotonic_calibration")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("parquet"),
      s"fit work leaked back into the result plan:\n$p")
  }

  test("q_ewma: one user_id exchange, join-free") {
    val p = plan("q_ewma")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
    assert(p.contains("hashpartitioning(user_id#"), p)
  }
}
