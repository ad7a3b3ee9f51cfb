package graft

import org.apache.spark.sql.Row

/** Executable invariants for the round-7 analysis/curation queries —
  * structural properties of the operators' MATH (apportionment adds up,
  * ratios live in their domain, flags agree with their counts) checked
  * against real sf0.001 runs, complementing the sf0.01 DuckDB hash gate
  * (which proves engine agreement but not that the spec itself is sane).
  */
class QueryInvariantsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[Row] =
    SparkEntry.queries(q)(spark, d).collect().toSeq

  test("q_token_budget: Hamilton apportionment is exact and bounded") {
    val r = rows("q_token_budget")
    // the full budget is allocated, no more, no less
    assert(r.map(_.getAs[Long]("alloc")).sum == 100000L)
    // extras are binary and consistent with alloc = base + extra
    assert(r.forall { x =>
      val e = x.getAs[Long]("extra")
      (e == 0L || e == 1L) &&
        x.getAs[Long]("alloc") == x.getAs[Long]("base") + e
    })
    // quota rule: every allocation is within 1 of the exact share
    val tAll = r.map(_.getAs[Long]("n_tokens")).sum.toDouble
    assert(r.forall { x =>
      val exact = 100000L * x.getAs[Long]("n_tokens") / tAll
      math.abs(x.getAs[Long]("alloc") - exact) < 1.0
    })
  }

  test("q_substring_dedup ≡ q_substring_scrub: report and rewrite agree " +
      "doc by doc, and the rewrite's text length proves it") {
    val rep = rows("q_substring_dedup")
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("removed_chars"), x.getAs[Long]("clean_chars"),
          x.getAs[Long]("n_chunks"))).toMap
    val scr = rows("q_substring_scrub")
    assert(scr.nonEmpty && scr.size == rep.size)
    scr.foreach { x =>
      val (removed, clean, nChunks) = rep(x.getAs[Long]("doc_id"))
      assert(x.getAs[Long]("removed_chars") == removed)
      assert(x.getAs[Long]("n_chunks") == nChunks)
      // the rewrite really removed exactly the reported spans
      assert(x.getAs[String]("clean_text").length.toLong == clean)
    }
    // the fixture exercises both branches: some doc loses a span,
    // most docs keep everything
    assert(scr.exists(_.getAs[Long]("removed_chars") > 0))
    assert(scr.exists(_.getAs[Long]("removed_chars") == 0))
  }

  test("q_sample_quantiles: estimates live inside the sampled order " +
      "statistics and equal the exact report when the sample is the " +
      "whole group") {
    val r = rows("q_sample_quantiles")
    assert(r.nonEmpty)
    r.foreach { x =>
      val m = x.getAs[Long]("m")
      val n = x.getAs[Long]("n_docs")
      assert(m == math.min(n, 64L)) // sample size = min(group, k)
      val med = x.getAs[Double]("median_est")
      val p90 = x.getAs[Double]("p90_est")
      assert(med <= p90, s"quantiles out of order: $x")
      // at sf0.001 every group is smaller than k, so the "sample" is
      // the whole group and the sketch must REPRODUCE the exact report
      if (n <= 64) {
        assert(med == x.getAs[Double]("median_exact"), s"median: $x")
        assert(p90 == x.getAs[Double]("p90_exact"), s"p90: $x")
      }
      ()
    }
  }

  test("q_kmv_overlap: estimator degenerates to exact Jaccard when " +
      "both sketches hold the whole set") {
    val est = rows("q_kmv_overlap")
    assert(est.nonEmpty)
    // exact bigram-shingle Jaccard per consecutive source pair,
    // computed independently of the sketch path
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("source"),
        explode(graft.dedup.Dedup.shingles(col("text"), 2)).as("g"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
      .toMap
    est.foreach { x =>
      val e = x.getAs[Double]("jaccard_est")
      assert(e >= 0.0 && e <= 1.0, s"estimate out of range: $x")
      val a = docs(x.getAs[String]("src_a"))
      val b = docs(x.getAs[String]("src_b"))
      if ((a | b).size <= 256) {
        // the whole UNION fits in the sketch budget, so the union
        // bottom-k is the union itself -> estimator must be EXACT
        val exact = (a & b).size.toDouble / (a | b).size
        assert(math.abs(e - exact) < 1e-6,
          s"degenerate estimate $e != exact $exact for $x")
      }
      ()
    }
  }

  test("q_mattr: ratios in (0,1], at least one window per doc") {
    val r = rows("q_mattr")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val m = x.getAs[Double]("mattr")
      m > 0.0 && m <= 1.0 && x.getAs[Long]("n_windows") >= 1L
    })
  }

  test("q_ngram_novelty: seen <= spans, novelty = 1 - seen/spans") {
    val r = rows("q_ngram_novelty")
    assert(r.map(_.getAs[String]("split")).toSet == Set("val", "test"))
    assert(r.forall { x =>
      val sp = x.getAs[Long]("n_spans"); val se = x.getAs[Long]("n_seen")
      val nv = x.getAs[Double]("novelty")
      se >= 0 && se <= sp && nv >= 0.0 && nv <= 1.0 &&
        math.abs(nv - (sp - se).toDouble / sp) < 1e-6
    })
  }

  test("q_mad_outliers: MAD flags a bounded minority per event type") {
    val r = rows("q_mad_outliers")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val n = x.getAs[Long]("n_events")
      // > half the mass is within one MAD of the median by definition,
      // so strictly-beyond-3-MAD outliers are always a minority
      x.getAs[Long]("n_outliers") * 2 < n &&
        x.getAs[Double]("mad_value") >= 0.0
    })
  }

  test("q_zipf_slope: negative slope over the frequency-ranked vocab") {
    val r = rows("q_zipf_slope")
    assert(r.size == 1)
    assert(r.head.getAs[Double]("slope") < 0.0)
    assert(r.head.getAs[Long]("n_terms") >= 2L)
  }

  test("q_blocklist_filter: flag agrees with the hit count") {
    val r = rows("q_blocklist_filter")
    assert(r.nonEmpty)
    assert(r.forall(x =>
      x.getAs[Boolean]("flagged") == (x.getAs[Long]("n_hits") > 0)))
    // the blocklist includes corpus words — some doc must hit
    assert(r.exists(_.getAs[Long]("n_hits") > 0))
  }

  test("q_zorder: per-file spans bounded on BOTH dimensions") {
    // file = top 10 bits of the 32-bit Morton key, so 11 bits of each
    // coordinate vary within a file: span <= 2^11 - 1 on x AND y — the
    // two-dimensional locality a single-sort layout cannot give
    val r = rows("q_zorder")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      x.getAs[Long]("x_span") <= 2047L && x.getAs[Long]("y_span") <= 2047L
    })
  }

  test("q_zonemap_prune: the sorted layout prunes at least as well") {
    val r = rows("q_zonemap_prune")
      .map(x => x.getAs[String]("layout") ->
        (x.getAs[Long]("n_pruned"), x.getAs[Long]("rows_scanned"))).toMap
    assert(r("shipdate_sorted")._1 >= r("by_orderkey")._1)
    assert(r("shipdate_sorted")._2 <= r("by_orderkey")._2)
  }

  test("q_embed_quantize: int8 error bounded by half a quantization step") {
    val r = rows("q_embed_quantize")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val vmax = x.getAs[Long]("vmax_micro").toDouble
      val bound = vmax / 254.0 / 1e6 + 1e-6 // half step + 6-dec rounding
      x.getAs[Double]("max_abs_err") <= bound &&
        x.getAs[Double]("rmse") <= x.getAs[Double]("max_abs_err") + 1e-6
    })
  }

  test("q_pq_ann: top-10 with valid codes per subspace") {
    val r = rows("q_pq_ann")
    assert(r.size == 10)
    assert(r.forall(x => Seq("c0", "c1", "c2", "c3").forall { c =>
      val v = x.getAs[Int](c); v >= 0 && v < 8
    }))
  }

  test("q_fuzzy_dedup: funnel counts are monotone where the math says") {
    val r = rows("q_fuzzy_dedup")
      .map(x => x.getAs[String]("stage_name") -> x.getAs[Long]("n")).toMap
    // verified edges are a subset of candidates
    assert(r("verified_edges") <= r("candidates"))
    // each cluster removes at least one doc: kept = input - (members -
    // clusters), and members >= 2 per cluster
    assert(r("kept_docs") <= r("input"))
    assert(r("input") - r("kept_docs") >= r("clusters") ||
      r("clusters") == 0L)
  }

  test("q_scd2: intervals partition each user's history, one open run") {
    val r = rows("q_scd2")
    val byUser = r.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.forall { case (_, runs) =>
      // exactly one open (is_current) run per user
      runs.count(_.getAs[Boolean]("is_current")) == 1 && {
        // closed runs chain: valid_to of run k == valid_from of run k+1
        val sorted = runs.sortBy(_.getAs[Long]("valid_from_us"))
        sorted.sliding(2).forall {
          case Seq(a, b) =>
            a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us")
          case _ => true
        }
      }
    })
    // runs cover every event exactly once
    val total = r.map(_.getAs[Long]("n_events")).sum
    assert(total == SparkEntry.queries("q_scan_project")(spark, d).count())
  }

  test("q_concurrency: prefix sums stay non-negative and close at zero") {
    val r = rows("q_concurrency")
    assert(r.forall(_.getAs[Long]("concurrent") >= 0L))
    // every +1 has its -1: the multiset of deltas sums to zero, and the
    // LAST prefix value (max us, delta=-1 sorts first... the global
    // minimum at the end) is zero
    assert(r.map(_.getAs[Long]("delta")).sum == 0L)
    // several sessions may end at the same global max us: rows within
    // that tie group carry prefix values {k-1, ..., 0}, so the closing
    // zero is the group MIN, not an arbitrary maxBy pick
    val lastKey = r.map(x =>
      (x.getAs[Long]("us"), x.getAs[Long]("delta"))).max
    val lastGroup = r.filter(x =>
      (x.getAs[Long]("us"), x.getAs[Long]("delta")) == lastKey)
    assert(lastGroup.map(_.getAs[Long]("concurrent")).min == 0L)
    assert(r.exists(_.getAs[Long]("concurrent") >= 1L))
  }

  test("q_triangles: wedge and edge bounds hold") {
    val x = rows("q_triangles").head
    val (tri, wed, e, n) = (x.getAs[Long]("n_triangles"),
      x.getAs[Long]("n_wedges"), x.getAs[Long]("n_edges"),
      x.getAs[Long]("n_nodes"))
    assert(tri >= 0 && 3 * tri <= wed) // each triangle closes 3 wedges
    assert(e <= n * (n - 1) / 2)
    val gcc = x.getAs[Long]("gcc_micro")
    assert(gcc >= 0 && gcc <= 1000000L)
  }

  test("q_skyline: result is mutually non-dominated and non-empty") {
    val r = rows("q_skyline")
    assert(r.nonEmpty)
    val pts = r.map(x => (x.getAs[Long]("n_chars"), x.getAs[Long]("n_words")))
    assert(pts.forall { case (x1, y1) => !pts.exists { case (x2, y2) =>
      x2 >= x1 && y2 >= y1 && (x2 > x1 || y2 > y1) } })
  }

  test("q_shuffle_order: train_rank is a permutation of 1..n") {
    val ranks = rows("q_shuffle_order").map(_.getAs[Long]("train_rank"))
    assert(ranks.sorted == (1L to ranks.size.toLong).toSeq)
  }

  test("q_compaction_plan: next-fit bins overflow by at most one file") {
    val r = rows("q_compaction_plan")
    val target = 8000L
    val byBin = r.groupBy(_.getAs[Long]("bin"))
      .view.mapValues(_.map(_.getAs[Long]("bytes")).sum).toMap
    // a next-fit bin closes only once cum crosses the target, so its
    // total is < target + its last file (≤ max single file)
    val maxFile = r.map(_.getAs[Long]("bytes")).max
    assert(byBin.values.forall(_ < target + maxFile))
    // bins are contiguous 0..k
    val bins = byBin.keySet
    assert(bins == (0L until bins.size.toLong).toSet)
  }

  test("q_mutual_info: cells sum to N, MI is non-negative") {
    val r = rows("q_mutual_info")
    val n = r.map(_.getAs[Long]("n_xy")).sum
    assert(n == spark.read.parquet(s"$d/documents.parquet").count())
    val mi = r.map(_.getAs[Double]("pmi_contrib")).sum
    assert(mi >= -1e-3) // MI >= 0 in exact math; 6dp rounding slack
  }

  test("q_trend_slope: denominators satisfy Cauchy-Schwarz") {
    val r = rows("q_trend_slope")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val den = x.getAs[Long]("slope_den")
      den >= 0L &&
        den == x.getAs[Long]("n") * x.getAs[Long]("sxx") -
          x.getAs[Long]("sx") * x.getAs[Long]("sx")
    })
  }

  test("q_column_stats: ndv <= notnull <= rows, five columns") {
    val r = rows("q_column_stats")
    assert(r.map(_.getAs[String]("column_name")).toSet ==
      Set("event_id", "user_id", "event_type", "cents", "us"))
    assert(r.forall { x =>
      val nn = x.getAs[Long]("n_rows") - x.getAs[Long]("n_null")
      x.getAs[Long]("ndv") <= nn && nn <= x.getAs[Long]("n_rows")
    })
  }

  test("q_bfs_hops: source at 0, distances within the hop budget") {
    val r = rows("q_bfs_hops")
    val dists = r.map(_.getAs[Long]("dist"))
    assert(dists.count(_ == 0L) == 1) // exactly the source
    assert(dists.forall(x => x >= 0L && x <= 4L))
    // BFS level sets: if any node sits at level k>0, some node sits at
    // k-1 (frontiers never skip a level)
    val levels = dists.toSet
    assert((0L to levels.max).forall(levels.contains))
  }

  test("q_ts_similarity: the query window matches itself at distance 0") {
    val r = rows("q_ts_similarity")
    assert(r.size == 10)
    val d2 = r.map(_.getAs[Long]("dist2"))
    assert(d2.head == 0L)       // self-match survives the top-k
    assert(d2 == d2.sorted)     // profile returned in distance order
  }

  test("q_hll_distinct: estimator within the m=512 error envelope") {
    val r = rows("q_hll_distinct")
    assert(r.size == 1)
    val x = r.head
    val m = x.getAs[Int]("m")
    val zeros = x.getAs[Long]("zeros")
    val hden = x.getAs[Long]("hden")
    val est = x.getAs[Double]("est_distinct")
    val exact = x.getAs[Long]("exact_distinct")
    assert(m == 512 && zeros >= 0 && zeros < m)
    // every register contributes at least 2^0 and at most 2^40 scaled units
    assert(hden >= m.toLong && hden <= m.toLong * (1L << 40))
    // HLL standard error is 1.04/sqrt(m) ~ 4.6%; allow 5 sigma plus the
    // small-range regime (zeros>0 biases high without linear counting)
    val rse = 1.04 / math.sqrt(m.toDouble)
    assert(est > 0 && math.abs(est - exact) <= (6 * rse + 0.25) * exact,
      s"est=$est exact=$exact")
  }

  test("q_hll_merge: union-of-sketches equals sketch-of-union exactly") {
    val mr = rows("q_hll_merge")
    val all = mr.filter(_.getAs[String]("source") == "ALL")
    assert(all.size == 1 && mr.size > 2) // ALL + at least two sources
    // the merged estimate is BIT-IDENTICAL to the direct global sketch
    val direct = rows("q_hll_distinct").head
    assert(all.head.getAs[Double]("est_distinct") ==
      direct.getAs[Double]("est_distinct"))
    assert(all.head.getAs[Long]("exact_distinct") ==
      direct.getAs[Long]("exact_distinct"))
    // per-source exacts are each <= global (spans shared across sources)
    val perSrc = mr.filterNot(_.getAs[String]("source") == "ALL")
    assert(perSrc.forall(x => x.getAs[Long]("exact_distinct") <=
      all.head.getAs[Long]("exact_distinct")))
  }

  test("q_upsert: latest-wins merge covers every user exactly once") {
    val r = rows("q_upsert")
    val users = r.map(_.getAs[Long]("user_id"))
    assert(users.distinct.size == users.size)
    assert(r.forall(x =>
      Set("insert", "update", "keep")(x.getAs[String]("action"))))
  }

  test("q_snapshot_peaks: one frame per serial, 8 channel slices each") {
    val r = rows("q_snapshot_peaks")
    val bySerial = r.groupBy(_.getAs[Long]("serial_number"))
    // exactly one snapshot frame per serial: 8 channels, one ts pair
    assert(bySerial.values.forall(_.size == 8))
    assert(bySerial.values.forall(g =>
      g.map(x => (x.getAs[Long]("ts_int"), x.getAs[Long]("ts_frac")))
        .distinct.size == 1))
    assert(bySerial.values.forall(g =>
      g.map(_.getAs[Int]("channel")).sorted == (1 to 8)))
    // the recipe: channel slice i = slice 1's peak + (i-1)*100
    assert(bySerial.values.forall { g =>
      val p1 = g.find(_.getAs[Int]("channel") == 1).get
        .getAs[Double]("peak_value")
      g.forall(x => x.getAs[Double]("peak_value")
        == p1 + (x.getAs[Int]("channel") - 1) * 100.0)
    })
  }

  test("q_snapshot_spectrum: single frame, only bitmap-active channels") {
    val r = rows("q_snapshot_spectrum")
    val frames = r.map(_.getAs[Long]("frame_id")).distinct
    assert(frames.size == 1, s"want ONE snapshot frame, got $frames")
    // active channels each carry the full 16-point axis
    val byCh = r.groupBy(_.getAs[Int]("channel"))
    assert(byCh.values.forall(_.size == 16))
    // channel is 1-based (reference spectra keying); bit index = ch-1
    assert(byCh.keySet.forall(ch =>
      ((frames.head % 256) >> (ch - 1) & 1L) == 1L))
    // wavelength axis is the header grid
    assert(r.forall(x => x.getAs[Double]("wl")
      == 1500.0 + x.getAs[Int]("point_idx") * 0.8))
  }

  /** Scored/labeled doc set the eval-metric family (q_auc, q_pr_curve,
    * q_welch_ttest) is defined over, rebuilt from the PUBLIC queries:
    * score = q_quality_score, label = q_gopher_filter's keep — also
    * proving the family is consistent with those two surfaces.
    */
  private lazy val scoredDocs: Seq[(String, Long, Boolean)] = {
    val score = rows("q_quality_score").map(x => x.getAs[Long]("doc_id") ->
      math.floor(x.getAs[Double]("q_score") * 1e6 + 0.5).toLong).toMap
    val keep = rows("q_gopher_filter").map(x => x.getAs[Long]("doc_id") ->
      x.getAs[Boolean]("keep")).toMap
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    score.keys.toSeq.sorted.map(id => (src(id), score(id), keep(id)))
  }

  test("q_auc ≡ brute-force pairwise Mann–Whitney over the public " +
      "score/label queries (wins + half-ties)") {
    val got = rows("q_auc").map(x => x.getAs[String]("source") ->
      (x.getAs[Long]("n_pos"), x.getAs[Long]("n_neg"),
        x.getAs[Long]("u2"), x.getAs[Double]("auc"))).toMap
    val bySrc = scoredDocs.groupBy(_._1)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (srcName, docs) =>
      val posQ = docs.filter(_._3).map(_._2)
      val negQ = docs.filterNot(_._3).map(_._2)
      var u2 = 0L
      for (p <- posQ; n <- negQ)
        u2 += (if (p > n) 2L else if (p == n) 1L else 0L)
      val (gp, gn, gu2, gauc) = got(srcName)
      assert(gp == posQ.size && gn == negQ.size && gu2 == u2,
        s"$srcName: counters disagree with brute force")
      val pn = posQ.size.toLong * negQ.size
      val want = if (pn == 0) 0.5
        else ((u2 * 1000000L + pn) / (2 * pn)).toDouble / 1e6
      assert(gauc == want, s"$srcName: auc $gauc != brute $want")
    }
  }

  test("q_pr_curve: counters are the brute-force confusion matrix; " +
      "tp+fn is the gold-positive count at every threshold; ratios " +
      "recompute from the counters") {
    val r = rows("q_pr_curve")
    assert(r.map(_.getAs[Long]("t")).sorted == (1L to 9L))
    val nPos = scoredDocs.count(_._3).toLong
    r.foreach { x =>
      val t = x.getAs[Long]("t")
      val (tp, fp, fn) = (x.getAs[Long]("tp"), x.getAs[Long]("fp"),
        x.getAs[Long]("fn"))
      val wantTp = scoredDocs.count(dd => dd._2 >= t * 100000L && dd._3)
      val wantFp = scoredDocs.count(dd => dd._2 >= t * 100000L && !dd._3)
      assert(tp == wantTp && fp == wantFp && tp + fn == nPos,
        s"t=$t: counters disagree with brute force")
      def ratio(num: Long, den: Long): Double =
        if (den == 0) 0.0
        else ((2 * num * 1000000L + den) / (2 * den)).toDouble / 1e6
      assert(x.getAs[Double]("prec") == ratio(tp, tp + fp))
      assert(x.getAs[Double]("recall") == ratio(tp, tp + fn))
      assert(x.getAs[Double]("f1") == ratio(2 * tp, 2 * tp + fp + fn))
    }
    // recall is monotone non-increasing in the threshold
    val rec = r.sortBy(_.getAs[Long]("t")).map(_.getAs[Double]("recall"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a >= b })
  }

  test("q_welch_ttest ≡ brute-force Welch over the public score query; " +
      "df within the classical bounds; t sign matches the mean order") {
    val stats = scoredDocs.groupBy(_._1).map { case (srcName, docs) =>
      val n = docs.size.toLong
      val s1 = docs.map(_._2).sum
      val s2 = docs.map(dd => dd._2 * dd._2).sum
      srcName -> ((n, s1, s2))
    }.filter(_._2._1 >= 2)
    def rd(x: Double, p: Int): Double = {
      val m = math.pow(10, p); math.floor(x * m + 0.5) / m
    }
    rows("q_welch_ttest").foreach { x =>
      val (na, s1a, s2a) = stats(x.getAs[String]("src_a"))
      val (nb, s1b, s2b) = stats(x.getAs[String]("src_b"))
      assert(x.getAs[Long]("n_a") == na && x.getAs[Long]("n_b") == nb)
      // the IDENTICAL IEEE tree the query (and oracle) evaluate
      val (nad, nbd) = (na.toDouble, nb.toDouble)
      val va = (nad * s2a.toDouble - s1a.toDouble * s1a.toDouble) /
        (nad * (nad - 1.0))
      val vb = (nbd * s2b.toDouble - s1b.toDouble * s1b.toDouble) /
        (nbd * (nbd - 1.0))
      val se2 = va / nad + vb / nbd
      val md = s1a.toDouble / nad - s1b.toDouble / nbd
      val t = if (se2 <= 0.0) 0.0 else md / math.sqrt(se2)
      val df = if (se2 <= 0.0) 0.0
        else se2 * se2 / ((va / nad) * (va / nad) / (nad - 1.0) +
          (vb / nbd) * (vb / nbd) / (nbd - 1.0))
      assert(x.getAs[Double]("t_stat") == rd(t, 6), s"t mismatch")
      assert(x.getAs[Double]("df") == rd(df, 4), s"df mismatch")
      assert(x.getAs[Double]("mean_a") == rd(s1a.toDouble / nad / 1e6, 6))
      // classical Welch bounds: min(na,nb)-1 <= df <= na+nb-2
      if (se2 > 0.0) {
        val gdf = x.getAs[Double]("df")
        assert(gdf >= math.min(na, nb) - 1.0 && gdf <= na + nb - 2.0,
          s"df $gdf outside [min-1, na+nb-2]")
        // t's sign follows the micro-mean order
        assert(math.signum(x.getAs[Double]("t_stat")) ==
          math.signum(rd(md, 6)) || x.getAs[Double]("t_stat") == 0.0)
      }
    }
  }

  test("q_isotonic_calibration ≡ the pool-adjacent-violators ALGORITHM " +
      "(independent of the query's minimax formula); fitted is monotone " +
      "and fixes raw only where violations exist") {
    val r = rows("q_isotonic_calibration")
      .sortBy(_.getAs[Long]("bucket"))
    def rm(num: Long, den: Long): Long = (2 * num * 1000000L + den) / (2 * den)
    val fit = r.map(_.getAs[Double]("fitted"))
    val raw = r.map(_.getAs[Double]("raw"))
    // monotone
    assert(fit.zip(fit.tail).forall { case (a, b) => a <= b },
      s"fitted not monotone: $fit")
    // brute force: classic PAV pooling on the (n, np) buckets with the
    // same pre-rounded micro rates — a genuinely different derivation
    // from the max-min minimax loop the query runs
    val blocks2 = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long)] // (n_buckets, n, np)
    r.foreach { x =>
      blocks2 += ((1, x.getAs[Long]("n"), x.getAs[Long]("n_pos")))
      while (blocks2.length >= 2 &&
          rm(blocks2(blocks2.length - 2)._3, blocks2(blocks2.length - 2)._2) >
          rm(blocks2.last._3, blocks2.last._2)) {
        val a = blocks2.remove(blocks2.length - 1)
        val b = blocks2.remove(blocks2.length - 1)
        blocks2 += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    }
    val bruteFit = blocks2.flatMap { case (k, n, np) =>
      Seq.fill(k)(rm(np, n).toDouble / 1e6)
    }
    assert(fit == bruteFit.toSeq,
      s"minimax fit $fit != PAV-algorithm fit $bruteFit")
    // where raw is already isotone the fit is the identity
    if (raw.zip(raw.tail).forall { case (a, b) => a <= b })
      assert(fit == raw)
  }

  test("q_chi2_terms ≡ brute-force contingency recomputation over the " +
      "corpus; counts bounded, ranking consistent") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val keepById = rows("q_gopher_filter").map(x =>
      x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    val nn = docs.size.toLong
    val pp = keepById.values.count(identity).toLong
    val termCounts = scala.collection.mutable.Map
      .empty[String, (Long, Long)]
    docs.foreach { case (id, text) =>
      val pos = if (keepById(id)) 1L else 0L
      text.split(" ").distinct.foreach { t =>
        val (dfc, n1) = termCounts.getOrElse(t, (0L, 0L))
        termCounts(t) = (dfc + 1, n1 + pos)
      }
    }
    def chi2Of(dfc: Long, n1: Long): Double = {
      val a = n1.toDouble; val b = (dfc - n1).toDouble
      val c0 = pp.toDouble - a; val e = (nn - pp).toDouble - b
      val den = (a + b) * (c0 + e) * (a + c0) * (b + e)
      if (den == 0.0) 0.0
      else math.floor(nn.toDouble * (a * e - b * c0) * (a * e - b * c0)
        / den * 1e4 + 0.5) / 1e4
    }
    val brute = termCounts.toSeq.collect {
      case (t, (dfc, n1)) if dfc >= 5 => (t, n1, dfc - n1, chi2Of(dfc, n1))
    }.sortBy { case (t, _, _, c) => (-c, t) }.take(20)
    val got = rows("q_chi2_terms").map(x => (x.getAs[String]("term"),
      x.getAs[Long]("n11"), x.getAs[Long]("n10"),
      x.getAs[Double]("chi2")))
    assert(got == brute, s"top-20 disagrees:\ngot   $got\nbrute $brute")
  }

  test("q_rocchio_expand: rel set is q_bm25's top-10 prefix; weights " +
      "recompute from rtf x idf; query terms excluded") {
    val got = rows("q_rocchio_expand")
    assert(got.size <= 15 && got.nonEmpty)
    val qTerms = Set("hash", "join", "vector")
    assert(got.forall(x => !qTerms.contains(x.getAs[String]("term"))),
      "a query term leaked into its own expansion")
    // recompute weight from the row's own counts + corpus scalars
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    got.foreach { x =>
      val df = x.getAs[Long]("df")
      val idfMicro = math.floor(math.log(
        ((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
        * 1e6 + 0.5).toLong
      assert(x.getAs[Long]("w_micro") == idfMicro * x.getAs[Long]("rtf"),
        s"${x.getAs[String]("term")}: weight != rtf x idf")
    }
    // weights arrive ranked
    val w = got.map(_.getAs[Long]("w_micro"))
    assert(w.zip(w.tail).forall { case (a, b) => a >= b })
  }

  test("q_knn_graph ≡ brute-force within-cell kNN; degree conservation " +
      "laws hold") {
    // widen float→double in BINARY (the query's array<double> cast),
    // never via toString (shortest-repr parse gives a different double)
    val emb = spark.read.parquet(s"$d/embeddings.parquet").collect()
      .map(x => x.getLong(0) -> (x.get(1) match {
        case s: scala.collection.Seq[_] => s.map {
          case f: Float => f.toDouble
          case dd: Double => dd
        }.toArray
      })).toMap
    val n = emb.size
    val cells = math.min(1 << 20, math.max(4, (n + 63) / 64))
    val cents = graft.sim.Similarity.ivfCentroids(64, cells)
    // two-level reference since round 11: best non-empty coarse group
    // first, then the flat argmax restricted to that group's members
    val coarse = graft.sim.Similarity.ivfCoarse(64, cells)
    val grp = graft.sim.Similarity.ivfGroupOf(cents, coarse)
    val nonEmpty = coarse.indices.filter(g => grp.contains(g))
    def dotp(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cellOf(v: Array[Double]): Int = {
      val g = nonEmpty.maxBy(gi => (dotp(v, coarse(gi)), -gi))
      grp.indices.filter(grp(_) == g)
        .maxBy(c => (dotp(v, cents(c)), -c))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(dot / (na * nb) * 1e4 + 0.5) / 1e4
    }
    val byCell = emb.toSeq.groupBy { case (_, v) => cellOf(v) }
    val edges = byCell.values.flatMap { ms =>
      ms.flatMap { case (ia, va) =>
        ms.filter(_._1 != ia)
          .map { case (ib, vb) => (ib, cos(va, vb)) }
          .sortBy { case (ib, sim) => (-sim, ib) }
          .take(3).map { case (ib, _) => (ia, ib) }
      }
    }.toSet
    val got = rows("q_knn_graph")
    val mutual = got.head.getAs[Long]("mutual_pairs")
    val hist = got.map(x =>
      x.getAs[Long]("in_deg") -> x.getAs[Long]("n_vecs")).toMap
    // histogram covers every vector exactly once
    assert(hist.values.sum == n.toLong)
    // total in-degree mass == |edges| (each edge lands on one dst)
    assert(hist.map { case (d0, c) => d0 * c }.sum == edges.size.toLong)
    // brute in-degree histogram matches
    val inDeg = emb.keys.toSeq.map(id =>
      edges.count(_._2 == id).toLong)
    val bruteHist = inDeg.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    assert(hist == bruteHist, s"got $hist brute $bruteHist")
    // brute mutual count matches
    val bruteMutual = edges.count { case (a, b) =>
      a < b && edges.contains((b, a)) }.toLong
    assert(mutual == bruteMutual)
  }

  test("q_psi_drift ≡ brute-force PSI recomputation; terms nonnegative, " +
      "spine complete, total self-consistent") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.util.Tables.events(spark, d)
      .select(col("value"), unix_micros(col("ts")).as("e")).collect()
      .map(x => (x.getDouble(0), x.getLong(1)))
    val cents = ev.map { case (v, _) => math.floor(v * 100 + 0.5).toLong }
    val (cmin, cmax) = (cents.min, cents.max)
    val (emin, emax) = (ev.map(_._2).min, ev.map(_._2).max)
    val counts = Array.fill(10, 2)(0L)
    ev.zip(cents).foreach { case ((_, e), c) =>
      val era = if (e * 2 >= emin + emax) 1 else 0
      val b = math.min(9L, (c - cmin) * 10 / (cmax - cmin + 1)).toInt
      counts(b)(era) += 1
    }
    val ta = counts.map(_(0)).sum; val tb = counts.map(_(1)).sum
    val terms = (0 until 10).map { b =>
      val pa = (counts(b)(0).toDouble + 1.0) / (ta.toDouble + 10.0)
      val pb = (counts(b)(1).toDouble + 1.0) / (tb.toDouble + 10.0)
      math.floor((pa - pb) * math.log(pa / pb) * 1e9 + 0.5).toLong
    }
    val psi = math.floor(terms.sum.toDouble / 1e9 * 1e6 + 0.5) / 1e6
    val got = rows("q_psi_drift").sortBy(_.getAs[Long]("bucket"))
    assert(got.map(_.getAs[Long]("bucket")) == (0L to 9L),
      "bucket spine incomplete")
    got.foreach { x =>
      val b = x.getAs[Long]("bucket").toInt
      assert(x.getAs[Long]("n_a") == counts(b)(0) &&
        x.getAs[Long]("n_b") == counts(b)(1), s"bucket $b counts")
      assert(x.getAs[Long]("psi_nano") == terms(b), s"bucket $b term")
      assert(x.getAs[Long]("psi_nano") >= 0L,
        s"bucket $b: negative PSI term")
      assert(x.getAs[Double]("psi") == psi)
    }
    assert(ta + tb == ev.length.toLong)
  }

  test("q_hits ≡ brute-force 3-round HITS recomputation; scores " +
      "bounded by the micro cap, the top authority saturates it") {
    import org.apache.spark.sql.functions.{col, explode, sequence, size,
      split, element_at, lit}
    val docs = graft.util.Tables.documents(spark, d)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(element_at(col("t"), col("i")).as("a"),
        element_at(col("t"), col("i") + 1).as("b"))
      .filter(col("a") =!= col("b"))
      .collect().map(x => (x.getString(0), x.getString(1))).distinct
    val nodes = (docs.map(_._1) ++ docs.map(_._2)).distinct.sorted
    var h = nodes.map(_ -> 1000000L).toMap
    var a = nodes.map(_ -> 1000000L).toMap
    (1 to 3).foreach { _ =>
      val ar = docs.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => h(e._1)).sum }
      val am = ar.values.max
      val a2 = ar.map { case (n, v) => n -> v * 1000000L / am }
      val hr = docs.groupBy(_._1).map { case (src, es) =>
        src -> es.map(e => a2.getOrElse(e._2, 0L)).sum }
      val hm = hr.values.max
      val h2 = hr.map { case (n, v) => n -> v * 1000000L / hm }
      a = nodes.map(n => n -> a2.getOrElse(n, 0L)).toMap
      h = nodes.map(n => n -> h2.getOrElse(n, 0L)).toMap
    }
    val expected = nodes.map(n => (n, a(n), h(n)))
      .sortBy(x => (-x._2, x._1)).take(10)
    val got = rows("q_hits").map(x => (x.getAs[String]("node"),
      x.getAs[Long]("auth_micro"), x.getAs[Long]("hub_micro")))
    assert(got.toSeq == expected.toSeq)
    assert(got.forall(x => x._2 >= 0L && x._2 <= 1000000L &&
      x._3 >= 0L && x._3 <= 1000000L))
    // L∞ normalization: the argmax authority sits exactly at the cap
    assert(got.head._2 == 1000000L)
  }

  test("q_jl_project: projection ≡ brute-force md5-sign recompute; " +
      "pair frame complete; energy checksum consistent; distortion " +
      "centered") {
    import org.apache.spark.sql.functions.col
    val emb = graft.util.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(x => x.getLong(0) -> x.getSeq[Double](1).toArray)
    val micro = emb.map { case (v, xs) =>
      v -> xs.map(x => math.floor(x * 1e6 + 0.5).toLong) }.toMap
    def sgn(i: Int, j: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      if (java.lang.Integer.parseInt(hex, 16) % 2 == 0) 1L else -1L
    }
    val proj = micro.map { case (v, xs) =>
      v -> (0 until 4).map(j =>
        xs.indices.map(i => sgn(i, j) * xs(i)).sum).toArray }
    val energy = proj.values.flatMap(_.map(y => BigInt(y) * BigInt(y)))
      .sum
    val got = rows("q_jl_project")
    val sample = micro.keys.filter(_ < 24).toSeq.sorted
    assert(got.size == sample.size * (sample.size - 1) / 2,
      "pair frame incomplete")
    got.foreach { r0 =>
      val (va, vb) = (r0.getAs[Long]("va"), r0.getAs[Long]("vb"))
      val d2o = micro(va).zip(micro(vb))
        .map { case (x, y) => (x - y) * (x - y) }.sum
      val d2p = proj(va).zip(proj(vb))
        .map { case (x, y) => (x - y) * (x - y) }.sum
      assert(r0.getAs[Long]("d2_orig") == d2o &&
        r0.getAs[Long]("d2_proj") == d2p, s"pair ($va,$vb)")
      assert(r0.getAs[Long]("dist_micro") ==
        math.floor(d2p.toDouble / (math.max(d2o, 1L).toDouble * 4.0) *
          1e6 + 0.5).toLong)
      assert(r0.getAs[Long]("n_vecs") == emb.length.toLong)
      // energy is emitted as hash-stable BIGINT hi/lo parts (div/mod
      // 10⁹) since round 11 — reconstruct in BigInt, the total exceeds
      // Long at the larger embedding decades
      assert(BigInt(r0.getAs[Long]("energy_hi")) * BigInt(1000000000L) +
        BigInt(r0.getAs[Long]("energy_lo")) == energy)
    }
    // JL unbiasedness (E d2_proj = k·d2_orig): the mean ratio over the
    // 276-pair frame sits in a broad band around 1 — k=4 is noisy per
    // pair, but the average over 276 pairs concentrates
    val mean = got.map(_.getAs[Long]("dist_micro")).sum.toDouble /
      got.size / 1e6
    assert(mean > 0.3 && mean < 3.0, s"distortion mean off: $mean")
  }

  test("q_acf ≡ brute-force lag products over the sorted series; " +
      "coefficients bounded") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.util.Tables.events(spark, d)
      .select(col("event_type"), unix_micros(col("ts")),
        col("event_id"),
        org.apache.spark.sql.functions
          .floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .map(r0 => (r0.getString(0), r0.getLong(1), r0.getLong(2),
        r0.getLong(3)))
    val bySeries = ev.groupBy(_._1).map { case (k, xs) =>
      k -> xs.sortBy(x => (x._2, x._3)).map(_._4) }
    val got = rows("q_acf")
    assert(got.map(_.getString(0)).toSet == bySeries.keySet)
    got.foreach { r0 =>
      val cs = bySeries(r0.getString(0))
      assert(r0.getAs[Long]("n") == cs.length.toLong)
      val mu = cs.sum / cs.length // integral division, the query's mean
      val dc = cs.map(_ - mu)
      val den = dc.map(x => x * x).sum
      for (l <- 1 to 5) {
        val num = (0 until dc.length - l).map(i => dc(i) * dc(i + l)).sum
        val exp = math.floor(num.toDouble / den.toDouble * 1e6 + 0.5)
          .toLong
        val gotL = r0.getAs[Long](s"acf${l}_micro")
        assert(gotL == exp, s"${r0.getString(0)} lag $l: $gotL != $exp")
        // an autocorrelation is a cosine — always within [-1, 1]
        assert(math.abs(gotL) <= 1000000L)
      }
    }
  }

  test("q_cohen_kappa: contingency internally consistent, kappa " +
      "recomputable from its own cells, class counts agree with q_auc") {
    val got = rows("q_cohen_kappa")
    val auc = rows("q_auc")
      .map(r0 => r0.getString(0) ->
        (r0.getAs[Long]("n_pos"), r0.getAs[Long]("n_neg"))).toMap
    assert(got.nonEmpty && got.map(_.getString(0)).toSet == auc.keySet)
    got.foreach { r0 =>
      val (n, n11, n10, n01, n00) = (r0.getAs[Long]("n"),
        r0.getAs[Long]("n11"), r0.getAs[Long]("n10"),
        r0.getAs[Long]("n01"), r0.getAs[Long]("n00"))
      assert(n == n11 + n10 + n01 + n00, "cells don't tile the corpus")
      // the gopher-positive mass is the SAME labeler q_auc counts
      val (np, ng) = auc(r0.getString(0))
      assert(n11 + n10 == np && n01 + n00 == ng,
        s"${r0.getString(0)}: labeler-A marginals disagree with q_auc")
      val po = (n11 + n00).toDouble / n
      val pa = (n11 + n10).toDouble / n
      val pb = (n11 + n01).toDouble / n
      val pe = pa * pb + (1.0 - pa) * (1.0 - pb)
      val exp = math.floor((po - pe) / (1.0 - pe) * 1e6 + 0.5).toLong
      assert(r0.getAs[Long]("kappa_micro") == exp)
      assert(math.abs(r0.getAs[Long]("kappa_micro")) <= 1000000L)
    }
  }

  test("q_brier: decomposition parts nonnegative, resolution bounded " +
      "by uncertainty (law of total variance), uncertainty follows the " +
      "kappa contingency's base rate, Murphy identity within bin band") {
    val got = rows("q_brier")
    val kap = rows("q_cohen_kappa")
      .map(r0 => r0.getString(0) ->
        (r0.getAs[Long]("n"), r0.getAs[Long]("n11") +
          r0.getAs[Long]("n10"))).toMap
    assert(got.nonEmpty && got.map(_.getString(0)).toSet == kap.keySet)
    got.foreach { r0 =>
      val (brier, rel, res, unc) = (r0.getAs[Long]("brier_micro"),
        r0.getAs[Long]("reliability_micro"),
        r0.getAs[Long]("resolution_micro"),
        r0.getAs[Long]("uncertainty_micro"))
      assert(brier >= 0 && rel >= 0 && res >= 0 && unc >= 0)
      assert(brier <= 1000000L && unc <= 250000L)
      // Var(E[o|bin]) <= Var(o) exactly; integerization slop only
      assert(res <= unc + 5, s"${r0.getString(0)}: resolution $res " +
        s"exceeds uncertainty $unc")
      val (n, npos) = kap(r0.getString(0))
      assert(r0.getAs[Long]("n") == n)
      val obar = npos.toDouble / n
      assert(unc == math.floor(obar * (1.0 - obar) * 1e6 + 0.5).toLong,
        s"${r0.getString(0)}: uncertainty drifted from the base rate")
      assert(math.abs(brier - (rel - res + unc)) <= 10000,
        s"${r0.getString(0)}: Murphy identity broke")
    }
  }

  test("q_sssp ≡ brute-force 4-round Bellman-Ford over the surprisal-" +
      "weighted bigram graph") {
    import org.apache.spark.sql.functions.col
    val texts = graft.util.Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    texts.foreach { t =>
      val tk = t.split(" ")
      (1 until tk.length).foreach { i =>
        if (tk(i - 1) != tk(i)) counts((tk(i - 1), tk(i))) += 1L
      }
    }
    val outc = counts.toSeq.groupBy(_._1._1)
      .map { case (s0, xs) => s0 -> xs.map(_._2).sum }
    val w = counts.map { case ((a, b), c) =>
      (a, b) -> math.floor(-math.log(c.toDouble / outc(a).toDouble)
        * 1e6 + 0.5).toLong }
    val src = counts.keys.map(_._1).min
    var dist = Map(src -> 0L)
    for (_ <- 1 to 4) {
      val relax = dist.toSeq.flatMap { case (u, du) =>
        w.collect { case ((a, b), wt) if a == u => b -> (du + wt) } }
      dist = (dist.toSeq ++ relax).groupBy(_._1)
        .map { case (k, xs) => k -> xs.map(_._2).min }
    }
    val got = rows("q_sssp")
      .map(r0 => r0.getString(0) -> r0.getAs[Long]("dist_micro")).toMap
    assert(got == dist,
      s"extra=${(got.toSet -- dist.toSet).take(3)} " +
        s"missing=${(dist.toSet -- got.toSet).take(3)}")
    assert(got(src) == 0L)
  }

  test("q_entropy_rate ≡ brute-force conditional entropy; conditioning " +
      "bound h_rate <= second-token unigram entropy") {
    import org.apache.spark.sql.functions.col
    val texts = graft.util.Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    texts.foreach { t =>
      val tk = t.split(" ")
      (1 until tk.length).foreach { i =>
        if (tk(i - 1) != tk(i)) counts((tk(i - 1), tk(i))) += 1L
      }
    }
    val outc = counts.toSeq.groupBy(_._1._1)
      .map { case (a, xs) => a -> xs.map(_._2).sum }
    val total = counts.values.sum
    val mass = counts.map { case ((a, _), c) =>
      c * math.floor(-math.log(c.toDouble / outc(a).toDouble) * 1e6
        + 0.5).toLong }.sum
    val got = rows("q_entropy_rate").head
    assert(got.getAs[Long]("n_bigrams") == total)
    assert(got.getAs[Long]("h_mass_micro") == mass)
    assert(got.getAs[Long]("h_rate_micro") == mass / total)
    // H(X2|X1) <= H(X2): the second-token marginal's unigram entropy
    // (exact math; integerization slop is sub-micro per term)
    val m2 = counts.toSeq.groupBy(_._1._2)
      .map { case (_, xs) => xs.map(_._2).sum }
    val h2 = m2.map { c =>
      -c.toDouble / total * math.log(c.toDouble / total) }.sum
    assert(got.getAs[Long]("h_rate_micro") <=
      math.ceil(h2 * 1e6).toLong + 10,
      s"conditioning bound violated: ${got.getAs[Long]("h_rate_micro")}" +
        s" vs ${math.ceil(h2 * 1e6).toLong}")
  }

  test("q_gini_tokens ≡ brute-force ranked Lorenz sum; coefficient in " +
      "[0, 1)") {
    import org.apache.spark.sql.functions.col
    val counts = graft.util.Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(_.split(" "))
      .groupBy(identity).map { case (_, xs) => xs.length.toLong }
      .toSeq.sorted
    val n = counts.length.toLong
    val t = counts.sum
    val s0 = counts.zipWithIndex
      .map { case (c, i) => (i + 1).toLong * c }.sum
    val exp = math.floor((2L * s0 - (n + 1) * t).toDouble /
      (n * t).toDouble * 1e6 + 0.5).toLong
    val got = rows("q_gini_tokens").head
    assert(got.getAs[Long]("n_vocab") == n)
    assert(got.getAs[Long]("n_tokens") == t)
    assert(got.getAs[Long]("gini_micro") == exp,
      s"rank-run fold diverged from the brute-force rank sum: " +
        s"${got.getAs[Long]("gini_micro")} != $exp")
    assert(got.getAs[Long]("gini_micro") >= 0 &&
      got.getAs[Long]("gini_micro") < 1000000L)
  }

  test("q_good_turing ≡ brute-force trigram frequency-of-frequencies; " +
      "totals consistent, p0 is the hapax share") {
    import org.apache.spark.sql.functions.col
    val counts = graft.util.Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val tk = t.split(" ")
        if (tk.length < 3) Seq.empty
        else tk.sliding(3).map(_.mkString(" ")).toSeq
      }
      .groupBy(identity).map { case (_, xs) => xs.length.toLong }
    val ff = counts.groupBy(identity)
      .map { case (c, xs) => c -> xs.size.toLong }
    val n = counts.sum
    val v = counts.size.toLong
    val n1 = ff.getOrElse(1L, 0L)
    val got = rows("q_good_turing")
    assert(got.nonEmpty && got.size == ff.keys.count(_ <= 5L))
    got.foreach { x =>
      val c = x.getAs[Long]("c")
      val mNext = ff.getOrElse(c + 1, 0L)
      assert(x.getAs[Long]("m_c") == ff(c))
      assert(x.getAs[Long]("m_next") == mNext)
      assert(x.getAs[Long]("c_star_micro") ==
        (c + 1) * mNext * 1000000L / ff(c))
      assert(x.getAs[Long]("p0_micro") == n1 * 1000000L / n)
      assert(x.getAs[Long]("n_tokens") == n)
      assert(x.getAs[Long]("n_vocab") == v)
    }
    // a natural corpus has hapaxes, so the unseen mass is real
    assert(n1 > 0L && got.head.getAs[Long]("p0_micro") > 0L)
  }

  test("q_spearman ≡ brute-force tie-average ranks + Pearson on " +
      "ranks; rho in [-1, 1] and positive for length vs distinct") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
      .map { t =>
        val tk = t.split(" ")
        (tk.length.toLong, tk.distinct.length.toLong)
      }
    def avgRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      sorted.distinct.map { v =>
        val below = sorted.count(_ < v)
        val ties = sorted.count(_ == v)
        v -> (below + (ties + 1) / 2.0)
      }.toMap
    }
    val rx = avgRanks(docs.map(_._1).toSeq)
    val ry = avgRanks(docs.map(_._2).toSeq)
    val n = docs.length.toDouble
    val xs = docs.map(p => rx(p._1))
    val ys = docs.map(p => ry(p._2))
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
      ys.map(b => (b - my) * (b - my)).sum)
    val rho = num / den
    val got = rows("q_spearman").head
    assert(got.getAs[Long]("n_docs") == docs.length.toLong)
    // doubled-rank sums identity: Σ2r = n(n+1) on both axes
    assert(got.getAs[Long]("sx") == docs.length.toLong *
      (docs.length + 1))
    assert(got.getAs[Long]("sy") == docs.length.toLong *
      (docs.length + 1))
    val gotRho = got.getAs[Long]("rho_micro")
    assert(math.abs(gotRho - rho * 1e6) <= 2,
      s"rank-grid rho diverged from brute force: $gotRho vs ${rho * 1e6}")
    assert(gotRho > 0L && gotRho <= 1000000L,
      "length and vocabulary breadth should correlate positively")
  }

  test("q_wasserstein ≡ brute-force CDF-area integral per pair; " +
      "metric properties hold (symmetry baked in, identity, " +
      "triangle on micro values)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1).split(" ").length.toLong))
    val bySrc = docs.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.map(_._2).sorted }
    def w1(a: Seq[Long], b: Seq[Long]): Double = {
      val dom = (a ++ b).distinct.sorted
      dom.zip(dom.tail).map { case (l, nl) =>
        val fa = a.count(_ <= l).toDouble / a.length
        val fb = b.count(_ <= l).toDouble / b.length
        math.abs(fa - fb) * (nl - l)
      }.sum
    }
    val got = rows("q_wasserstein")
    val bySrcSeq = bySrc.map { case (k, v) => k -> v.toSeq }
    assert(got.size ==
      bySrc.size * (bySrc.size - 1) / 2, "pair frame incomplete")
    val m = got.map { x =>
      (x.getAs[String]("src_a"), x.getAs[String]("src_b")) ->
        x.getAs[Long]("w1_micro") }.toMap
    got.foreach { x =>
      val (sa, sb) = (x.getAs[String]("src_a"), x.getAs[String]("src_b"))
      assert(x.getAs[Long]("n_a") == bySrcSeq(sa).size.toLong)
      val exp = w1(bySrcSeq(sa), bySrcSeq(sb))
      assert(math.abs(x.getAs[Long]("w1_micro") - exp * 1e6) <= 2,
        s"($sa,$sb): ${x.getAs[Long]("w1_micro")} vs ${exp * 1e6}")
    }
    // identity of indiscernibles: a source vs itself would be 0 —
    // approximate via triangle inequality over the reported pairs
    def dist(a: String, b: String): Long =
      if (a == b) 0L
      else m.getOrElse((a, b), m((b, a)))
    val srcs = bySrc.keys.toSeq.sorted
    for (a <- srcs; b <- srcs; c <- srcs if a < b && b < c)
      assert(dist(a, c) <= dist(a, b) + dist(b, c) + 2,
        s"triangle violated at ($a,$b,$c)")
  }

  test("q_kruskal ≡ brute-force average-rank H with tie correction; " +
      "rank-sum identity holds") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1).split(" ").length.toLong))
    val all = docs.map(_._2).sorted
    val n = all.length.toDouble
    def avgRank(v: Long): Double =
      all.count(_ < v) + (all.count(_ == v) + 1) / 2.0
    val groups = docs.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.map(p => avgRank(p._2)) }
    val sTerm = groups.toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.sum * rs.sum / rs.length }.sum
    val h = 12.0 / (n * (n + 1.0)) * sTerm - 3.0 * (n + 1.0)
    val tieSum = all.groupBy(identity)
      .map { case (_, xs) => xs.length.toLong }
      .map(t => t * t * t - t).sum
    val c = 1.0 - tieSum.toDouble / (n * n * n - n)
    val got = rows("q_kruskal")
    assert(got.size == groups.size)
    // Σ rank2_sum over groups = 2·Σranks = n(n+1)
    assert(got.map(_.getAs[Long]("rank2_sum")).sum ==
      all.length.toLong * (all.length + 1))
    got.foreach { x =>
      val src = x.getAs[String]("source")
      assert(x.getAs[Long]("n_g") == groups(src).size.toLong)
      assert(math.abs(x.getAs[Long]("h_micro") - h * 1e6) <= 2,
        s"H diverged: ${x.getAs[Long]("h_micro")} vs ${h * 1e6}")
      assert(math.abs(x.getAs[Long]("hc_micro") - h / c * 1e6) <= 2)
      assert(x.getAs[Long]("tie_sum") == tieSum)
      assert(x.getAs[Long]("df") == groups.size.toLong - 1)
    }
  }

  test("q_fleiss_kappa ≡ brute-force four-gate vote histogram and " +
      "kappa; masses conserve") {
    import org.apache.spark.sql.functions.col
    val stop = Set("the", "a", "an", "of", "to", "in", "and", "is",
      "it", "that")
    val votes = graft.util.Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
      .map { t =>
        val tk = t.split(" ")
        val nTok = tk.length.toLong
        val wordChars = t.length.toLong - (nTok - 1)
        val stopHits = tk.count(stop.contains).toLong
        val nDistinct = tk.distinct.length.toLong
        val g1 = if (nTok < 20 || nTok > 1000) 0L else 1L
        val g2 = if (wordChars < nTok * 3 || wordChars > nTok * 10) 0L
          else 1L
        val g3 = if (stopHits < 2) 0L else 1L
        val g4 = if (nDistinct * 10 < nTok * 3) 0L else 1L
        g1 + g2 + g3 + g4
      }
    val hist = votes.groupBy(identity)
      .map { case (x, xs) => x -> xs.length.toLong }
    val n = votes.length.toDouble
    val t = votes.sum.toDouble
    val s2 = votes.map(x => x * x + (4 - x) * (4 - x)).sum.toDouble
    val pb = (s2 - 4.0 * n) / (12.0 * n)
    val pq = t / (4.0 * n)
    val pe = pq * pq + (1.0 - pq) * (1.0 - pq)
    val kappa = (pb - pe) / (1.0 - pe)
    val got = rows("q_fleiss_kappa")
    assert(got.size == hist.size)
    assert(got.map(_.getAs[Long]("n_x")).sum == votes.length.toLong)
    got.foreach { x =>
      assert(x.getAs[Long]("n_x") == hist(x.getAs[Long]("keep_votes")))
      assert(x.getAs[Long]("n_docs") == votes.length.toLong)
      assert(x.getAs[Long]("p_keep_micro") ==
        votes.sum * 1000000L / (4L * votes.length))
      assert(math.abs(x.getAs[Long]("kappa_micro") - kappa * 1e6) <= 2,
        s"kappa diverged: ${x.getAs[Long]("kappa_micro")} vs ${kappa * 1e6}")
      assert(x.getAs[Long]("kappa_micro") >= -1000000L &&
        x.getAs[Long]("kappa_micro") <= 1000000L)
    }
  }

  test("q_cliffs_delta ≡ brute-force O(n_a·n_b) dominance count; " +
      "masses conserve and delta is consistent with wasserstein's " +
      "pair frame") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1).split(" ").length.toLong))
    val bySrc = docs.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.map(_._2).toSeq }
    val got = rows("q_cliffs_delta")
    assert(got.size == bySrc.size * (bySrc.size - 1) / 2)
    got.foreach { x =>
      val a = bySrc(x.getAs[String]("src_a"))
      val b = bySrc(x.getAs[String]("src_b"))
      var (w, t, l) = (0L, 0L, 0L)
      for (va <- a; vb <- b) {
        if (va > vb) w += 1 else if (va == vb) t += 1 else l += 1
      }
      assert(x.getAs[Long]("wins") == w)
      assert(x.getAs[Long]("ties") == t)
      assert(x.getAs[Long]("losses") == l)
      assert(w + t + l == a.size.toLong * b.size)
      val exp = math.floor((w - l).toDouble /
        (a.size.toDouble * b.size.toDouble) * 1e6 + 0.5).toLong
      assert(x.getAs[Long]("delta_micro") == exp)
    }
    // same pair frame as q_wasserstein (shared grid contract)
    val wFrame = rows("q_wasserstein").map(x =>
      (x.getAs[String]("src_a"), x.getAs[String]("src_b"))).toSet
    assert(got.map(x => (x.getAs[String]("src_a"),
      x.getAs[String]("src_b"))).toSet == wFrame)
  }

  test("q_cross_perplexity ≡ brute-force add-1 bigram scoring; " +
      "n_bigrams constant per scored source") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1).split(" ")))
      .filter(_._2.length >= 2)
    val grids: Map[String, Map[(String, String), Long]] =
      docs.groupBy(_._1).map { case (src, xs) =>
        src -> xs.flatMap(p => p._2.sliding(2).map(w => (w(0), w(1))))
          .groupBy(identity).map { case (k, ys) => k -> ys.length.toLong }
      }
    val vocab = grids.values.flatMap(_.keys)
      .flatMap(k => Seq(k._1, k._2)).toSet.size.toLong
    val outc: Map[String, Map[String, Long]] =
      grids.map { case (src, g) =>
        src -> g.groupBy(_._1._1).map { case (x0, m) => x0 -> m.values.sum }
      }
    val got = rows("q_cross_perplexity")
    assert(got.size == grids.size * grids.size, "pair matrix incomplete")
    got.foreach { r =>
      val (sa, sb) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val ga = grids(sa)
      val na = ga.values.sum
      val mass = ga.map { case ((x0, y0), ca) =>
        val cb = grids(sb).getOrElse((x0, y0), 0L)
        val oc = outc(sb).getOrElse(x0, 0L)
        ca * math.floor(-math.log((cb + 1).toDouble /
          (oc + vocab).toDouble) * 1e6 + 0.5).toLong
      }.sum
      assert(r.getAs[Long]("n_bigrams") == na)
      assert(r.getAs[Long]("h_cross_micro") == mass / na,
        s"($sa under $sb): ${r.getAs[Long]("h_cross_micro")} " +
          s"vs ${mass / na}")
    }
  }

  test("q_mmr_rerank ≡ brute-force greedy MMR from raw embeddings; " +
      "rank 1 is pure relevance, scores non-increasing, picks " +
      "distinct") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.util.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosDm(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000.0).toLong
    }
    val qv = vecs(0L)
    val pool = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cosDm(v, qv)) }
      .sortBy(x => (-x._3, x._1)).take(20)
    var selected = Vector.empty[(Long, Long, Long, Long)]
    var remaining = pool
    (1L to 5L).foreach { rank =>
      val scored = remaining.map { case (id, v, rel) =>
        val ms = if (selected.isEmpty) 0L
          else selected.map(sl => cosDm(v, vecs(sl._2))).max
        (id, rel, ms, 7L * rel - 3L * ms)
      }
      val best = scored.minBy(x => (-x._4, x._1))
      selected :+= ((rank, best._1, best._2, best._3))
      remaining = remaining.filterNot(_._1 == best._1)
    }
    val got = rows("q_mmr_rerank").sortBy(_.getAs[Long]("rnk"))
    assert(got.size == 5)
    got.zip(selected).foreach { case (g, (rank, id, rel, ms)) =>
      assert(g.getAs[Long]("rnk") == rank)
      assert(g.getAs[Long]("vec_id") == id,
        s"pick $rank diverged: ${g.getAs[Long]("vec_id")} vs $id")
      assert(g.getAs[Long]("rel_dm") == rel)
      assert(g.getAs[Long]("maxsim_dm") == ms)
      assert(g.getAs[Long]("mmr_score") == 7L * rel - 3L * ms)
    }
    // structural properties: rank 1 is the relevance argmax; greedy
    // scores can only fall; no repeats
    assert(got.head.getAs[Long]("vec_id") == pool.head._1)
    val scores = got.map(_.getAs[Long]("mmr_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"greedy MMR scores increased: $scores")
    assert(got.map(_.getAs[Long]("vec_id")).distinct.size == 5)
  }

  private def md5hex(s0: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_conformal ≡ brute-force order statistic; the conformal " +
      "coverage guarantee holds: coverage >= 1 - alpha") {
    import org.apache.spark.sql.functions.col
    val scores = rows("q_quality_score").map { x =>
      x.getAs[Long]("doc_id") ->
        (1000000L - math.floor(x.getAs[Double]("q_score") * 1e6 + 0.5)
          .toLong) }.toMap
    val gate = rows("q_gopher_filter")
      .filter(_.getAs[Long]("fail_bits") == 0L)
      .map(_.getAs[Long]("doc_id")).toSet
    val cal = scores.filter(x => gate(x._1)).values.toSeq.sorted
    val n = cal.length.toLong
    val k = math.ceil((n + 1) * 0.9).toLong
    val qhat = cal((k - 1).toInt)
    val nCov = cal.count(_ <= qhat).toLong
    val got = rows("q_conformal").head
    assert(got.getAs[Long]("n_cal") == n)
    assert(got.getAs[Long]("k") == k)
    assert(got.getAs[Long]("qhat_micro") == qhat,
      s"bucket refinement missed the order statistic: " +
        s"${got.getAs[Long]("qhat_micro")} vs $qhat")
    assert(got.getAs[Long]("n_covered") == nCov)
    assert(got.getAs[Long]("n_covered") >= k,
      "order statistic must cover at least its own rank")
    assert(got.getAs[Long]("coverage_micro") >= 900000L,
      s"conformal guarantee violated: ${got.getAs[Long]("coverage_micro")}")
  }

  test("q_bootstrap_ci ≡ brute-force Poisson draws; endpoints are " +
      "exact order statistics and the interval is ordered") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1).split(" ", -1).length.toLong))
    val cuts = {
      val fact = Array(1L, 1L, 2L, 6L, 24L, 120L, 720L, 5040L, 40320L)
      var s0 = 0.0
      (0 to 8).map { k => s0 += 1.0 / fact(k); math.exp(-1.0) * s0 }
    }
    def weight(id: Long, rep: Int): Long = {
      // 4 draws per md5: 8 hex chars each, block-keyed on rep/4
      val hex = md5hex(s"$id|${rep / 4}")
        .substring(8 * (rep % 4), 8 * (rep % 4) + 8)
      val u = java.lang.Long.parseLong(hex, 16) / 4294967296.0
      cuts.indexWhere(u < _) match {
        case -1 => 9L; case k => k.toLong
      }
    }
    val means = (0 until 100).map { rep =>
      var sw = 0L; var swx = 0L
      docs.foreach { case (id, x) =>
        val w = weight(id, rep); sw += w; swx += w * x }
      swx * 1000000L / sw
    }.sorted
    val got = rows("q_bootstrap_ci").head
    assert(got.getAs[Long]("n_docs") == docs.length.toLong)
    assert(got.getAs[Long]("mean_micro") ==
      docs.map(_._2).sum * 1000000L / docs.length)
    assert(got.getAs[Long]("ci_lo_micro") == means(4),
      s"lo: ${got.getAs[Long]("ci_lo_micro")} vs ${means(4)}")
    assert(got.getAs[Long]("ci_hi_micro") == means(95))
    assert(got.getAs[Long]("ci_lo_micro") <=
      got.getAs[Long]("ci_hi_micro"))
    assert(got.getAs[Long]("n_replicates") == 100L)
  }

  test("q_dp_counts ≡ brute-force seeded Laplace; census conserves, " +
      "noise bounded by the 48-bit uniform's tails") {
    import org.apache.spark.sql.functions.col
    val trueCounts = graft.util.Tables.documents(spark, d)
      .select(col("source")).collect().map(_.getString(0))
      .groupBy(identity).map { case (s0, xs) => s0 -> xs.length.toLong }
    val got = rows("q_dp_counts")
    assert(got.size == trueCounts.size)
    assert(got.map(_.getAs[Long]("n_docs")).sum ==
      trueCounts.values.sum)
    got.foreach { x =>
      val src = x.getAs[String]("source")
      val u = java.lang.Long.parseLong(
        md5hex(src).take(12), 16) / 281474976710656.0
      val lap = if (u < 0.5) math.log(1.0 - 2.0 * (0.5 - u))
        else -math.log(1.0 - 2.0 * (u - 0.5))
      val lapM = math.floor(lap * 1e6 + 0.5).toLong
      assert(x.getAs[Long]("n_docs") == trueCounts(src))
      assert(x.getAs[Long]("lap_micro") == lapM,
        s"$src: ${x.getAs[Long]("lap_micro")} vs $lapM")
      assert(x.getAs[Long]("noisy_micro") ==
        trueCounts(src) * 1000000L + lapM)
      assert(math.abs(lapM) < 35000000L,
        "Laplace draw outside the 48-bit uniform's possible range")
    }
  }

  test("q_mcc ≡ brute-force 2x2 from the public score/gate queries; " +
      "confusion mass conserves, mcc in [-1, 1]") {
    val qm = rows("q_quality_score").map { x =>
      x.getAs[Long]("doc_id") ->
        math.floor(x.getAs[Double]("q_score") * 1e6 + 0.5).toLong }.toMap
    val pos = rows("q_gopher_filter")
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("fail_bits") == 0L)).toMap
    var (tp, fp, fn, tn) = (0L, 0L, 0L, 0L)
    qm.foreach { case (id, q) =>
      (q >= 500000L, pos(id)) match {
        case (true, true) => tp += 1
        case (true, false) => fp += 1
        case (false, true) => fn += 1
        case (false, false) => tn += 1
      }
    }
    val den = math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
      (tn + fp).toDouble * (tn + fn).toDouble)
    val mcc = if (den <= 0.0) 0L
      else math.floor((tp.toDouble * tn.toDouble -
        fp.toDouble * fn.toDouble) / den * 1e6 + 0.5).toLong
    val got = rows("q_mcc").head
    assert(got.getAs[Long]("tp") == tp && got.getAs[Long]("fp") == fp)
    assert(got.getAs[Long]("fn") == fn && got.getAs[Long]("tn") == tn)
    assert(tp + fp + fn + tn == qm.size.toLong)
    assert(got.getAs[Long]("acc_micro") ==
      (tp + tn) * 1000000L / qm.size)
    assert(got.getAs[Long]("mcc_micro") == mcc)
    assert(math.abs(got.getAs[Long]("mcc_micro")) <= 1000000L)
  }

  test("q_llr_colloc ≡ brute-force Dunning G² over the loop-filtered " +
      "bigram table; scores non-negative-dominant and ranked") {
    import org.apache.spark.sql.functions.col
    val pairs = graft.util.Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val tk = t.split(" ")
        (1 until tk.length).collect {
          case i if tk(i - 1) != tk(i) => (tk(i - 1), tk(i)) }
      }
    val cnt = pairs.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    val ca = cnt.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val cb = cnt.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val n = cnt.values.sum
    def cell(obs: Long, row: Long, colm: Long): Long =
      if (obs <= 0L) 0L
      else obs * math.floor(math.log(obs.toDouble * n.toDouble /
        (row.toDouble * colm.toDouble)) * 1e6 + 0.5).toLong
    val g2 = cnt.map { case ((a, b), cab) =>
      (a, b, cab, 2L * (cell(cab, ca(a), cb(b)) +
        cell(ca(a) - cab, ca(a), n - cb(b)) +
        cell(cb(b) - cab, n - ca(a), cb(b)) +
        cell(n - ca(a) - cb(b) + cab, n - ca(a), n - cb(b))))
    }.toSeq.sortBy(x => (-x._4, x._1, x._2)).take(20)
    val got = rows("q_llr_colloc")
    assert(got.size == math.min(20, g2.size))
    got.zip(g2).foreach { case (r, (a, b, cab, s0)) =>
      assert(r.getAs[String]("a") == a && r.getAs[String]("b") == b,
        s"rank frame diverged at ($a,$b)")
      assert(r.getAs[Long]("cab") == cab)
      assert(r.getAs[Long]("g2_micro") == s0)
    }
    val s = got.map(_.getAs[Long]("g2_micro"))
    assert(s.zip(s.tail).forall { case (x, y) => x >= y })
  }

  test("q_rbo_overlap ≡ brute-force BM25/tf rankings + telescoped " +
      "weight sum; bounded by the full-agreement RBO") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1).split(" ", -1)))
    val n = docs.length.toLong
    val tot = docs.map(_._2.length.toLong).sum
    val weights = graft.queries.PipelineQueries.rboWeightsMicro
    val fullAgreement = weights.sum
    val got = rows("q_rbo_overlap")
    assert(got.nonEmpty)
    got.foreach { row =>
      val term = row.getAs[String]("term")
      val cand = docs.map { case (id, tk) =>
        (id, tk.length.toLong, tk.count(_ == term).toLong)
      }.filter(_._3 > 0)
      val df = cand.length.toLong
      def sm(tf: Long, dl: Long): Long = math.floor(
        math.log(((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
          * (tf.toDouble * 2.2)
          / (tf.toDouble + 1.2 * (0.25
            + 0.75 * dl.toDouble / (tot.toDouble / n)))
          * 1e6 + 0.5).toLong
      val top = cand.map { case (id, dl, tf) => (id, tf, sm(tf, dl)) }
        .sortBy(x => (-x._3, x._1)).take(10)
      val ra = top.map(_._1)
        .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      val rb = top.sortBy(x => (-x._2, x._1)).map(_._1)
        .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      val exp = top.map(_._1)
        .map(id => weights((math.max(ra(id), rb(id)) - 1).toInt)).sum
      assert(row.getAs[Long]("n_cand") == top.length.toLong)
      assert(row.getAs[Long]("rbo_micro") == exp,
        s"$term: ${row.getAs[Long]("rbo_micro")} vs $exp")
      assert(row.getAs[Long]("rbo_micro") <= fullAgreement &&
        row.getAs[Long]("rbo_micro") >= 0L)
    }
  }

  test("q_hill_tail ≡ brute-force top-51 trigram order statistics; " +
      "alpha non-negative") {
    import org.apache.spark.sql.functions.col
    val counts = graft.util.Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val tk = t.split(" ", -1)
        if (tk.length < 3) Seq.empty
        else tk.sliding(3).map(_.mkString(" ")).toSeq
      }
      .groupBy(identity).map { case (_, xs) => xs.length.toLong }
      .toSeq.sorted.reverse.take(51)
    val ck1 = counts.last
    val sumLn = counts.take(50).map { ci =>
      math.floor(math.log(ci.toDouble / ck1.toDouble) * 1e6 + 0.5)
        .toLong }.sum
    val alpha = if (sumLn == 0L) 0L else 50L * 1000000000000L / sumLn
    val got = rows("q_hill_tail").head
    assert(got.getAs[Long]("k") == 50L)
    assert(got.getAs[Long]("c_k1") == ck1)
    assert(got.getAs[Long]("sum_ln_micro") == sumLn)
    assert(got.getAs[Long]("alpha_micro") == alpha)
    assert(got.getAs[Long]("alpha_micro") >= 0L)
  }

  test("q_shard_assign ≡ brute-force rendezvous argmax; minimal " +
      "movement holds exactly (every mover lands on the new shard)") {
    import org.apache.spark.sql.functions.col
    val ids = graft.util.Tables.documents(spark, d)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def assign(id: Long, n: Int): Long =
      (0 until n).map { sh =>
        java.lang.Long.parseLong(md5hex(s"$id#$sh").take(12), 16) *
          32L + sh
      }.max % 32L
    val a16 = ids.map(id => id -> assign(id, 16)).toMap
    val a17 = ids.map(id => id -> assign(id, 17)).toMap
    // the rendezvous property itself, from first principles
    ids.foreach { id =>
      if (a16(id) != a17(id)) assert(a17(id) == 16L,
        s"doc $id moved to ${a17(id)} — not minimal movement")
    }
    val census = ids.groupBy(a16).map { case (sh, xs) =>
      sh -> (xs.length.toLong,
        xs.count(id => a16(id) != a17(id)).toLong) }
    val got = rows("q_shard_assign")
    assert(got.map(_.getAs[Long]("n_docs")).sum == ids.length.toLong)
    assert(got.forall(_.getAs[Long]("bad_moves") == 0L))
    got.foreach { x =>
      val (n, moved) = census(x.getAs[Long]("shard"))
      assert(x.getAs[Long]("n_docs") == n)
      assert(x.getAs[Long]("moved_out") == moved)
    }
  }

  test("q_curriculum ≡ per-source top-5 of q_quality_score; ranks " +
      "dense, scores non-increasing within source") {
    import org.apache.spark.sql.functions.col
    val srcOf = graft.util.Tables.documents(spark, d)
      .select(col("doc_id"), col("source")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val qs = rows("q_quality_score").map { x =>
      val id = x.getAs[Long]("doc_id")
      (srcOf(id), id,
        math.floor(x.getAs[Double]("q_score") * 1e6 + 0.5).toLong)
    }
    val expected = qs.groupBy(_._1).flatMap { case (src, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex.map {
        case ((_, id, qm), i) => (i + 1L, src, id, qm) }
    }.toSet
    val got = rows("q_curriculum")
    assert(got.map(x => (x.getAs[Long]("rk"), x.getAs[String]("source"),
      x.getAs[Long]("doc_id"), x.getAs[Long]("qm"))).toSet == expected)
    got.groupBy(_.getAs[String]("source")).foreach { case (_, xs) =>
      val byRk = xs.sortBy(_.getAs[Long]("rk"))
      assert(byRk.map(_.getAs[Long]("rk")) ==
        (1L to byRk.size.toLong))
      val q2 = byRk.map(_.getAs[Long]("qm"))
      assert(q2.zip(q2.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_token_dropout ≡ brute-force seeded md5 draws; drop " +
      "fraction near 1/5, order and separators preserved") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val got = rows("q_token_dropout")
    assert(got.size == docs.size)
    var (kept, total) = (0L, 0L)
    got.foreach { x =>
      val id = x.getAs[Long]("doc_id")
      val tk = docs(id).split(" ", -1)
      val expKept = tk.zipWithIndex.collect { case (t, i)
        if java.lang.Integer.parseInt(
          md5hex(s"$id:${i + 1}").take(4), 16) % 5 != 0 => t }
      assert(x.getAs[Long]("n_tokens") == tk.length.toLong)
      assert(x.getAs[Long]("n_kept") == expKept.length.toLong)
      assert(x.getAs[String]("aug_text") == expKept.mkString(" "),
        s"doc $id: augmented text diverged from the seeded draws")
      kept += expKept.length; total += tk.length
    }
    val frac = (total - kept).toDouble / total
    assert(frac > 0.12 && frac < 0.28,
      s"drop fraction $frac implausible for a 1/5 draw")
  }

  test("q_ks_test ≡ brute-force ECDF sup-norm; D bounded, argmax is " +
      "the earliest cent, era totals conserve") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.util.Tables.events(spark, d)
      .select(col("value"), unix_micros(col("ts")).as("e")).collect()
      .map(x => (math.floor(x.getDouble(0) * 100 + 0.5).toLong,
        x.getLong(1)))
    val (emin, emax) = (ev.map(_._2).min, ev.map(_._2).max)
    val byEra = ev.map { case (c, e) =>
      (c, if (e * 2 >= emin + emax) 1 else 0) }
    val ta = byEra.count(_._2 == 0).toLong
    val tb = byEra.count(_._2 == 1).toLong
    val cents = byEra.map(_._1).distinct.sorted
    var (cuma, cumb) = (0L, 0L)
    var best = (Long.MinValue, Long.MaxValue) // (d_micro, at_cents)
    cents.foreach { c =>
      cuma += byEra.count(x => x._1 == c && x._2 == 0)
      cumb += byEra.count(x => x._1 == c && x._2 == 1)
      val dm = math.abs(cuma * 1000000L / math.max(ta, 1L) -
        cumb * 1000000L / math.max(tb, 1L))
      if (dm > best._1) best = (dm, c)
    }
    val got = rows("q_ks_test")
    assert(got.size == 1)
    val r0 = got.head
    assert(r0.getAs[Long]("ks_micro") == best._1 &&
      r0.getAs[Long]("at_cents") == best._2)
    assert(r0.getAs[Long]("ks_micro") >= 0L &&
      r0.getAs[Long]("ks_micro") <= 1000000L)
    assert(r0.getAs[Long]("n_a") == ta && r0.getAs[Long]("n_b") == tb)
    assert(ta + tb == ev.length.toLong)
  }

  test("q_benford ≡ brute-force first-digit χ²; spine complete, counts " +
      "conserve, expected masses sum to the total") {
    import org.apache.spark.sql.functions.col
    val pNano = Array(301029996L, 176091259L, 124938737L, 96910013L,
      79181246L, 66946790L, 57991947L, 51152522L, 45757491L)
    val digits = graft.util.Tables.orders(spark, d)
      .select(col("o_totalprice")).collect()
      .map(x => math.floor(x.getDouble(0)).toLong.toString.charAt(0) - '0')
      .filter(_ >= 1)
    val n = (1 to 9).map(dg => digits.count(_ == dg).toLong)
    val t = n.sum
    val got = rows("q_benford").sortBy(_.getAs[Long]("digit"))
    assert(got.map(_.getAs[Long]("digit")) == (1L to 9L),
      "digit spine incomplete")
    var chiMicroSum = 0L
    (0 until 9).foreach { i =>
      val e = t.toDouble * (pNano(i).toDouble / 1e9)
      val diff = n(i).toDouble - e
      val r0 = got(i)
      assert(r0.getAs[Long]("n_obs") == n(i), s"digit ${i + 1} count")
      assert(r0.getAs[Long]("exp_micro") ==
        math.floor(e * 1e6 + 0.5).toLong)
      assert(r0.getAs[Long]("chi2_micro") ==
        math.floor(diff * diff / e * 1e6 + 0.5).toLong)
      assert(r0.getAs[Long]("chi2_micro") >= 0L)
      chiMicroSum += r0.getAs[Long]("chi2_micro")
    }
    val chi2 = math.floor(chiMicroSum.toDouble / 1e6 * 1e4 + 0.5) / 1e4
    got.foreach(r0 => assert(r0.getAs[Double]("chi2") == chi2))
    assert(got.map(_.getAs[Long]("n_obs")).sum == t)
    // Benford probabilities are a distribution: expected masses
    // reconstruct the total to within 9 half-ulp micro roundings
    assert(math.abs(got.map(_.getAs[Long]("exp_micro")).sum -
      t * 1000000L) <= 9L)
  }

  test("q_cusum: closed form S_k − min S_j ≡ the textbook recursion " +
      "C_k = max(0, C_{k-1} + x_k − μ); argmax is the earliest peak") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.util.Tables.events(spark, d)
      .select(col("event_type"), unix_micros(col("ts")).as("e"),
        col("event_id"), col("value")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        math.floor(x.getDouble(3) * 100 + 0.5).toLong))
    val got = rows("q_cusum").map(x => x.getAs[String]("event_type") ->
      (x.getAs[Long]("at_us"), x.getAs[Long]("max_cusum"),
        x.getAs[Long]("n"))).toMap
    val series = ev.groupBy(_._1)
    assert(got.keySet == series.keySet)
    series.foreach { case (et, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3))
      val mu = ordered.map(_._4).sum / ordered.length // both nonneg
      var c = 0L
      var best = (Long.MinValue, Long.MaxValue) // (cusum, at_us)
      ordered.foreach { x =>
        c = math.max(0L, c + (x._4 - mu))
        if (c > best._1) best = (c, x._2)
      }
      val (atUs, maxCusum, n) = got(et)
      assert(maxCusum == best._1, s"$et: max cusum")
      assert(atUs == best._2, s"$et: argmax position")
      assert(n == ordered.length.toLong, s"$et: series length")
    }
  }

  test("q_peak_offsets: wire-decoded delays equal the physics formula") {
    val r = rows("q_peak_offsets")
    assert(r.size == (1 to 8).map(ch => math.min(ch, 3)).sum)
    assert(r.forall { x =>
      val ch = x.getAs[Int]("channel"); val rg = x.getAs[Int]("region")
      x.getAs[Long]("delay_ns") == graft.ops.Physics.delayNsScalar(
        graft.model.InstrumentConfig.offsetDistanceM(ch, rg),
        graft.model.InstrumentConfig.IndexOfRefraction) &&
        x.getAs[Int]("boundary") ==
          graft.model.InstrumentConfig.offsetBoundary(ch, rg)
    })
  }
}
