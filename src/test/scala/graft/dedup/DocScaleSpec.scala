package graft.dedup

import org.apache.spark.sql.functions._
import graft.{SparkSpec, SparkEntry}

/** Automated decade invariants for the document families, built on
  * [[graft.ScaleCorpus]]'s construction: replica 0 is the source corpus
  * verbatim and replica r>0 token-prefixes every word, so per-replica
  * structure (shingle-set sizes, Jaccard values, per-source span sets,
  * token-count distributions) is PRESERVED while nothing is shared
  * across replicas. Exact consequences a correct implementation must
  * reproduce — and a scale-dependent bug (a pinned threshold, a
  * candidate set that leaks across replicas, an order-sensitive float)
  * cannot:
  *
  *  - exact-pair count at ×N = N × the sf0.1 count (q_prefix_join);
  *  - per-source-pair shared-span counts at ×N = N × sf0.1's matrix
  *    (sources repeat across replicas, spans never do);
  *
  * Cancels (not fails) when the ScaleCorpus dir is absent — the same
  * contract as AnnTriScaleSpec.
  */
class DocScaleSpec extends SparkSpec {
  private val base = "/root/testdata/sf0.1"
  private val sfx1 = sys.env.getOrElse("GRAFT_SFX1_DIR", "/tmp/graft_sfx1")

  private def requireCorpus(): Long = {
    assume(new java.io.File(s"$sfx1/documents.parquet").exists(),
      s"decade gate needs the ScaleCorpus dir at $sfx1")
    val nBase = spark.read.parquet(s"$base/documents.parquet").count()
    val nBig = spark.read.parquet(s"$sfx1/documents.parquet").count()
    assume(nBase > 0 && nBig % nBase == 0 && nBig > nBase,
      s"$sfx1 is not an integer replication of $base ($nBig vs $nBase)")
    nBig / nBase
  }

  test("exact near-dup pairs scale exactly xN across the decade") {
    val n = requireCorpus()
    val basePairs = SparkEntry.queries("q_prefix_join")(spark, base).count()
    val bigPairs = SparkEntry.queries("q_prefix_join")(spark, sfx1).count()
    assert(basePairs > 0)
    assert(bigPairs == n * basePairs,
      s"expected ${n}x$basePairs pairs at the decade, got $bigPairs — " +
        "candidates leak across replicas or a threshold is scale-pinned")
  }

  test("CDC chunking is corpus-size-invariant per doc; duplication " +
      "only grows with the decade") {
    val n = requireCorpus()
    // replica 0 carries the base corpus TEXT verbatim (at doc_id·N) and
    // chunk boundaries are content-defined per doc — so every base doc
    // must chunk IDENTICALLY at x10 (n_chunks equal), while adding N-1
    // replicas can only grow a chunk's corpus-wide occurrence
    // (n_dup_chunks monotone >=). A chunker whose boundaries depended
    // on corpus statistics or partitioning would break the first; a
    // dup counter that leaked or reset across the decade the second.
    val baseRep = SparkEntry.queries("q_substring_dedup")(spark, base)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"))
      .collect().map(r => r.getLong(0) * n -> (r.getLong(1), r.getLong(2)))
      .toMap
    val big = SparkEntry.queries("q_substring_dedup")(spark, sfx1)
      .filter(col("doc_id") % n === 0) // replica 0: doc_id' = doc_id·N
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(big.keySet == baseRep.keySet)
    baseRep.foreach { case (id, (nc, nd)) =>
      assert(big(id)._1 == nc, s"doc $id re-chunked at the decade")
      assert(big(id)._2 >= nd, s"doc $id lost duplication at the decade")
    }
  }

  test("rouge rows at the decade: exact pair count, all-zero overlap " +
      "(replica vocabularies are disjoint)") {
    val n = requireCorpus()
    // meaningfulness control: the base corpus has real overlap (shared
    // vocabulary between consecutive docs), so the decade's zero-law
    // below is a consequence of the replica construction, not a
    // degenerate metric
    val baseRows = SparkEntry.queries("q_rouge_pairs")(spark, base)
    assert(baseRows.filter(col("f1") > 0).count() > 0,
      "base corpus should have nonzero rouge overlap")
    // at xN every consecutive doc pair crosses replicas (doc_id' =
    // d*N + r interleaves them), and replica token sets share nothing —
    // so EVERY pair row exists (2 metrics x (N*D - 1) pairs) and every
    // overlap metric is exactly 0. A candidate leak across replicas or
    // a pair-slot misalignment shows up as a nonzero row or a missing
    // row here.
    val nd = spark.read.parquet(s"$sfx1/documents.parquet").count()
    val big = SparkEntry.queries("q_rouge_pairs")(spark, sfx1)
    assert(big.count() == 2 * (nd - 1), s"expected ${2 * (nd - 1)} rows")
    assert(big.filter(col("p") =!= 0.0 || col("rec") =!= 0.0 ||
      col("f1") =!= 0.0).count() == 0,
      "cross-replica pair with nonzero overlap — replica leak")
  }

  test("bleu rows at the decade: exact pair count, zero precisions " +
      "(replica vocabularies are disjoint), BP from lengths alone") {
    requireCorpus()
    // meaningfulness control: the base corpus has consecutive pairs
    // with shared vocabulary, so the decade zero-law below is the
    // replica construction at work, not a degenerate metric
    val baseRows = SparkEntry.queries("q_bleu_pairs")(spark, base)
    assert(baseRows.filter(col("p1") > 0).count() > 0,
      "base corpus should have nonzero unigram precision")
    // at xN every consecutive pair crosses replicas and replica token
    // sets share nothing — one row per pair, every clipped precision
    // exactly 0 (a candidate leak shows up as a nonzero precision)
    val nd = spark.read.parquet(s"$sfx1/documents.parquet").count()
    val big = SparkEntry.queries("q_bleu_pairs")(spark, sfx1)
    assert(big.count() == nd - 1, s"expected ${nd - 1} rows")
    assert(big.filter(col("p1") =!= 0.0 || col("p2") =!= 0.0 ||
      col("bleu") =!= 0.0).count() == 0,
      "cross-replica pair with nonzero precision — replica leak")
    // the brevity penalty is computed from token counts alone, and
    // replica prefixing preserves counts — pairs that cross a base-doc
    // boundary keep base-like length contrast, so BP<1 rows survive
    // the decade (an all-1 column would mean the length plumbing broke)
    assert(big.filter(col("bp") < 1.0).count() > 0, "degenerate BP")
  }

  test("ndcg at the decade: per-term frame IDENTICAL to base — " +
      "replicas never hit the query terms, idf growth rescales " +
      "scores but not ranks, avgdl is replication-invariant") {
    requireCorpus()
    // replica r>0 prefixes every token, so only replica-0 docs contain
    // the bare query terms: the hit set, tf values, dl values and
    // avgdl (tot and n_docs both scale xN) are all base-identical,
    // idf is a per-term positive constant at each scale — so both
    // rankings, hence every gain and both DCG sums, must reproduce
    // the base frame EXACTLY
    val b = SparkEntry.queries("q_ndcg")(spark, base)
      .collect().map(_.toSeq).toSet
    val big = SparkEntry.queries("q_ndcg")(spark, sfx1)
      .collect().map(_.toSeq).toSet
    assert(b.nonEmpty && big == b, s"ndcg diverged: base=$b decade=$big")
  }

  test("skipgram pairs at the decade: never mix replicas; total mass " +
      "equals the base-derived expectation") {
    val n = requireCorpus()
    import spark.implicits._
    val tag = (w: String) => {
      val m = "^r(\\d+)_".r.findFirstIn(w); m.getOrElse("")
    }
    val rows = SparkEntry.queries("q_skipgrams")(spark, sfx1)
      .select(col("center"), col("context"), col("n_pairs"))
      .as[(String, String, Long)].collect()
    // pairs are generated within a doc = within one replica: center and
    // context must carry the SAME replica prefix
    rows.foreach { case (c, x, _) =>
      assert(tag(c) == tag(x), s"cross-replica pair ($c, $x)")
    }
    // exact mass law from the BASE corpus: replica r's compacted doc
    // lengths are the base lengths minus that replica's dropped-variant
    // occurrences (the global top-3 lands on 3 (replica, word)
    // variants); a doc with n' kept tokens emits 2*max(n'-1,0) +
    // 2*max(n'-2,0) directed pairs
    val drop3 = graft.queries.PipelineQueries.skipgramDrop3(spark, sfx1)
      .as[String].collect()
    val dropByReplica = drop3.groupBy(tag).map { case (t, ws) =>
      val r = if (t.isEmpty) 0 else t.drop(1).dropRight(1).toInt
      r -> ws.map(w => if (t.isEmpty) w else w.substring(t.length)).toSet
    }
    val baseDocs = spark.read.parquet(s"$base/documents.parquet")
      .select(col("text")).as[String].collect()
    var expected = 0L
    for (r <- 0 until n.toInt) {
      val dropped = dropByReplica.getOrElse(r, Set.empty[String])
      baseDocs.foreach { t =>
        val toks = t.split(" ", -1)
        val kept = toks.count(w => !dropped.contains(w)).toLong
        expected += 2 * math.max(kept - 1, 0) + 2 * math.max(kept - 2, 0)
      }
    }
    assert(rows.map(_._3).sum == expected,
      s"pair mass ${rows.map(_._3).sum} != base-derived $expected")
  }

  test("image-dedup clusters at the decade: same 37 fixtures, counts " +
      "from the id-range law, stable representatives") {
    val n = requireCorpus()
    val nd = spark.read.parquet(s"$sfx1/documents.parquet").count()
    val b = SparkEntry.queries("q_image_dedup")(spark, base)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val big = SparkEntry.queries("q_image_dedup")(spark, sfx1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the logo fixture keys payloads by doc_id % 37, and doc ids stay
    // consecutive at the decade — so the SAME cluster set appears, each
    // representative is its smallest seed (first occurrence), and each
    // count is the exact id-range mass of the cluster's seed set
    // (several distinct fixture images share an aHash, so a cluster can
    // own multiple seeds — derive the seed→hash map from one doc per
    // seed rather than assuming 1:1)
    assert(big.keySet == b.keySet, "fixture cluster set changed")
    val seedsByHash = graft.multimodal.MultiModal.imageAHash(
        graft.multimodal.MultiModal.asLogoMediaTable(
          spark.read.parquet(s"$base/documents.parquet")
            .filter(col("doc_id") < 37), "doc_id"))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("ahash"))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(seedsByHash.keySet == b.keySet, "seed map disagrees with base")
    big.foreach { case (ahash, (cnt, rep)) =>
      assert(rep == b(ahash)._2, s"representative moved for $ahash")
      assert(rep == seedsByHash(ahash).min, s"rep not the smallest seed")
      val exp = seedsByHash(ahash)
        .map(s => nd / 37 + (if (s < nd % 37) 1 else 0)).sum
      assert(cnt == exp, s"cluster $ahash count $cnt != id-range law $exp")
    }
  }

  test("heaps curve at the decade: end-point token mass and vocabulary " +
      "scale exactly xN (replica vocabularies are disjoint), curve " +
      "stays 10 monotone rows") {
    val n = requireCorpus()
    val b = SparkEntry.queries("q_heaps_law")(spark, base)
      .orderBy(col("decile")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val big = SparkEntry.queries("q_heaps_law")(spark, sfx1)
      .orderBy(col("decile")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(b.length == 10 && big.length == 10)
    // replica prefixing preserves per-doc token counts, so total mass
    // is exactly xN; replica vocabularies share nothing (r>0 prefixes
    // every word), so total distinct vocabulary is exactly xN too — a
    // dedup across replicas or a lost decile shows up here
    assert(big.last._2 == n * b.last._2,
      s"decade token mass ${big.last._2} != ${n}x${b.last._2}")
    assert(big.last._3 == n * b.last._3,
      s"decade vocabulary ${big.last._3} != ${n}x${b.last._3}")
    // cumulative curves are strictly monotone at both scales
    for (c <- Seq(b, big); i <- 1 until c.length) {
      assert(c(i)._2 > c(i - 1)._2 && c(i)._3 >= c(i - 1)._3,
        s"non-monotone curve at decile ${c(i)._1}")
    }
  }

  test("source-divergence matrix at the decade: same source-pair frame, " +
      "every JSD inside the [0, ln 2] band") {
    requireCorpus()
    // meaningfulness control: the base matrix has a strictly positive
    // divergence somewhere (sources differ)
    val b = SparkEntry.queries("q_source_divergence")(spark, base)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(b.exists(_._3 > 0), "degenerate base matrix")
    // replicas preserve the source column, so the decade emits exactly
    // the same unordered source pairs; per-bucket nano terms can be
    // individually negative (the floor errs by <=0.5 nano on each of
    // the 256 buckets) but the sum must stay inside the JSD bound
    val big = SparkEntry.queries("q_source_divergence")(spark, sfx1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(big.map(t => (t._1, t._2)).toSet ==
      b.map(t => (t._1, t._2)).toSet, "source-pair frame changed")
    val ln2Nano = (math.log(2.0) * 1e9).toLong
    big.foreach { case (a, c, j) =>
      assert(j >= -256L && j <= ln2Nano + 256L,
        s"JSD($a,$c)=$j outside the [0, ln 2] nano band")
    }
  }

  test("welch pair frame at the decade: same source pairs, sample " +
      "sizes scale exactly xN (sources repeat verbatim across replicas)") {
    val n = requireCorpus()
    val b = SparkEntry.queries("q_welch_ttest")(spark, base)
      .select("src_a", "src_b", "n_a", "n_b").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val big = SparkEntry.queries("q_welch_ttest")(spark, sfx1)
      .select("src_a", "src_b", "n_a", "n_b").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(b.nonEmpty && big.keySet == b.keySet,
      "source-pair frame changed at the decade")
    b.foreach { case (k, (na, nb)) =>
      assert(big(k) == (na * n, nb * n),
        s"$k: sample sizes did not scale xN — source rows lost or leaked")
    }
  }

  test("pr-curve confusion counters at the decade: gold positives are " +
      "EXACTLY the base corpus's (prefixed replicas hit no stopwords, " +
      "so the Gopher gate drops every r>0 doc) — tp/fn preserved " +
      "verbatim, fp monotone >= base") {
    requireCorpus()
    val b = SparkEntry.queries("q_pr_curve")(spark, base).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val big = SparkEntry.queries("q_pr_curve")(spark, sfx1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(big.keySet == b.keySet && b.keySet == (1L to 9L).toSet)
    b.foreach { case (t, (tp, fp, fn)) =>
      val (btp, bfp, bfn) = big(t)
      // replica-0 docs are base verbatim (same score, same label) and
      // no other replica passes the gate: the positive side of the
      // confusion matrix cannot move at ALL
      assert(btp == tp && bfn == fn,
        s"t=$t: positive-side counters moved at the decade")
      assert(bfp >= fp, s"t=$t: fp shrank — replica-0 rows were lost")
    }
  }

  test("chi2 terms at the decade: unprefixed survivors keep their " +
      "exact contingency counts (they occur only in replica 0)") {
    requireCorpus()
    val b = SparkEntry.queries("q_chi2_terms")(spark, base).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val big = SparkEntry.queries("q_chi2_terms")(spark, sfx1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(big.length == 20)
    val unprefixed = big.filterNot(_._1.matches("^r\\d+_.*"))
    // the discriminating stopword-ish terms stay at the top at the
    // decade (their n11 is unchanged while the corpus grows, so their
    // significance only sharpens) — require a real overlap, then exact
    // count preservation on it
    val shared = unprefixed.filter(t => b.contains(t._1))
    assert(shared.nonEmpty,
      s"no base top-20 term survived at the decade: ${big.map(_._1)}")
    shared.foreach { case (t, n11, n10) =>
      assert((n11, n10) == b(t),
        s"$t: contingency counts moved at the decade")
    }
  }

  test("isotonic calibration at the decade: fitted stays monotone, " +
      "the doc mass scales xN, the positive mass is EXACTLY base's") {
    val n = requireCorpus()
    val b = SparkEntry.queries("q_isotonic_calibration")(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    val big = SparkEntry.queries("q_isotonic_calibration")(spark, sfx1)
      .collect().sortBy(_.getLong(0)).map(r => (r.getLong(0),
        r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(big.map(_._2).sum == n * b.map(_._2).sum,
      "bucketed doc mass did not scale xN")
    assert(big.map(_._3).sum == b.map(_._3).sum,
      "positive mass moved — a prefixed replica passed the Gopher gate")
    val fit = big.map(_._4)
    assert(fit.zip(fit.tail).forall { case (x, y) => x <= y },
      s"decade fit not monotone: ${fit.toSeq}")
  }

  test("auc at the decade: same per-source frame, class counts " +
      "monotone >= base, auc in [0,1]") {
    requireCorpus()
    val b = SparkEntry.queries("q_auc")(spark, base).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val big = SparkEntry.queries("q_auc")(spark, sfx1).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    assert(big.keySet == b.keySet, "source frame changed at the decade")
    b.foreach { case (srcName, (p, ng)) =>
      val (bp, bn, auc) = big(srcName)
      assert(bp >= p && bn >= ng,
        s"$srcName: class counts shrank at the decade")
      assert(auc >= 0.0 && auc <= 1.0, s"$srcName: auc $auc out of range")
    }
  }

  test("rocchio expansion at the decade: the rel set is replica-0 only " +
      "(prefixed replicas contain no query term), so every expansion " +
      "term is unprefixed with base-exact rtf and df") {
    requireCorpus()
    val b = SparkEntry.queries("q_rocchio_expand")(spark, base).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val big = SparkEntry.queries("q_rocchio_expand")(spark, sfx1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(big.nonEmpty)
    assert(big.forall(t => !t._1.matches("^r\\d+_.*")),
      s"a prefixed replica term entered the expansion: ${big.map(_._1)}")
    val shared = big.filter(t => b.contains(t._1))
    assert(shared.nonEmpty, "no term shared with the base expansion")
    shared.foreach { case (t, rtf, df) =>
      assert((rtf, df) == b(t),
        s"$t: rel-tf/df moved at the decade — rel set leaked replicas")
    }
  }

  test("sssp at the decade is IDENTICAL to base: replica graphs are " +
      "disjoint, the source is replica-0's min token, and replica-0 " +
      "edge weights are base-exact") {
    requireCorpus()
    // bigrams never span replicas (no doc mixes prefixed and
    // unprefixed tokens), so the ×N graph is a disjoint union of N
    // replica graphs, each structurally ≡ base. The global min token
    // is unprefixed (base has tokens < "r1_..."), so the search stays
    // inside replica 0, whose transition counts — hence surprisal
    // weights — are base-exact. Any cross-replica edge leak, count
    // pollution, or scale-dependent weight breaks exact equality.
    val b = SparkEntry.queries("q_sssp")(spark, base)
      .collect().map(_.toSeq).toSet
    val big = SparkEntry.queries("q_sssp")(spark, sfx1)
      .collect().map(_.toSeq).toSet
    assert(b.nonEmpty)
    assert(big == b,
      s"sssp moved at the decade: extra=${(big -- b).take(3)} " +
        s"missing=${(b -- big).take(3)}")
  }

  test("cohen-kappa at the decade: positive-labeler cells are " +
      "base-exact (only replica-0 passes the gopher gate), totals " +
      "scale xN") {
    val n = requireCorpus()
    val b = SparkEntry.queries("q_cohen_kappa")(spark, base).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val big = SparkEntry.queries("q_cohen_kappa")(spark, sfx1).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(big.keySet == b.keySet, "source frame changed at the decade")
    b.foreach { case (srcName, (bn, n11, n10)) =>
      val (gn, g11, g10) = big(srcName)
      assert(gn == n * bn, s"$srcName: total is not xN ($gn vs $n x $bn)")
      // gopher pos mass is EXACTLY base (prefixed tokens hit no
      // stopwords), and replica-0 docs keep their base qm — so both
      // pos=1 cells are base-exact
      assert(g11 == n11 && g10 == n10,
        s"$srcName: positive cells moved at the decade")
    }
  }

  test("brier at the decade: totals xN, uncertainty follows the " +
      "diluted base rate exactly, Murphy identity within bin spread " +
      "at both scales") {
    val n = requireCorpus()
    // base positive mass per source from the kappa contingency
    val posMass = SparkEntry.queries("q_cohen_kappa")(spark, base)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2) + r.getLong(3))).toMap
    def check(rows: Array[org.apache.spark.sql.Row]): Unit =
      rows.foreach { r =>
        val (brier, rel, res, unc) = (r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
        // Murphy: brier = reliability − resolution + uncertainty, up
        // to the binning residual (within-bin variance of p MINUS
        // twice the within-bin p–o covariance — the variance part is
        // ≤ (0.1/2)² = 2500 micro for 0.1-wide bins, the covariance
        // part is data-dependent; observed ≤ 3700 across scales).
        // 10⁴ micro = 1% of the Brier scale keeps this a real law
        // while honest about the residual's covariance term.
        assert(math.abs(brier - (rel - res + unc)) <= 10000,
          s"${r.getString(0)}: decomposition broke ($brier vs " +
            s"$rel - $res + $unc)")
      }
    val b = SparkEntry.queries("q_brier")(spark, base).collect()
    val big = SparkEntry.queries("q_brier")(spark, sfx1).collect()
    check(b); check(big)
    val bn = b.map(r => r.getString(0) -> r.getLong(1)).toMap
    big.foreach { r =>
      val srcName = r.getString(0)
      assert(r.getLong(1) == n * bn(srcName), s"$srcName: total not xN")
      // only replica-0 passes the gate, so the decade base rate is the
      // base positive mass over N× the docs — uncertainty must follow
      val obar = posMass(srcName).toDouble / (n * bn(srcName)).toDouble
      val expUnc = math.floor(obar * (1.0 - obar) * 1e6 + 0.5).toLong
      assert(r.getLong(5) == expUnc,
        s"$srcName: uncertainty ${r.getLong(5)} != expected $expUnc")
    }
  }

  test("entropy rate at the decade: bigram mass scales exactly xN, " +
      "the rate is IDENTICAL (replica chains are isomorphic)") {
    val n = requireCorpus()
    // each replica's transition table has the SAME counts as base
    // (replica 0 verbatim, r>0 prefixed-isomorphic), so surprisal
    // weights repeat per replica: mass and total both scale xN and
    // floor(Nh/NT) = floor(h/T) exactly
    val b = SparkEntry.queries("q_entropy_rate")(spark, base).head()
    val big = SparkEntry.queries("q_entropy_rate")(spark, sfx1).head()
    assert(big.getAs[Long]("n_bigrams") == n * b.getAs[Long]("n_bigrams"))
    assert(big.getAs[Long]("h_mass_micro") ==
      n * b.getAs[Long]("h_mass_micro"),
      "entropy mass is not replica-additive — counts leaked across " +
        "replicas")
    assert(big.getAs[Long]("h_rate_micro") == b.getAs[Long]("h_rate_micro"))
  }

  test("gini at the decade: vocab and token masses scale exactly xN, " +
      "the coefficient moves only by the O(1/n) rank-run correction") {
    val n = requireCorpus()
    val b = SparkEntry.queries("q_gini_tokens")(spark, base).head()
    val big = SparkEntry.queries("q_gini_tokens")(spark, sfx1).head()
    assert(big.getAs[Long]("n_vocab") == n * b.getAs[Long]("n_vocab"))
    assert(big.getAs[Long]("n_tokens") == n * b.getAs[Long]("n_tokens"))
    // replicating every frequency class xN preserves the Lorenz curve
    // up to the within-run discretization term — sub-1000-micro at any
    // realistic vocabulary
    assert(math.abs(big.getAs[Long]("gini_micro") -
        b.getAs[Long]("gini_micro")) <= 1000,
      s"gini moved at the decade: ${b.getAs[Long]("gini_micro")} -> " +
        s"${big.getAs[Long]("gini_micro")}")
  }

  test("good-turing at the decade: frequency-of-frequencies scales " +
      "exactly xN, smoothed counts and unseen mass are IDENTICAL " +
      "(floor(Na/Nb) = floor(a/b))") {
    val n = requireCorpus()
    val b = SparkEntry.queries("q_good_turing")(spark, base)
      .collect().map(x => x.getAs[Long]("c") -> x).toMap
    val big = SparkEntry.queries("q_good_turing")(spark, sfx1).collect()
    assert(big.length == b.size)
    big.foreach { x =>
      val e = b(x.getAs[Long]("c"))
      assert(x.getAs[Long]("m_c") == n * e.getAs[Long]("m_c"))
      assert(x.getAs[Long]("m_next") == n * e.getAs[Long]("m_next"))
      assert(x.getAs[Long]("n_tokens") == n * e.getAs[Long]("n_tokens"))
      assert(x.getAs[Long]("n_vocab") == n * e.getAs[Long]("n_vocab"))
      assert(x.getAs[Long]("c_star_micro") == e.getAs[Long]("c_star_micro"),
        "smoothed count is not replica-invariant")
      assert(x.getAs[Long]("p0_micro") == e.getAs[Long]("p0_micro"),
        "unseen mass is not replica-invariant")
    }
  }

  test("wasserstein at the decade: every source pair's distance is " +
      "IDENTICAL (CDFs are replica-invariant, rounding cancels xN²)") {
    val n = requireCorpus()
    val key = (x: org.apache.spark.sql.Row) =>
      (x.getAs[String]("src_a"), x.getAs[String]("src_b"))
    val b = SparkEntry.queries("q_wasserstein")(spark, base)
      .collect().map(x => key(x) -> x).toMap
    val big = SparkEntry.queries("q_wasserstein")(spark, sfx1).collect()
    assert(big.length == b.size, "pair frame changed at the decade")
    big.foreach { x =>
      val e = b(key(x))
      assert(x.getAs[Long]("n_a") == n * e.getAs[Long]("n_a"))
      assert(x.getAs[Long]("w1_micro") == e.getAs[Long]("w1_micro"),
        s"${key(x)}: W1 moved at the decade — CDF leaked across replicas")
    }
  }

  test("spearman + kruskal at the decade ≡ exact recomputation from " +
      "the base grid scaled xN (rank structure is predictable, not " +
      "invariant)") {
    val n = requireCorpus()
    // base joint (x=len, y=distinct) grid, collected once
    val grid = spark.read.parquet(s"$base/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map { r =>
        val tk = r.getString(1).split(" ")
        (r.getString(0), tk.length.toLong, tk.distinct.length.toLong)
      }
    // ---- spearman: scale every (x, y) cell count xN and refold
    val cells = grid.groupBy(g => (g._2, g._3))
      .map { case (k, xs) => k -> n * xs.length.toLong }
    def ranks(of: ((Long, Long)) => Long): Map[Long, Long] = {
      val byV = cells.groupBy { case (k, _) => of(k) }
        .map { case (v, m) => v -> m.values.sum }
      val sortedV = byV.keys.toSeq.sorted
      var acc = 0L
      sortedV.map { v =>
        val t = byV(v); val r2 = 2L * acc + t + 1L; acc += t; v -> r2
      }.toMap
    }
    val rx = ranks(_._1); val ry = ranks(_._2)
    var (nd, sx, sy, sxy, sxx, syy) = (0L, 0L, 0L, 0L, 0L, 0L)
    cells.foreach { case ((x, y), c) =>
      nd += c; sx += c * rx(x); sy += c * ry(y)
      sxy += c * rx(x) * ry(y)
      sxx += c * rx(x) * rx(x); syy += c * ry(y) * ry(y)
    }
    val num = nd.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val den = math.sqrt(
      (nd.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
      (nd.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    val expRho = math.floor(num / den * 1e6 + 0.5).toLong
    val gotS = SparkEntry.queries("q_spearman")(spark, sfx1).head()
    assert(gotS.getAs[Long]("n_docs") == nd)
    assert(gotS.getAs[Long]("sxy") == sxy,
      "scaled-grid moment prediction missed — rank structure leaked")
    assert(gotS.getAs[Long]("rho_micro") == expRho)
    // ---- kruskal: same scaled grid, per-source rank sums + H
    val lt = grid.groupBy(_._2).map { case (l, xs) =>
      l -> n * xs.length.toLong }
    val sortedL = lt.keys.toSeq.sorted
    val below = {
      var acc = 0L
      sortedL.map { l => val r = l -> acc; acc += lt(l); r }.toMap
    }
    val rg = grid.groupBy(_._1).map { case (src, xs) =>
      val r2 = xs.groupBy(_._2).map { case (l, ys) =>
        n * ys.length.toLong * (2L * below(l) + lt(l) + 1L) }.sum
      (src, n * xs.length.toLong, r2)
    }.toSeq.sortBy(_._1)
    val nTot = rg.map(_._2).sum
    val sFold = rg.foldLeft(0.0) { case (acc, (_, ng, r2)) =>
      val half = r2.toDouble / 2.0; acc + half * half / ng.toDouble }
    val h = 12.0 * sFold / (nTot.toDouble * (nTot.toDouble + 1.0)) -
      3.0 * (nTot.toDouble + 1.0)
    val tie = lt.values.map(t => t * t * t - t).sum
    val cc = 1.0 - tie.toDouble /
      (nTot.toDouble * nTot.toDouble * nTot.toDouble - nTot.toDouble)
    val gotK = SparkEntry.queries("q_kruskal")(spark, sfx1).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    rg.foreach { case (src, ng, r2) =>
      val x = gotK(src)
      assert(x.getAs[Long]("n_g") == ng)
      assert(x.getAs[Long]("rank2_sum") == r2,
        s"$src: scaled-grid rank-sum prediction missed")
      assert(x.getAs[Long]("tie_sum") == tie)
      assert(x.getAs[Long]("h_micro") ==
        math.floor(h * 1e6 + 0.5).toLong)
      assert(x.getAs[Long]("hc_micro") ==
        math.floor(h / cc * 1e6 + 0.5).toLong)
    }
  }

  test("cliffs delta at the decade: dominance masses scale exactly " +
      "xN², delta is IDENTICAL (length grids are replica-invariant)") {
    val n = requireCorpus()
    val key = (x: org.apache.spark.sql.Row) =>
      (x.getAs[String]("src_a"), x.getAs[String]("src_b"))
    val b = SparkEntry.queries("q_cliffs_delta")(spark, base)
      .collect().map(x => key(x) -> x).toMap
    val big = SparkEntry.queries("q_cliffs_delta")(spark, sfx1).collect()
    assert(big.length == b.size)
    big.foreach { x =>
      val e = b(key(x))
      assert(x.getAs[Long]("wins") == n * n * e.getAs[Long]("wins"))
      assert(x.getAs[Long]("ties") == n * n * e.getAs[Long]("ties"))
      assert(x.getAs[Long]("losses") == n * n * e.getAs[Long]("losses"))
      assert(x.getAs[Long]("delta_micro") == e.getAs[Long]("delta_micro"),
        s"${key(x)}: delta moved at the decade")
    }
  }

  test("fleiss kappa at the decade ≡ brute-force over the decade " +
      "corpus (replica gates DIFFER from base: prefixed tokens hit " +
      "no stopwords, so the histogram is NOT a clean xN)") {
    requireCorpus()
    val stop = Set("the", "a", "an", "of", "to", "in", "and", "is",
      "it", "that")
    val votes = spark.read.parquet(s"$sfx1/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
      .map { t =>
        val tk = t.split(" ")
        val nTok = tk.length.toLong
        val wordChars = t.length.toLong - (nTok - 1)
        val g1 = if (nTok < 20 || nTok > 1000) 0L else 1L
        val g2 = if (wordChars < nTok * 3 || wordChars > nTok * 10) 0L
          else 1L
        val g3 = if (tk.count(stop.contains) < 2) 0L else 1L
        val g4 = if (tk.distinct.length.toLong * 10 < nTok * 3) 0L
          else 1L
        g1 + g2 + g3 + g4
      }
    val hist = votes.groupBy(identity)
      .map { case (x, xs) => x -> xs.length.toLong }
    val nD = votes.length.toDouble
    val t = votes.sum.toDouble
    val s2 = votes.map(x => x * x + (4 - x) * (4 - x)).sum.toDouble
    val pb = (s2 - 4.0 * nD) / (12.0 * nD)
    val pq = t / (4.0 * nD)
    val pe = pq * pq + (1.0 - pq) * (1.0 - pq)
    val kap = math.floor((pb - pe) / (1.0 - pe) * 1e6 + 0.5).toLong
    val got = SparkEntry.queries("q_fleiss_kappa")(spark, sfx1).collect()
    assert(got.map(x => x.getAs[Long]("keep_votes") ->
      x.getAs[Long]("n_x")).toMap == hist)
    got.foreach { x =>
      assert(x.getAs[Long]("kappa_micro") == kap)
      assert(x.getAs[Long]("p_keep_micro") ==
        votes.sum * 1000000L / (4L * votes.length))
    }
    // the decade histogram must show the replica signature: more
    // mass at the stopword-failing vote levels than xN of base would
    val baseN = spark.read.parquet(s"$base/documents.parquet").count()
    assert(votes.length.toLong > baseN, "decade corpus not bigger")
  }

  test("cross-perplexity at the decade ≡ prediction from the base " +
      "bigram grid with V' = N·V (replica models are isomorphic and " +
      "vocabulary-disjoint; per-replica mass repeats)") {
    val n = requireCorpus()
    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1).split(" ")))
      .filter(_._2.length >= 2)
    val grids: Map[String, Map[(String, String), Long]] =
      docs.groupBy(_._1).map { case (src, xs) =>
        src -> xs.flatMap(p => p._2.sliding(2).map(w => (w(0), w(1))))
          .groupBy(identity).map { case (k, ys) => k -> ys.length.toLong }
      }
    val vocabN = n * grids.values.flatMap(_.keys)
      .flatMap(k => Seq(k._1, k._2)).toSet.size.toLong
    val outc: Map[String, Map[String, Long]] =
      grids.map { case (src, g) =>
        src -> g.groupBy(_._1._1).map { case (x0, m) => x0 -> m.values.sum }
      }
    val got = SparkEntry.queries("q_cross_perplexity")(spark, sfx1)
      .collect()
    assert(got.length == grids.size * grids.size)
    got.foreach { r =>
      val (sa, sb) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val ga = grids(sa)
      val na = ga.values.sum
      // each replica contributes the identical mass: prefixed bigrams
      // find prefixed model counts with the SAME (cb, outc) — only V
      // is global and grows to N·V
      val mass = ga.map { case ((x0, y0), ca) =>
        val cb = grids(sb).getOrElse((x0, y0), 0L)
        val oc = outc(sb).getOrElse(x0, 0L)
        ca * math.floor(-math.log((cb + 1).toDouble /
          (oc + vocabN).toDouble) * 1e6 + 0.5).toLong
      }.sum
      assert(r.getAs[Long]("n_bigrams") == n * na)
      assert(r.getAs[Long]("h_cross_micro") == (n * mass) / (n * na),
        s"($sa under $sb): replica-structure prediction missed — " +
          "bigram counts leaked across replicas")
    }
  }

  test("conformal at the decade: the calibration set is EXACTLY the " +
      "base corpus (prefixed replica tokens fail the stopword gate), " +
      "so every output column is IDENTICAL") {
    requireCorpus()
    val b = SparkEntry.queries("q_conformal")(spark, base).head()
    val big = SparkEntry.queries("q_conformal")(spark, sfx1).head()
    Seq("n_cal", "k", "qhat_micro", "n_covered", "coverage_micro")
      .foreach { c =>
        assert(big.getAs[Long](c) == b.getAs[Long](c),
          s"$c moved at the decade — replica docs leaked into the " +
            "calibration set")
      }
  }

  test("dp counts at the decade: census scales exactly xN while the " +
      "per-source Laplace draw is IDENTICAL (noise seeds on the " +
      "source, not the rows)") {
    val n = requireCorpus()
    val b = SparkEntry.queries("q_dp_counts")(spark, base).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val big = SparkEntry.queries("q_dp_counts")(spark, sfx1).collect()
    assert(big.length == b.size)
    big.foreach { x =>
      val e = b(x.getAs[String]("source"))
      assert(x.getAs[Long]("n_docs") == n * e.getAs[Long]("n_docs"))
      assert(x.getAs[Long]("lap_micro") == e.getAs[Long]("lap_micro"),
        "noise draw moved at the decade — seeding leaked row state")
      assert(x.getAs[Long]("noisy_micro") ==
        n * e.getAs[Long]("n_docs") * 1000000L +
          e.getAs[Long]("lap_micro"))
    }
  }

  test("bootstrap at the decade: the full-sample mean is IDENTICAL " +
      "(lengths replicate xN) and the interval tightens with n") {
    requireCorpus()
    val b = SparkEntry.queries("q_bootstrap_ci")(spark, base).head()
    val big = SparkEntry.queries("q_bootstrap_ci")(spark, sfx1).head()
    assert(big.getAs[Long]("mean_micro") == b.getAs[Long]("mean_micro"))
    val wBase = b.getAs[Long]("ci_hi_micro") - b.getAs[Long]("ci_lo_micro")
    val wBig = big.getAs[Long]("ci_hi_micro") -
      big.getAs[Long]("ci_lo_micro")
    assert(wBig >= 0 && wBase >= 0)
    // ~1/sqrt(10) tightening; allow generous slack for 100 replicates
    assert(wBig < wBase,
      s"CI did not tighten at the decade: $wBig vs $wBase")
    assert(big.getAs[Long]("ci_lo_micro") <=
      big.getAs[Long]("mean_micro") &&
      big.getAs[Long]("mean_micro") <= big.getAs[Long]("ci_hi_micro"),
      "decade CI excludes the sample mean")
  }

  test("rbo at the decade: the entire output is IDENTICAL (prefixed " +
      "replica tokens never contain the query terms, per-term idf is " +
      "a positive common factor so both rankings are preserved)") {
    requireCorpus()
    val key = (r: org.apache.spark.sql.Row) => r.getAs[String]("term")
    val b = SparkEntry.queries("q_rbo_overlap")(spark, base)
      .collect().map(r => key(r) -> r).toMap
    val big = SparkEntry.queries("q_rbo_overlap")(spark, sfx1).collect()
    assert(big.length == b.size, "term frame changed at the decade")
    big.foreach { r =>
      val e = b(key(r))
      assert(r.getAs[Long]("n_cand") == e.getAs[Long]("n_cand"))
      assert(r.getAs[Long]("rbo_micro") == e.getAs[Long]("rbo_micro"),
        s"${key(r)}: RBO moved at the decade — replica docs leaked " +
          "into the candidate set or a ranking flipped")
    }
  }

  test("hill tail at the decade ≡ prediction from the base top-51 " +
      "expanded xN (each base gram's count repeats in every replica)") {
    val n = requireCorpus()
    val baseTop = spark.read.parquet(s"$base/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val tk = t.split(" ", -1)
        if (tk.length < 3) Seq.empty
        else tk.sliding(3).map(_.mkString(" ")).toSeq
      }
      .groupBy(identity).map { case (_, xs) => xs.length.toLong }
      .toSeq.sorted.reverse.take(51)
    // decade multiset = every base count with multiplicity xN
    val expTop = baseTop.flatMap(c => Seq.fill(n.toInt)(c))
      .sorted.reverse.take(51)
    val ck1 = expTop.last
    val sumLn = expTop.take(50).map { ci =>
      math.floor(math.log(ci.toDouble / ck1.toDouble) * 1e6 + 0.5)
        .toLong }.sum
    val alpha = if (sumLn == 0L) 0L else 50L * 1000000000000L / sumLn
    val got = SparkEntry.queries("q_hill_tail")(spark, sfx1).head()
    assert(got.getAs[Long]("c_k1") == ck1,
      "decade order statistics diverge from the xN expansion — " +
        "replica grams collided")
    assert(got.getAs[Long]("sum_ln_micro") == sumLn)
    assert(got.getAs[Long]("alpha_micro") == alpha)
  }

  test("mcc at the decade: the positive column is EXACTLY base " +
      "(replica tokens fail the stopword gate), negatives absorb " +
      "the replicas, mcc recomputes from the decade's own 2x2") {
    val n = requireCorpus()
    val b = SparkEntry.queries("q_mcc")(spark, base).head()
    val big = SparkEntry.queries("q_mcc")(spark, sfx1).head()
    assert(big.getAs[Long]("tp") == b.getAs[Long]("tp"),
      "replica docs leaked into the positive class")
    assert(big.getAs[Long]("fn") == b.getAs[Long]("fn"))
    val total = Seq("tp", "fp", "fn", "tn")
      .map(big.getAs[Long](_)).sum
    val baseTotal = Seq("tp", "fp", "fn", "tn")
      .map(b.getAs[Long](_)).sum
    assert(total == n * baseTotal)
    val (tp, fp, fn, tn) = (big.getAs[Long]("tp"),
      big.getAs[Long]("fp"), big.getAs[Long]("fn"),
      big.getAs[Long]("tn"))
    val den = math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
      (tn + fp).toDouble * (tn + fn).toDouble)
    val exp = if (den <= 0.0) 0L
      else math.floor((tp.toDouble * tn.toDouble -
        fp.toDouble * fn.toDouble) / den * 1e6 + 0.5).toLong
    assert(big.getAs[Long]("mcc_micro") == exp)
    assert(big.getAs[Long]("acc_micro") == (tp + tn) * 1000000L / total)
  }

  test("llr collocations at the decade ≡ prediction from the base " +
      "bigram grid with n' = N·n (per-replica tables are isomorphic; " +
      "compare the top-20 G² value multiset)") {
    val n = requireCorpus()
    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val pairs = docs.flatMap { t =>
      val tk = t.split(" ")
      (1 until tk.length).collect {
        case i if tk(i - 1) != tk(i) => (tk(i - 1), tk(i)) }
    }
    val cnt = pairs.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    val ca = cnt.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val cb = cnt.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val nTot = n * cnt.values.sum // decade total; marginals stay base
    def cell(obs: Long, row: Long, colm: Long): Long =
      if (obs <= 0L) 0L
      else obs * math.floor(math.log(obs.toDouble * nTot.toDouble /
        (row.toDouble * colm.toDouble)) * 1e6 + 0.5).toLong
    // every base bigram's predicted decade G², with multiplicity N
    // (its prefixed replicas are isomorphic and score identically)
    val predicted = cnt.toSeq.flatMap { case ((a, b), cab) =>
      val g2 = 2L * (cell(cab, ca(a), cb(b)) +
        cell(ca(a) - cab, ca(a), nTot - cb(b)) +
        cell(cb(b) - cab, nTot - ca(a), cb(b)) +
        cell(nTot - ca(a) - cb(b) + cab, nTot - ca(a), nTot - cb(b)))
      Seq.fill(n.toInt)(g2)
    }.sorted.reverse.take(20)
    val got = SparkEntry.queries("q_llr_colloc")(spark, sfx1)
      .collect().map(_.getAs[Long]("g2_micro")).sorted.reverse
    assert(got.toSeq == predicted,
      "decade G² multiset diverged from the base-grid prediction — " +
        "replica bigrams collided or marginals leaked")
  }

  test("the cross-source span matrix scales exactly xN per source pair") {
    val n = requireCorpus()
    // the matrix is source-pair-sized — collect once and compare sets,
    // rather than 4 exceptAll jobs re-running the shingle self-join
    val b = SparkEntry.queries("q_source_overlap")(spark, base)
      .withColumn("n_shared", col("n_shared") * n)
      .collect().map(_.toSeq).toSet
    val big = SparkEntry.queries("q_source_overlap")(spark, sfx1)
      .collect().map(_.toSeq).toSet
    assert(b.nonEmpty)
    // exact frame equality both directions (source pairs AND counts)
    assert(big == b,
      s"matrix diverged: extra=${(big -- b).take(3)} " +
        s"missing=${(b -- big).take(3)}")
  }
}
