package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (3L, "completely different text about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog")    // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps the lowest id per digest") {
    val dups = Dedup.exactDuplicates(docs, $"doc_id", $"text")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(dups == Seq((1L, 0L), (4L, 0L)))
  }

  test("shingles: n-gram sets over tokens") {
    val sh = docs.filter($"doc_id" === 3)
      .select(Dedup.shingles($"text", 2)).as[Seq[String]].head()
    assert(sh.contains("completely different"))
    assert(sh.contains("spark engines"))
    assert(sh.size == 5) // 6 tokens -> 5 bigrams, all distinct
  }

  test("jaccard: 1.0 for identical, 0 for disjoint, sane for near-dups") {
    val pairs = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.jaccard(col("a.text"), col("b.text"), 2).as("j"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 3L)) == 0.0)
    assert(pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
  }

  test("LSH candidate pairs include exact and near duplicates") {
    val bands = Dedup.lshBands(docs, $"doc_id", $"text", 2,
      bands = 4, rowsPerBand = 2)
    val pairs = Dedup.lshCandidatePairs(bands)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical docs share every band
    assert(pairs.contains((0L, 4L)))
    assert(pairs.contains((1L, 4L)))
    // doc 3 shares no shingles with anything -> should pair with nothing
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })

    // reliable-storage materialization (the 100 TB config): identical
    // pairs, and the narrow bands table lands as parquet at the path
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsh_bands").toString + "/bands"
    val persisted = Dedup.lshCandidatePairs(bands, Some(dir))
      .as[(Long, Long)].collect().toSet
    assert(persisted == pairs)
    assert(spark.read.parquet(dir).columns.toSeq ==
      Seq("doc_id", "band_idx", "band_key"))
  }

  test("duplicateClusters: multi-hop components collapse to the min id") {
    // chain 10-20-30-40 (3 hops), pair 50-60, singleton edge 70-80
    val edges = Seq((10L, 20L), (20L, 30L), (30L, 40L), (50L, 60L),
      (80L, 70L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      50L -> 50L, 60L -> 50L, 70L -> 70L, 80L -> 70L))
  }

  test("duplicateClusters: a 60-hop chain converges (pointer doubling)") {
    // A chain-shaped component much longer than any plausible 1-hop
    // round budget: 61 nodes, min id planted mid-chain. Plain min-label
    // propagation would need 30+ rounds; pointer doubling collapses it
    // within the default maxIters with rounds to spare.
    val ids = (1L to 30L) ++ Seq(0L) ++ (31L to 60L)
    val edges = ids.zip(ids.tail).map { case (a, b) => (a, b) }
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(edges)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 61)
    assert(got.values.forall(_ == 0L))
  }

  test("duplicateClusters: reliable-storage mode matches and survives " +
      "a cache wipe") {
    val edges = Seq((10L, 20L), (20L, 30L), (30L, 40L), (50L, 60L))
      .toDF("id_a", "id_b")
    val expect = Dedup.duplicateClusters(edges)
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cc").toString
    val persisted = Dedup.duplicateClusters(edges,
      materializePath = Some(dir))
    assert(persisted.as[(Long, Long)].collect().toMap == expect)
    // edges + per-batch labels landed on (simulated) reliable storage
    assert(new java.io.File(s"$dir/edges").exists())
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("labels_")))
    // simulate losing every executor-local block: wipe all persisted
    // RDDs, then re-read the result — it must come back from storage
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(persisted.as[(Long, Long)].collect().toMap == expect)
  }

  test("duplicateClusters: refuses to return non-converged labels") {
    // maxIters=1 leaves a 5-node chain mid-propagation -> hard error,
    // never a silently wrong clustering
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, maxIters = 1)
    }
    // ...but an input that IS converged after round 1 passes the
    // certificate check even at maxIters=1
    val pairs = Seq((1L, 2L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs, maxIters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("spanOverlap flags exact n-token spans only") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "completely different words entirely here now"),
      (3L, "ends with quick brown fox jumps too")).toDF("id", "t")
    val bench = Seq(
      (100L, "prefix then quick brown fox jumps suffix"),
      (101L, "nothing shared at all whatsoever")).toDF("id", "t")
    val hits = Dedup.spanOverlap(train, $"id", $"t", bench, $"id", $"t", 4)
      .as[(Long, Long)].collect().toSet
    // "quick brown fox jumps" is the shared 4-token span of docs 1 and 3
    assert(hits == Set((1L, 100L), (3L, 100L)))
  }

  test("hashSample: deterministic, disjoint-complement, rate-monotone") {
    val df = (0 until 2000).map(_.toLong).toDF("id")
    val s10 = Dedup.hashSample(df, $"id", 26).as[Long].collect().toSet
    val s10b = Dedup.hashSample(df, $"id", 26).as[Long].collect().toSet
    assert(s10 == s10b)                       // reproducible, no rand()
    val s50 = Dedup.hashSample(df, $"id", 128).as[Long].collect().toSet
    assert(s10.subsetOf(s50))                 // buckets nest by rate
    assert(math.abs(s10.size / 2000.0 - 26.0 / 256) < 0.03)
    assert(math.abs(s50.size / 2000.0 - 0.5) < 0.05)
  }

  test("minhash Jaccard estimate tracks exact Jaccard on near-dups") {
    // identical docs -> estimate 1; disjoint docs -> estimate 0;
    // near-dups -> estimate within a loose band of the exact value
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "totally disjoint words nothing shared at all ok"))
      .toDF("doc_id", "text")
    val k = 8
    val sig = Dedup.minhashDf(docs, $"doc_id", $"text", 2, k)
      .select($"doc_id", array((1 to k).map(i => col(s"h$i")): _*).as("sig"))
    val a = sig.select($"doc_id".as("ia"), $"sig".as("sa"))
    val b = sig.select($"doc_id".as("ib"), $"sig".as("sb"))
    val est = a.join(b, $"ia" < $"ib")
      .select($"ia", $"ib",
        Dedup.minhashJaccardEstimate($"sa", $"sb", k).as("e"))
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, e) => (x, y) -> e }.toMap
    assert(est((0L, 1L)) == 1.0)              // identical
    assert(est((0L, 3L)) == 0.0)              // disjoint
    assert(est((0L, 2L)) > 0.3)               // near-dup: high agreement
  }

  test("minhash signature is identical for identical docs") {
    val sigs = docs.select($"doc_id",
        Dedup.minhashSignature($"text", 2, 8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    assert(sigs(0L).size == 8)
  }

  test("minhashDf (explode+agg scale form) equals the column form") {
    val dfForm = Dedup.minhashDf(docs, $"doc_id", $"text", 2, 4)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(i => r.getString(i))).toMap
    val colForm = docs.select($"doc_id",
        Dedup.minhashSignature($"text", 2, 4).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(dfForm.keySet == colForm.keySet)
    for (k <- dfForm.keySet) assert(dfForm(k) == colForm(k), s"doc $k")
  }

  test("simhashDf (explode+agg scale form) equals the column form") {
    val dfForm = Dedup.simhashDf(docs, $"doc_id", $"text")
      .as[(Long, Int)].collect().toMap
    val colForm = docs.select($"doc_id", Dedup.simhash16($"text").cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(dfForm == colForm)
  }

  test("simhashDf native sig+fp kernel equals the SQL probe form") {
    val native = Dedup.simhashDf(docs, $"doc_id", $"text")
      .as[(Long, Int)].collect().toMap
    val sql = Dedup.simhashDfSql(docs, $"doc_id", $"text")
      .as[(Long, Int)].collect().toMap
    assert(native == sql)
  }

  test("simhash64Df native sig+fp kernel equals the SQL probe form") {
    val native = Dedup.simhash64Df(docs, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    val sql = Dedup.simhash64DfSql(docs, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(native == sql)
  }

  test("simhash exploded sig+agg shape equals the SQL probe form (both " +
    "widths) — the scale-shape alternative to the per-doc kernel") {
    import graft.functions.SimhashExprs
    import graft.text.TextAnalysis
    def exploded(nBits: Int) = docs
      .select($"doc_id",
        explode(array_distinct(TextAnalysis.tokens($"text"))).as("t"))
      .select($"doc_id", SimhashExprs.sig($"t", nBits).as("sig"))
      .groupBy($"doc_id")
      .agg(SimhashExprs.fp($"sig", nBits).as("fp"))
    assert(exploded(64).as[(Long, Long)].collect().toMap ==
      Dedup.simhash64DfSql(docs, $"doc_id", $"text")
        .as[(Long, Long)].collect().toMap)
    assert(exploded(16).select($"doc_id", $"fp".cast("int"))
      .as[(Long, Int)].collect().toMap ==
      Dedup.simhashDfSql(docs, $"doc_id", $"text")
        .as[(Long, Int)].collect().toMap)
  }

  test("simhash doc kernel: split(' ') edge semantics (empty text, " +
    "leading/consecutive/trailing spaces) match the exploded SQL form") {
    val edge = Seq((1L, ""), (2L, " "), (3L, "a  b"), (4L, "a b "),
      (5L, " a"), (6L, "a a a b"), (7L, "x")).toDF("doc_id", "text")
    val native = Dedup.simhash64Df(edge, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    val sql = Dedup.simhash64DfSql(edge, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(native == sql)
    // null text: the exploded form drops the doc; the kernel's callers
    // filter nulls to match
    val withNull = Seq((1L, Option("a b")), (2L, None))
      .toDF("doc_id", "text")
    val n2 = Dedup.simhash64Df(withNull, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    val s2 = Dedup.simhash64DfSql(withNull, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(n2 == s2 && n2.keySet == Set(1L))
  }

  test("shingles native kernel equals the HOF form (n = 1, 2, 5, 8), " +
    "including order and edge texts") {
    val edge = Seq((100L, ""), (101L, " "), (102L, "a"), (103L, "a b"),
      (104L, "a  b"), (105L, "a b "), (106L, " a b"),
      (107L, "w x w x w y"), (108L, "t t t t t t t t t"))
      .toDF("doc_id", "text")
    for (df <- Seq(docs.select($"doc_id", $"text"), edge); n <- Seq(1, 2, 5, 8)) {
      val nat = df.select($"doc_id", Dedup.shingles($"text", n).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val hof = df.select($"doc_id", Dedup.shinglesHof($"text", n).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      assert(nat == hof, s"n=$n") // incl. element ORDER (first occurrence)
    }
  }

  test("simhash: equal fingerprints for identical docs, hamming sane") {
    val fps = docs.select($"doc_id", Dedup.simhash16($"text").as("fp"))
      .as[(Long, Int)].collect().toMap
    assert(fps(0L) == fps(1L))
    assert(fps.values.forall(f => f >= 0 && f < 65536))
    val ham = docs.limit(1).select(
      Dedup.hamming16(lit(fps(0L)), lit(fps(2L)))).as[Long].head()
    assert(ham >= 0 && ham <= 16)
    // near-dup should be closer than unrelated text
    val hamFar = Integer.bitCount(fps(0L) ^ fps(3L))
    val hamNear = Integer.bitCount(fps(0L) ^ fps(2L))
    assert(hamNear <= hamFar)
  }

  test("simhash64: identical docs collide, near-dups beat unrelated") {
    val fps = Dedup.simhash64Df(docs, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(fps(0L) == fps(1L) && fps(0L) == fps(4L))
    val hamNear = java.lang.Long.bitCount(fps(0L) ^ fps(2L))
    val hamFar = java.lang.Long.bitCount(fps(0L) ^ fps(3L))
    assert(hamNear < hamFar)
    // 16-bit bands of the fingerprint reconstruct it (the pairing path
    // reads bands via unsigned shift + mask — incl. the sign-bit band)
    val f = fps(3L)
    val rebuilt = (0 until 4).map(b => ((f >>> (16 * b)) & 0xFFFFL) << (16 * b))
      .reduce(_ | _)
    assert(rebuilt == f)
  }

  test("winnowing: window guarantee, density, and rightmost tie-break") {
    val k = 4; val w = 5
    // two docs sharing a verbatim run of w+k-1 = 8 tokens MUST share a
    // fingerprint digest (the winnowing guarantee)
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val pair = Seq(
      (10L, s"unrelated prefix words here $shared"),
      (11L, s"$shared and a different suffix tail")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(pair, $"doc_id", $"text", k, w)
      .as[(Long, Int, String)].collect()
    val a = fp.filter(_._1 == 10L).map(_._3).toSet
    val b = fp.filter(_._1 == 11L).map(_._3).toSet
    assert(a.intersect(b).nonEmpty)

    // every selected position is a valid gram start; every full window
    // [p, p+w-1] contains at least one selected position (coverage)
    val one = Seq((20L, ("tok" + (1 to 40).mkString(" tok")))
      ).toDF("doc_id", "text")
    val sel = Dedup.winnowFingerprints(one, $"doc_id", $"text", k, w)
      .as[(Long, Int, String)].collect().map(_._2).toSet
    val ng = 40 - k + 1
    assert(sel.forall(p => p >= 1 && p <= ng))
    (1 to (ng - w + 1)).foreach { p =>
      assert((p until p + w).exists(sel.contains),
        s"window starting at $p selected nothing")
    }
    // expected density ~2/(w+1): selected count well under gram count
    assert(sel.size < ng)

    // a doc shorter than one window still yields exactly one fingerprint
    val tiny = Seq((30L, "just three words")).toDF("doc_id", "text")
    val t = Dedup.winnowFingerprints(tiny, $"doc_id", $"text", k, w)
      .as[(Long, Int, String)].collect()
    assert(t.length == 1 && t.head._2 == 1)

    // rightmost-on-tie: all-identical tokens -> every gram digest equal;
    // each full window must select its RIGHTMOST position
    val flat = Seq((40L, Seq.fill(12)("same").mkString(" ")))
      .toDF("doc_id", "text")
    val fsel = Dedup.winnowFingerprints(flat, $"doc_id", $"text", k, w)
      .as[(Long, Int, String)].collect().map(_._2).toSet
    val fng = 12 - k + 1 // 9 grams, full windows start at 1..5
    assert(fsel == Set(5, 6, 7, 8, 9).intersect((1 to fng).toSet) ||
      fsel == (5 to fng).toSet) // windows 1..5 all pick their last row
  }

  test("winnowing: native kernel ≡ windowed formulation row-for-row") {
    // the zero-shuffle WinnowExpr kernel and the r10 window-over-
    // exploded-grams form must select identical (doc_id, fp_pos, fp)
    // sets, including the partial-gram tail, empty-text, multi-space
    // and shorter-than-window edge docs
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha  beta   gamma delta"), // multi-space: empty tokens kept
      (3L, ""),
      (4L, "just three words"),
      (5L, Seq.fill(12)("same").mkString(" ")),
      (6L, ("tok" + (1 to 40).mkString(" tok"))),
      (7L, null.asInstanceOf[String]) // null text: BOTH forms drop the doc
    ).toDF("doc_id", "text")
    for ((k, w) <- Seq((4, 5), (2, 3), (1, 1))) {
      val native = Dedup.winnowFingerprints(docs, $"doc_id", $"text", k, w)
        .as[(Long, Int, String)].collect().toSet
      val windowed = Dedup
        .winnowFingerprintsWindowed(docs, $"doc_id", $"text", k, w)
        .as[(Long, Int, String)].collect().toSet
      assert(native == windowed, s"k=$k w=$w")
    }
  }

  test("simhash banding knob: every nBands ≥ 4 catches every " +
    "Hamming ≤ 3 pair (pigeonhole), and 4 is tight") {
    // deterministic fp corpus: an LCG walk plus, for each base, twins
    // at Hamming 1/2/3 with flip positions spread across bands —
    // every (base, twin) pair MUST share at least one band at any
    // banding with nBands ≥ h+1 = 4
    val bases = Iterator.iterate(0x9E3779B97F4A7C15L)(x =>
      x * 6364136223846793005L + 1442695040888963407L).take(8).toSeq
    val pairs = bases.zipWithIndex.flatMap { case (b, i) =>
      val flips = Seq(
        Seq(63),                       // h=1, sign bit
        Seq(i % 16, 16 + (i % 16)),    // h=2, two bands
        Seq(i % 16, 31, 48 + i % 16))  // h=3, three bands
      flips.map(f => (b, f.foldLeft(b)((acc, p) => acc ^ (1L << p))))
    }
    def bandSets(fps: Seq[Long], nBands: Int): Seq[Set[(Int, Long)]] = {
      val df = fps.zipWithIndex.map { case (f, i) => (i.toLong, f) }
        .toDF("id", "fp")
        .select($"id", explode(Dedup.simhashBands($"fp", nBands)).as("b"))
        .select($"id", $"b.band_idx", $"b.bv")
        .as[(Long, Int, Long)].collect()
      fps.indices.map(i =>
        df.filter(_._1 == i).map(r => (r._2, r._3)).toSet)
    }
    for (nBands <- Seq(4, 8, 16, 32)) {
      val fps = pairs.flatMap(p => Seq(p._1, p._2))
      val sets = bandSets(fps, nBands)
      pairs.indices.foreach { k =>
        val shared = sets(2 * k).intersect(sets(2 * k + 1))
        assert(shared.nonEmpty,
          s"nBands=$nBands missed Hamming<=3 pair #$k " +
            f"(${pairs(k)._1}%016x vs ${pairs(k)._2}%016x)")
      }
    }
    // tightness: one flip in EACH 16-bit band (Hamming 4) shares no
    // band at nBands=4 — the ⌈64/(3+1)⌉ bound is exactly the rule's
    // minimum, not slack
    val evader = Seq(0, 16, 32, 48).foldLeft(bases.head)(
      (acc, p) => acc ^ (1L << p))
    val s4 = bandSets(Seq(bases.head, evader), 4)
    assert(s4(0).intersect(s4(1)).isEmpty,
      "a Hamming-4 pair flipping every band must evade 4 bands")
  }

  test("simhash banding knob: the Hamming ≤ 3 near-pair set is " +
    "invariant across 4/8/16 bands on planted near-dups") {
    // mirror of the q_simhash_pairs pipeline, banding parameterized
    def nearPairs(nBands: Int): Set[(Long, Long)] = {
      val fp = Dedup.simhash64Df(docs, $"doc_id", $"text")
      val bands = fp.select($"doc_id", $"fp",
          explode(Dedup.simhashBands($"fp", nBands)).as("b"))
        .select($"doc_id", $"fp", $"b.band_idx".as("band_idx"),
          $"b.bv".as("bv"))
      val a = bands.select($"doc_id".as("id_a"), $"fp".as("fa"),
        $"band_idx", $"bv")
      val b = bands.select($"doc_id".as("id_b"), $"fp".as("fb"),
        $"band_idx", $"bv")
      a.join(b, Seq("band_idx", "bv"))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b", $"fa", $"fb").distinct()
        .filter(bit_count($"fa".bitwiseXOR($"fb")) <= 3)
        .select($"id_a", $"id_b")
        .as[(Long, Long)].collect().toSet
    }
    val base = nearPairs(4)
    // the fixture plants exact dups (0,1,4) — Hamming 0 — which no
    // banding may lose; near-dup 2 joins if its fp is within 3 bits
    assert(Set((0L, 1L), (0L, 4L), (1L, 4L)).subsetOf(base))
    for (nBands <- Seq(8, 16))
      assert(nearPairs(nBands) == base, s"nBands=$nBands near set drifted")
  }

  test("fuzzy-dedup funnel: verified edges drop non-dups, survivors are " +
    "min-id") {
    // candidates from LSH include (0,1),(0,4),(1,4) and likely (0,2);
    // Jaccard >= 0.5 keeps the exact trio and the near pair, drops
    // accidental band collisions with doc 3
    val cand = Dedup.lshCandidatePairs(
      Dedup.lshBands(docs, $"doc_id", $"text", 2, 4, 2))
    val sh = docs.select($"doc_id", Dedup.shingles($"text", 2).as("sh"))
    val inter = size(array_intersect($"sa", $"sb"))
    val edges = cand
      .join(sh.select($"doc_id".as("id_a"), $"sh".as("sa")), "id_a")
      .join(sh.select($"doc_id".as("id_b"), $"sh".as("sb")), "id_b")
      .filter(inter * 2 >= size($"sa") + size($"sb") - inter)
      .select($"id_a", $"id_b")
    val cl = Dedup.duplicateClusters(edges)
      .as[(Long, Long)].collect().toMap
    // 0,1,2,4 form one component headed by 0; doc 3 untouched
    assert(cl(1L) == 0L && cl(4L) == 0L && cl(0L) == 0L)
    assert(!cl.contains(3L))
    assert(cl.getOrElse(2L, 0L) == 0L) // near-dup joins via jaccard > 0.5
  }
}
