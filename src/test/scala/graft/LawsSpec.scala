package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Randomized law checks (seeded, batched into single DataFrame evals so
  * 200 cases cost one Spark job, not 200).
  */
class LawsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  test("laws: native vector exprs == HOF forms on random arrays") {
    // mixed dims per row (same dim within a pair), negatives and zero
    // ELEMENTS — but never all-zero vectors: cosine of a zero-norm
    // vector is NaN from the native expr while the ANSI `/` in the HOF
    // comparison throws DIVIDE_BY_ZERO (documented divergence).
    val rows = (1 to 200).map { i =>
      val dim = 1 + rnd.nextInt(16)
      def vec() = Seq.tabulate(dim)(j =>
        if (j == 0) 1.0 + rnd.nextDouble()
        else rnd.nextInt(5) match {
          case 0 => 0.0
          case _ => rnd.nextGaussian() * 10
        })
      (i, vec(), vec())
    }
    val df = rows.toDF("i", "a", "b")
    val bad = df.select(
      (Similarity.dot($"a", $"b") === Similarity.dotHof($"a", $"b")).as("d") &&
        (Similarity.norm($"a") === Similarity.normHof($"a")).as("n") &&
        (Similarity.cosine($"a", $"b") ===
          Similarity.dotHof($"a", $"b") /
            (Similarity.normHof($"a") * Similarity.normHof($"b"))).as("c"))
      .as[Boolean].collect()
    assert(bad.forall(identity), "native/HOF mismatch on some random row")
    // zero-norm edge: native cosine is NaN (no ANSI divide error)
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b")).as[Double].head()
    assert(z.isNaN)
  }

  test("laws: jaccard is 1 on self and symmetric") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rows = (1 to 100).map { i =>
      def text() = Seq.fill(2 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, text(), text())
    }
    val df = rows.toDF("i", "ta", "tb")
    val checks = df.select(
      (Dedup.jaccard($"ta", $"ta", 2) === 1.0).as("self"),
      (Dedup.jaccard($"ta", $"tb", 2) === Dedup.jaccard($"tb", $"ta", 2))
        .as("sym"))
      .as[(Boolean, Boolean)].collect()
    assert(checks.forall { case (s, y) => s && y })
  }

  test("laws: shingle count within [1, max(tokens-n+1, 1)]") {
    val vocab = Vector("a", "b", "c", "d")
    val rows = (1 to 100).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(20))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = rows.toDF("i", "text")
    val checks = df.select(
      size(Dedup.shingles($"text", 2)).as("ns"),
      size(TextAnalysis.tokens($"text")).as("nt"))
      .as[(Int, Int)].collect()
    assert(checks.forall { case (ns, nt) =>
      ns >= 1 && ns <= math.max(nt - 1, 1) })
  }

  test("laws: srpBucket invariant under positive scaling, in range") {
    val rows = (1 to 100).map { i =>
      val v = Seq.fill(8)(rnd.nextGaussian())
      val s = 0.1 + rnd.nextDouble() * 50
      (i, v, v.map(_ * s))
    }
    val df = rows.toDF("i", "v", "vs")
    val eq = df.select(
      (Similarity.srpBucket($"v", 8, 6) === Similarity.srpBucket($"vs", 8, 6))
        .as("eq"),
      Similarity.srpBucket($"v", 8, 6).as("b"))
      .as[(Boolean, Int)].collect()
    assert(eq.forall { case (e, b) => e && b >= 0 && b < 64 })
  }

  test("laws: nfc normalize is idempotent and length-nonincreasing") {
    // random mixes of ASCII, precomposed accents, combining marks and
    // zero-width chars — composition can only shrink codepoint counts
    val pool = "abc \u00e9\u00fc" + "e\u0301a\u030an\u0303" + "\u200B"
    val rows = (1 to 200).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(30))(
        pool(rnd.nextInt(pool.length))).mkString)
    }
    val df = rows.toDF("i", "t")
    val n1 = graft.functions.TextExprs.nfcNormalize($"t")
    val n2 = graft.functions.TextExprs.nfcNormalize(n1)
    val bad = df.select((n2 === n1 && length(n1) <= length($"t")).as("ok"))
      .as[Boolean].collect()
    assert(bad.forall(identity))
  }

  test("laws: cms estimate is one-sided on random skewed streams") {
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "hot", "xyz", "qq")
    val toks = (1 to 800).map(i =>
      if (i % 3 == 0) "hot" else vocab(rnd.nextInt(vocab.size)))
    val df = toks.map(Tuple1(_)).toDF("t")
    val sk = df.agg(
      graft.functions.CmsSketchExpr.cms($"t", 4, 8).as("sk")) // forced collisions
    val bad = df.groupBy($"t").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .filter(graft.functions.CmsSketchExpr
        .estimate($"t", $"sk", 4, 8) < $"exact")
      .count()
    assert(bad == 0, "cms under-estimated some token")
  }

  test("laws: native bootstrap_weights == the SQL/HOF md5-split form " +
      "bit-for-bit; vec_sum_long == explode+groupBy sums") {
    val ids = ((1 to 200).map(_ => math.abs(rnd.nextLong() % 1000000L))
      ++ Seq(0L, 1L, 999999999999L)).distinct
    val df = ids.toDF("doc_id")
    val native = df.select(col("doc_id"),
      graft.functions.BootstrapWeightsExpr.bootstrapWeights(
        col("doc_id"), 25, graft.queries.PipelineQueries.poissonCuts)
        .as("w"))
    val hof = df.select(col("doc_id"),
      graft.queries.PipelineQueries.bootstrapWeightsHof.as("w"))
    val n = native.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    val h = hof.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n.keySet == h.keySet)
    n.foreach { case (id, w) =>
      assert(w.length == 100)
      assert(w == h(id), s"doc $id: native draws diverge from HOF")
    }
    // vec_sum_long vs the explode reference on the same arrays
    val gotSums = native.agg(graft.functions.VecSumLongExpr
      .vecSumLong(col("w"))).head().getSeq[Long](0)
    val refSums = native.select(posexplode(col("w")))
      .groupBy(col("pos")).agg(sum(col("col")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotSums.length == 100)
    gotSums.zipWithIndex.foreach { case (s0, i) =>
      assert(s0 == refSums(i), s"replicate $i sum diverged")
    }
  }

  test("laws: hash_sample == bottom-k-by-(h,v) reference under any " +
      "partitioning") {
    val k = 16
    val rows = (1 to 500).map(_ =>
      (rnd.nextLong() & 0xFFFFFFFFL, rnd.nextInt(1000).toLong))
    // reference: values of the k smallest DISTINCT (h, v) pairs,
    // sorted ascending — what the aggregate must produce however the
    // input is partitioned (partial/merge associativity)
    val expected = rows.distinct.sorted.take(k).map(_._2).sorted
    for (parts <- Seq(1, 3, 32)) {
      val got = rows.toDF("h", "v").repartition(parts)
        .agg(graft.functions.HashSampleExpr.sample($"h", $"v", k).as("vs"))
        .head.getSeq[Long](0)
      assert(got == expected, s"parts=$parts: $got != $expected")
    }
  }

  test("laws: bloom filter has no false negatives on random strings") {
    val items = (1 to 500).map(i =>
      (i, rnd.alphanumeric.take(1 + rnd.nextInt(24)).mkString))
    val df = items.toDF("i", "s")
    val bf = graft.functions.BloomExprs.build(
      df.select($"s"), "s", 64, 0.5) // undersized + high fpp on purpose
    val misses = df.filter(
      !graft.functions.BloomExprs.mightContain($"s", bf)).count()
    assert(misses == 0)
  }

  test("laws: frame codec decode∘encode = id on random frames (all kinds)") {
    import graft.ingest.FrameCodec
    // 200 random peaks frames: varying count/peak lengths, extreme
    // doubles, u32-boundary timestamps, u64-wrap serials
    val peaks = (1 to 200).map { i =>
      val nC = rnd.nextInt(6)
      val nP = rnd.nextInt(10)
      (rnd.nextLong(), rnd.nextInt().toLong & 0xFFFFFFFFL,
        rnd.nextInt().toLong & 0xFFFFFFFFL,
        Seq.fill(nC)(rnd.nextInt(65536) - 32768),
        Seq.fill(nP)(rnd.nextInt(4) match {
          case 0 => 0.0
          case 1 => Double.MinPositiveValue
          case 2 => -1.7e308
          case _ => rnd.nextGaussian() * 1e9
        }))
    }
    val pdf = peaks.toDF("serial", "ti", "tf", "counts", "ps")
    val bad = pdf.select(
        FrameCodec.decodePeaks(FrameCodec.encodePeaks($"serial", $"ti",
          $"tf", $"counts", $"ps")).as("f"),
        $"serial", $"ti", $"tf", $"counts", $"ps")
      .filter($"f.serial_number" =!= $"serial" ||
        $"f.timestamp_int" =!= $"ti" || $"f.timestamp_frac" =!= $"tf" ||
        $"f.peak_counts" =!= $"counts" || $"f.peaks" =!= $"ps")
      .count()
    assert(bad == 0)

    // 100 random sensor frames incl. u8-boundary status values
    val sensors = (1 to 100).map { i =>
      (rnd.nextInt(256), rnd.nextInt(256), rnd.nextLong(),
        rnd.nextInt().toLong & 0xFFFFFFFFL, (i * 7L) % 1000000000L,
        Seq.fill(rnd.nextInt(8))(rnd.nextGaussian() * 1e6))
    }
    val sdf = sensors.toDF("st", "bp", "serial", "ti", "tf", "vs")
    val sbad = sdf.select(
        FrameCodec.decodeSensor(FrameCodec.encodeSensor($"st", $"bp",
          $"serial", $"ti", $"tf", $"vs")).as("f"),
        $"st", $"bp", $"serial", $"vs")
      .filter($"f.status" =!= $"st" || $"f.buffer_percentage" =!= $"bp" ||
        $"f.serial_number" =!= $"serial" || $"f.values" =!= $"vs")
      .count()
    assert(sbad == 0)
  }
}
