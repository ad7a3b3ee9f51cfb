package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
  }

  test("cosine: 1 for self, -1 for negation, 0 for orthogonal") {
    val df = Seq((Seq(1.0, 0.0, 2.0), Seq(-1.0, 0.0, -2.0),
      Seq(0.0, 3.0, 0.0))).toDF("a", "na", "o")
    val (self, neg, orth) = df.select(
      Similarity.cosine($"a", $"a"), Similarity.cosine($"a", $"na"),
      Similarity.cosine($"a", $"o")).as[(Double, Double, Double)].head()
    assert(math.abs(self - 1.0) < 1e-12)
    assert(math.abs(neg + 1.0) < 1e-12)
    assert(math.abs(orth) < 1e-12)
  }

  test("bruteForceTopK matches a driver-side reference computation") {
    val data = vecs(200, 16)
    val df = data.toDF("vec_id", "v")
    val q = data.head._2
    val qDf = Seq(Tuple1(q)).toDF("qv")
    val got = Similarity.bruteForceTopK(
      df.crossJoin(broadcast(qDf)), $"vec_id", $"v", $"qv", 5)
      .as[(Long, Double)].collect().toSeq
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = data.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(5)
    assert(got.map(_._1) == expected.map(_._1))
    for ((g, e) <- got.map(_._2).zip(expected.map(_._2)))
      assert(math.abs(g - e) < 1e-9)
  }

  test("srpBucket is deterministic and self-consistent") {
    val data = vecs(50, 16)
    val df = data.toDF("vec_id", "v")
    val b1 = df.select($"vec_id",
      Similarity.srpBucket($"v", 16, 8).as("b")).as[(Long, Int)].collect()
    val b2 = df.select($"vec_id",
      Similarity.srpBucket($"v", 16, 8).as("b")).as[(Long, Int)].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall { case (_, b) => b >= 0 && b < 256 })
    // a vector lands in the same bucket as itself scaled (SRP is scale-free)
    val scaled = data.map { case (id, v) => (id, v.map(_ * 3.7)) }.toDF("vec_id", "v")
    val b3 = scaled.select($"vec_id",
      Similarity.srpBucket($"v", 16, 8).as("b")).as[(Long, Int)].collect()
    assert(b1.toSeq == b3.toSeq)
  }

  test("lshTopK returns a subset of brute-force candidates with exact sims") {
    val data = vecs(300, 16)
    val df = data.toDF("vec_id", "v")
    val q = data.head._2
    val qDf = Seq(Tuple1(q)).toDF("qv")
    val lsh = Similarity.lshTopK(df, $"vec_id", $"v",
      // query column must be resolvable against df -> inline literal array
      array(q.map(lit): _*), 16, 4, 10).as[(Long, Double)].collect()
    assert(lsh.nonEmpty) // query's own bucket contains at least itself
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byId = data.toMap
    for ((id, s) <- lsh) assert(math.abs(s - cos(byId(id), q)) < 1e-9)
  }

  test("native vector expressions equal the HOF formulations bit-for-bit") {
    val data = vecs(100, 16)
    val df = data.zip(data.reverse).map { case ((i, a), (_, b)) => (i, a, b) }
      .toDF("vec_id", "a", "b")
    val rows = df.select(
      Similarity.dot($"a", $"b"), Similarity.dotHof($"a", $"b"),
      Similarity.norm($"a"), Similarity.normHof($"a"),
      Similarity.cosine($"a", $"b"),
      Similarity.dotHof($"a", $"b") /
        (Similarity.normHof($"a") * Similarity.normHof($"b")))
      .as[(Double, Double, Double, Double, Double, Double)].collect()
    for ((d1, d2, n1, n2, c1, c2) <- rows) {
      assert(d1 == d2)   // exact, not approximate: same fold order
      assert(n1 == n2)
      assert(c1 == c2)
    }
    // float input arrays coerce implicitly
    val f = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("x", "y")
    assert(f.select(Similarity.dot($"x", $"y")).as[Double].head() == 11.0)
    // mismatched lengths -> null, like the zip_with null-padded fold
    val m = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("x", "y")
    assert(m.select(Similarity.dot($"x", $"y")).isEmpty === false)
    assert(m.select(Similarity.dot($"x", $"y")).head().isNullAt(0))
  }

  test("srpProbes: base bucket first, then smallest-margin flips, distinct") {
    val q = vecs(1, 16).head._2.toArray
    val probes = Similarity.srpProbes(q, 16, 6, nProbes = 8)
    assert(probes.length == 8 && probes.distinct.length == 8)
    assert(probes.forall(p => p >= 0 && p < 64))
    // first probe is the query's own bucket; next are Hamming-1 flips
    assert(Integer.bitCount(probes.head ^ probes(1)) == 1)
  }

  test("annSearch multi-probe recall@10 beats single-probe and passes 0.9") {
    // Clustered fixture — the realistic shape for document embeddings
    // (uniform gaussians are LSH's worst case: top-k cosines ~0.3 put
    // neighbors ~2.3 bucket bits away, so no probe count short of a full
    // scan reaches 0.9; clustered neighbors share most bucket bits).
    val data = {
      val rnd = new scala.util.Random(7)
      val centers = Seq.fill(10)(Array.fill(64)(rnd.nextGaussian()))
      (0 until 500).map { i =>
        val c = centers(i % 10)
        (i.toLong, c.toSeq.map(_ + 0.3 * rnd.nextGaussian()))
      }
    }
    val df = data.toDF("vec_id", "v")
    val q = data.head._2.toArray
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = data.map { case (id, v) => (id, cos(v, q.toSeq)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    def recallAt(nProbes: Int): Double = {
      val got = Similarity.annSearch(df, $"vec_id", $"v", q,
        dim = 64, nBits = 6, nProbes = nProbes, k = 10)
        .as[(Long, Double)].collect().map(_._1).toSet
      got.intersect(truth).size / 10.0
    }
    val single = recallAt(1)
    val multi = recallAt(16)
    assert(multi >= single)
    assert(multi >= 0.9, s"multi-probe recall $multi < 0.9 (single $single)")
  }

  test("srpBitsFor / ivfCellsFor scale with corpus size and clamp") {
    // constant expected occupancy: doubling n adds one bit
    assert(Similarity.srpBitsFor(500, 8) == 6)   // the sf0.01 oracle value
    assert(Similarity.srpBitsFor(1000, 8) == 7)
    assert(Similarity.srpBitsFor(1L << 40, 8) == 30) // maxBits clamp
    assert(Similarity.srpBitsFor(10, 64) == 4)       // minBits clamp
    assert(Similarity.ivfCellsFor(500, 64) == 8)     // the sf0.01 value
    assert(Similarity.ivfCellsFor(5000, 64) == 79)
    assert(Similarity.ivfCellsFor(1, 64) == 4)       // minCells clamp
  }

  test("bucketOccupancy bounds the max bucket on the clustered fixture") {
    // 10 clusters of 50 — the skew-guard histogram must see per-cluster
    // bucket concentration but no runaway bucket beyond cluster size
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val data = (0 until 500).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.toSeq.map(_ + 0.3 * rnd.nextGaussian()))
    }
    val df = data.toDF("vec_id", "v")
    val bits = Similarity.srpBitsFor(500, 8)
    val occ = Similarity.bucketOccupancy(df,
        Similarity.srpBucket($"v", 64, bits))
      .as[(Long, Long, Double, Double)].head()
    val (nBuckets, maxBucket, p99, avg) = occ
    assert(nBuckets >= 10)           // clusters spread over ≥ #cluster buckets
    assert(maxBucket <= 3 * 50,      // no runaway bucket vs cluster size 50
      s"max bucket $maxBucket")
    assert(p99 <= maxBucket && avg <= maxBucket)
  }

  test("ivfProbes(nprobe=2) are the two highest-dot cells in order") {
    val cents = Seq(Array(1.0, 0.0), Array(0.5, 0.5), Array(0.0, 1.0))
    assert(Similarity.ivfProbes(Array(1.0, 0.1), cents, 2) == Seq(0, 1))
    assert(Similarity.ivfProbes(Array(0.1, 1.0), cents, 2) == Seq(2, 1))
    // tie → lower index first
    assert(Similarity.ivfProbes(Array(1.0, 1.0),
      Seq(Array(1.0, 0.0), Array(0.0, 1.0)), 2) == Seq(0, 1))
  }

  test("ivfAssign picks the max-dot-product centroid") {
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val df = Seq((0L, Seq(0.9, 0.1)), (1L, Seq(0.1, 0.9)), (2L, Seq(-5.0, 0.0)))
      .toDF("vec_id", "v")
    val cells = df.select($"vec_id", Similarity.ivfAssign($"v", cents).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(cells == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("kmeans: well-separated clusters recovered, centroids = means") {
    // three tight blobs; the first three ids are one seed per blob, so
    // Lloyd converges to the true partition in one update
    def blob(cx: Double, cy: Double, ids: Range): Seq[(Long, Seq[Double])] =
      ids.map(i => (i.toLong, Seq(cx + (i % 3) * 0.1, cy - (i % 2) * 0.1)))
    val data = blob(10, 0, 0 to 0) ++ blob(0, 10, 1 to 1) ++
      blob(-10, -10, 2 to 2) ++ blob(10, 0, 10 to 19) ++
      blob(0, 10, 20 to 29) ++ blob(-10, -10, 30 to 39)
    val df = data.toDF("id", "v")
    val (assign, cents) = Similarity.kmeans(df, $"id", $"v", k = 3,
      iters = 3)
    val got = assign.as[(Long, Int)].collect().toMap
    // every blob lands in one cluster, each cluster a different one
    def clusterOf(ids: Seq[Long]): Set[Int] = ids.map(got).toSet
    val c1 = clusterOf(Seq(0L) ++ (10L to 19L))
    val c2 = clusterOf(Seq(1L) ++ (20L to 29L))
    val c3 = clusterOf(Seq(2L) ++ (30L to 39L))
    assert(c1.size == 1 && c2.size == 1 && c3.size == 1)
    assert(Set(c1.head, c2.head, c3.head).size == 3)
    // centroids are the (rounded) blob means
    val cm = cents.toMap
    val blob1 = Seq(0L) ++ (10L to 19L)
    val mean1 = data.filter(p => blob1.contains(p._1)).map(_._2)
    val exp1 = (0 until 2).map(j =>
      math.floor(mean1.map(_(j)).sum / mean1.size * 1e6 + 0.5) / 1e6)
    assert(cm(c1.head).toSeq == exp1)
    // an id equidistant to nothing: all points assigned, none dropped
    assert(got.size == data.size)
  }

  test("isqrt is exact across boundaries (squares, squares±1, random)") {
    val ns = (0L to 200L) ++
      (1 to 40).map(i => i.toLong * i * i) ++
      Seq(1L << 20, (1L << 20) - 1, (1L << 20) + 1, 1048576L * 1048576L) ++
      Seq.fill(200)(math.abs(new scala.util.Random(9).nextLong()) % (1L << 40))
    ns.foreach { n =>
      val s = Similarity.isqrt(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s")
    }
  }

  test("two-level assignment law: cell ∈ the vector's coarse group and " +
      "equals the flat argmax RESTRICTED to that group; probes are the " +
      "within-group argmaxes of the top coarse groups") {
    val rnd = new scala.util.Random(11)
    val k = 23
    val cents = Seq.fill(k)(Array.fill(16)(rnd.nextGaussian()))
    val coarse = Similarity.ivfCoarse(16, k)
    assert(coarse.length == Similarity.ivfCoarseCount(k) &&
      coarse.length == 4) // ⌊√23⌋
    val grp = Similarity.ivfGroupOf(cents, coarse)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val data = (0 until 300).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian())))
    val df = data.toDF("vec_id", "v")
    val got = df.select($"vec_id",
        Similarity.ivfAssignTwoLevel($"v", cents, coarse).as("c"))
      .as[(Long, Int)].collect().toMap
    val nonEmpty = coarse.indices.filter(g => grp.contains(g))
    data.foreach { case (id, vs) =>
      val v = vs.toArray
      // reference two-level: best NON-empty coarse group (first-wins),
      // then flat argmax restricted to that group's members
      val g = nonEmpty.maxBy(gi => (dot(v, coarse(gi)), -gi))
      val members = grp.indices.filter(grp(_) == g)
      val expect = members.maxBy(c => (dot(v, cents(c)), -c))
      assert(got(id) == expect, s"vec $id")
      assert(grp(got(id)) == g, s"vec $id not in its coarse group")
    }
    // probes: within-group argmax of each of the top-2 coarse groups
    val qv = Array.fill(16)(rnd.nextGaussian())
    val ps = Similarity.ivfProbesTwoLevel(qv, cents, coarse, 2)
    val ranked = nonEmpty.sortBy(gi => (-dot(qv, coarse(gi)), gi)).take(2)
    val expectPs = ranked.map { g =>
      grp.indices.filter(grp(_) == g).maxBy(c => (dot(qv, cents(c)), -c))
    }
    assert(ps == expectPs)
    // degenerate single-group table → one probe, not a bogus second
    val oneGroup = Seq(Array.fill(16)(1.0))
    val g1 = Similarity.ivfGroupOf(cents, oneGroup)
    assert(g1.forall(_ == 0) &&
      Similarity.ivfProbesTwoLevel(qv, cents, oneGroup, 2).size == 1)
  }

  test("two-level degenerates to flat when one coarse group holds " +
      "every centroid (the k ≤ 3 kmeans configuration)") {
    val rnd = new scala.util.Random(5)
    val cents = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian()))
    val coarse = Similarity.ivfCoarse(8, 3)
    assert(coarse.length == 1) // ⌊√3⌋
    val df = (0 until 100).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "v")
    val cmp = df.select(
        Similarity.ivfAssign($"v", cents).as("a"),
        Similarity.ivfAssignTwoLevel($"v", cents, coarse).as("b"))
      .filter($"a" =!= $"b").count()
    assert(cmp == 0)
  }

  test("native ivfAssign ≡ least(struct) column form, incl. ties") {
    val rnd = new scala.util.Random(3)
    val cents = Seq.fill(17)(Array.fill(16)(rnd.nextGaussian()))
    val data = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian()))) ++
      // exact-tie rows: equal dots against duplicated centroids
      Seq((900L, cents(3).toSeq), (901L, Seq.fill(16)(0.0)))
    val df = data.toDF("vec_id", "v")
    val dupCents = cents :+ cents(3) // duplicate → tie on every row's dot
    val cmp = df.select(
        Similarity.ivfAssign($"v", dupCents).as("a"),
        Similarity.ivfAssignCols($"v", dupCents).as("b"))
      .filter($"a" =!= $"b").count()
    assert(cmp == 0)
  }
}
