package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample: per-stratum rates, deterministic across runs") {
    val df = (0L until 600L).map(i => (i, s"src${i % 3}"))
      .toDF("id", "source")
    val rates = Seq("src0" -> 256, "src1" -> 0) // keep all / none / default
    val got = Curation.stratifiedSample(df, $"id", $"source", rates, 26)
    val bySrc = got.groupBy($"source").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc("src0") == 200)          // rate 256 keeps everything
    assert(!bySrc.contains("src1"))       // rate 0 keeps nothing
    val d = bySrc("src2")                 // ~26/256 ≈ 10 % of 200
    assert(d > 5 && d < 50, s"default-rate stratum kept $d of 200")
    // deterministic: the same predicate selects the same rows again
    val again = Curation.stratifiedSample(df, $"id", $"source", rates, 26)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(again == got.select($"id").as[Long].collect().sorted.toSeq)
  }

  test("upsampleMix: weights repeat rows, zero drops, copy is 1-based") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "source")
    val out = Curation.upsampleMix(df, $"source",
        Seq("a" -> 3, "b" -> 0, "c" -> 1), defaultWeight = 2)
      .select($"id", $"copy").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 1L), (1L, 2L), (1L, 3L), (3L, 1L),
      (4L, 1L), (4L, 2L)))
  }

  test("packBins: per-shard running cut at capacity, bin of first token") {
    // shard s: docs of 3,4,4 tokens, capacity 5:
    //   doc 1 starts at 0 -> bin 0; doc 2 at 3 -> bin 0; doc 3 at 7 -> bin 1
    val df = Seq(
      (1L, "s", 3L), (2L, "s", 4L), (3L, "s", 4L),
      (9L, "t", 11L), (10L, "t", 1L)).toDF("id", "shard", "n")
    val out = Curation.packBins(df, $"shard", $"id", $"n", capacity = 5L)
      .select($"id", $"cum_before", $"bin").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 1L),
      (9L, 0L, 0L), (10L, 11L, 2L)))
  }

  test("temperatureMix: skewed corpus oversamples the small source by " +
      "repetition, exactly filling the Hamilton allocation") {
    // 100:1 skew — the case α=0.5 flattening exists for. n_all=2020,
    // T=1010; w_small=floor(sqrt(20)e6+.5)=4472136, w_big=44721360,
    // w_all=49193496; base 91/918, leftover 1 goes to small (larger
    // remainder) → alloc small=92 (4.6× its 20 rows), big=918.
    val df = ((0L until 2000L).map(i => (i, "big")) ++
      (10000L until 10020L).map(i => (i, "small"))).toDF("id", "source")
    val out = Curation.temperatureMix(df, "id", "source")
      .select($"source", $"id", $"pick_rank").as[(String, Long, Long)]
      .collect().toSeq
    assert(out.size == 1010)
    val bySrc = out.groupBy(_._1)
    assert(bySrc("small").size == 92 && bySrc("big").size == 918)
    // pick_rank is a bijection onto 1..alloc within each source
    assert(bySrc("small").map(_._3).sorted == (1L to 92L))
    assert(bySrc("big").map(_._3).sorted == (1L to 918L))
    // small source repeats: 92 = 4 full passes + 12 extras, so every
    // doc appears 4 or 5 times; big is a plain subsample (once each)
    val smallCopies = bySrc("small").groupBy(_._2).map(_._2.size).toSet
    assert(smallCopies == Set(4, 5))
    assert(bySrc("big").groupBy(_._2).forall(_._2.size == 1))
  }

  test("temperatureMix rejects reserved internal column names eagerly") {
    val df = Seq((1L, "a")).toDF("id", "n")
    val e = intercept[IllegalArgumentException] {
      Curation.temperatureMix(df, "id", "n")
    }
    assert(e.getMessage.contains("reserves column name 'n'"))
  }

  test("temperatureMix laws: exact Hamilton fill on random corpora " +
      "(total = T, per-stratum count = alloc, pick_rank bijective)") {
    val rnd = new scala.util.Random(2024)
    for (c <- 1 to 5) {
      val k = 2 + rnd.nextInt(4)
      val sizes = Seq.tabulate(k)(i => s"s$i" -> (1 + rnd.nextInt(300)))
      val rows = sizes.flatMap { case (s, n) =>
        (0 until n).map(j =>
          (c * 1000000L + s.drop(1).toLong * 10000L + j, s))
      }
      val out = Curation.temperatureMix(rows.toDF("id", "source"),
          "id", "source")
        .select($"source", $"pick_rank").as[(String, Long)].collect()

      // independent Hamilton reference (same integer algebra, BigInt-
      // free: every product bounded by T·w_all < 2^63 at these sizes)
      val w = sizes.map { case (s, n) =>
        s -> math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong }
      val wAll = w.map(_._2).sum
      val t = sizes.map(_._2.toLong).sum / 2
      val base = w.map { case (s, ws) => (s, t * ws / wAll,
        t * ws - (t * ws / wAll) * wAll) }
      val leftover = t - base.map(_._2).sum
      val ranked = base.sortBy { case (s, _, rem) => (-rem, s) }
      val alloc = ranked.zipWithIndex.map { case ((s, b, _), i) =>
        s -> (b + (if (i < leftover) 1L else 0L)) }.toMap

      assert(out.length.toLong == t, s"case $c: ${out.length} != T=$t")
      val bySrc = out.groupBy(_._1)
      sizes.foreach { case (s, _) =>
        val got = bySrc.get(s).map(_.length.toLong).getOrElse(0L)
        assert(got == alloc(s), s"case $c stratum $s: $got != ${alloc(s)}")
        if (got > 0)
          assert(bySrc(s).map(_._2).sorted.toSeq == (1L to alloc(s)),
            s"case $c stratum $s: pick_rank not bijective onto 1..alloc")
      }
    }
  }

  test("curation funnel: reliable-storage barriers match localCheckpoint " +
      "and land stage parquet") {
    // the cluster configuration: spark.graft.materializeDir routes every
    // stage barrier to parquet (executor-loss-safe), values unchanged
    val d = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("q_curation_pipeline")
    val expect = q(spark, d).collect().map(_.toSeq).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curation_mat").toString
    spark.conf.set(graft.util.Materialize.ConfKey, dir)
    try {
      val got = q(spark, d).collect().map(_.toSeq).toSet
      assert(got == expect)
      val stages = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(stages.exists(_.startsWith("curation_normalized")) &&
        stages.exists(_.startsWith("curation_lines")) &&
        stages.exists(_.startsWith("curation_rewritten")), stages)
    } finally spark.conf.unset(graft.util.Materialize.ConfKey)
  }
}
