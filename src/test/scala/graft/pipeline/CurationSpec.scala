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
