package graft.tools

import org.apache.spark.sql.SparkSession

/** Child-JVM probe for LocalClusterSpec: runs representative queries on
  * `local-cluster[2,2,2048]` — in-JVM master/workers but REAL forked
  * executor processes, so the suite's custom machinery crosses actual
  * process boundaries for the first time: closures and broadcast
  * variables serialize over the wire, shuffle blocks are fetched
  * remotely between executor JVMs through the BlockManager, generated
  * code and `ctx.addReferenceObj` expression instances are shipped and
  * class-loaded inside executors, and the typed aggregate buffers
  * (VecMeanExpr) round-trip their serializers between processes. All of
  * that is invisible on `local[N]` (one JVM, everything in-heap) and is
  * exactly what a 1000-executor cluster exercises on every stage.
  *
  * Prints `<query>|<row>` lines; LocalClusterSpec diffs them against the
  * shared in-process session running the IDENTICAL SparkEntry queries.
  */
object ClusterProbe {

  /** Queries chosen to cover each custom-machinery class: native
    * codegen expressions (CDC chunking, text kernels), the custom
    * TypedImperativeAggregate (vec_mean), the custom physical operator
    * (TopKPerKey), a distributed-build broadcast Bloom probe, and a
    * digest-keyed multi-stage shuffle funnel.
    */
  val Probes: Seq[String] = Seq(
    "q_substring_dedup", // CdcChunksExpr codegen in remote executors
    "q_text_stats",      // TextExprs one-pass kernels
    "q_window_mean",     // VecMeanExpr typed agg buffers over shuffle
    "q_topk_per_key",    // custom LogicalPlan/Strategy/SparkPlan
    "q_bloom_decontam",  // executor-built bloom, broadcast probe
    "q_lsh_pairs",       // minhash/banding digest shuffle funnel
    "q_ann_batch",       // broadcast query table + custom top-k re-rank
    "q_window_battery",  // rank/lag/rolling window functions
    "q_rouge_pairs",     // GramCounts/MapClipSum map-valued exprs (r10):
                         // MapData results cross the shuffle + the
                         // kernels' reference objects ship to executors
    "q_jaro_link",       // JaroWinklerExpr codegen + grid-blocked join
    "q_pca_project",     // CovSumMicroExpr (r10): d² exact-long
                         // covariance partials serialized and merged
                         // across the real process boundary, then the
                         // driver-side power iteration off the merge
    "q_bootstrap_ci",    // BootstrapWeightsExpr reference objects in
                         // remote codegen + VecSumLongExpr buffers
                         // (r10 s5): the 100-long partial arrays
                         // serialize and merge across executor JVMs;
                         // any buffer-serializer defect flips a CI
                         // endpoint
    "q_ann_ivf",         // ArgMaxDotGrouped (r11): the two-level
                         // quantizer's coarse/member/centroid tables
                         // ride the expression tree to remote codegen
                         // as one reference object — a serialization
                         // defect reassigns cells and changes the row
                         // set
    "q_semdedup",        // kmeans two-level Lloyd passes + the
                         // within-cell pair join across real shuffle
                         // boundaries (r11)
    "q_winnowing")       // WinnowExpr (r11 s2): the zero-shuffle
                         // struct-array kernel's reference object
                         // ships to remote codegen; the MessageDigest
                         // and rightmost-min state live entirely
                         // executor-side

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    // fails fast + prints the executors| proof line BEFORE any query
    val spark = ProbeHarness.clusterSession()
    Probes.foreach { name =>
      graft.SparkEntry.queries(name)(spark, d).collect()
        .map(r => s"$name|${r.toString}").sorted.foreach(println)
    }
    spark.stop()
  }
}
