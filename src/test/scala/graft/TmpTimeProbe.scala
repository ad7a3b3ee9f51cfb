package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B timing harness for optimization-round keep/reject
  * decisions (bench-identical session settings; NOT part of the suite
  * or the driver contract).
  *
  * Usage:  Test/runMain graft.TmpTimeProbe <spec> [sfDir] [rounds]
  *
  * where <spec> is either a comma-separated list of SparkEntry query
  * names (times the declared queries as-is) or the name of a variant
  * group registered below (times alternative formulations of one
  * query against each other). Method per r14's measurement memory:
  * one untimed warmup per variant, then `rounds` alternating timed
  * rounds; report min + all runs. Only compare numbers from the SAME
  * probe session — ONLY-mode and full-bench numbers are not
  * comparable.
  */
object TmpTimeProbe {

  /** Variant groups: alternative formulations of one query, timed
    * against each other. Bodies intentionally mirror the query under
    * test at HEAD; drift is probe-only risk (they decide keep/reject,
    * never correctness — the oracle gates that).
    */
  private def groups(
      d: String): Map[String, Seq[(String, () => DataFrame)]] = {
    val s = SparkSession.active
    def docs = graft.util.Tables.documents(s, d)

    // q_simhash_pairs body, parameterized by the fingerprint pass
    def pairs(fp: DataFrame): DataFrame = {
      val bands = fp.select(col("doc_id"), col("fp"),
          explode(graft.dedup.Dedup.simhashBands(col("fp"), 4)).as("b"))
        .select(col("doc_id"), col("fp"),
          col("b.band_idx").as("band_idx"), col("b.bv").as("bv"))
      val a = bands.select(col("doc_id").as("id_a"), col("fp").as("fa"),
        col("band_idx"), col("bv"))
      val b = bands.select(col("doc_id").as("id_b"), col("fp").as("fb"),
        col("band_idx"), col("bv"))
      a.join(b, Seq("band_idx", "bv"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("fa"), col("fb"))
        .distinct()
        .select(col("id_a"), col("id_b"),
          bit_count(col("fa").bitwiseXOR(col("fb"))).cast("int")
            .as("hamming"),
          (bit_count(col("fa").bitwiseXOR(col("fb"))) <= 3).as("is_near"))
    }
    // id-only candidate distinct, fingerprints re-attached from the
    // (tiny) fp table afterwards — shuffles 16 bytes/pair instead of 28
    def pairsThin(fpDf: DataFrame): DataFrame = {
      val bands = fpDf.select(col("doc_id"),
          explode(graft.dedup.Dedup.simhashBands(col("fp"), 4)).as("b"))
        .select(col("doc_id"),
          col("b.band_idx").as("band_idx"), col("b.bv").as("bv"))
      val a = bands.select(col("doc_id").as("id_a"), col("band_idx"),
        col("bv"))
      val b = bands.select(col("doc_id").as("id_b"), col("band_idx"),
        col("bv"))
      val cand = a.join(b, Seq("band_idx", "bv"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      cand
        .join(broadcast(fpDf.select(col("doc_id").as("id_a"),
          col("fp").as("fa"))), "id_a")
        .join(broadcast(fpDf.select(col("doc_id").as("id_b"),
          col("fp").as("fb"))), "id_b")
        .select(col("id_a"), col("id_b"),
          bit_count(col("fa").bitwiseXOR(col("fb"))).cast("int")
            .as("hamming"),
          (bit_count(col("fa").bitwiseXOR(col("fb"))) <= 3).as("is_near"))
    }
    def bandsOf(fpDf: DataFrame): DataFrame =
      fpDf.select(col("doc_id"), col("fp"),
          explode(graft.dedup.Dedup.simhashBands(col("fp"), 4)).as("b"))
        .select(col("doc_id"), col("fp"),
          col("b.band_idx").as("band_idx"), col("b.bv").as("bv"))
    def withConf(k: String, v: String)(f: => DataFrame): DataFrame = {
      s.conf.set(k, v); f
    }
    def fullPairs() = pairs(graft.dedup.Dedup.simhash64Df(
      docs, col("doc_id"), col("text")))
    def fuzzyCand() = graft.dedup.Dedup.lshCandidatePairs(
      graft.dedup.Dedup.lshBands(docs, col("doc_id"), col("text"), 2, 4, 2))
    def fuzzyEdges() = {
      val cand = fuzzyCand()
      val sh = docs.select(col("doc_id"),
        graft.dedup.Dedup.shingles(col("text"), 2).as("sh"))
      val inter = size(array_intersect(col("sa"), col("sb")))
      cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sa")),
          "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sb")),
          "id_b")
        .filter(inter * 2 >= size(col("sa")) + size(col("sb")) - inter)
        .select(col("id_a"), col("id_b"))
    }
    Map(
      "fuzzy_parts" -> Seq(
        "cand_only" -> (() => fuzzyCand()),
        "edges_only" -> (() => fuzzyEdges()),
        "full_query" -> (() =>
          SparkEntry.queries("q_fuzzy_dedup")(s, d))),
      "simhash_pfirst" -> Seq(
        "pfirst_false" -> (() => withConf(
          "spark.sql.adaptive.coalescePartitions.parallelismFirst",
          "false")(fullPairs())),
        "pfirst_true" -> (() => withConf(
          "spark.sql.adaptive.coalescePartitions.parallelismFirst",
          "true")(fullPairs()))),
      "simhash_aqe" -> Seq(
        "adv_default" -> (() => withConf(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")(
          fullPairs())),
        "adv_8m" -> (() => withConf(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")(
          fullPairs())),
        "adv_1m" -> (() => withConf(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")(
          fullPairs()))),
      "simhash_join_parts" -> Seq(
        "join_only" -> (() => {
          val bands = bandsOf(graft.dedup.Dedup.simhash64Df(
            docs, col("doc_id"), col("text")))
          val a = bands.select(col("doc_id").as("id_a"), col("fp").as("fa"),
            col("band_idx"), col("bv"))
          val b = bands.select(col("doc_id").as("id_b"), col("fp").as("fb"),
            col("band_idx"), col("bv"))
          a.join(b, Seq("band_idx", "bv"))
            .filter(col("id_a") < col("id_b"))
            .select(col("id_a"), col("id_b"), col("fa"), col("fb"))
        }),
        "join_distinct" -> (() => {
          val bands = bandsOf(graft.dedup.Dedup.simhash64Df(
            docs, col("doc_id"), col("text")))
          val a = bands.select(col("doc_id").as("id_a"), col("fp").as("fa"),
            col("band_idx"), col("bv"))
          val b = bands.select(col("doc_id").as("id_b"), col("fp").as("fb"),
            col("band_idx"), col("bv"))
          a.join(b, Seq("band_idx", "bv"))
            .filter(col("id_a") < col("id_b"))
            .select(col("id_a"), col("id_b"), col("fa"), col("fb"))
            .distinct()
        })),
      "simhash_shapes" -> Seq(
        "wide_distinct" -> (() => pairs(graft.dedup.Dedup.simhash64Df(
          docs, col("doc_id"), col("text")))),
        "thin_distinct" -> (() => pairsThin(graft.dedup.Dedup.simhash64Df(
          docs, col("doc_id"), col("text"))))),
      "simhash_parts" -> Seq(
        "scan_only" -> (() => docs.select(col("doc_id"), col("text"))),
        "fp_only" -> (() => graft.dedup.Dedup.simhash64Df(
          docs, col("doc_id"), col("text"))),
        "pairs_full" -> (() => pairs(graft.dedup.Dedup.simhash64Df(
          docs, col("doc_id"), col("text"))))),
      "simhash_pairs" -> Seq(
        "native" -> (() => pairs(graft.dedup.Dedup.simhash64Df(
          docs, col("doc_id"), col("text")))),
        "native_ckpt" -> (() => pairs(graft.dedup.Dedup.simhash64Df(
          docs, col("doc_id"), col("text")).localCheckpoint(false))),
        "sql" -> (() => pairs(graft.dedup.Dedup.simhash64DfSql(
          docs, col("doc_id"), col("text"))))))
  }

  def main(args: Array[String]): Unit = {
    val spec = args.headOption.getOrElse("simhash_pairs")
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val g = groups(d)
    val variants: Seq[(String, () => DataFrame)] =
      if (g.contains(spec)) g(spec)
      else spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { n =>
        require(SparkEntry.queries.contains(n), s"unknown query: $n")
        n -> (() => SparkEntry.queries(n)(spark, d))
      }

    variants.foreach { v =>                    // untimed warmup each
      v._2().write.format("noop").mode("overwrite").save()
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to rounds; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(n) = t :: times.getOrElse(n, Nil)
    }
    for ((n, _) <- variants)
      println(f"[probe] $n%-24s min=${times(n).min}%.3f  " +
        s"runs=${times(n).reverse.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
