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
    // q_curation_pipeline stage prefixes (mirrors the query body sans
    // barriers; decides which funnel stage dominates)
    def curationStages(): Seq[(String, () => DataFrame)] = {
      val lineW = 4
      def t0() = docs.filter(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"),
          graft.text.TextAnalysis.normalizeText(col("text")).as("t"))
      def t1() = {
        val toks = split(col("t"), " ")
        val nTok = size(toks).cast("long")
        val wordChars = (length(col("t")) - (nTok - 1)).cast("long")
        val stopHits = graft.functions.TextExprs
          .tokenSetCount(col("t"), graft.text.TextAnalysis.Stopwords)
          .cast("long")
        val nDistinct = size(array_distinct(toks)).cast("long")
        t0().filter(!(nTok < 20 || nTok > 1000) &&
          !(wordChars < nTok * 3 || wordChars > nTok * 10) &&
          stopHits >= 2 && nDistinct * 10 >= nTok * 3)
      }
      def t2() = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("t")))
        t1().withColumn("kid", min(col("doc_id")).over(w))
          .filter(col("doc_id") === col("kid")).drop("kid")
      }
      def lines() = t2()
        .select(col("doc_id"), split(col("t"), " ").as("tk"))
        .select(col("doc_id"), col("tk"),
          explode(sequence(lit(0L),
            expr(s"(size(tk) - 1) div $lineW"))).as("i"))
        .select(col("doc_id"), col("i"),
          array_join(slice(col("tk"),
            (col("i") * lineW + 1).cast("int"), lit(lineW)), " ")
            .as("line"))
        .withColumn("k", md5(col("line")))
      def t3() = {
        val l = lines()
        val lineDf = l.groupBy(col("k"))
          .agg(countDistinct(col("doc_id")).as("df"))
        l.join(lineDf.hint("shuffle_hash"), "k")
          .groupBy(col("doc_id"))
          .agg(array_join(
            transform(array_sort(collect_list(
              when(col("df") <= 2, struct(col("i"), col("line"))))),
              x => x.getField("line")), " ").as("t"))
          .filter(col("t") =!= "")
      }
      Seq(
        "c_t0_normalize" -> (() => t0()),
        "c_t1_gopher" -> (() => t1()),
        "c_t2_exact" -> (() => t2()),
        "c_lines" -> (() => lines()),
        "c_t3_linededup" -> (() => t3()),
        "c_full" -> (() => SparkEntry.queries("q_curation_pipeline")(s, d)))
    }
    def gopherOld() = {
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("long")
      val wordChars = (length(col("text")) - (nTok - 1)).cast("long")
      val stopHits = graft.functions.TextExprs
        .tokenSetCount(col("text"), graft.text.TextAnalysis.Stopwords)
        .cast("long")
      val nDistinct = size(array_distinct(toks)).cast("long")
      docs.filter(!(nTok < 20 || nTok > 1000) &&
        !(wordChars < nTok * 3 || wordChars > nTok * 10) &&
        stopHits >= 2 && nDistinct * 10 >= nTok * 3)
    }
    def gopherNew() = {
      val st = graft.functions.TextExprs.tokenStats(col("text"))
      val nTok = st.getField("n_tok").cast("long")
      val wordChars = (length(col("text")) - (nTok - 1)).cast("long")
      val stopHits = graft.functions.TextExprs
        .tokenSetCount(col("text"), graft.text.TextAnalysis.Stopwords)
        .cast("long")
      val nDistinct = st.getField("n_distinct").cast("long")
      docs.filter(!(nTok < 20 || nTok > 1000) &&
        !(wordChars < nTok * 3 || wordChars > nTok * 10) &&
        stopHits >= 2 && nDistinct * 10 >= nTok * 3)
    }
    Map(
      "gopher_forms" -> Seq(
        "old_split" -> (() => gopherOld()),
        "new_stats" -> (() => gopherNew())),
      "curation_parts" -> curationStages(),
      "fuzzy_sh" -> Seq(
        "sh_only" -> (() => docs.select(col("doc_id"),
          graft.dedup.Dedup.shingles(col("text"), 2).as("sh"))),
        "cand_count" -> (() => fuzzyCand()
          .agg(count(lit(1)).as("n"))),
        "sh_sizes" -> (() => docs.select(
          sum(size(graft.dedup.Dedup.shingles(col("text"), 2)))
            .as("total_shingles")))),
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
