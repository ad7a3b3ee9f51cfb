package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-timing experiments for the round-10 perf work.
  * Not part of the shipped surface.
  */
object Scratch {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.util.Tables._

    def t(name: String)(mk: => DataFrame): Unit = {
      force(mk) // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); force(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-32s min=${times.min}%.3f " +
        times.map(x => f"$x%.3f").mkString(","))
    }

    val docs = parallelize(documents(spark, d))

    def tc(name: String)(mk: => Unit): Unit = {
      mk // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-32s min=${times.min}%.3f " +
        times.map(x => f"$x%.3f").mkString(","))
    }

    tc("div_collect_only") {
      graft.queries.PipelineQueries.sourceBucketCounts(spark, d, 256)
        .collect()
    }
    tc("div_full_collect") {
      SparkEntry.queries("q_source_divergence")(spark, d).collect()
    }
    tc("div_full_noop") {
      force(SparkEntry.queries("q_source_divergence")(spark, d))
    }

    // --- divergence stages ---
    t("div_a_srcword") {
      docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cw"))
    }
    t("div_b_bucket2level") {
      docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cw"))
        .withColumn("b", (conv(substring(md5(col("w")), 1, 8), 16, 10)
          .cast("long") % 256).cast("int"))
        .groupBy(col("source"), col("b")).agg(sum(col("cw")).as("c"))
    }
    t("div_b_bucket1level") {
      docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
        .withColumn("b", (conv(substring(md5(col("w")), 1, 8), 16, 10)
          .cast("long") % 256).cast("int"))
        .groupBy(col("source"), col("b")).agg(count(lit(1)).as("c"))
    }
    t("div_noop_docs") { docs.select(col("source")) }

    tc("softdedup_current") {
      force(SparkEntry.queries("q_softdedup_weights")(spark, d))
    }
    t("softdedup_window") {
      import org.apache.spark.sql.expressions.Window
      val spans = graft.dedup.Dedup.spanDigests(
        parallelize(documents(spark, d)), col("doc_id"), col("text"), 5)
        .distinct()
      spans.withColumn("occ", count(lit(1)).over(
          Window.partitionBy(col("g"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), sum(col("occ")).as("sum_occ"))
        .select(col("doc_id"), col("n_spans"), col("sum_occ"),
          floor(col("n_spans").cast("double") * lit(1e6) /
            col("sum_occ").cast("double") + lit(0.5)).cast("long")
            .as("weight_micro"))
    }

    tc("mad_current") {
      force(SparkEntry.queries("q_mad_outliers")(spark, d))
    }
    tc("mad_cp_literal") {
      import graft.util.Tables.events
      val base = events(spark, d).select(col("event_type"),
        (floor(col("value") * 1e6 + lit(0.5)) * 2).cast("long").as("v2"))
        .localCheckpoint(false)
      val med = base.groupBy(col("event_type"))
        .agg(expr("percentile(v2, 0.5)").as("med2"),
          count(lit(1)).as("n_events"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      val medCase = med.foldLeft(lit(null).cast("double")) {
        case (acc, (t, m, _)) =>
          when(col("event_type") === t, lit(m)).otherwise(acc)
      }
      val dev = base.withColumn("dev2",
        abs(col("v2").cast("double") - medCase))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(dev2, 0.5)").as("mad2"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val madCase = mad.foldLeft(lit(null).cast("double")) {
        case (acc, (t, m)) =>
          when(col("event_type") === t, lit(m)).otherwise(acc)
      }
      val nMap = med.map(t => t._1 -> t._3).toMap
      val medMap = med.map(t => t._1 -> t._2).toMap
      val out = dev.groupBy(col("event_type"))
        .agg(sum(when(col("dev2") > lit(3.0) * madCase, 1L)
          .otherwise(0L)).as("n_outliers"))
        .collect().map { r =>
          val t = r.getString(0)
          (t, nMap(t), math.floor(medMap(t) / 2e6 * 1e6 + 0.5) / 1e6,
            math.floor(mad(t) / 2e6 * 1e6 + 0.5) / 1e6, r.getLong(1))
        }
      force(spark.createDataFrame(out.toSeq).toDF("event_type",
        "n_events", "median_value", "mad_value", "n_outliers"))
    }

    // --- heaps stages ---
    val nd = documents(spark, d).count()
    def decOf(c: String) =
      expr(s"least(9, ($c * 10) div ${nd}L)").cast("long")
    t("heaps_a_toks_scan") {
      docs.groupBy(decOf("doc_id").as("decile"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("tk"))
    }
    t("heaps_a_toks_norepart") {
      documents(spark, d).groupBy(decOf("doc_id").as("decile"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("tk"))
    }
    t("heaps_b_vocab") {
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
        .groupBy(decOf("fd").as("decile")).agg(count(lit(1)).as("nv"))
    }
    t("heaps_c_onepass") {
      val dw = docs
        .select(decOf("doc_id").as("decile"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy(col("decile"), col("w")).agg(count(lit(1)).as("cw"))
        .localCheckpoint(false)
      val toks = dw.groupBy(col("decile")).agg(sum(col("cw")).as("tk"))
      val vocab = dw.groupBy(col("w"))
        .agg(min(col("decile")).as("fdec"))
        .groupBy(col("fdec").as("decile")).agg(count(lit(1)).as("nv"))
      toks.join(vocab, Seq("decile"), "left")
    }
    spark.stop()
  }
}
