package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch plan-audit / timing main — not part of the shipped surface.
  *
  * SPARK_GRAFT_PROFILE=q_a,q_b  → time those queries (min of 3 after
  * warmup) and dump the formatted plan of each.
  * Default: plan-shape asserts for the join-family queries (no
  * BroadcastNestedLoop / CartesianProduct anywhere).
  */
object Profile {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // UTC like every other entry point — Tables.events casts
      // TIMESTAMP_NTZ through the session zone, so a non-UTC host would
      // silently shift all timestamps
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (sys.env.contains("SPARK_GRAFT_EXPERIMENT")) {
      import org.apache.spark.sql.functions._
      val fr = graft.ingest.FrameSource.spectrumFrames(spark, d)
        .filter(col("frame_id") % 50 === 0)
      def t(name: String)(mk: => DataFrame): Unit = {
        force(mk)
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); force(mk)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"EXP $name%-28s min=${times.min}%.3f")
      }
      t("scan_only") { graft.util.Tables.events(spark, d)
        .filter(col("event_id") % 50 === 0).select(col("event_id")) }
      t("spectrum_frames") { fr }
      t("spectrum_encode") { fr.select(graft.ingest.FrameCodec.encodeSpectrum(
        col("frame_id"), lit(0L), lit(0L), col("start_wavelength"),
        col("wavelength_increment"), col("active_channel_bits"),
        col("spectrum")).as("b")) }
      spark.stop(); return
    }
    sys.env.get("SPARK_GRAFT_PROFILE") match {
      case Some(list) =>
        for (q <- list.split(",").map(_.trim).filter(_.nonEmpty)) {
          val mk = () => SparkEntry.queries(q)(spark, d)
          val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
          force(mk())                      // warmup
          val times = (1 to iters).map { _ =>
            val t0 = System.nanoTime()
            force(mk())
            (System.nanoTime() - t0) / 1e9
          }
          println(f"TIME $q%-24s min=${times.min}%.3f  all=" +
            times.map(t => f"$t%.3f").mkString(","))
          if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
            mk().explain("formatted")
        }
      case None =>
        for (q <- Seq("q_asof_join", "q_range_join", "q_embed_neardup",
            "q_ann_ivf")) {
          val plan = SparkEntry.queries(q)(spark, d)
            .queryExecution.executedPlan.toString
          val bad = Seq("BroadcastNestedLoop", "CartesianProduct")
            .filter(plan.contains)
          println(s"PLANCHECK $q: " +
            (if (bad.isEmpty) "OK" else s"BAD ${bad.mkString(",")}"))
          println(plan.linesIterator
            .filter(l => l.contains("Join") || l.contains("Exchange") ||
              l.contains("Window"))
            .map(_.trim.take(120)).mkString("  ", "\n  ", "\n"))
        }
    }
    spark.stop()
  }
}
