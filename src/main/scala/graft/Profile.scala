package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.FrameSource
import graft.util.Tables._

/** Scratch profiling main — not part of the shipped surface. */
object Profile {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(name: String)(df: => DataFrame): Unit = {
    force(df); force(df)
    val t0 = System.nanoTime()
    force(df)
    println(f"PROFILE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sp = FrameSource.spectrumFrames(spark, d)
      .filter(col("frame_id") % 50 === 0)

    time("spectrum frames only")(
      sp.select(col("frame_id"), col("active_channel_bits")))
    time("spectrum + matrix build")(sp)
    time("spectrum + posexplode ch")(
      sp.select(col("frame_id"), col("active_channel_bits"),
        posexplode(col("spectrum")).as(Seq("ch", "raw"))))
    time("full q_spectrum_calibrate")(
      graft.queries.ReferenceQueries.defs("q_spectrum_calibrate")(spark, d))

    // events scan baselines
    time("events scan")(events(spark, d).select(col("event_id"), col("value")))
    time("events filtered %50")(
      events(spark, d).filter(col("event_id") % 50 === 0)
        .select(col("event_id"), col("value")))

    spark.stop()
  }
}
