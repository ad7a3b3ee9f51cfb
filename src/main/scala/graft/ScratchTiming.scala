package graft

import org.apache.spark.sql.SparkSession

/** Scratch: timing probe for the memoized graph queries. */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def force(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_pagerank")(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to 4) println(f"pass $i: ${force()}%.3f s")
    spark.stop()
  }
}
