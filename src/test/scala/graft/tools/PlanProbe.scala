package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Iteration aid: print the executed plan of named SparkEntry queries.
  *
  * {{{
  * sbt -batch "Test/runMain graft.tools.PlanProbe /root/testdata/sf0.01 q_heaps_law"
  * }}}
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1))
      println(s"==== $q ====\n" + SparkEntry.queries(q)(spark, args(0))
        .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
