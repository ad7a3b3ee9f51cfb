package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit main — not part of the shipped surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
    spark.stop()
  }
}
