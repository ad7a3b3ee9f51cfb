package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway r14 measurement probe (not part of the suite). */
object TmpTimeProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.util.Tables.{events, epochS, r}

    def ewma(norms: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(epochS(col("ts")), col("event_id")).rowsBetween(-15, 0)
      val beta = 0.75
      val normLit = typedLit((0 to 16).map(n =>
        (1 to n).foldLeft(0.0)((acc, _) => acc * beta + 1.0)))
      events(spark, d)
        .withColumn("arr", collect_list(col("value")).over(w))
        .select(col("event_id"), col("user_id"),
          r(aggregate(col("arr"), lit(0.0), (acc, x) => acc * beta + x) /
            (if (norms) element_at(normLit, size(col("arr")) + 1)
             else aggregate(col("arr"), lit(0.0),
               (acc, _) => acc * beta + 1.0)), 6)
            .as("ewma"))
    }
    val variants = Seq("ewma_head" -> (() => ewma(false)),
      "ewma_lut" -> (() => ewma(true)))
    variants.foreach(v =>
      v._2().write.format("noop").mode("overwrite").save())
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to 5; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(n) = t :: times.getOrElse(n, Nil)
    }
    for ((n, _) <- variants)
      println(f"[probe] $n%-10s min=${times(n).min}%.3f  " +
        s"runs=${times(n).reverse.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
