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
    import graft.util.Tables.{lineitem, orders, cents}

    def salted(buildFact: Boolean): DataFrame = {
      val S = 8
      val fact0 = lineitem(spark, d)
        .select(col("l_orderkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev_cents"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(S))
            .as("salt"))
      val dim0 = orders(spark, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          explode(sequence(lit(0), lit(S - 1))).as("salt"))
      val (fact, dim) =
        if (buildFact) (fact0.hint("shuffle_hash"), dim0)
        else (fact0, dim0.hint("shuffle_hash"))
      fact.join(dim,
          fact0("l_orderkey") === dim0("o_orderkey") &&
            fact0("salt") === dim0("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("rev_cents")).as("rev_cents"))
    }
    val variants = Seq("build_dim" -> (() => salted(false)),
      "build_fact" -> (() => salted(true)))
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
