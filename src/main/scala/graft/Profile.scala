package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables
import graft.util.Tables._

/** Scratch profiling main — not part of the shipped surface. */
object Profile {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(name: String)(df: DataFrame): Unit = {
    force(df) // warmup: codegen + JIT
    force(df)
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

    def q1(li: DataFrame) = li
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")))).as("sum_charge_cents"),
        r(avg(col("l_quantity"))).as("avg_qty"),
        r(avg(col("l_extendedprice"))).as("avg_price"),
        r(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))

    time("q1 single-task scan")(q1(lineitem(spark, d)))
    time("q1 parallelized scan")(q1(Tables.parallelize(lineitem(spark, d))))

    def jacOld = {
      val docs = documents(spark, d)
      val a = docs.select(col("doc_id").as("id_a"), col("text").as("ta"))
      val b = docs.select(col("doc_id").as("id_b"), col("text").as("tb"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          r(graft.dedup.Dedup.jaccard(col("ta"), col("tb"), 2), 6).as("jaccard"))
    }
    time("jaccard as shipped")(jacOld)

    def jacNew = {
      val sh = Tables.parallelize(documents(spark, d))
        .select(col("doc_id"), graft.dedup.Dedup.shingles(col("text"), 2).as("sh"))
      val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sa"))
      val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sb"))
      val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          r(inter / (size(col("sa")) + size(col("sb")) - inter), 6).as("jaccard"))
    }
    time("jaccard pre-materialized CSE")(jacNew)

    def prioOld = {
      val late = lineitem(spark, d).join(orders(spark, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "inner")
        .select(col("o_orderkey"), col("o_orderpriority")).distinct()
      late.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_orders"))
    }
    time("priority_exists as shipped")(prioOld)

    def prioNew = {
      orders(spark, d).join(lineitem(spark, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_orders"))
    }
    time("priority_exists semi-join")(prioNew)

    spark.stop()
  }
}
