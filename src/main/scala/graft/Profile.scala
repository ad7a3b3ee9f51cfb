package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.util.Tables

/** Scratch profiling main for q_lsh_bands — not part of the shipped
  * surface; deleted once the regression is understood.
  */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.documents(spark, d)
    time("docs.count (cold JVM)")(docs.count())

    time("lshBands full (1st)")(
      Dedup.lshBands(docs, col("doc_id"), col("text"), 2, 4, 2).count())
    time("lshBands full (2nd)")(
      Dedup.lshBands(docs, col("doc_id"), col("text"), 2, 4, 2).count())
    time("lshBands full (3rd)")(
      Dedup.lshBands(docs, col("doc_id"), col("text"), 2, 4, 2).count())

    time("lshPairs (1st)")(
      Dedup.lshCandidatePairs(
        Dedup.lshBands(docs, col("doc_id"), col("text"), 2, 4, 2)).count())
    time("minhashDf (1st)")(
      Dedup.minhashDf(docs, col("doc_id"), col("text"), 2, 4).count())

    Dedup.lshBands(docs, col("doc_id"), col("text"), 2, 4, 2)
      .explain("formatted")

    spark.stop()
  }
}
