package graft

import org.apache.spark.sql.SparkSession

/** Build-side probe — NOT part of the shipped surface.
  *
  * Counts q_simhash_pairs' output rows on a corpus where the full
  * 218M-row hash compare is impractical, so the decade gate can assert
  * COUNT equality against the DuckDB oracle's count (TRISCALE ×100
  * banding row).
  *
  * Usage: Test/runMain graft.SimhashPairCount <dir>
  */
object SimhashPairCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sfx10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("q_simhash_pairs")(spark, dir).count()
    println(f"pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f dir=$dir")
    spark.stop()
  }
}
