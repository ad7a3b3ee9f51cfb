package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-side probe — NOT part of the shipped surface.
  *
  * Measures, for a documents.parquet corpus and a set of SimHash band
  * widths, the band-bucket occupancy and the exact candidate-pair
  * volume Σ C(cnt, 2) of the q_simhash_pairs band join — the linear
  * diagnostic that decides the banding knob (Dedup.simhashBands)
  * without executing the quadratic join itself. One line per
  * (corpus, nBands):
  *
  *   dir=… nBands=… docs=… buckets=… max_occ=… p99_occ=… cand_pairs=…
  *
  * Usage: Test/runMain graft.SimhashOccupancyProbe <dir> [nBands,...]
  */
object SimhashOccupancyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bandsList = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(4, 8))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val fp = graft.dedup.Dedup
      .simhash64Df(docs, col("doc_id"), col("text"))
      .localCheckpoint(true) // fingerprint stage runs once for all knobs
    val nDocs = fp.count()
    val fpSec = (System.nanoTime() - t0) / 1e9
    println(f"dir=$dir docs=$nDocs fp_sec=$fpSec%.2f")

    for (nBands <- bandsList) {
      val occ = fp.select(
          explode(graft.dedup.Dedup.simhashBands(col("fp"), nBands))
            .as("b"))
        .groupBy(col("b.band_idx"), col("b.bv"))
        .agg(count(lit(1)).as("cnt"))
      val stats = occ.agg(
          count(lit(1)).as("buckets"),
          max(col("cnt")).as("max_occ"),
          expr("approx_percentile(cnt, 0.99)").as("p99_occ"),
          sum(expr("cnt * (cnt - 1) div 2")).as("cand_pairs"))
        .head()
      println(s"dir=$dir nBands=$nBands docs=$nDocs " +
        s"buckets=${stats.getLong(0)} max_occ=${stats.getLong(1)} " +
        s"p99_occ=${stats.getLong(2)} cand_pairs=${stats.getLong(3)}")
    }
    spark.stop()
  }
}
