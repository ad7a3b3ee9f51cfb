package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Build-side RELATIONAL corpus scaler — NOT part of the shipped
  * surface; the events/part companion to [[ScaleCorpus]] (which scales
  * documents+embeddings only), for gating the relational query family
  * (q_rfm, q_concurrency, q_linkage_clusters) at the ×10/×100 decades
  * (r12 verdict items 2-3).
  *
  * Replication is ENTITY-wise, mirroring ScaleCorpus's design rule —
  * a decade corpus must behave like a larger population with the same
  * per-entity statistics, never like one giant duplicate blob:
  *
  *  - events: `user_id' = user_id·N + r`, `event_id' = event_id·N + r`,
  *    `ts' = ts + r microseconds`. Each replica is a disjoint user
  *    population with the source's exact session structure (the µs
  *    stagger is ≪ the 30-min session gap, it only breaks exact
  *    timestamp ties deterministically), so sessionization/RFM rollups
  *    see N× users, and the concurrency sweep sees N× deltas over the
  *    SAME hour-bucket domain — per-bucket prefix scans grow with the
  *    data while the bucket manifest stays value-sized, exactly the
  *    100 TB shape those plans claim.
  *  - part: `p_partkey' = p_partkey·N + r`; replica 0 verbatim, and
  *    replicas r>0 prefix every name token with `r<r>_` (the
  *    ScaleCorpus token rule) — the leading-token linkage blocks stay
  *    replica-disjoint and per-block size distribution is preserved,
  *    so the JW verify volume grows linearly in N, never quadratically
  *    across replicas.
  *
  * Everything lands in parquet at generation time: Spark and the
  * DuckDB oracle read identical bytes, so generation arithmetic cannot
  * cause gate mismatches. Writes into an EXISTING decade dir (the
  * ScaleCorpus output) without touching documents/embeddings.
  *
  * Usage: Test/runMain graft.RelScaleCorpus <srcSfDir> <outDir> [N=10]
  * (or via [[BuildDecades]], which rebuilds every decade dir in one go)
  */
object RelScaleCorpus {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sfx1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, out, n)
    spark.stop()
  }

  /** Generate `out/events.parquet` and `out/part.parquet` (both ×n)
    * from the driver dir `src`, into an existing decade dir. Callable
    * from [[BuildDecades]] so all decades share one session.
    */
  def build(spark: SparkSession, src: String, out: String, n: Int): Unit = {
    val reps = spark.range(0, n).select(col("id").cast("int").as("r"))

    // read through Tables.events: normalizes the ts encoding
    // (TIMESTAMP(NANOS) vs MICROS) exactly like every consumer does
    val events = graft.util.Tables.events(spark, src)
      .crossJoin(reps)
      .select(
        (col("event_id") * n + col("r")).as("event_id"),
        timestamp_micros(unix_micros(col("ts")) + col("r")).as("ts"),
        (col("user_id") * n + col("r")).as("user_id"),
        col("event_type"), col("value"), col("props"))

    val part = spark.read.parquet(s"$src/part.parquet")
      .crossJoin(reps)
      .select(
        (col("p_partkey") * n + col("r")).as("p_partkey"),
        when(col("r") === 0, col("p_name")).otherwise(
          array_join(transform(split(col("p_name"), " "),
            t => concat(lit("r"), col("r"), lit("_"), t)), " "))
          .as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))

    def landSingle(df: DataFrame, name: String): Unit = {
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(out))
      Files.move(f.toPath, Paths.get(s"$out/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      def rm(g: java.io.File): Unit = {
        Option(g.listFiles()).foreach(_.foreach(rm)); g.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
    landSingle(events.orderBy(col("event_id")), "events")
    landSingle(part.orderBy(col("p_partkey")), "part")
    println(s"[rel-scale-corpus] $out: events=" +
      spark.read.parquet(s"$out/events.parquet").count() +
      " part=" + spark.read.parquet(s"$out/part.parquet").count())
  }
}
