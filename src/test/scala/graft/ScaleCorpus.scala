package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Build-side corpus scaler — NOT part of the shipped surface.
  *
  * Synthesizes an sf1-equivalent documents+embeddings corpus as a
  * deterministic N× replication of a driver sf dir, for running the
  * dedup/ANN/curation oracle gate one decade past the largest driver
  * scale (TRISCALE.md's quad-scale row):
  *
  *  - `doc_id' = doc_id·N + r` (digest-distinct per replica);
  *  - replica 0 is the source corpus verbatim; replicas r>0 prefix every
  *    token with `r<r>_`, so a replica is internally near-dup-
  *    structured exactly like the source but shares NO shingles across
  *    replicas — the corpus behaves like a 10× LARGER corpus with the
  *    same per-doc statistics, not like one giant duplicate blob
  *    (which would square the candidate-pair volume and the oracle's
  *    reachability CTE, an oracle-cost artifact, not a scale test);
  *  - `vec_id' = vec_id·N + r`; replica r>0 vectors rotate left by r
  *    so within-replica geometry (norms, neighbor ranks) is preserved
  *    while cross-replica neighborhoods decorrelate.
  *
  * All transforms run at GENERATION time and land in parquet — Spark
  * and the DuckDB oracle then read identical bytes, so generation
  * arithmetic cannot cause gate mismatches.
  *
  * Document and embedding factors are independent, defaulting to the
  * DRIVER's own decade scaling (sf0.01 → sf0.1 is docs ×10 but
  * embeddings ×4): docs ×10 → 50k, embeddings ×4 → 8k. The embedding
  * factor matters for the oracle gate: 8k vectors sit inside both
  * static-literal envelopes (srpBits 10 ≤ MaxOracleBits 12; ivfCells
  * ⌈8000/64⌉ = 125 ≤ MaxOracleCells 128), while a ×10 replication
  * (20k) would need 313 IVF centroid literals — an ORACLE-SQL
  * embedding artifact, not a Spark-plan limit (the plans derive
  * parameters up to maxBits=30 / 2^20 cells).
  *
  * Usage: Test/runMain graft.ScaleCorpus <srcSfDir> <outDir> [N=10] [embN=4]
  * (or via [[BuildDecades]], which rebuilds every decade dir in one go)
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sfx1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val embN = args.lift(3).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, out, n, embN)
    spark.stop()
  }

  /** Generate `out/documents.parquet` (×n) and `out/embeddings.parquet`
    * (×embN) from the driver dir `src`. Callable from [[BuildDecades]]
    * so all decades share one session.
    */
  def build(spark: SparkSession, src: String, out: String,
            n: Int, embN: Int): Unit = {
    val reps = spark.range(0, n).select(col("id").cast("int").as("r"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .crossJoin(reps)
      .select(
        (col("doc_id") * n + col("r")).as("doc_id"),
        when(col("r") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(lit("r"), col("r"), lit("_"), t)), " "))
          .as("text"),
        col("lang"), col("source"), col("r"))
      .withColumn("n_chars", length(col("text")))
      .drop("r")

    val embReps = spark.range(0, embN).select(col("id").cast("int").as("r"))
    val dim = spark.read.parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
      .crossJoin(embReps)
      .select(
        (col("vec_id") * embN + col("r")).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          transform(sequence(lit(0), lit(dim - 1)),
            i => element_at(col("embedding"),
              pmod(i + col("r"), lit(dim)) + 1)))
          .cast("array<float>").as("embedding"),
        col("label"))

    def landSingle(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(out))
      Files.move(part.toPath, Paths.get(s"$out/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
    landSingle(docs.orderBy(col("doc_id")), "documents")
    landSingle(embs.orderBy(col("vec_id")), "embeddings")
    println(s"[scale-corpus] $out: docs=" +
      spark.read.parquet(s"$out/documents.parquet").count() +
      " embs=" + spark.read.parquet(s"$out/embeddings.parquet").count())
  }
}
