package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators for assembling a training mix: stratified
  * sampling, weighted upsampling, and sequence packing. All are built
  * so the 100 TB shape is right by construction:
  *
  *  - sampling is a deterministic hash FILTER (no shuffle, no rand(),
  *    retry/replay-stable — the same predicate keeps the same rows in
  *    any engine, cf. [[graft.dedup.Dedup.hashSample]]);
  *  - upsampling is a narrow generate (no shuffle);
  *  - packing orders within a caller-chosen shard, never globally —
  *    a global ORDER BY over 100 TB is the classic single-reducer
  *    trap, whereas per-shard packing parallelizes over shards and is
  *    how epoch assembly actually runs (one packed stream per shard).
  */
object Curation {

  private def md5Bucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("int")

  /** Chained stratum→value lookup with a default; compiles to a flat
    * CASE WHEN, evaluated inside codegen (no join, no UDF).
    */
  private def caseLookup(stratum: Column, m: Seq[(String, Int)],
      default: Int): Column =
    m.foldRight(lit(default)) { case ((k, v), acc) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }

  /** Per-stratum deterministic sampling: keep a row iff the first byte
    * of md5(key) falls under its stratum's rate (rate256/256 ≈ the
    * keep fraction). The per-stratum rate is a broadcast-free CASE
    * lookup, so the whole operator is a single scan filter that pushes
    * down next to the reader — the only sampling construction that
    * still works when the strata are petabyte-sized.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Seq[(String, Int)], defaultRate256: Int): DataFrame =
    df.filter(md5Bucket(key) < caseLookup(stratum, rates, defaultRate256))

  /** Weighted integer upsampling (the data-mixing step that repeats
    * high-quality strata N× per epoch): each row is emitted
    * weight(stratum) times with a 1-based `copy` index, as a narrow
    * generate — no shuffle, and downstream shuffles see the copies as
    * ordinary rows. Weight 0 drops the stratum.
    */
  def upsampleMix(df: DataFrame, stratum: Column,
      weights: Seq[(String, Int)], defaultWeight: Int): DataFrame = {
    val w = caseLookup(stratum, weights, defaultWeight).cast("long")
    // sequence(1, 0) is DESCENDING [1, 0] in Spark (implicit step -1),
    // not empty — weight 0 must drop the row explicitly
    df.withColumn("copy",
      explode(when(w >= 1L, sequence(lit(1L), w))
        .otherwise(lit(Array.empty[Long]))))
  }

  /** Temperature-resampled mix (the multilingual-LM α-sampling knob at
    * α=0.5): per-stratum weights n_s^α flatten the stratum distribution
    * and a corpus-derived budget T = n_all/2 is apportioned by exact
    * largest-remainder (Hamilton) integer algebra — sqrt is integerized
    * to micro-units first, and IEEE sqrt is correctly rounded, so any
    * engine integerizes the same double. The sample itself is drawn per
    * stratum by deterministic md5 rank (no rand(), retry-stable).
    *
    * A stratum whose allocation EXCEEDS its row count — the skewed-corpus
    * case α-sampling exists for — is oversampled by repetition: every row
    * repeats `alloc div n` full passes and the first `alloc mod n` rows
    * (in md5-rank order) once more, so the output has exactly `alloc`
    * rows per stratum with `pick_rank` spanning 1..alloc contiguously
    * (pick_rank = (pass-1)·n + rank, a bijection onto 1..alloc). When
    * alloc ≤ n this degenerates to the plain rank filter.
    *
    * Scale shape: only the stratum-sized alloc table touches windows
    * over lit(1); the corpus pass is one per-stratum rank plus a narrow
    * generate for the repeated passes — no all-corpus window, no rand().
    */
  def temperatureMix(df: DataFrame, keyName: String,
      stratumName: String): DataFrame = {
    // the construction builds these internally; a caller column with
    // one of these names would collide in the alloc join — fail with
    // the remedy instead of an ambiguous-attribute analysis error
    val internal = Set("n", "w", "w_all", "n_all", "t_total", "base",
      "rem", "leftover", "rk", "alloc", "prk", "copies", "copy",
      "pick_rank")
    Seq(keyName, stratumName).filter(internal).foreach { c =>
      throw new IllegalArgumentException(
        s"temperatureMix reserves column name '$c' internally " +
          s"(${internal.toSeq.sorted.mkString(", ")}); alias the " +
          "input column before calling")
    }
    val wAll = Window.partitionBy(lit(1))
    val ord = Window.partitionBy(lit(1))
      .orderBy(col("rem").desc, col(stratumName).asc)
    val alloc = df.groupBy(col(stratumName))
      .agg(count(lit(1)).as("n"))
      .withColumn("w",
        floor(sqrt(col("n").cast("double")) * 1e6 + 0.5).cast("long"))
      .withColumn("w_all", sum(col("w")).over(wAll))
      .withColumn("n_all", sum(col("n")).over(wAll))
      .withColumn("t_total", expr("n_all div 2"))
      .withColumn("base", expr("(t_total * w) div w_all"))
      .withColumn("rem",
        col("t_total") * col("w") - col("base") * col("w_all"))
      .withColumn("leftover",
        col("t_total") - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(ord))
      .select(col(stratumName), col("n"),
        (col("base") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc"))
    val pick = Window.partitionBy(col(stratumName))
      .orderBy(md5(col(keyName).cast("string")), col(keyName))
    df.select(col(keyName), col(stratumName))
      .withColumn("prk", row_number().over(pick))
      .join(alloc, stratumName)
      .withColumn("copies",
        expr("alloc div n") +
          when(col("prk") <= expr("alloc % n"), 1L).otherwise(0L))
      // sequence(1, 0) is DESCENDING in Spark — drop copies=0 rows first
      .filter(col("copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("copies"))))
      .select(col(stratumName), col(keyName),
        ((col("copy") - 1L) * col("n") + col("prk")).cast("long")
          .as("pick_rank"))
  }

  /** Sequence packing: concatenate documents in `order` within each
    * `shard`, cut the token stream at `capacity` boundaries, and label
    * each document with the bin its first token lands in — the
    * GPT-style pack-then-chunk epoch layout. One window per shard
    * (running token count over the preceding rows), integer bin ids;
    * deterministic for a deterministic `order`.
    */
  def packBins(df: DataFrame, shard: Column, order: Column,
      nTokens: Column, capacity: Long): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before",
        coalesce(sum(nTokens.cast("long")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before DIV $capacity"))
  }
}
