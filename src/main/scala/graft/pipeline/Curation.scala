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
