package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key series
  * onto a fixed epoch-second grid with linear interpolation between
  * the bracketing observations — the step that puts every sensor port
  * on a common time axis before cross-port analysis (the reference's
  * per-port series are taken at the instrument's cadence and drift;
  * analyze_data.py:73-91 plots them raw — a grid is what any joint
  * analysis needs first).
  *
  * Semantics (deterministic, engine-reproducible):
  *  - per key, grid points g·step for g in [⌈min_ts/step⌉, ⌊max_ts/step⌋];
  *  - prev = the observation with the greatest (ts, id) ≤ grid ts,
  *    next = the least (ts, id) with ts STRICTLY greater; ties on ts
  *    break by the caller's id column, so duplicate timestamps can't
  *    make the result partition-order-dependent;
  *  - v = prev_v + (next_v − prev_v)·(g − prev_ts)/(next_ts − prev_ts)
  *    (an exact-hit grid point reduces to prev_v with no special case);
  *  - grid points before the first or at/after the last observation are
  *    dropped (no extrapolation).
  *
  * Scale shape: the observations union the (narrow, generated) grid
  * rows, then TWO keyed window sorts (ascending for prev, descending
  * for next) — the as-of-join family's plan: one hash exchange per
  * sort on the key, state linear in rows, no joins. Per-key grid size
  * is span/step — the caller's step choice bounds it; there is no
  * cross-key interaction.
  */
object Resample {
  /** @param tsSec observation time as epoch seconds (double — micros
    *              fraction preserved); grid/interp arithmetic matches
    *              DuckDB's `epoch(ts)` bit-for-bit
    * @param id    total tie-break among same-ts observations
    *
    * Plan: ONE keyed window sort (`lead` hands every observation its
    * successor), then a narrow generate of the grid points falling in
    * each [obs, next) interval. Duplicate-timestamp groups fall out for
    * free: a non-final member of a ts-group sees lead.ts == ts (empty
    * interval, no grid), so prev is always the greatest (ts, id) ≤ g
    * and next the least (ts, id) strictly after — the same bracketing
    * the two-directional IGNORE-NULLS window walk (the oracle's
    * formulation) produces, at half the sort cost and with no
    * union/grid materialization.
    */
  def gridInterpolate(df: DataFrame, key: Column, tsSec: Column,
                      id: Column, value: Column, stepSec: Long): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("tss"), col("oid"))
    df.select(key.as("k"), tsSec.as("tss"), id.as("oid"), value.as("v"))
      .withColumn("nt", lead(col("tss"), 1).over(w))
      .withColumn("nv", lead(col("v"), 1).over(w))
      // strict inequality drops both the tail observation (no
      // extrapolation) and empty same-ts intervals
      .filter(col("nt") > col("tss"))
      // grid ordinals with tss <= g*step < nt:
      // [ceil(tss/step), ceil(nt/step) - 1]; empty intervals yield a
      // null sequence, which explode skips (sequence(a, b) with a > b
      // would DESCEND, not empty out)
      .withColumn("gmin", ceil(col("tss") / stepSec))
      .withColumn("gmax", ceil(col("nt") / stepSec) - 1)
      .withColumn("g", explode(when(col("gmin") <= col("gmax"),
        sequence(col("gmin"), col("gmax")))))
      .select(col("k"), (col("g") * stepSec).as("grid_ts"),
        (col("v") + (col("nv") - col("v")) *
          (col("g") * stepSec - col("tss")).cast("double") /
          (col("nt") - col("tss"))).as("v_interp"))
  }
}
