package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.util.Tables.cents

/** Distribution-drift machinery shared by the batch PSI report
  * (`q_psi_drift`) and the streaming drift monitor: the same binning
  * rule and the same Laplace-smoothed PSI arithmetic, so the
  * streaming monitor's verdict over a drained stream is BIT-EQUAL to
  * the batch report on the same rows (pinned by DriftMonitorSpec).
  *
  * The monitor is the production shape of the check: freeze a
  * reference histogram from a trusted ingestion snapshot, then watch
  * the live stream's histogram against it batch over batch — the
  * "did the feed drift" alarm a training-data pipeline runs at the
  * ingestion boundary.
  */
object Drift {

  /** One drift verdict per micro-batch: stream-so-far vs reference. */
  final case class DriftReport(batchId: Long, nRef: Long, nCur: Long,
      psi: Double)

  /** The Laplace-smoothed PSI arithmetic — Σ_b (p_a−p_b)·ln(p_a/p_b)
    * with add-one smoothing over k buckets, each term nano-floored
    * from the identical IEEE double tree the DuckDB oracle evaluates,
    * the total an exact long sum micro-floored at the end. Shared
    * verbatim by the batch query's driver-side finish and the
    * streaming monitor's per-batch finish.
    */
  def psiNanoTerms(nA: Seq[Long], nB: Seq[Long]): (IndexedSeq[Long], Double) = {
    require(nA.length == nB.length, "bucket frames differ")
    val k = nA.length
    val (ta, tb) = (nA.sum, nB.sum)
    val terms = (0 until k).map { b =>
      val pa = (nA(b).toDouble + 1.0) / (ta.toDouble + k.toDouble)
      val pb = (nB(b).toDouble + 1.0) / (tb.toDouble + k.toDouble)
      math.floor((pa - pb) * math.log(pa / pb) * 1e9 + 0.5).toLong
    }
    (terms, math.floor(terms.sum.toDouble / 1e9 * 1e6 + 0.5) / 1e6)
  }

  /** The 10-bucket equal-width histogram under the batch report's
    * binning rule (integer-cents edges, integral division), clamped
    * both ends so live values OUTSIDE the frozen reference range land
    * in the edge buckets instead of out-of-frame. The SAME declarative
    * fragment plans as a batch aggregate or as a streaming aggregation
    * with 10-key bounded state — no custom state machinery needed.
    */
  def bucketHistogram(values: DataFrame, cmin: Long, cmax: Long): DataFrame =
    values
      .select(greatest(lit(0L), least(lit(9L),
        expr(s"(c - ${cmin}L) * 10 div (${cmax}L - ${cmin}L + 1)")))
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Project a raw `value` column to integer cents named `c` — the
    * input shape [[bucketHistogram]] bins.
    */
  def centsOf(values: DataFrame): DataFrame =
    values.select(cents(col("value")).as("c"))

  /** Streaming PSI drift monitor: complete-mode 10-key histogram of
    * the stream so far, finished per micro-batch against the frozen
    * reference counts with the shared arithmetic. The per-batch
    * collect is the ≤10-row aggregate — the batch report's
    * driver-side-finish pattern at the sink boundary, bounded at any
    * stream volume. Call `.start()` (checkpoint already set) on the
    * returned writer.
    */
  def psiMonitor(values: DataFrame, ref: IndexedSeq[Long], cmin: Long,
      cmax: Long, checkpoint: String)(
      onReport: DriftReport => Unit): DataStreamWriter[Row] = {
    require(ref.length == 10, "reference must be the 10-bucket frame")
    bucketHistogram(centsOf(values), cmin, cmax)
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val got = df.collect()
          .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
        val cur = (0 until 10).map(b => got.getOrElse(b, 0L))
        val (_, psi) = psiNanoTerms(ref, cur)
        onReport(DriftReport(batchId, ref.sum, cur.sum, psi))
      }
  }
}
