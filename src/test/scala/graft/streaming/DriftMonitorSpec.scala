package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Drift

/** The streaming PSI drift monitor against the batch report: freeze
  * the era-A histogram as the reference, stream era B in several
  * micro-batches, and the DRAINED monitor's verdict must equal the
  * batch `q_psi_drift` PSI bit-for-bit — same binning rule, same
  * shared smoothing arithmetic (`Drift.psiNanoTerms`), counts
  * accumulated by the engine's own 10-key streaming aggregation
  * rather than custom state.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("drained streaming monitor ≡ batch q_psi_drift; per-batch " +
      "reports are cumulative and bounded") {
    implicit val sqlCtx = spark.sqlContext
    // the batch report and the exact inputs it derived
    val batch = graft.SparkEntry.queries("q_psi_drift")(
      spark, d).collect().sortBy(_.getLong(0))
    val batchPsi = batch.head.getAs[Double]("psi")
    val refCounts = batch.map(_.getAs[Long]("n_a")).toIndexedSeq
    val ev = graft.util.Tables.events(spark, d)
      .select(col("value"), unix_micros(col("ts")).as("e")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val (emin, emax) = (ev.map(_._2).min, ev.map(_._2).max)
    val centsAll = ev.map(x => math.floor(x._1 * 100 + 0.5).toLong)
    val (cmin, cmax) = (centsAll.min, centsAll.max)
    val eraB = ev.filter { case (_, e) => e * 2 >= emin + emax }
      .map(_._1)

    val reports = mutable.ArrayBuffer.empty[Drift.DriftReport]
    val in = MemoryStream[Double]
    val ckpt = Files.createTempDirectory("drift_ckpt").toString
    val q = Drift.psiMonitor(in.toDF().toDF("value"), refCounts,
      cmin, cmax, ckpt)(r => reports.synchronized { reports += r })
      .start()
    try {
      val chunks = eraB.grouped(math.max(1, eraB.length / 3)).toSeq
      chunks.foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val rs = reports.synchronized(reports.toVector)
      assert(rs.nonEmpty && rs.length >= 3,
        s"expected one report per micro-batch, got ${rs.length}")
      // cumulative: stream-so-far counts are nondecreasing and end at
      // the full era-B mass; the reference side never moves
      assert(rs.map(_.nCur).sliding(2).forall(w =>
        w.length < 2 || w(0) <= w(1)))
      assert(rs.forall(_.nRef == refCounts.sum))
      assert(rs.last.nCur == eraB.length.toLong)
      // the drained verdict IS the batch report's PSI, bit-for-bit
      assert(rs.last.psi == batchPsi,
        s"streaming ${rs.last.psi} != batch $batchPsi")
    } finally q.stop()
  }

  test("monitor flags an injected mean shift the reference era " +
      "does not contain") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.SparkEntry.queries("q_psi_drift")(
      spark, d).collect()
    val refCounts = batch.sortBy(_.getLong(0))
      .map(_.getAs[Long]("n_a")).toIndexedSeq
    val ev = graft.util.Tables.events(spark, d)
      .select(col("value")).collect().map(_.getDouble(0))
    val (cmin, cmax) = (ev.map(v => math.floor(v * 100 + 0.5).toLong).min,
      ev.map(v => math.floor(v * 100 + 0.5).toLong).max)

    val reports = mutable.ArrayBuffer.empty[Drift.DriftReport]
    val in = MemoryStream[Double]
    val ckpt = Files.createTempDirectory("drift_ckpt2").toString
    val q = Drift.psiMonitor(in.toDF().toDF("value"), refCounts,
      cmin, cmax, ckpt)(r => reports.synchronized { reports += r })
      .start()
    try {
      // a shifted feed: everything piles into the top bucket (values
      // beyond the reference range clamp into bucket 9, not out of
      // frame) — PSI must read clearly above the self-drift band
      in.addData((0 until 500).map(_ => (cmax + 100).toDouble / 100.0))
      q.processAllAvailable()
      val rs = reports.synchronized(reports.toVector)
      assert(rs.nonEmpty && rs.last.nCur == 500L)
      assert(rs.last.psi > 1.0,
        s"injected shift not flagged: psi=${rs.last.psi}")
    } finally q.stop()
  }
}
