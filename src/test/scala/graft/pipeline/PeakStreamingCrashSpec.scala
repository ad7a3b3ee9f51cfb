package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.model.Schemas.PeaksFrame

/** Driver-side partial-flush crash injection (r13 verdict item 6).
  *
  * The dual-sink foreachBatch writes st THEN lt
  * (database_peak_streaming.py:47-58's flush-then-stride-copy). The
  * spec battery already kills executors mid-micro-batch
  * (LocalClusterSpec) and retries tasks (TaskRetrySpec); the fault
  * mode NOT yet injected was the driver dying BETWEEN the two sink
  * writes — st committed for batch N, lt not, checkpoint holding the
  * offsets but no commit. Exactly-once then rests on two mechanisms
  * composing: the checkpoint replays batch N on restart (offsets
  * without commit), and the `batch_id=<N>` dynamic-partition
  * overwrite makes the replayed st write rewrite-in-place instead of
  * duplicating. This spec throws from the production seam between
  * the writes and asserts both sinks converge to exactly the
  * uninterrupted run's row sets.
  */
class PeakStreamingCrashSpec extends SparkSpec {
  import spark.implicits._

  private def frame(k: Int, t0: Long): PeaksFrame =
    PeaksFrame(k.toLong, new Timestamp(t0 + k * 50L), 7L,
      Seq(1, 1), Seq(k.toDouble, k + 10.0))

  private def toFrames(mem: MemoryStream[PeaksFrame]): DataFrame =
    mem.toDF()
      .select($"frameId".as("frame_id"), $"ts",
        $"serialNumber".as("serial_number"),
        $"peakCounts".as("peak_counts"), $"peaks")

  // (batch_id, win_start, n_frames, mean_peaks) — the full sink row
  // identity; sorted so set comparison is order-free. A sink that only
  // ever received empty batches holds no parquet footer to infer a
  // schema from (partitionBy writes just _SUCCESS) — that IS "no rows"
  private def sinkRows(path: String): Seq[(Long, Double, Long, Seq[Double])] =
    try spark.read.parquet(path)
      .select($"batch_id", $"win_start".cast("double"), $"n_frames",
        $"mean_peaks")
      .as[(Long, Double, Long, Seq[Double])].collect().toSeq
      .sortBy(r => (r._1, r._2))
    catch {
      case _: org.apache.spark.sql.AnalysisException => Seq.empty
    }

  test("driver crash between st and lt flush: replayed batch converges " +
    "both sinks, no duplicates") {
    val t0 = 1700000000000L
    implicit val sq = spark.sqlContext

    // ---- control: identical data/cadence, no fault ----
    val ctlDir = Files.createTempDirectory("graft-crash-ctl").toString
    val ctlMem = MemoryStream[PeaksFrame]
    val ctl = PeakStreaming.stream(toFrames(ctlMem),
      s"$ctlDir/st", s"$ctlDir/lt", s"$ctlDir/ckpt").start()
    try {
      ctlMem.addData((0 until 10).map(frame(_, t0)))
      ctl.processAllAvailable()
      ctlMem.addData(frame(1200, t0)) // watermark pusher closes windows
      ctl.processAllAvailable()
      ctlMem.addData(frame(2400, t0))
      ctl.processAllAvailable()
    } finally ctl.stop()

    // ---- fault run: same cadence, crash after the first non-empty
    // st write, before its lt write ----
    val dir = Files.createTempDirectory("graft-crash").toString
    val mem = MemoryStream[PeaksFrame]
    @volatile var injected = false
    @volatile var crashedBatch = -1L
    val hook: (DataFrame, Long) => Unit = { (st, batchId) =>
      if (!injected && !st.isEmpty) {
        injected = true
        crashedBatch = batchId
        throw new RuntimeException("injected driver crash mid-flush")
      }
    }

    val q1 = PeakStreaming.stream(toFrames(mem),
      s"$dir/st", s"$dir/lt", s"$dir/ckpt",
      midFlushHook = hook).start()
    mem.addData((0 until 10).map(frame(_, t0)))
    try q1.processAllAvailable() catch { case _: Throwable => () }
    mem.addData(frame(1200, t0)) // this batch emits windows → crash
    val failed =
      try { q1.processAllAvailable(); false }
      catch { case _: Throwable => true }
    assert(failed && injected, "fault must have fired and killed the query")
    try q1.stop() catch { case _: Throwable => () }

    // mid-write state on disk: the crashed batch's st partition is
    // committed, its lt partition is NOT — the exact half-flush the
    // recovery must repair
    val stPartial = sinkRows(s"$dir/st")
    assert(stPartial.exists(_._1 == crashedBatch),
      s"st must hold the crashed batch $crashedBatch's partition")
    val ltPartialHasBatch =
      new java.io.File(s"$dir/lt").exists() &&
        sinkRows(s"$dir/lt").exists(_._1 == crashedBatch)
    assert(!ltPartialHasBatch,
      "lt must NOT hold the crashed batch — that is the injected fault")

    // ---- restart from the same checkpoint: offsets-without-commit
    // replays the crashed batch; the hook is spent, so it completes ----
    val q2 = PeakStreaming.stream(toFrames(mem),
      s"$dir/st", s"$dir/lt", s"$dir/ckpt",
      midFlushHook = hook).start()
    try {
      q2.processAllAvailable()
      mem.addData(frame(2400, t0))
      q2.processAllAvailable()
    } finally q2.stop()

    // convergence: both sinks equal the uninterrupted run's row sets
    // (batch ids included — the replay reuses the crashed batch's id)
    assert(sinkRows(s"$dir/st") == sinkRows(s"$ctlDir/st"),
      "replayed st must equal the uninterrupted run exactly")
    assert(sinkRows(s"$dir/lt") == sinkRows(s"$ctlDir/lt"),
      "replayed lt must equal the uninterrupted run exactly")
    // idempotence stated directly: the replayed batch's rewrite left no
    // duplicate (batch_id, win_start) rows anywhere
    val st = sinkRows(s"$dir/st")
    assert(st.map(r => (r._1, r._2)).distinct.size == st.size,
      "dynamic batch_id overwrite must leave no duplicate windows")
  }
}
