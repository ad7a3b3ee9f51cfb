package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row
import graft.ops.WindowMean

/** The reference's main program (SURVEY.md §3 EP1) as one pipeline:
  * stream of peak frames → tumbling-window aggregate (per-position mean of
  * the peak vectors + port counts of the window's last frame) → dual-
  * resolution sinks (short-term raw, long-term 1-in-N stride) with TTL.
  *
  * Ref: database_peak_streaming.py:16-69 — ~97 ms window drain loop,
  * column-wise numpy.mean, hourly flush, stride copy, age-based DELETE.
  *
  * Improvements over the reference, by design (SURVEY.md §2.7): event time
  * + watermark instead of consumer wall clock; flush-on-stop instead of
  * dropping the tail; checkpointed exactly-once sink instead of
  * lose-on-crash buffers.
  */
object PeakStreaming {
  /** One laser-scan period (ref window ≈ 97 ms drain loop at the 10 Hz
    * default rate) — fetched from the instrument's scan-speed surface
    * (`#GetLaserScanSpeed` default), not assumed.
    */
  val WindowMs: Int =
    1000 / graft.model.InstrumentConfig.LaserScanSpeedDefault
  val LtIncrement = 10        // ref: database_peak_streaming.py:11 (smoke)
  val StLengthSec = 30L       // ref: database_peak_streaming.py:13 (smoke)

  /** Core windowed aggregate, shared by the batch and streaming forms.
    * Input schema: (frame_id, ts, serial_number, peak_counts, peaks).
    * Output: (win_start ts, n_frames, port_counts of last frame,
    * mean_peaks array).
    *
    * One shuffle, keyed by window; VecMean aggregates map-side so each
    * window contributes a single partial row per input partition
    * regardless of frame rate.
    */
  def windowed(frames: DataFrame, windowMs: Int = WindowMs): DataFrame =
    frames
      .groupBy(window(col("ts"), s"$windowMs milliseconds").as("win"))
      .agg(
        count(lit(1)).as("n_frames"),
        max_by(col("peak_counts"), col("frame_id")).as("port_counts"),
        WindowMean.vecMean(col("peaks")).as("mean_peaks"))
      .select(col("win.start").as("win_start"), col("n_frames"),
        col("port_counts"), col("mean_peaks"))

  /** Batch-equivalent of the full pipeline with explicit seq numbers —
    * the form the DuckDB oracle can verify. `batchId` stride semantics:
    * the reference restarts its long-term stride at each flush
    * (database_peak_streaming.py:52); batch form derives batch_id from the
    * flush cadence.
    *
    * `seq` is the window-grid index relative to the first window
    * ((win_start - min)/width + 1): O(1) per row plus one broadcast 1-row
    * min, instead of the global unpartitioned row_number this shipped with
    * originally — a single-task whole-dataset sort at scale. Equal to
    * row_number when every window is non-empty (true of any continuous
    * stream at the reference's 10 Hz); with gaps the grid index is the
    * more faithful physical notion (missing windows keep their slot).
    */
  def batch(frames: DataFrame, windowMs: Int = WindowMs,
            flushSec: Long = 10L): DataFrame = {
    val win = windowed(frames, windowMs)
    val mn = win.agg(min(unix_millis(col("win_start"))).as("__mn"))
    win.crossJoin(broadcast(mn))
      .withColumn("seq",
        ((unix_millis(col("win_start")) - col("__mn")) / windowMs + 1)
          .cast("int"))
      .drop("__mn")
      .withColumn("batch_id",
        floor(col("win_start").cast("double") / flushSec).cast("long"))
      .withColumn("ts_epoch", col("win_start").cast("double"))
  }

  /** The streaming (watermarked) variant of [[windowed]] — split out so
    * the bench can time the read→agg prefix of the pipeline separately
    * from the parquet dual-sink stage (the per-round streaming figure
    * is attributable component by component, not one opaque number).
    */
  def streamAgg(frames: DataFrame, windowMs: Int = WindowMs): DataFrame =
    frames
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), s"$windowMs milliseconds").as("win"))
      .agg(
        count(lit(1)).as("n_frames"),
        max_by(col("peak_counts"), col("frame_id")).as("port_counts"),
        WindowMean.vecMean(col("peaks")).as("mean_peaks"))
      .select(col("win.start").as("win_start"), col("n_frames"),
        col("port_counts"), col("mean_peaks"))

  /** Streaming form: watermarked event-time windows, append mode, both
    * sinks written per micro-batch from one aggregation via foreachBatch
    * (the reference's flush writes st_* then stride-copies to lt_*,
    * database_peak_streaming.py:47-58).
    *
    * Sizing note: the stateful window shuffles every micro-batch into
    * `spark.sql.shuffle.partitions` state stores, and that conf is
    * FROZEN into the checkpoint at first start — size it to the
    * micro-batch volume before starting (small ingest → few
    * partitions, TB-scale state → thousands). Mis-sizing is pure
    * per-batch fixed cost: at ~6k frames/trigger, 32 → 8 partitions
    * measured 2,417 → 4,377 f/s end-to-end (PERF.md r13).
    */
  def stream(frames: DataFrame, stPath: String, ltPath: String,
             checkpoint: String, windowMs: Int = WindowMs,
             ltIncrement: Int = LtIncrement,
             // fault-injection seam (no-op in production): invoked
             // between the st write and the lt stride-copy — the one
             // point where a driver crash leaves the dual sink HALF
             // flushed (st committed, lt not). The crash-recovery spec
             // throws here and asserts the checkpoint-replayed batch
             // converges both sinks (offsets recorded, commit not ⇒
             // replay; dynamic batch_id overwrite ⇒ no duplicates).
             midFlushHook: (DataFrame, Long) => Unit = (_, _) => ())
      : DataStreamWriter[Row] = {
    val agg = streamAgg(frames, windowMs)

    agg.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // IDEMPOTENT dual sink: each micro-batch lands in its own
        // `batch_id=<id>` partition via DYNAMIC partition overwrite, so
        // a batch replayed after a crash (checkpoint has the offsets
        // but not the commit) rewrites exactly its own partition
        // instead of appending duplicates — the Spark equivalent of
        // the reference's one-SQLite-transaction-per-flush atomicity
        // (database_peak_streaming.py:60-63). Metadata-only at scale:
        // only the replayed batch's files are touched.
        //
        // The batch frame is PERSISTED across the two sink actions
        // (r14): foreachBatch hands over a plan, not a result — without
        // the persist the st write and the lt stride-copy each execute
        // the micro-batch's windowed aggregation (the drain's dominant
        // stage) once, i.e. the agg ran twice per batch. Caching the
        // handful of closed-window rows is the Spark-documented
        // multi-action foreachBatch pattern; unpersist before returning
        // so state never outlives its batch.
        val st = batch.withColumn("batch_id", lit(batchId)).persist()
        try {
          st.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(stPath)
          midFlushHook(st, batchId)
          // Long-term sink: per-batch stride (restarts each flush, as the
          // reference does). Strided within batch_id: within one micro-batch
          // that is a single bounded partition — the reference's per-flush
          // restart semantics — never a whole-history sort.
          graft.ops.Downsample
            .strided(st, col("win_start"), ltIncrement,
              partitionBy = Seq(col("batch_id")))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(ltPath)
        } finally st.unpersist()
        ()
      }
  }
}
