package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Deterministic synthetic peaks-frame source.
  *
  * The reference's source is a TCP stream from a physical interrogator
  * (ref: hyperion.py:284-312, port 51972) — external I/O, not query
  * semantics. For a reproducible, oracle-checkable equivalent we derive
  * frames 1:1 from the driver-provided `events` table: `event_id` is the
  * frame sequence number, `ts` the instrument timestamp, and the peak
  * vector is a pure arithmetic function of `value`, so DuckDB can
  * recompute every downstream result from the same parquet.
  *
  * Scale: this is a narrow projection over a parquet scan — no shuffle,
  * column-pruned, partition count inherited from the source files. At
  * 100 TB the same plan holds (one map stage).
  */
object FrameSource {
  val NumPorts = 8
  val NumPeaks = 8 // committed smoke value, ref: database_peak_streaming.py:10

  /** Batch form: one frame per event.
    * peaks[i]   = cents(value) + i*100      (i = 0..NumPeaks-1)
    * counts[p]  = 1 per port               (sum == NumPeaks)
    * serial     = user_id
    *
    * Peaks are INTEGER-VALUED doubles (value has 2 decimals → cents are
    * exact): sums of integer-valued doubles are associativity-independent
    * below 2^53, so window means are bit-identical regardless of Spark's
    * partition/merge order AND match DuckDB's sequential `avg` exactly —
    * no float-boundary flakiness in the hash-compare gate.
    */
  def frames(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    // array(scalar exprs), not transform(sequence, lambda): higher-order
    // functions evaluate interpreted; the scalar array constructor stays
    // in whole-stage codegen (and CSE dedups the repeated floor()).
    ev.select(
      col("event_id").as("frame_id"),
      col("ts"),
      col("user_id").as("serial_number"),
      array(Seq.fill(NumPorts)(lit(1)): _*).as("peak_counts"),
      array((0 until NumPeaks).map(i =>
        floor(col("value") * 100 + lit(0.5)).cast("double") +
          lit(i.toDouble) * 100): _*).as("peaks"))
  }

  /** Streaming form over the same schema, for pipeline tests: callers feed
    * a MemoryStream[PeaksFrame] (see PeakStreamingSpec); production would
    * point `readStream` at a frame landing zone with this schema.
    */
  def framesStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(graft.model.Schemas.peaksFrameSchema)
      .parquet(path)

  /** Streaming forms of the sensor/spectrum sources (S2/S3): same
    * schemas as the batch builders, read from a landing zone. The
    * builders above define the schema contract; production points these
    * at the instrument gateway's drop directory (or any other
    * Structured Streaming source with the same schema).
    */
  def sensorStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema("frame_id BIGINT, ts TIMESTAMP, values ARRAY<DOUBLE>")
      .parquet(path)

  def spectrumStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema("frame_id BIGINT, ts TIMESTAMP, start_wavelength DOUBLE, " +
        "wavelength_increment DOUBLE, num_points INT, " +
        "active_channel_bits INT, spectrum ARRAY<ARRAY<INT>>")
      .parquet(path)

  val NumSensors = 4

  /** S2/S5 — sensor stream (ref: hyperion.py:388-420: per-sensor float
    * values at a fixed rate). Deterministic synthetic form, same recipe as
    * [[frames]]: values[k] = cents(value) + k*1000 — integer-valued
    * doubles, so every downstream aggregate is oracle-exact.
    */
  def sensorFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.select(
      col("event_id").as("frame_id"),
      col("ts"),
      array((0 until NumSensors).map(k =>
        floor(col("value") * 100 + lit(0.5)).cast("double") +
          lit(k.toDouble) * 1000): _*).as("values"))
  }

  val SpectrumChannels = 8
  val SpectrumPoints = 16

  /** S3/S6 — spectrum stream (ref: hyperion.py:473-515): header carries
    * start wavelength / increment / point count / active-channel bitmap;
    * payload is a channels × points uint16 count matrix. Synthetic matrix:
    * raw[c][p] = (cents(value) + c*1000 + p*7) mod 65536 — a genuine
    * nested ARRAY<ARRAY<INT>> column the calibration pipeline consumes.
    */
  def spectrumFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.select(
      col("event_id").as("frame_id"),
      col("ts"),
      lit(1500.0).as("start_wavelength"),
      lit(0.8).as("wavelength_increment"),
      lit(SpectrumPoints).as("num_points"),
      (col("event_id") % 256).cast("int").as("active_channel_bits"),
      // one native call per row (FrameCodec.synthSpectrum) — the unrolled
      // 128-scalar array(array(...)) construction compiled into a
      // JIT-hostile giant method (~100 µs/row); same values:
      // raw[c][p] = (cents + c*1000 + p*7) % 65536
      FrameCodec.synthSpectrum(
        floor(col("value") * 100 + lit(0.5)).cast("long"),
        SpectrumChannels, SpectrumPoints).as("spectrum"))
  }
}
