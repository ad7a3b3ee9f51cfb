package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Data model of the reference pipeline (SURVEY.md §1), re-expressed as
  * Spark schemas. The reference's wide `port1..portN` / `peak1..peakM`
  * SQLite tables (ref: database_peak_streaming.py:74-80) are a workaround
  * for SQLite lacking arrays; the native Spark layout is array-typed, with
  * wide projections only at the oracle-parity boundary.
  */
object Schemas {

  /** One peaks frame off the instrument stream
    * (ref: hyperion.py:432-469 — ts int+frac ns, int16 per-channel counts,
    * float64 peak vector sliced by cumsum(counts)).
    */
  final case class PeaksFrame(
      frameId: Long,
      ts: Timestamp,
      serialNumber: Long,
      peakCounts: Seq[Int],
      peaks: Seq[Double])

  /** One sensor frame (ref: hyperion.py:388-420). */
  final case class SensorFrame(ts: Timestamp, values: Seq[Double])

  /** One spectrum frame (ref: hyperion.py:473-515): header carries the
    * wavelength axis; data is channels × points raw counts.
    */
  final case class SpectrumFrame(
      ts: Timestamp,
      startWavelength: Double,
      wavelengthIncrement: Double,
      numPoints: Int,
      activeChannelBits: Int,
      spectrum: Seq[Seq[Int]])

  /** Windowed output row, array-native form. The reference splits this
    * across `st_data` (port counts) + `st_peak` (means) aligned by rowid
    * (ref: database_peak_streaming.py:31-45); we keep one table with an
    * explicit `seq` so ordering never depends on storage internals.
    */
  final case class WindowRow(
      seq: Long,
      batchId: Long,
      ts: Timestamp,
      tsEpoch: Double,
      portCounts: Seq[Int],
      meanPeaks: Seq[Double])

  val peaksFrameSchema: StructType = StructType(Seq(
    StructField("frameId", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("serialNumber", LongType, nullable = false),
    StructField("peakCounts", ArrayType(IntegerType, containsNull = false)),
    StructField("peaks", ArrayType(DoubleType, containsNull = false))))

  /** Power-calibration row per channel (ref: hyperion.py:679-697). */
  final case class PowerCal(channel: Int, offset: Double, scale: Double)
}
