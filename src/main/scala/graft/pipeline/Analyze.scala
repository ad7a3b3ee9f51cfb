package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ingest.FrameSource
import graft.ops.Downsample

/** EP2 — the reference's batch analysis (`analyze_data.py`): scan the
  * long-term tables, project the timestamp column, split peak columns by
  * per-port counts and extract per-peak time series (analyze_data.py:44-82).
  *
  * In Spark the "lt table" is the downsampled pipeline output; series
  * extraction is column projection + explicit time order (the reference
  * leans on SQLite rowid order — SURVEY.md §7.4).
  */
object Analyze {

  /** Long-term table = the windowed pipeline output strided 1-in-N.
    * (The reference's analyze reads lt_data/lt_peak; see PeakStreaming.)
    */
  def ltTable(spark: SparkSession, sfDir: String, windowMs: Int,
              ltIncrement: Int): DataFrame = {
    val windowed = PeakStreaming.batch(
      FrameSource.frames(spark, sfDir), windowMs)
    // seq is already the dense window-grid index — stride is a pure
    // filter, not a row_number sort (Downsample scale note).
    Downsample.stridedByKey(windowed, col("seq") - 1, ltIncrement)
  }

  /** P1/P2 — time series per peak position: (seq, ts_epoch, peak value),
    * one row per (window, position), ordered by time.
    */
  def peakSeries(lt: DataFrame): DataFrame =
    lt.select(col("seq"), col("ts_epoch"),
        posexplode(col("mean_peaks")).as(Seq("pos", "peak_value")))
      .withColumn("peak_no", col("pos") + 1)
      .drop("pos")

  /** P3 — per-port split of the flat peak vector, driven by the port
    * counts (ref: analyze_data.py:66-82 derives column ranges from the
    * first row's port counts; we carry counts per row, which also handles
    * reconfiguration mid-stream).
    */
  def perPortSeries(lt: DataFrame): DataFrame =
    lt.select(col("seq"), col("ts_epoch"),
        posexplode(graft.ops.ChannelSlice.channelSlices(
          col("mean_peaks"), col("port_counts"))).as(Seq("p", "port_peaks")))
      .withColumn("port_no", col("p") + 1)
      .withColumn("n_in_port", size(col("port_peaks")))
      .withColumn("first_peak", element_at(col("port_peaks"), 1))
      .select("seq", "ts_epoch", "port_no", "n_in_port", "first_peak")
}
