package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.{CommandCodec, FrameSource}

/** S14-lite — the instrument's config/metadata surface as static
  * DataFrames, so queries can join against instrument properties the
  * way the reference's analysis implicitly assumes them.
  *
  * The reference exposes these as TCP command round-trips on the
  * `Hyperion` client (serial/name/versions hyperion.py:699-740,
  * `channel_count` hyperion.py:765-771, `max_peak_count_per_channel`
  * hyperion.py:773-780, detection-settings presets and per-channel
  * assignments via `HPeakDetectionSettings` hyperion.py:552-590). The
  * command TRANSPORT is control-plane and out of engine scope (SURVEY
  * §1.1); what belongs in the engine is the queryable shape of the
  * answers — one config row, a presets table, and the channel→preset
  * assignment — with deterministic values sized to the synthetic
  * instrument ([[FrameSource.NumPorts]] channels).
  */
object InstrumentConfig {
  val Serial = "HYP-D-8421"
  val InstrumentName = "graft-interrogator-1"
  val FirmwareVersion = "7.2.1"
  val FpgaVersion = "3.9"
  val ChannelCount: Int = FrameSource.NumPorts
  val MaxPeaksPerChannel = 64

  case class Config(serial_number: String, instrument_name: String,
                    firmware_version: String, fpga_version: String,
                    is_ready: Boolean, channel_count: Int,
                    max_peak_count_per_channel: Int)

  /** ref: HPeakDetectionSettings fields, hyperion.py:557-590 (lengths
    * and periods in pm, normalized threshold, Peak|Valley mode)
    */
  case class DetectionPreset(setting_id: Int, name: String,
                             description: String, boxcar_length: Int,
                             diff_filter_length: Int, lockout: Int,
                             ntv_period: Int, threshold: Int, mode: String)

  case class ChannelSetting(channel: Int, setting_id: Int)

  val Presets: Seq[DetectionPreset] = Seq(
    DetectionPreset(0, "default", "standard peak detection",
      250, 800, 1000, 9000, 2000, "Peak"),
    DetectionPreset(1, "sharp", "narrow peaks, short filters",
      125, 400, 500, 4500, 3000, "Peak"),
    DetectionPreset(2, "valley", "valley detection for notch sensors",
      250, 800, 1000, 9000, 1500, "Valley"))

  def config(spark: SparkSession): DataFrame =
    spark.createDataFrame(Seq(Config(Serial, InstrumentName,
      FirmwareVersion, FpgaVersion, is_ready = true, ChannelCount,
      MaxPeaksPerChannel)))

  def detectionSettings(spark: SparkSession): DataFrame =
    spark.createDataFrame(Presets)

  /** channel c (1-based) runs preset (c-1) mod |Presets| — the
    * queryable form of `channel_detection_setting_ids`.
    */
  def channelSettings(spark: SparkSession): DataFrame =
    spark.createDataFrame((1 to ChannelCount).map(c =>
      ChannelSetting(c, (c - 1) % Presets.size)))

  /** Per-channel power calibration (ref: hyperion.py:679-697): integral
    * offset/scale per channel — offsets at even int32 indices, scales at
    * odd (`cal_info[::2]` / `cal_info[1::2]`), dBm = raw·(1/scale)+offset.
    * Deterministic synthetic values: offset(ch) = -40-ch, scale(ch) =
    * 100+ch for 0-based channel ch.
    */
  val PowerCalibration: Seq[CommandCodec.PowerCal] =
    (0 until ChannelCount).map(ch =>
      CommandCodec.PowerCal(-40 - ch, 100 + ch))

  /** The `#GetPowerCalibrationInfo` wire content. */
  def powerCalContent: Array[Byte] =
    CommandCodec.encodePowerCal(PowerCalibration)

  /** Time-sync defaults (ref: hyperion.py:947-1000): NTP on, PTP off —
    * the instrument enforces that the two are never enabled together.
    */
  val NtpEnabledDefault = true
  val NtpServerDefault = "10.0.0.1"
  val PtpEnabledDefault = false

  /** Default sensors (ref: hyperion.py:1229-1330 add_sensor /
    * export_sensors): one per sensor-stream slot
    * ([[FrameSource]] sensor frames carry 4 sensors), channels 1-based,
    * calibration factors exact binary fractions so calibrated
    * aggregates stay float-safe across engines. The 16-byte wire id is
    * the md5 of the name — deterministic, collision-free at this scale.
    */
  val DefaultSensors: Seq[CommandCodec.SensorExport] =
    (1 to 4).map { k =>
      CommandCodec.SensorExport(version = 1, id = sensorId(s"sensor_$k"),
        name = s"sensor_$k", model = if (k % 2 == 1) "os7510" else "os7520",
        channel = k, distance = 10.0 * k, wavelength = 1500.0 + 10 * k,
        calibrationFactor = k * 0.25, rcGain = 1.0,
        rcThresholdHigh = 3000.0, rcThresholdLow = 1000.0)
    }

  def sensorId(name: String): Seq[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(name.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .toSeq

  val SensorExportHeaderVersion = 1

  case class SensorRow(sensor_no: Int, name: String, model: String,
                       channel: Int, distance: Double, wavelength: Double,
                       calibration_factor: Double)

  /** The queryable sensor dim table, built by DECODING the same
    * `#ExportSensors` wire bytes the responder serves (the powerCal
    * pattern): sensor_no is the 1-based stream slot = channel.
    */
  def sensors(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      CommandCodec.decodeSensorExport(CommandCodec.encodeSensorExport(
        SensorExportHeaderVersion, DefaultSensors)).map(s =>
        SensorRow(s.channel, s.name, s.model, s.channel, s.distance,
          s.wavelength, s.calibrationFactor)))

  /** The power-cal dim table (channel, offset, scale) the dBm kernel
    * broadcast-joins against — built by DECODING the same wire bytes the
    * responder serves, so the constants feeding [[graft.ops.Calibrate]]
    * are sourced from the command path, never duplicated by hand.
    */
  def powerCal(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      CommandCodec.decodePowerCal(powerCalContent).zipWithIndex.map {
        case (c, ch) => Schemas.PowerCal(ch, c.offset.toDouble,
          c.scale.toDouble)
      })
}
