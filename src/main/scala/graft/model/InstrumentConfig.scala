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

  /** Laser scan speeds (ref: hyperion.py:824-846): the settable Hz
    * rates; the default is the 10 Hz envelope the whole streaming
    * pipeline is built around ([[graft.pipeline.PeakStreaming.WindowMs]]
    * = one scan period). Synthetic-deterministic set — the reference
    * fetches it from hardware.
    */
  val AvailableLaserScanSpeeds: Seq[Int] = Seq(1, 10, 100, 1000)
  val LaserScanSpeedDefault = 10

  /** Fiber index of refraction used wherever delay physics runs — the
    * reference's client-side default for SMF28 is 1.452
    * (hyperion.py:1134); we pin one instrument-wide constant shared by
    * the wire-served peak-offset table and the q_delay_physics kernel.
    */
  val IndexOfRefraction = 1.4682

  /** Synthetic count↔wavelength model for `#ConvertCountToWavelength` /
    * `#ConvertWavelengthToCount` (hyperion.py:1175-1223): wl(count) =
    * [[CountZeroWavelength]] + count·[[WavelengthPerCount]]; the
    * wavelength→count direction additionally shifts by the offset delay
    * (ns) at [[CountsPerNsDelay]] counts/ns. Linear like the
    * instrument's published axis (start + k·increment).
    */
  val CountZeroWavelength = 1500.0
  val WavelengthPerCount = 0.0008
  val CountsPerNsDelay = 1.0

  def countToWavelength(count: Double): Double =
    CountZeroWavelength + count * WavelengthPerCount

  def wavelengthToCount(wl: Double, offsetNs: Double): Double =
    (wl - CountZeroWavelength) / WavelengthPerCount +
      offsetNs * CountsPerNsDelay

  /** Default time-of-flight compensation regions per channel
    * (ref: hyperion.py:1085-1126): channel ch carries min(ch, 3)
    * regions; region r (1-based) ends at boundary 1000·r + 100·ch
    * counts and compensates a one-way fiber run of 10·ch + 5·r meters,
    * so every wire-served delay is the [[graft.ops.Physics]] formula
    * over that distance at [[IndexOfRefraction]] — the command path and
    * the physics kernel can never disagree.
    */
  def offsetDistanceM(ch: Int, region: Int): Double = 10.0 * ch + 5.0 * region

  def offsetBoundary(ch: Int, region: Int): Int = 1000 * region + 100 * ch

  def defaultPeakOffsets(ch: Int): CommandCodec.PeakOffsets = {
    val regions = (1 to math.min(ch, 3))
    CommandCodec.PeakOffsets(
      regions.map(r => offsetBoundary(ch, r)),
      regions.map(r => graft.ops.Physics.delayNsScalar(
        offsetDistanceM(ch, r), IndexOfRefraction)))
  }

  case class PeakOffsetRow(channel: Int, region: Int, boundary: Int,
                           delay_ns: Long)

  /** The queryable peak-offsets dim — built by DECODING the same
    * `#GetPeakOffsets` wire bytes the responder serves per channel
    * (the powerCal pattern), one row per (channel, region).
    */
  def peakOffsets(spark: SparkSession): DataFrame =
    spark.createDataFrame((1 to ChannelCount).flatMap { ch =>
      val o = CommandCodec.decodePeakOffsets(
        CommandCodec.encodePeakOffsets(defaultPeakOffsets(ch)))
      o.boundaries.zip(o.delays).zipWithIndex.map { case ((b, d), i) =>
        PeakOffsetRow(ch, i + 1, b, d)
      }
    })

  /** Network defaults (ref: hyperion.py:848-925): DHCP mode on boot;
    * the static triple is what `#EnableStaticIpMode` switches to.
    */
  val StaticNetworkDefault: CommandCodec.NetworkSettings =
    CommandCodec.NetworkSettings("10.0.0.55", "255.255.255.0", "10.0.0.254")
  val DhcpNetworkDefault: CommandCodec.NetworkSettings =
    CommandCodec.NetworkSettings("10.0.1.77", "255.255.255.0", "10.0.1.1")
  val IpModeDefault = "DHCP"

  /** Deterministic boot clock for `#GetInstrumentUtcDateTime`
    * (hyperion.py:927-942) — a fixed instant, not wall time, so specs
    * and oracles never race the clock.
    */
  val BootUtc: Seq[Int] = Seq(2026, 1, 1, 0, 0, 0)

  /** Channels streaming full spectra by default
    * (ref: hyperion.py:803-821) — all of them, matching
    * [[FrameSource.SpectrumChannels]].
    */
  val ActiveFullSpectrumChannelsDefault: Seq[Int] =
    (1 to FrameSource.SpectrumChannels)

  /** Deterministic current-frame state behind the `#GetPeaks` /
    * `#GetSpectrum` snapshot commands (hyperion.py:1003-1019): the
    * FrameSource recipe at cents=2500 (value 25.00), matching what the
    * stream would emit for that event.
    */
  val SnapshotCentsDefault = 2500L
  val SnapshotSerialDefault = 1L
  val SnapshotTsIntDefault = 1735689600L // 2025-01-01T00:00:00Z
  val SnapshotTsFracDefault = 500000000L

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
