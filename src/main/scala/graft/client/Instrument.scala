package graft.client

import java.nio.charset.StandardCharsets.US_ASCII

import graft.ingest.{CommandCodec, FrameCodec}
import graft.ingest.CommandCodec.{DetectionSetting, NetworkSettings, PeakOffsets, Response, SensorExport}
import graft.model.InstrumentConfig
import graft.ops.Physics

/** Typed synchronous client for the instrument command port — the
  * Scala equivalent of the reference's `Hyperion` class property
  * surface (hyperion.py:652-1330): every property/method a user of the
  * reference client calls has a typed accessor here, speaking the same
  * wire protocol through [[CommandCodec]], so switching from the
  * reference client to this library is a 1:1 rename.
  *
  * Errors follow the reference's `HyperionError` path
  * (hyperion.py:141-146): a non-SUCCESS status raises
  * [[Instrument.CommandError]] carrying the instrument's message.
  *
  * This is control-plane, one instrument per endpoint — data-plane
  * scale lives in the landing gateway + MicroBatchStream; the client
  * exists so the full reference API surface is callable end to end.
  */
class Instrument(transport: CommandTransport) {
  import graft.client.Instrument._

  /** The reference's default lifecycle: a throwaway socket per command
    * (hyperion.py:188-223). Pass a [[PersistentConnection]] instead to
    * get the `AsyncHyperion` lifecycle over the same typed surface.
    */
  def this(host: String, port: Int) =
    this(new PerCommandTransport(host, port))

  private def exec(command: String, argument: String = ""): Response = {
    val r = transport.execute(command, argument)
    if (r.status != CommandCodec.Success) throw new CommandError(r.message)
    r
  }

  /** The version of this client library (hyperion.py:711, 64). */
  def libraryVersion: String = Instrument.LibraryVersion

  // --- identity / readiness (hyperion.py:700-774) ---
  def serialNumber: String = ascii(exec("#GetSerialNumber"))
  def firmwareVersion: String = ascii(exec("#GetFirmwareVersion"))
  def fpgaVersion: String = ascii(exec("#GetFPGAVersion"))
  def instrumentName: String = ascii(exec("#GetInstrumentName"))
  def setInstrumentName(name: String): Unit =
    exec("#SetInstrumentName", name)
  def isReady: Boolean = exec("#isready").content.head > 0
  def channelCount: Int =
    CommandCodec.readU32le(exec("#GetDutChannelCount").content).toInt
  def maxPeakCountPerChannel: Int =
    CommandCodec.readU32le(
      exec("#GetMaximumPeakCountPerDutChannel").content).toInt

  // --- power calibration (hyperion.py:679-697) ---
  /** (offset, scale) per channel; dBm = raw·(1/scale)+offset. Fetched
    * once and cached like the reference client (`self._power_cal`,
    * hyperion.py:686) — calibration constants are fixed per instrument.
    */
  lazy val powerCal: Seq[CommandCodec.PowerCal] =
    CommandCodec.decodePowerCal(exec("#GetPowerCalibrationInfo").content)

  // --- detection settings (hyperion.py:776-801, 1027-1082) ---
  def availableDetectionSettings: Seq[DetectionSetting] =
    CommandCodec.decodeDetectionSettings(
      exec("#GetAvailableDetectionSettings").content)
  def getDetectionSetting(id: Int): DetectionSetting =
    CommandCodec.decodeDetectionSettings(
      exec("#getDetectionSetting", id.toString).content).head
  /** The reference's add-then-update fallback (hyperion.py:1039-1048). */
  def addOrUpdateDetectionSetting(s: DetectionSetting): Unit = {
    val packed = CommandCodec.formatDetectionSetting(s)
    try { exec("#AddDetectionSetting", packed); () }
    catch { case _: CommandError =>
      exec("#UpdateDetectionSetting", packed); ()
    }
  }
  def removeDetectionSetting(id: Int): Unit =
    exec("#removeDetectionSetting", id.toString)
  def channelDetectionSettingIds: Seq[Int] =
    exec("#GetAllChannelDetectionSettingIds").content.map(_ & 0xFF).toSeq
  def getChannelDetectionSetting(channel: Int): DetectionSetting =
    getDetectionSetting(CommandCodec.readU16le(
      exec("#GetChannelDetectionSettingId", channel.toString).content))
  def setChannelDetectionSettingId(channel: Int, id: Int): Unit =
    exec("#SetChannelDetectionSettingID", s"$channel $id")

  // --- full-spectrum channel set (hyperion.py:803-821) ---
  def activeFullSpectrumChannelNumbers: Seq[Int] =
    CommandCodec.readI32ArrayLe(
      exec("#getActiveFullSpectrumDutChannelNumbers").content)
  def setActiveFullSpectrumChannelNumbers(channels: Seq[Int]): Unit =
    exec("#setActiveFullSpectrumDutChannelNumbers",
      channels.mkString(" ") + " ") // trailing space like the reference

  // --- laser scan speed (hyperion.py:824-846) ---
  def availableLaserScanSpeeds: Seq[Int] =
    CommandCodec.readI32ArrayLe(
      exec("#GetAvailableLaserScanSpeeds").content)
  def laserScanSpeed: Int =
    CommandCodec.readU32le(exec("#GetLaserScanSpeed").content).toInt
  def setLaserScanSpeed(hz: Int): Unit =
    exec("#SetLaserScanSpeed", hz.toString)

  // --- network (hyperion.py:848-925) ---
  def activeNetworkSettings: NetworkSettings =
    CommandCodec.decodeNetworkSettings(
      exec("#GetActiveNetworkSettings").content)
  def staticNetworkSettings: NetworkSettings =
    CommandCodec.decodeNetworkSettings(
      exec("#GetStaticNetworkSettings").content)
  def setStaticNetworkSettings(n: NetworkSettings): Unit =
    exec("#SetStaticNetworkSettings",
      s"${n.address} ${n.netmask} ${n.gateway}")
  def networkIpMode: String = ascii(exec("#GetNetworkIpMode"))
  def setNetworkIpMode(mode: String): Unit = mode.toUpperCase match {
    case "STATIC" => exec("#EnableStaticIpMode")
    case "DHCP" | "DYNAMIC" => exec("#EnableDynamicIpMode")
    case other => throw new CommandError(s"unknown network IP mode: $other")
  }

  // --- UTC clock / time sync (hyperion.py:927-1000) ---
  /** (year, month, day, hour, minute, second). */
  def instrumentUtcDateTime: Seq[Int] =
    CommandCodec.decodeUtcDateTime(
      exec("#GetInstrumentUtcDateTime").content)
  def setInstrumentUtcDateTime(parts: Seq[Int]): Unit =
    exec("#SetInstrumentUtcDateTime", parts.mkString(" "))
  def ntpEnabled: Boolean =
    CommandCodec.readU32le(exec("#GetNtpEnabled").content) > 0
  def setNtpEnabled(v: Boolean): Unit =
    exec("#SetNtpEnabled", if (v) "1" else "0")
  def ntpServer: String = ascii(exec("#GetNtpServer"))
  def setNtpServer(addr: String): Unit = exec("#SetNtpServer", addr)
  def ptpEnabled: Boolean =
    CommandCodec.readU32le(exec("#GetPtpEnabled").content) > 0
  def setPtpEnabled(v: Boolean): Unit =
    exec("#SetPtpEnabled", if (v) "1" else "0")

  // --- one-shot snapshot reads (hyperion.py:1003-1019) ---
  /** The current peaks frame, decoded with the stream's parser and
    * split into 1-based channel slices like `HACQPeaksData`.
    */
  def peaks: PeaksSnapshot = Instrument.parsePeaks(exec("#GetPeaks").content)

  /** The current spectra in dBm for the active full-spectrum channels,
    * keyed by 1-based channel — `HACQSpectrumData(content, power_cal)`:
    * raw·(1/scale)+offset per the channel map, wavelength axis from the
    * header (hyperion.py:488-540).
    */
  def spectra: SpectrumSnapshot =
    Instrument.parseSpectrum(exec("#GetSpectrum").content, powerCal)

  /** The current sensor frame — the `#GetSensors` engine extension
    * (the reference serves sensors stream-only on STREAM_SENSORS_PORT,
    * hyperion.py:60; see [[graft.sources.InstrumentResponder]]):
    * status/buffer header plus one measurement value per sensor slot,
    * decoded with the stream's parser.
    */
  def sensors: SensorsSnapshot =
    Instrument.parseSensors(exec("#GetSensors").content)

  // --- peak offsets + conversions (hyperion.py:1085-1223) ---
  def getPeakOffsets(channel: Int): PeakOffsets =
    CommandCodec.decodePeakOffsets(
      exec("#GetPeakOffsets", channel.toString).content)
  def setPeakOffsetsInCounts(channel: Int, o: PeakOffsets): Unit = {
    // '{ch} {n} ' + '{delay} {boundary} '*n (hyperion.py:1095-1099)
    val arg = s"$channel ${o.boundaries.length} " +
      o.delays.zip(o.boundaries).map { case (d, b) => s"$d $b" }
        .mkString(" ")
    exec("#SetPeakOffsets", arg)
  }
  def clearPeakOffsets(channel: Option[Int] = None): Unit = channel match {
    case Some(ch) => exec("#ClearPeakOffsets", ch.toString)
    case None => exec("#ClearAllPeakOffsets")
  }
  def convertCountsToWavelengths(counts: Seq[Double]): Seq[Double] =
    counts.map(c => CommandCodec.readF64le(
      exec("#ConvertCountToWavelength", c.toString).content))
  def convertWavelengthsToCounts(wls: Seq[Double],
                                 offsets: Option[Seq[Long]] = None)
      : Seq[Double] = {
    val offs = offsets.getOrElse(Seq.fill(wls.length)(0L))
    wls.zip(offs).map { case (wl, off) =>
      CommandCodec.readF64le(
        exec("#ConvertWavelengthToCount", s"$wl $off").content)
    }
  }
  /** The reference's client-side composition (hyperion.py:1129-1159):
    * wavelength boundaries → counts over the wire, delays from one-way
    * fiber distances via the delay physics, then a counts-mode set.
    * Returns the resulting offsets as set.
    */
  def setPeakOffsetsInWavelength(channel: Int,
      wavelengthBoundaries: Seq[Double], distancesM: Seq[Double],
      indexOfRefraction: Double = InstrumentConfig.IndexOfRefraction)
      : PeakOffsets = {
    // truncate like the reference's np.asarray(..., dtype=np.int)
    // (hyperion.py:1151) so the boundary bytes sent to #SetPeakOffsets
    // match the reference client exactly
    val counts = convertWavelengthsToCounts(wavelengthBoundaries)
      .map(_.toInt)
    val delays = distancesM.map(d =>
      Physics.delayNsScalar(d, indexOfRefraction))
    val o = PeakOffsets(counts, delays)
    setPeakOffsetsInCounts(channel, o)
    o
  }

  // --- sensors (hyperion.py:1229-1330) ---
  def addSensor(name: String, model: String, channel: Int,
                wavelength: Double, calibrationFactor: Double,
                distance: Double = 0.0): Unit =
    exec("#AddSensor",
      s"$name $model $channel $distance $wavelength $calibrationFactor")
  def sensorNames: Seq[String] = {
    val msg = exec("#GetSensorNames").message
    if (msg.isEmpty) Nil else msg.split(" ").toSeq
  }
  def exportSensors: Seq[SensorExport] =
    CommandCodec.decodeSensorExport(exec("#ExportSensors").content)
  def removeSensor(name: String): Unit = exec("#removeSensor", name)
  def saveSensors(): Unit = exec("#saveSensors")

  // --- reboot (hyperion.py:1021-1025) ---
  def reboot(): Unit = exec("#Reboot")

  private def ascii(r: Response): String = new String(r.content, US_ASCII)
}

object Instrument {
  /** The analogue of the reference's `_LIBRARY_VERSION` constant
    * (hyperion.py:64), served client-side without touching the wire.
    */
  val LibraryVersion: String = "1.0.0"

  /** Non-SUCCESS response status — the reference's `HyperionError`. */
  final class CommandError(message: String)
      extends RuntimeException(message)

  /** Decoded `#GetPeaks` content: `channels(i)` is the 1-based channel
    * slice, like `HACQPeaksData.__getitem__`.
    */
  final case class PeaksSnapshot(serialNumber: Long, timestampInt: Long,
      timestampFrac: Long, channelSlices: Seq[Seq[Double]]) {
    def apply(channel: Int): Seq[Double] = {
      require(channel >= 1 && channel <= channelSlices.length,
        s"invalid channel number: $channel")
      channelSlices(channel - 1)
    }
    def timestamp: Double = timestampFrac * 1e-9 + timestampInt
  }

  /** Decoded + calibrated `#GetSpectrum` content, keyed by 1-based
    * channel; `wavelengths` is the header-derived axis.
    */
  final case class SpectrumSnapshot(serialNumber: Long, timestampInt: Long,
      timestampFrac: Long, startWavelength: Double,
      wavelengthIncrement: Double, numPoints: Int,
      spectra: Map[Int, Seq[Double]]) {
    def apply(channel: Int): Seq[Double] =
      spectra.getOrElse(channel, throw new CommandError(
        "No data for requested channel. Make sure requested channel is " +
          "in the set of full spectrum channel numbers."))
    def wavelengths: Seq[Double] =
      (0 until numPoints).map(startWavelength + _ * wavelengthIncrement)
    def timestamp: Double = timestampFrac * 1e-9 + timestampInt
  }

  /** Decoded `#GetSensors` content: one measurement per sensor slot
    * (the reference's sensor-stream record shape, hyperion.py:388-420).
    */
  final case class SensorsSnapshot(status: Int, bufferPct: Int,
      serialNumber: Long, timestampInt: Long, timestampFrac: Long,
      values: Seq[Double]) {
    def timestamp: Double = timestampFrac * 1e-9 + timestampInt
  }

  // --- frame-content parsers, shared by the snapshot facade and the
  // --- streaming client (the reference's HACQ*Data.data_parser
  // --- callables, hyperion.py:388-549, are exactly this split: one
  // --- parse function consumed by both `Hyperion.peaks` and the
  // --- `HCommTCPStreamer` subclasses)

  /** `HACQPeaksData` parse (hyperion.py:422-470): frame content →
    * typed peaks, 1-based channel slices from the counts cumsum.
    * Undecodable content raises [[CommandError]].
    */
  def parsePeaks(content: Array[Byte]): PeaksSnapshot = {
    val row = FrameCodec.decodePeaksBytes(content)
    if (row == null) throw new CommandError("malformed peaks frame content")
    val counts = row.getArray(5).toIntArray()
    val data = row.getArray(6).toDoubleArray()
    // a zero-port frame (header only) is a valid empty snapshot
    val bounds = counts.scanLeft(0)(_ + _)
    val slices = bounds.zip(bounds.drop(1)).map {
      case (a, b) => data.slice(a, b).toSeq
    }.toSeq
    PeaksSnapshot(row.getLong(2), row.getLong(3), row.getLong(4), slices)
  }

  /** `HACQSpectrumData` parse bound to a power calibration
    * (hyperion.py:473-549, the `powercal` parameter): channels from the
    * frame's bitmap, dBm = raw·(1/scale)+offset per mapped channel.
    */
  def parseSpectrum(content: Array[Byte],
      cal: Seq[CommandCodec.PowerCal]): SpectrumSnapshot = {
    val row = FrameCodec.decodeSpectrumBytes(content)
    if (row == null)
      throw new CommandError("malformed spectrum frame content")
    val bits = row.getInt(9)
    val chans = (0 until 16).filter(i => ((bits >> i) & 1) == 1)
    // a frame may legally carry any bit pattern whose popcount matches
    // its channel count, but calibration only exists for the
    // instrument's physical channels — fail cleanly, not with an
    // IndexOutOfBoundsException deep in the map below
    chans.find(_ >= cal.length).foreach { ch =>
      throw new CommandError(
        s"spectrum frame reports channel ${ch + 1} but power " +
          s"calibration covers only ${cal.length} channels")
    }
    val m = row.getArray(10)
    val spectraByChannel = chans.zipWithIndex.map { case (ch, i) =>
      (ch + 1) -> m.getArray(i).toIntArray()
        .map(raw => raw * (1.0 / cal(ch).scale) + cal(ch).offset).toSeq
    }.toMap
    SpectrumSnapshot(row.getLong(2), row.getLong(3), row.getLong(4),
      row.getDouble(5), row.getDouble(6), row.getInt(7), spectraByChannel)
  }

  /** `HACQSensorData` parse (hyperion.py:388-420). */
  def parseSensors(content: Array[Byte]): SensorsSnapshot = {
    val row = FrameCodec.decodeSensorBytes(content)
    if (row == null)
      throw new CommandError("malformed sensor frame content")
    SensorsSnapshot(row.getInt(1), row.getInt(2), row.getLong(3),
      row.getLong(4), row.getLong(5),
      row.getArray(6).toDoubleArray().toSeq)
  }
}
