package graft.sources

import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.US_ASCII

import graft.ingest.CommandCodec
import graft.ingest.CommandCodec.{Request, Response}
import graft.model.InstrumentConfig

/** S14 FULL — the live instrument command round-trip: a TCP responder
  * speaking the reference's command-port protocol (ref:
  * hyperion.py:188-223 `hyperion_command` client flow on COMMAND_PORT,
  * request/response wire shapes in [[CommandCodec]]), answering from
  * the same [[InstrumentConfig]] the query surface joins against — so
  * the live control plane and the queryable config can never disagree.
  *
  * Commands mirror the reference's property implementations
  * (hyperion.py:699-780): `#GetSerialNumber`, `#GetInstrumentName`,
  * `#GetFirmwareVersion`, `#GetFPGAVersion` (ascii content),
  * `#isready` (1 byte), `#GetDutChannelCount`,
  * `#GetMaximumPeakCountPerDutChannel` (u32 LE),
  * `#GetPowerCalibrationInfo` (interleaved int32 offset/scale pairs,
  * hyperion.py:679-697), plus the detection-settings surface
  * (hyperion.py:777-801, 1027-1086): `#GetAvailableDetectionSettings` /
  * `#getDetectionSetting` (binary records), `#AddDetectionSetting` /
  * `#UpdateDetectionSetting` (pack-string argument; add fails on an
  * existing id so the reference client's add-then-update fallback
  * exercises both paths), `#removeDetectionSetting` (refused for ids
  * outside 0-127 or in use on a channel, hyperion.py:1051-1058),
  * `#GetAllChannelDetectionSettingIds` (one byte per channel),
  * `#GetChannelDetectionSettingId` (u16 LE) and
  * `#SetChannelDetectionSettingID`. Unknown commands
  * answer status≠SUCCESS with the error text in `message`, matching
  * the reference's error path (hyperion.py:141-146).
  *
  * COMPLETE command surface as of round 8 — additionally: the one-shot
  * snapshot reads `#GetPeaks` / `#GetSpectrum` (hyperion.py:1003-1019,
  * served through the same [[graft.ingest.FrameCodec]] encoders the
  * stream uses, spectrum restricted to the active full-spectrum set),
  * laser scan speed (`#Get/SetLaserScanSpeed`,
  * `#GetAvailableLaserScanSpeeds`, hyperion.py:824-846), per-channel
  * peak offsets + count↔wavelength conversion
  * (`#Get/Set/ClearPeakOffsets`, `#ClearAllPeakOffsets`,
  * `#ConvertCountToWavelength`, `#ConvertWavelengthToCount`,
  * hyperion.py:1085-1223), the full-spectrum channel set
  * (`#get/setActiveFullSpectrumDutChannelNumbers`, hyperion.py:803-821),
  * network settings (`#Get{Active,Static}NetworkSettings`,
  * `#SetStaticNetworkSettings`, `#GetNetworkIpMode`,
  * `#Enable{Static,Dynamic}IpMode`, hyperion.py:848-925), the UTC clock
  * (`#Get/SetInstrumentUtcDateTime`, hyperion.py:927-942),
  * `#SetInstrumentName` (hyperion.py:745-748) and `#Reboot`
  * (hyperion.py:1021-1025, reverting unsaved sensor edits to the last
  * `#saveSensors` snapshot).
  *
  * Detection presets and channel assignments are MUTABLE instrument
  * state, seeded from [[InstrumentConfig]]'s static defaults; mutations
  * serialize on the responder (control-plane rates, one per device).
  *
  * This is a single-instrument control-plane endpoint (one per
  * device), not a data-plane component — the engine-scale story stays
  * with the landing gateway + MicroBatchStream; the responder exists
  * so the full client→socket→instrument→response loop is modeled and
  * spec-driven end to end.
  */
class InstrumentResponder(streamIntervalMs: Long = 1L) {
  import graft.ingest.CommandCodec.DetectionSetting

  private val server = new ServerSocket(0)
  @volatile private var running = true
  private var acceptThread: Thread = _

  // --- streaming ports (ref: hyperion.py:57-60 STREAM_PEAKS_PORT /
  // STREAM_SPECTRA_PORT / STREAM_SENSORS_PORT): one server socket per
  // kind. The reference instrument starts pushing framed records the
  // moment a client connects; each accepted connection here gets its
  // own producer thread doing the same, paced by `streamIntervalMs`,
  // which is what the [[graft.client.InstrumentStreamer]] family
  // consumes. Streamed frames also update the snapshot mirror, so the
  // command port's #GetPeaks/#GetSpectrum/#GetSensors always answer
  // with the last streamed frame — the reference's coherence.
  private val peaksStreamServer = new ServerSocket(0)
  private val sensorsStreamServer = new ServerSocket(0)
  private val spectraStreamServer = new ServerSocket(0)
  private var streamAcceptThreads: List[Thread] = Nil
  def streamPeaksPort: Int = peaksStreamServer.getLocalPort
  def streamSensorsPort: Int = sensorsStreamServer.getLocalPort
  def streamSpectraPort: Int = spectraStreamServer.getLocalPort

  // mutable control state, seeded from the static defaults so the live
  // surface and the queryable config start in agreement
  private val settings =
    scala.collection.mutable.LinkedHashMap[Int, DetectionSetting](
      InstrumentConfig.Presets.map(p => p.setting_id ->
        DetectionSetting(p.setting_id, p.name, p.description,
          p.boxcar_length, p.diff_filter_length, p.lockout, p.ntv_period,
          p.threshold, p.mode)): _*)
  private val channelIds =
    Array.tabulate(InstrumentConfig.ChannelCount)(
      _ % InstrumentConfig.Presets.size)
  // time sync (ref: hyperion.py:947-1000): NTP and PTP are mutually
  // exclusive — enabling one disables the other
  private var ntpEnabled = InstrumentConfig.NtpEnabledDefault
  private var ntpServer = InstrumentConfig.NtpServerDefault
  private var ptpEnabled = InstrumentConfig.PtpEnabledDefault
  // sensors (ref: hyperion.py:1229-1330), keyed by name; saveSensors
  // commits the running set as the persistent snapshot — #Reboot
  // restores it (the one piece of state the reference documents as
  // needing an explicit save)
  private val sensors =
    scala.collection.mutable.LinkedHashMap[String, CommandCodec.SensorExport](
      InstrumentConfig.DefaultSensors.map(s => s.name -> s): _*)
  private var savedSensors: Seq[CommandCodec.SensorExport] =
    InstrumentConfig.DefaultSensors
  @volatile private var sensorsSaved = true
  // instrument identity / clock / network (ref: hyperion.py:737-942)
  private var instrumentName = InstrumentConfig.InstrumentName
  private var utcDateTime: Seq[Int] = InstrumentConfig.BootUtc
  private var staticNet = InstrumentConfig.StaticNetworkDefault
  private var ipMode = InstrumentConfig.IpModeDefault
  @volatile private var rebootCount = 0
  // laser scan (ref: hyperion.py:824-846): only speeds from the
  // available set are accepted
  private var scanSpeed = InstrumentConfig.LaserScanSpeedDefault
  // per-channel time-of-flight compensation (ref: hyperion.py:1085-1126)
  private val peakOffsets =
    scala.collection.mutable.LinkedHashMap[Int, CommandCodec.PeakOffsets](
      (1 to InstrumentConfig.ChannelCount)
        .map(ch => ch -> InstrumentConfig.defaultPeakOffsets(ch)): _*)
  // full-spectrum acquisition set (ref: hyperion.py:803-821), 1-based
  private var activeSpectrumChannels: Seq[Int] =
    InstrumentConfig.ActiveFullSpectrumChannelsDefault
  // current-frame state behind #GetPeaks/#GetSpectrum
  // (hyperion.py:1003-1019): the FrameSource recipe over (cents,
  // serial, ts) — the same frame the stream would emit for that event
  private var snapCents = InstrumentConfig.SnapshotCentsDefault
  private var snapSerial = InstrumentConfig.SnapshotSerialDefault
  private var snapTsInt = InstrumentConfig.SnapshotTsIntDefault
  private var snapTsFrac = InstrumentConfig.SnapshotTsFracDefault

  // raw mirrored frames take precedence over the synthetic recipe —
  // an arbitrary streamed frame need not follow the FrameSource shape
  @volatile private var mirroredPeaks: Option[Array[Byte]] = None
  @volatile private var mirroredSpectrum: Option[Array[Byte]] = None
  @volatile private var mirroredSensor: Option[Array[Byte]] = None

  /** Point the snapshot surface at a specific "current" frame by its
    * recipe parameters (synthetic form, used by specs/defaults).
    */
  def setCurrentFrame(cents: Long, serial: Long, tsInt: Long,
                      tsFrac: Long): Unit = settings.synchronized {
    snapCents = cents; snapSerial = serial
    snapTsInt = tsInt; snapTsFrac = tsFrac
    mirroredPeaks = None
    mirroredSpectrum = None
    mirroredSensor = None
  }

  /** Live mirror: serve these RAW peaks-frame bytes as the current
    * `#GetPeaks` snapshot — what a [[SocketLandingGateway]] `onContent`
    * hook calls per streamed frame, so the command port answers with
    * whatever the stream last produced (the reference instrument's
    * behavior). Bytes are refused (returns false) unless they decode
    * AND satisfy the peaks-frame invariant sum(peak_counts) == |peaks|
    * (the reference's channel_boundaries cumsum ends at the data
    * length) — spectrum/sensor frames happen to pass the structural
    * decode checks, and a mis-wired stream must not corrupt the
    * snapshot surface.
    */
  def setCurrentPeaksFrame(bytes: Array[Byte]): Boolean = {
    val row = graft.ingest.FrameCodec.decodePeaksBytes(bytes)
    if (row == null ||
        row.getArray(5).toIntArray().map(_.toLong).sum
          != row.getArray(6).numElements().toLong) false
    else { mirroredPeaks = Some(bytes.clone()); true }
  }

  /** Spectrum counterpart of [[setCurrentPeaksFrame]]: the mirrored
    * frame carries its own channel bitmap/count, which must agree
    * (bitcount(active_bits) == num_channels) for acceptance.
    */
  def setCurrentSpectrumFrame(bytes: Array[Byte]): Boolean = {
    val row = graft.ingest.FrameCodec.decodeSpectrumBytes(bytes)
    if (row == null ||
        java.lang.Integer.bitCount(row.getInt(9)) != row.getInt(8)) false
    else { mirroredSpectrum = Some(bytes.clone()); true }
  }

  /** Sensor counterpart of [[setCurrentPeaksFrame]], closing the
    * live-mirror surface for the third streamer port (the reference
    * streams sensors on STREAM_SENSORS_PORT, hyperion.py:60). The
    * stream's sensor header is a fixed 24 bytes
    * ([[graft.ingest.FrameCodec.encodeSensorBytes]]), so any other
    * header length is a mis-wired stream and is refused.
    */
  def setCurrentSensorFrame(bytes: Array[Byte]): Boolean = {
    val row = graft.ingest.FrameCodec.decodeSensorBytes(bytes)
    if (row == null || row.getInt(0) != 24) false
    else { mirroredSensor = Some(bytes.clone()); true }
  }

  /** How many #Reboot commands have been accepted. */
  def rebootsSeen: Int = rebootCount

  private val connectionCount = new java.util.concurrent.atomic.AtomicInteger
  /** How many TCP connections the command port has accepted — lets
    * specs prove a persistent client really reuses ONE connection.
    */
  def connectionsSeen: Int = connectionCount.get

  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import graft.ingest.{FrameCodec, FrameSource}

  /** The current peaks frame, encoded with the SAME FrameCodec byte
    * path the stream uses: counts = 1 per port, peaks[i] = cents+i·100
    * (the FrameSource recipe).
    */
  private def snapshotPeaksBytes(): Array[Byte] =
    mirroredPeaks.getOrElse(synthPeaksBytes(0L))

  /** The current spectrum frame for the ACTIVE full-spectrum channels
    * only: num_channels rows in channel order, active_channel_bits has
    * bit (ch-1) set per active channel (the reference's channel_map
    * decode, hyperion.py:495-501), matrix rows follow the FrameSource
    * synth recipe for the absolute channel index.
    */
  private def snapshotSpectrumBytes(): Array[Byte] =
    mirroredSpectrum.getOrElse(synthSpectrumBytes())

  /** The current sensor frame, encoded with the stream's FrameCodec
    * byte path: values[k] = cents + k·1000 (the FrameSource sensor
    * recipe, one value per defined sensor slot).
    */
  private def snapshotSensorBytes(): Array[Byte] =
    mirroredSensor.getOrElse(synthSensorBytes(0L))

  private def synthSpectrumBytes(): Array[Byte] = synthSpectrumBytes(0L)

  /** The spectrum synth recipe at `offset` frames past the current
    * snapshot state — offset 0 is the snapshot itself; the stream
    * producer advances serial/ts/cents by the frame ordinal.
    */
  private def synthSpectrumBytes(offset: Long): Array[Byte] = {
    // channel_map order (ascending bit index), whatever order the set
    // arrived in — HACQSpectrumData derives channels from the BITMAP
    val chans = activeSpectrumChannels.distinct.sorted
    val bits = chans.map(ch => 1 << (ch - 1)).sum
    FrameCodec.encodeSpectrumBytes(snapSerial + offset, snapTsInt + offset,
      snapTsFrac, 1500.0, 0.8, bits,
      new GenericArrayData(chans.map(ch =>
        new GenericArrayData(Array.tabulate(FrameSource.SpectrumPoints)(p =>
          ((snapCents + offset + (ch - 1) * 1000L + p * 7L) % 65536L).toInt))
          : Any).toArray))
  }

  /** Peaks/sensor synth recipes at `offset` frames past the snapshot
    * state (the FrameSource shapes, values advancing with the ordinal
    * so successive streamed frames are distinct).
    */
  private def synthPeaksBytes(offset: Long): Array[Byte] =
    FrameCodec.encodePeaksBytes(snapSerial + offset, snapTsInt + offset,
      snapTsFrac,
      new GenericArrayData(Array.fill(FrameSource.NumPorts)(1)),
      new GenericArrayData(Array.tabulate(FrameSource.NumPeaks)(i =>
        (snapCents + offset).toDouble + i * 100.0)))

  private def synthSensorBytes(offset: Long): Array[Byte] =
    FrameCodec.encodeSensorBytes(0, 0, snapSerial + offset,
      snapTsInt + offset, snapTsFrac,
      new GenericArrayData(Array.tabulate(FrameSource.NumSensors)(k =>
        (snapCents + offset).toDouble + k * 1000.0)))

  /** One streaming connection: push framed records (the 8-byte BBHI
    * read header with message_length 0, then the frame content — the
    * exact record shape `HCommTCPStreamer.get_data` consumes,
    * hyperion.py:266-282) until the responder stops or the client
    * disconnects. Every pushed frame updates the snapshot mirror
    * first, so the command port serves the last streamed frame.
    */
  private def serveStream(sock: Socket, kind: Int): Unit = {
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    var i = 0L
    try {
      while (running && !sock.isClosed) {
        val content = settings.synchronized {
          kind match {
            case 0 => val b = synthPeaksBytes(i); mirroredPeaks = Some(b); b
            case 1 => val b = synthSensorBytes(i); mirroredSensor = Some(b); b
            case _ =>
              val b = synthSpectrumBytes(i); mirroredSpectrum = Some(b); b
          }
        }
        out.write(CommandCodec.streamRecordHeader(content.length))
        out.write(content)
        out.flush()
        i += 1
        if (streamIntervalMs > 0) Thread.sleep(streamIntervalMs)
      }
    } catch {
      case _: java.io.IOException => () // client hung up
      case _: InterruptedException => ()
    } finally {
      try sock.close() catch { case _: java.io.IOException => () }
    }
  }

  def port: Int = server.getLocalPort

  def start(): InstrumentResponder = {
    acceptThread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          connectionCount.incrementAndGet()
          val t = new Thread(() => handle(sock), "graft-instrument-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: SocketException => () }
      }
    }, "graft-instrument-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()
    streamAcceptThreads =
      List((peaksStreamServer, 0, "peaks"), (sensorsStreamServer, 1, "sensors"),
        (spectraStreamServer, 2, "spectra")).map { case (srv, kind, name) =>
        val t = new Thread(() => {
          while (running) {
            try {
              val sock = srv.accept()
              val c = new Thread(() => serveStream(sock, kind),
                s"graft-instrument-stream-$name-conn")
              c.setDaemon(true)
              c.start()
            } catch { case _: SocketException => () }
          }
        }, s"graft-instrument-stream-$name-accept")
        t.setDaemon(true)
        t.start()
        t
      }
    this
  }

  def stop(): Unit = {
    running = false
    server.close()
    peaksStreamServer.close()
    sensorsStreamServer.close()
    spectraStreamServer.close()
    acceptThread.join(2000)
    streamAcceptThreads.foreach(_.join(2000))
  }

  private def dispatch(r: Request): Response = r.command match {
    case "#GetSerialNumber" =>
      ok(InstrumentConfig.Serial.getBytes(US_ASCII))
    case "#GetInstrumentName" => settings.synchronized {
      ok(instrumentName.getBytes(US_ASCII))
    }
    case "#SetInstrumentName" => settings.synchronized {
      val v = r.argument.trim
      if (v.isEmpty) err("empty instrument name")
      else { instrumentName = v; ok(Array.emptyByteArray) }
    }
    case "#GetFirmwareVersion" =>
      ok(InstrumentConfig.FirmwareVersion.getBytes(US_ASCII))
    case "#GetFPGAVersion" =>
      ok(InstrumentConfig.FpgaVersion.getBytes(US_ASCII))
    case "#isready" => ok(Array[Byte](1))
    case "#GetDutChannelCount" =>
      ok(CommandCodec.u32le(InstrumentConfig.ChannelCount))
    case "#GetMaximumPeakCountPerDutChannel" =>
      ok(CommandCodec.u32le(InstrumentConfig.MaxPeaksPerChannel))
    case "#GetPowerCalibrationInfo" =>
      ok(InstrumentConfig.powerCalContent)
    case "#GetAvailableDetectionSettings" => settings.synchronized {
      ok(CommandCodec.encodeDetectionSettings(settings.values.toSeq))
    }
    case "#getDetectionSetting" => settings.synchronized {
      intArg(r.argument).flatMap(settings.get) match {
        case Some(s) => ok(CommandCodec.encodeDetectionSettings(Seq(s)))
        case None => err(s"no detection setting: ${r.argument}")
      }
    }
    // id range 0-127 enforced at add/update (matching the remove
    // path's documented range, hyperion.py:1053): the binary dump
    // writes the id as ONE byte, so an id like 300 would silently
    // round-trip as 44 and corrupt the settings decode
    case "#AddDetectionSetting" => settings.synchronized {
      CommandCodec.parseDetectionSetting(r.argument) match {
        case None => err(s"malformed detection setting: ${r.argument}")
        case Some(s) if s.settingId < 0 || s.settingId > 127 =>
          err(s"setting id out of range 0-127: ${s.settingId}")
        case Some(s) if settings.contains(s.settingId) =>
          err(s"detection setting ${s.settingId} already exists")
        case Some(s) => settings(s.settingId) = s; ok(Array.emptyByteArray)
      }
    }
    case "#UpdateDetectionSetting" => settings.synchronized {
      CommandCodec.parseDetectionSetting(r.argument) match {
        case None => err(s"malformed detection setting: ${r.argument}")
        case Some(s) if s.settingId < 0 || s.settingId > 127 =>
          err(s"setting id out of range 0-127: ${s.settingId}")
        case Some(s) if !settings.contains(s.settingId) =>
          err(s"no detection setting: ${s.settingId}")
        case Some(s) => settings(s.settingId) = s; ok(Array.emptyByteArray)
      }
    }
    case "#removeDetectionSetting" => settings.synchronized {
      intArg(r.argument) match {
        case None => err(s"malformed setting id: ${r.argument}")
        case Some(id) if id < 0 || id > 127 =>
          err(s"setting id out of range 0-127: $id")
        case Some(id) if !settings.contains(id) =>
          err(s"no detection setting: $id")
        case Some(id) if channelIds.contains(id) =>
          err(s"detection setting $id is in use on a channel")
        case Some(id) => settings.remove(id); ok(Array.emptyByteArray)
      }
    }
    case "#GetAllChannelDetectionSettingIds" => settings.synchronized {
      ok(channelIds.map(_.toByte))
    }
    case "#GetChannelDetectionSettingId" => settings.synchronized {
      intArg(r.argument).filter(c => c >= 1 && c <= channelIds.length) match {
        case Some(c) => ok(CommandCodec.u16le(channelIds(c - 1)))
        case None => err(s"bad channel: ${r.argument}")
      }
    }
    case "#SetChannelDetectionSettingID" => settings.synchronized {
      r.argument.trim.split("\\s+") match {
        case Array(chS, idS) =>
          (intArg(chS), intArg(idS)) match {
            case (Some(c), Some(id))
                if c >= 1 && c <= channelIds.length =>
              if (!settings.contains(id)) err(s"no detection setting: $id")
              else { channelIds(c - 1) = id; ok(Array.emptyByteArray) }
            case _ => err(s"bad channel/setting: ${r.argument}")
          }
        case _ => err(s"expected 'channel settingId': ${r.argument}")
      }
    }
    // --- time sync (ref: hyperion.py:947-1000): u32 booleans, ascii
    // server address; NTP and PTP never report enabled together ---
    case "#GetNtpEnabled" => settings.synchronized {
      ok(CommandCodec.u32le(if (ntpEnabled) 1 else 0))
    }
    case "#SetNtpEnabled" => settings.synchronized {
      boolArg(r.argument) match {
        case Some(v) =>
          ntpEnabled = v; if (v) ptpEnabled = false; ok(Array.emptyByteArray)
        case None => err(s"expected 0/1: ${r.argument}")
      }
    }
    case "#GetNtpServer" => settings.synchronized {
      ok(ntpServer.getBytes(US_ASCII))
    }
    case "#SetNtpServer" => settings.synchronized {
      val v = r.argument.trim
      if (v.isEmpty) err("empty NTP server address")
      else { ntpServer = v; ok(Array.emptyByteArray) }
    }
    case "#GetPtpEnabled" => settings.synchronized {
      ok(CommandCodec.u32le(if (ptpEnabled) 1 else 0))
    }
    case "#SetPtpEnabled" => settings.synchronized {
      boolArg(r.argument) match {
        case Some(v) =>
          ptpEnabled = v; if (v) ntpEnabled = false; ok(Array.emptyByteArray)
        case None => err(s"expected 0/1: ${r.argument}")
      }
    }
    // --- sensor management (ref: hyperion.py:1229-1330) ---
    // #AddSensor argument: "name model channel distance wavelength
    // calibration_factor" (hyperion.py:1229-1243)
    case "#AddSensor" => settings.synchronized {
      r.argument.trim.split("\\s+") match {
        case Array(name, model, chS, distS, wlS, calS) =>
          (intArg(chS), dblArg(distS), dblArg(wlS), dblArg(calS)) match {
            case (Some(ch), Some(dist), Some(wl), Some(cal))
                if ch >= 1 && ch <= InstrumentConfig.ChannelCount =>
              if (sensors.contains(name)) err(s"sensor exists: $name")
              else if (model != "os7510" && model != "os7520")
                err(s"unknown sensor model: $model")
              else {
                sensors(name) = CommandCodec.SensorExport(
                  InstrumentConfig.SensorExportHeaderVersion,
                  InstrumentConfig.sensorId(name), name, model, ch, dist,
                  wl, cal, rcGain = 1.0, rcThresholdHigh = 3000.0,
                  rcThresholdLow = 1000.0)
                sensorsSaved = false
                ok(Array.emptyByteArray)
              }
            case _ => err(s"bad sensor argument: ${r.argument}")
          }
        case _ =>
          err("expected 'name model channel distance wavelength cal'")
      }
    }
    // names travel in the MESSAGE field, space-separated — the one
    // command whose payload is the message (hyperion.py:1245-1255)
    case "#GetSensorNames" => settings.synchronized {
      Response(CommandCodec.Success, 0, sensors.keys.mkString(" "),
        Array.emptyByteArray)
    }
    case "#ExportSensors" => settings.synchronized {
      ok(CommandCodec.encodeSensorExport(
        InstrumentConfig.SensorExportHeaderVersion, sensors.values.toSeq))
    }
    case "#removeSensor" => settings.synchronized {
      val name = r.argument.trim
      if (sensors.remove(name).isDefined) {
        sensorsSaved = false; ok(Array.emptyByteArray)
      } else err(s"no sensor: $name")
    }
    case "#saveSensors" => settings.synchronized {
      savedSensors = sensors.values.toSeq
      sensorsSaved = true; ok(Array.emptyByteArray)
    }
    // --- snapshot reads (ref: hyperion.py:1003-1019): the current
    // frame over the command port, byte-identical to what the stream
    // would emit — #GetSpectrum serves RAW uint16 counts; the client
    // applies power cal after decode, exactly like HACQSpectrumData ---
    case "#GetPeaks" => settings.synchronized {
      ok(snapshotPeaksBytes())
    }
    case "#GetSpectrum" => settings.synchronized {
      ok(snapshotSpectrumBytes())
    }
    // #GetSensors is an ENGINE-SIDE extension, not a reference command:
    // the reference snapshots only peaks/spectrum over the command port
    // (hyperion.py:1003-1019) and serves sensors stream-only
    // (STREAM_SENSORS_PORT, hyperion.py:60). It exists so the third
    // streamer port has the same live-mirror coherence surface as the
    // other two — the snapshot is the last streamed sensor frame,
    // byte-identical.
    case "#GetSensors" => settings.synchronized {
      ok(snapshotSensorBytes())
    }
    // --- laser scan speed (ref: hyperion.py:824-846): u32 Hz; only
    // values from the advertised set are accepted ---
    case "#GetLaserScanSpeed" => settings.synchronized {
      ok(CommandCodec.u32le(scanSpeed))
    }
    case "#GetAvailableLaserScanSpeeds" => settings.synchronized {
      ok(CommandCodec.i32ArrayLe(InstrumentConfig.AvailableLaserScanSpeeds))
    }
    case "#SetLaserScanSpeed" => settings.synchronized {
      intArg(r.argument) match {
        case Some(v) if InstrumentConfig.AvailableLaserScanSpeeds.contains(v) =>
          scanSpeed = v; ok(Array.emptyByteArray)
        case Some(v) => err(s"scan speed not available: $v " +
          s"(available: ${InstrumentConfig.AvailableLaserScanSpeeds.mkString(" ")})")
        case None => err(s"malformed scan speed: ${r.argument}")
      }
    }
    // --- peak offsets (ref: hyperion.py:1085-1126): per-channel
    // time-of-flight compensation regions ---
    case "#GetPeakOffsets" => settings.synchronized {
      intArg(r.argument).flatMap(peakOffsets.get) match {
        case Some(o) => ok(CommandCodec.encodePeakOffsets(o))
        case None => err(s"bad channel: ${r.argument}")
      }
    }
    case "#SetPeakOffsets" => settings.synchronized {
      // '{ch} {n} ' + '{delay} {boundary} ' * n (hyperion.py:1095-1099);
      // delays parse as LONG — the wire carries a full u32 (unpack('I')),
      // so values in [2^31, 2^32) are legal
      val toks = r.argument.trim.split("\\s+").toSeq
      val parsed = toks.headOption.flatMap(intArg).flatMap { ch =>
        toks.lift(1).flatMap(intArg).flatMap { n =>
          val pairs = toks.drop(2).flatMap(longArg)
          if (n < 0 || pairs.length != toks.length - 2 ||
              pairs.length != 2 * n) None
          else Some((ch, pairs.grouped(2).map(p => (p(0), p(1))).toSeq))
        }
      }
      parsed match {
        case None => err(s"expected 'ch n (delay boundary)*n': ${r.argument}")
        case Some((ch, _)) if !peakOffsets.contains(ch) =>
          err(s"bad channel: $ch")
        case Some((_, ps)) if ps.exists { case (d, b) =>
            d < 0 || d > 0xFFFFFFFFL || b < 0 || b > 0xFFFF } =>
          err("delay must be u32, boundary u16")
        case Some((ch, ps)) =>
          peakOffsets(ch) = CommandCodec.PeakOffsets(
            ps.map(_._2.toInt), ps.map(_._1))
          ok(Array.emptyByteArray)
      }
    }
    case "#ClearPeakOffsets" => settings.synchronized {
      intArg(r.argument) match {
        case Some(ch) if peakOffsets.contains(ch) =>
          peakOffsets(ch) = CommandCodec.PeakOffsets(Nil, Nil)
          ok(Array.emptyByteArray)
        case _ => err(s"bad channel: ${r.argument}")
      }
    }
    case "#ClearAllPeakOffsets" => settings.synchronized {
      peakOffsets.keys.toSeq.foreach(ch =>
        peakOffsets(ch) = CommandCodec.PeakOffsets(Nil, Nil))
      ok(Array.emptyByteArray)
    }
    // --- count↔wavelength conversions (ref: hyperion.py:1175-1223):
    // f64 content both ways; the wavelength→count argument carries the
    // offset delay in ns as its second token ---
    case "#ConvertCountToWavelength" => settings.synchronized {
      dblArg(r.argument) match {
        case Some(c) =>
          ok(CommandCodec.f64le(InstrumentConfig.countToWavelength(c)))
        case None => err(s"malformed count: ${r.argument}")
      }
    }
    case "#ConvertWavelengthToCount" => settings.synchronized {
      r.argument.trim.split("\\s+") match {
        case Array(wlS, offS) =>
          (dblArg(wlS), dblArg(offS)) match {
            case (Some(wl), Some(off)) =>
              ok(CommandCodec.f64le(
                InstrumentConfig.wavelengthToCount(wl, off)))
            case _ => err(s"malformed 'wavelength offset': ${r.argument}")
          }
        case _ => err(s"expected 'wavelength offset': ${r.argument}")
      }
    }
    // --- full-spectrum channel set (ref: hyperion.py:803-821): i32
    // array content; the setter takes space-separated 1-based channels ---
    case "#getActiveFullSpectrumDutChannelNumbers" => settings.synchronized {
      ok(CommandCodec.i32ArrayLe(activeSpectrumChannels))
    }
    case "#setActiveFullSpectrumDutChannelNumbers" => settings.synchronized {
      // an EMPTY argument clears the set (the reference setter with []
      // sends an empty channel string, hyperion.py:814-821); the given
      // order is preserved for the get round-trip — the snapshot's
      // channel_map is bitmap-derived (ascending) regardless
      val toks = r.argument.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val chans = toks.map(intArg)
      if (chans.exists(_.isEmpty))
        err(s"malformed channel list: ${r.argument}")
      else {
        val cs = chans.flatten
        if (cs.exists(c => c < 1 || c > FrameSource.SpectrumChannels))
          err(s"channel out of range 1-${FrameSource.SpectrumChannels}")
        else { activeSpectrumChannels = cs; ok(Array.emptyByteArray) }
      }
    }
    // --- network settings (ref: hyperion.py:848-925) ---
    case "#GetActiveNetworkSettings" => settings.synchronized {
      ok(CommandCodec.encodeNetworkSettings(
        if (ipMode == "STATIC") staticNet
        else InstrumentConfig.DhcpNetworkDefault))
    }
    case "#GetStaticNetworkSettings" => settings.synchronized {
      ok(CommandCodec.encodeNetworkSettings(staticNet))
    }
    case "#SetStaticNetworkSettings" => settings.synchronized {
      r.argument.trim.split("\\s+") match {
        case Array(a, m, g)
            if Seq(a, m, g).forall(CommandCodec.ipv4Bytes(_).isDefined) =>
          staticNet = CommandCodec.NetworkSettings(a, m, g)
          ok(Array.emptyByteArray)
        case _ => err(s"expected 'address netmask gateway': ${r.argument}")
      }
    }
    case "#GetNetworkIpMode" => settings.synchronized {
      ok(ipMode.getBytes(US_ASCII))
    }
    case "#EnableStaticIpMode" => settings.synchronized {
      ipMode = "STATIC"; ok(Array.emptyByteArray)
    }
    case "#EnableDynamicIpMode" => settings.synchronized {
      ipMode = "DHCP"; ok(Array.emptyByteArray)
    }
    // --- UTC clock (ref: hyperion.py:927-942): six u16s; the setter
    // argument is '%Y %m %d %H %M %S' ---
    case "#GetInstrumentUtcDateTime" => settings.synchronized {
      ok(CommandCodec.encodeUtcDateTime(utcDateTime))
    }
    case "#SetInstrumentUtcDateTime" => settings.synchronized {
      val parts = r.argument.trim.split("\\s+").toSeq.map(intArg)
      if (parts.length != 6 || parts.exists(_.isEmpty))
        err(s"expected 'Y m d H M S': ${r.argument}")
      else {
        val Seq(y, mo, d, h, mi, sec) = parts.flatten
        if (y < 1970 || y > 9999 || mo < 1 || mo > 12 || d < 1 || d > 31 ||
          h > 23 || h < 0 || mi < 0 || mi > 59 || sec < 0 || sec > 59)
          err(s"datetime field out of range: ${r.argument}")
        else { utcDateTime = Seq(y, mo, d, h, mi, sec)
          ok(Array.emptyByteArray) }
      }
    }
    // --- reboot (ref: hyperion.py:1021-1025): acknowledged, then the
    // instrument restarts — modeled as reverting the UNSAVED sensor set
    // to the last #saveSensors snapshot (flash persists everything else)
    case "#Reboot" => settings.synchronized {
      sensors.clear()
      savedSensors.foreach(s => sensors(s.name) = s)
      sensorsSaved = true
      rebootCount += 1
      ok(Array.emptyByteArray)
    }
    case other =>
      err(s"unknown command: $other")
  }

  /** Whether the current sensor set has been committed via #saveSensors. */
  def sensorsPersisted: Boolean = sensorsSaved

  private def boolArg(s: String): Option[Boolean] = s.trim match {
    case "1" => Some(true)
    case "0" => Some(false)
    case _ => None
  }

  private def dblArg(s: String): Option[Double] =
    try Some(s.trim.toDouble) catch { case _: NumberFormatException => None }

  private def intArg(s: String): Option[Int] =
    try Some(s.trim.toInt) catch { case _: NumberFormatException => None }

  private def longArg(s: String): Option[Long] =
    try Some(s.trim.toLong) catch { case _: NumberFormatException => None }

  private def ok(content: Array[Byte]): Response =
    Response(CommandCodec.Success, 0, "", content)

  private def err(message: String): Response =
    Response(1, 0, message, Array.emptyByteArray)

  private def handle(sock: Socket): Unit =
    try {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      var open = true
      while (open && running) {
        CommandCodec.readRequest(in) match {
          case Some(req) =>
            out.write(CommandCodec.encodeResponse(dispatch(req)))
            out.flush()
          case None => open = false
        }
      }
    } catch {
      case _: Throwable => () // client vanished / malformed stream
    } finally {
      try sock.close() catch { case _: Throwable => () }
    }
}

object InstrumentResponder {
  /** Synchronous single-command client — the reference's
    * `hyperion_command` wrapper (hyperion.py:188-223).
    */
  def command(host: String, port: Int, command: String,
              argument: String = "", requestOptions: Int = 0): Response = {
    val sock = new Socket(host, port)
    try {
      sock.getOutputStream.write(CommandCodec.encodeRequest(
        Request(requestOptions, command, argument)))
      sock.getOutputStream.flush()
      CommandCodec.readResponse(sock.getInputStream)
    } finally sock.close()
  }
}
