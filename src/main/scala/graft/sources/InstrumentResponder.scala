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
class InstrumentResponder {
  import CommandCodec.DetectionSetting

  private val server = new ServerSocket(0)
  @volatile private var running = true
  private var acceptThread: Thread = _

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
  // marks the running set persistent (a flag here — no real flash)
  private val sensors =
    scala.collection.mutable.LinkedHashMap[String, CommandCodec.SensorExport](
      InstrumentConfig.DefaultSensors.map(s => s.name -> s): _*)
  @volatile private var sensorsSaved = true

  def port: Int = server.getLocalPort

  def start(): InstrumentResponder = {
    acceptThread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => handle(sock), "graft-instrument-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: SocketException => () }
      }
    }, "graft-instrument-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()
    this
  }

  def stop(): Unit = {
    running = false
    server.close()
    acceptThread.join(2000)
  }

  private def dispatch(r: Request): Response = r.command match {
    case "#GetSerialNumber" =>
      ok(InstrumentConfig.Serial.getBytes(US_ASCII))
    case "#GetInstrumentName" =>
      ok(InstrumentConfig.InstrumentName.getBytes(US_ASCII))
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
    case "#AddDetectionSetting" => settings.synchronized {
      CommandCodec.parseDetectionSetting(r.argument) match {
        case None => err(s"malformed detection setting: ${r.argument}")
        case Some(s) if settings.contains(s.settingId) =>
          err(s"detection setting ${s.settingId} already exists")
        case Some(s) => settings(s.settingId) = s; ok(Array.emptyByteArray)
      }
    }
    case "#UpdateDetectionSetting" => settings.synchronized {
      CommandCodec.parseDetectionSetting(r.argument) match {
        case None => err(s"malformed detection setting: ${r.argument}")
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
      sensorsSaved = true; ok(Array.emptyByteArray)
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
