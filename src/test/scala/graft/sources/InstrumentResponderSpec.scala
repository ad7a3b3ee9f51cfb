package graft.sources

import java.net.Socket
import java.nio.charset.StandardCharsets.US_ASCII

import graft.SparkSpec
import graft.ingest.CommandCodec
import graft.ingest.CommandCodec.Request
import graft.model.InstrumentConfig
import graft.queries.PipelineQueries

/** S14 full: the live command round-trip — client-formatted packets
  * over a real TCP socket to the instrument responder, responses
  * parsed and checked against the SAME InstrumentConfig the query
  * surface serves, so control plane and queryable config agree. Plus
  * the F10 tie: q_command_format's SQL-derived packet hex equals the
  * real CommandCodec wire bytes.
  */
class InstrumentResponderSpec extends SparkSpec {

  test("every config property round-trips over a live socket") {
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String) =
        InstrumentResponder.command("127.0.0.1", r.port, c)
      assert(new String(cmd("#GetSerialNumber").content, US_ASCII)
        == InstrumentConfig.Serial)
      assert(new String(cmd("#GetInstrumentName").content, US_ASCII)
        == InstrumentConfig.InstrumentName)
      assert(new String(cmd("#GetFirmwareVersion").content, US_ASCII)
        == InstrumentConfig.FirmwareVersion)
      assert(new String(cmd("#GetFPGAVersion").content, US_ASCII)
        == InstrumentConfig.FpgaVersion)
      assert(cmd("#isready").content.head == 1.toByte)
      assert(CommandCodec.readU32le(cmd("#GetDutChannelCount").content)
        == InstrumentConfig.ChannelCount.toLong)
      assert(CommandCodec.readU32le(
        cmd("#GetMaximumPeakCountPerDutChannel").content)
        == InstrumentConfig.MaxPeaksPerChannel.toLong)
      // unknown command: non-SUCCESS status, error in message —
      // the reference's error path (hyperion.py:141-146)
      val bad = cmd("#NoSuchCommand")
      assert(bad.status != CommandCodec.Success)
      assert(bad.message.contains("unknown command"))
      // config answers equal the queryable config DataFrame (S14-lite
      // and S14-live can never disagree)
      val row = InstrumentConfig.config(spark).head()
      assert(row.getAs[String]("serial_number") == InstrumentConfig.Serial)
    } finally r.stop()
  }

  test("#GetPowerCalibrationInfo round-trips the interleaved int32 cal") {
    val r = new InstrumentResponder().start()
    try {
      val resp = InstrumentResponder.command("127.0.0.1", r.port,
        "#GetPowerCalibrationInfo")
      assert(resp.status == CommandCodec.Success)
      // the reference parse: offsets = cal_info[::2], scales =
      // cal_info[1::2] (hyperion.py:679-697)
      val decoded = CommandCodec.decodePowerCal(resp.content)
      assert(decoded == InstrumentConfig.PowerCalibration)
      assert(decoded.map(_.offset) ==
        (0 until InstrumentConfig.ChannelCount).map(-40 - _))
      assert(decoded.map(_.scale) ==
        (0 until InstrumentConfig.ChannelCount).map(100 + _))
      // the queryable dim table is built from the SAME decoded bytes the
      // socket serves — the dBm kernel's constants come from the wire
      val rows = InstrumentConfig.powerCal(spark)
        .orderBy("channel").collect()
      assert(rows.length == decoded.size)
      for ((row, ch) <- rows.zipWithIndex) {
        assert(row.getAs[Int]("channel") == ch)
        assert(row.getAs[Double]("offset") == decoded(ch).offset.toDouble)
        assert(row.getAs[Double]("scale") == decoded(ch).scale.toDouble)
      }
    } finally r.stop()
  }

  test("detection-settings surface round-trips incl. the error paths") {
    import graft.ingest.CommandCodec.DetectionSetting
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      // full preset dump decodes back to the static defaults
      val all = CommandCodec.decodeDetectionSettings(
        cmd("#GetAvailableDetectionSettings").content)
      assert(all.map(_.settingId) == InstrumentConfig.Presets.map(_.setting_id))
      assert(all.map(_.name) == InstrumentConfig.Presets.map(_.name))
      assert(all.map(_.threshold) == InstrumentConfig.Presets.map(_.threshold))
      assert(all.map(_.mode) == InstrumentConfig.Presets.map(_.mode))
      // single-setting fetch (#getDetectionSetting, hyperion.py:1027-1037)
      val one = CommandCodec.decodeDetectionSettings(
        cmd("#getDetectionSetting", "1").content)
      assert(one == Seq(all(1)))
      assert(cmd("#getDetectionSetting", "9").status != CommandCodec.Success)
      // add: fails on an existing id (the reference client's
      // add-then-update fallback, hyperion.py:1039-1049), succeeds fresh
      val mine = DetectionSetting(7, "mine", "a user preset",
        300, 900, 1200, 9500, 2500, "Valley")
      val packed = CommandCodec.formatDetectionSetting(mine)
      assert(cmd("#AddDetectionSetting",
        CommandCodec.formatDetectionSetting(all.head)).status
        != CommandCodec.Success)
      assert(cmd("#AddDetectionSetting", packed).status
        == CommandCodec.Success)
      assert(CommandCodec.decodeDetectionSettings(
        cmd("#getDetectionSetting", "7").content) == Seq(mine))
      // update requires the id to exist
      val mine2 = mine.copy(threshold = 2600)
      assert(cmd("#UpdateDetectionSetting",
        CommandCodec.formatDetectionSetting(mine2)).status
        == CommandCodec.Success)
      assert(cmd("#UpdateDetectionSetting",
        CommandCodec.formatDetectionSetting(mine.copy(settingId = 99)))
        .status != CommandCodec.Success)
      // channel assignment: ids dump one byte per channel; set then read
      val ids0 = cmd("#GetAllChannelDetectionSettingIds").content
      assert(ids0.toSeq == (0 until InstrumentConfig.ChannelCount)
        .map(c => (c % InstrumentConfig.Presets.size).toByte))
      assert(cmd("#SetChannelDetectionSettingID", "3 7").status
        == CommandCodec.Success)
      assert(CommandCodec.readU16le(
        cmd("#GetChannelDetectionSettingId", "3").content) == 7)
      assert(cmd("#SetChannelDetectionSettingID", "3 42").status
        != CommandCodec.Success) // unknown setting id
      assert(cmd("#GetChannelDetectionSettingId", "0").status
        != CommandCodec.Success) // channels are 1-based
      // remove: refused while in use on a channel (hyperion.py:1051-1058),
      // allowed once unassigned; out-of-range ids refused
      assert(cmd("#removeDetectionSetting", "7").status
        != CommandCodec.Success)
      assert(cmd("#SetChannelDetectionSettingID", "3 2").status
        == CommandCodec.Success)
      assert(cmd("#removeDetectionSetting", "7").status
        == CommandCodec.Success)
      assert(cmd("#getDetectionSetting", "7").status
        != CommandCodec.Success)
      assert(cmd("#removeDetectionSetting", "200").status
        != CommandCodec.Success)
    } finally r.stop()
  }

  test("NTP/PTP time-sync round-trips with mutual exclusion") {
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      def flag(c: String): Boolean =
        CommandCodec.readU32le(cmd(c).content) > 0
      // defaults: NTP on, PTP off (u32 content, hyperion.py:947-1000)
      assert(flag("#GetNtpEnabled") && !flag("#GetPtpEnabled"))
      assert(new String(cmd("#GetNtpServer").content, US_ASCII)
        == InstrumentConfig.NtpServerDefault)
      // set the server, flip to PTP — NTP must drop (the reference notes
      // the two cannot be enabled together)
      assert(cmd("#SetNtpServer", "10.9.9.9").status == CommandCodec.Success)
      assert(new String(cmd("#GetNtpServer").content, US_ASCII) == "10.9.9.9")
      assert(cmd("#SetPtpEnabled", "1").status == CommandCodec.Success)
      assert(flag("#GetPtpEnabled") && !flag("#GetNtpEnabled"))
      assert(cmd("#SetNtpEnabled", "1").status == CommandCodec.Success)
      assert(flag("#GetNtpEnabled") && !flag("#GetPtpEnabled"))
      // malformed boolean arguments are refused
      assert(cmd("#SetNtpEnabled", "yes").status != CommandCodec.Success)
      assert(cmd("#SetNtpServer", "").status != CommandCodec.Success)
    } finally r.stop()
  }

  test("sensor management round-trips incl. export binary and errors") {
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      // names travel in the MESSAGE field (hyperion.py:1245-1255)
      assert(cmd("#GetSensorNames").message.split(" ").toSeq
        == InstrumentConfig.DefaultSensors.map(_.name))
      // the export binary decodes back to the defaults (hyperion.py:
      // 1281-1331: HH header, then versioned per-sensor records)
      val exported = CommandCodec.decodeSensorExport(
        cmd("#ExportSensors").content)
      assert(exported == InstrumentConfig.DefaultSensors)
      // add → appears in names and export; duplicate/bad-model refused
      assert(cmd("#AddSensor", "strain_5 os7510 5 50 1550.0 1.5").status
        == CommandCodec.Success)
      assert(!r.sensorsPersisted)
      val after = CommandCodec.decodeSensorExport(
        cmd("#ExportSensors").content)
      assert(after.size == 5 && after.last.name == "strain_5" &&
        after.last.channel == 5 && after.last.wavelength == 1550.0 &&
        after.last.calibrationFactor == 1.5 && after.last.distance == 50.0)
      assert(cmd("#AddSensor", "strain_5 os7510 5 50 1550.0 1.5").status
        != CommandCodec.Success) // duplicate name
      assert(cmd("#AddSensor", "x os9999 1 0 1500.0 1.0").status
        != CommandCodec.Success) // unknown model
      assert(cmd("#AddSensor", "x os7510 99 0 1500.0 1.0").status
        != CommandCodec.Success) // channel out of range
      // save marks persistent; remove unmarks; removing twice errors
      assert(cmd("#saveSensors").status == CommandCodec.Success)
      assert(r.sensorsPersisted)
      assert(cmd("#removeSensor", "strain_5").status == CommandCodec.Success)
      assert(!r.sensorsPersisted)
      assert(cmd("#removeSensor", "strain_5").status != CommandCodec.Success)
      // the queryable dim table equals the decoded default export
      val rows = InstrumentConfig.sensors(spark).orderBy("sensor_no")
        .collect()
      assert(rows.map(_.getAs[String]("name")).toSeq
        == InstrumentConfig.DefaultSensors.map(_.name))
      assert(rows.map(_.getAs[Double]("calibration_factor")).toSeq
        == InstrumentConfig.DefaultSensors.map(_.calibrationFactor))
    } finally r.stop()
  }

  test("multiple commands pipeline over one connection") {
    val r = new InstrumentResponder().start()
    try {
      val sock = new Socket("127.0.0.1", r.port)
      try {
        val out = sock.getOutputStream
        for (c <- Seq("#GetSerialNumber", "#isready", "#GetDutChannelCount"))
          out.write(CommandCodec.encodeRequest(Request(0, c, "")))
        out.flush()
        val in = sock.getInputStream
        assert(new String(CommandCodec.readResponse(in).content, US_ASCII)
          == InstrumentConfig.Serial)
        assert(CommandCodec.readResponse(in).content.head == 1.toByte)
        assert(CommandCodec.readU32le(CommandCodec.readResponse(in).content)
          == InstrumentConfig.ChannelCount.toLong)
      } finally sock.close()
    } finally r.stop()
  }

  test("#GetPeaks snapshot is byte-identical to the stream's frame") {
    import org.apache.spark.sql.functions._
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      // default snapshot decodes through the SAME parser the stream uses
      val d0 = graft.ingest.FrameCodec.decodePeaksBytes(
        cmd("#GetPeaks").content)
      assert(d0.getLong(2) == InstrumentConfig.SnapshotSerialDefault)
      assert(d0.getArray(6).toDoubleArray().toSeq ==
        (0 until graft.ingest.FrameSource.NumPeaks).map(i =>
          InstrumentConfig.SnapshotCentsDefault.toDouble + i * 100.0))
      // point the snapshot at a REAL event and compare byte-for-byte
      // with the frame the streaming path emits for that event
      val d = "/root/testdata/sf0.001"
      val ev = graft.ingest.FrameSource.frames(spark, d)
        .orderBy("frame_id").limit(1)
      val streamBytes = ev.select(graft.ingest.FrameCodec.encodePeaks(
        col("serial_number"),
        floor(col("ts").cast("double")).cast("long"),
        col("frame_id") % 1000000000L,
        col("peak_counts"), col("peaks")).as("b"))
        .head().getAs[Array[Byte]]("b")
      val row = ev.select(col("serial_number"),
        floor(col("ts").cast("double")).cast("long").as("tsi"),
        (col("frame_id") % 1000000000L).as("tsf"),
        element_at(col("peaks"), 1).as("p0")).head()
      r.setCurrentFrame(row.getAs[Double]("p0").toLong,
        row.getAs[Long]("serial_number"), row.getAs[Long]("tsi"),
        row.getAs[Long]("tsf"))
      assert(cmd("#GetPeaks").content.toSeq == streamBytes.toSeq,
        "snapshot must equal the stream-emitted frame bytes")
    } finally r.stop()
  }

  test("#GetSpectrum snapshot honors the active channel set + power cal") {
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      // default active set = all channels; raw matrix follows the
      // FrameSource synth recipe
      val full = graft.ingest.FrameCodec.decodeSpectrumBytes(
        cmd("#GetSpectrum").content)
      assert(full.getInt(8) == graft.ingest.FrameSource.SpectrumChannels)
      assert(full.getInt(9) == 0xFF) // bits 0-7 set
      val cents = InstrumentConfig.SnapshotCentsDefault
      val m0 = full.getArray(10).getArray(0)
      assert(m0.getInt(0) == (cents % 65536).toInt)
      assert(m0.getInt(1) == ((cents + 7) % 65536).toInt)
      // shrink the active set: num_channels and the bitmap follow, rows
      // keep the ABSOLUTE channel recipe (reference channel_map decode)
      assert(cmd("#setActiveFullSpectrumDutChannelNumbers", "2 5").status
        == CommandCodec.Success)
      assert(CommandCodec.readI32ArrayLe(
        cmd("#getActiveFullSpectrumDutChannelNumbers").content) == Seq(2, 5))
      val part = graft.ingest.FrameCodec.decodeSpectrumBytes(
        cmd("#GetSpectrum").content)
      assert(part.getInt(8) == 2)
      assert(part.getInt(9) == ((1 << 1) | (1 << 4)))
      assert(part.getArray(10).getArray(0).getInt(0)
        == ((cents + 1000) % 65536).toInt) // channel 2 → c=1
      assert(part.getArray(10).getArray(1).getInt(0)
        == ((cents + 4000) % 65536).toInt) // channel 5 → c=4
      // client-side dBm calibration (HACQSpectrumData with power_cal):
      // raw*(1/scale)+offset using the channel_map — constants from the
      // decoded #GetPowerCalibrationInfo bytes
      val cal = CommandCodec.decodePowerCal(
        cmd("#GetPowerCalibrationInfo").content)
      val raw20 = part.getArray(10).getArray(0).getInt(0)
      val db = raw20 * (1.0 / cal(1).scale) + cal(1).offset
      assert(math.abs(db - (raw20 / 101.0 - 41.0)) < 1e-12)
      // out-of-range and malformed channel sets are refused
      assert(cmd("#setActiveFullSpectrumDutChannelNumbers", "0 3").status
        != CommandCodec.Success)
      assert(cmd("#setActiveFullSpectrumDutChannelNumbers", "x 3").status
        != CommandCodec.Success)
      // the given ORDER round-trips (reference does not sort), and an
      // EMPTY argument clears the set (the reference setter with [],
      // hyperion.py:814-821) — the snapshot then carries zero channels
      assert(cmd("#setActiveFullSpectrumDutChannelNumbers", "5 2").status
        == CommandCodec.Success)
      assert(CommandCodec.readI32ArrayLe(
        cmd("#getActiveFullSpectrumDutChannelNumbers").content) == Seq(5, 2))
      assert(cmd("#setActiveFullSpectrumDutChannelNumbers", "").status
        == CommandCodec.Success)
      assert(CommandCodec.readI32ArrayLe(
        cmd("#getActiveFullSpectrumDutChannelNumbers").content).isEmpty)
      val empty = graft.ingest.FrameCodec.decodeSpectrumBytes(
        cmd("#GetSpectrum").content)
      assert(empty.getInt(8) == 0 && empty.getInt(9) == 0)
      // live spectrum mirror: raw frame bytes served verbatim; a frame
      // whose bitmap disagrees with its channel count is refused
      val good = graft.ingest.FrameCodec.encodeSpectrumBytes(
        7L, 1700000001L, 5L, 1500.0, 0.8, (1 << 2) | (1 << 6),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Seq(0, 1).map(c =>
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              Array.tabulate(16)(p => c * 100 + p)): Any).toArray))
      assert(r.setCurrentSpectrumFrame(good))
      assert(cmd("#GetSpectrum").content.toSeq == good.toSeq)
      val badBits = graft.ingest.FrameCodec.encodeSpectrumBytes(
        7L, 1700000001L, 5L, 1500.0, 0.8, 1 /* 1 bit, 2 rows */,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Seq(0, 1).map(c =>
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              Array.tabulate(16)(p => c * 100 + p)): Any).toArray))
      assert(!r.setCurrentSpectrumFrame(badBits))
      // cross-kind guard: spectrum bytes must NOT be accepted as the
      // peaks snapshot even though they pass the structural decode
      assert(!r.setCurrentPeaksFrame(good))
    } finally r.stop()
  }

  test("laser scan speed round-trips; rejects unavailable speeds") {
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      assert(CommandCodec.readU32le(cmd("#GetLaserScanSpeed").content)
        == InstrumentConfig.LaserScanSpeedDefault.toLong)
      assert(CommandCodec.readI32ArrayLe(
        cmd("#GetAvailableLaserScanSpeeds").content)
        == InstrumentConfig.AvailableLaserScanSpeeds)
      // the streaming window is one scan period of the DEFAULT speed —
      // the 10 Hz envelope is fetched from this surface, not assumed
      assert(graft.pipeline.PeakStreaming.WindowMs
        == 1000 / InstrumentConfig.LaserScanSpeedDefault)
      assert(cmd("#SetLaserScanSpeed", "100").status == CommandCodec.Success)
      assert(CommandCodec.readU32le(cmd("#GetLaserScanSpeed").content) == 100L)
      assert(cmd("#SetLaserScanSpeed", "42").status != CommandCodec.Success)
      assert(cmd("#SetLaserScanSpeed", "fast").status != CommandCodec.Success)
      assert(CommandCodec.readU32le(cmd("#GetLaserScanSpeed").content) == 100L)
    } finally r.stop()
  }

  test("peak offsets + count↔wavelength conversions round-trip") {
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      // defaults decode to Physics-derived delays over the distance
      // model — the wire carries the SAME formula the query kernel uses
      val o3 = CommandCodec.decodePeakOffsets(
        cmd("#GetPeakOffsets", "3").content)
      assert(o3.boundaries == (1 to 3).map(r2 =>
        InstrumentConfig.offsetBoundary(3, r2)))
      assert(o3.delays == (1 to 3).map(r2 => graft.ops.Physics.delayNsScalar(
        InstrumentConfig.offsetDistanceM(3, r2),
        InstrumentConfig.IndexOfRefraction)))
      // set with the reference's '{ch} {n} {delay} {boundary}...' form
      assert(cmd("#SetPeakOffsets", "3 2 450 1200 900 2400").status
        == CommandCodec.Success)
      val o3b = CommandCodec.decodePeakOffsets(
        cmd("#GetPeakOffsets", "3").content)
      assert(o3b.delays == Seq(450L, 900L) &&
        o3b.boundaries == Seq(1200, 2400))
      // clear one channel / all channels
      assert(cmd("#ClearPeakOffsets", "3").status == CommandCodec.Success)
      assert(CommandCodec.decodePeakOffsets(
        cmd("#GetPeakOffsets", "3").content).boundaries.isEmpty)
      assert(CommandCodec.decodePeakOffsets(
        cmd("#GetPeakOffsets", "2").content).boundaries.nonEmpty)
      assert(cmd("#ClearAllPeakOffsets").status == CommandCodec.Success)
      assert(CommandCodec.decodePeakOffsets(
        cmd("#GetPeakOffsets", "2").content).boundaries.isEmpty)
      // malformed/out-of-range forms are refused
      assert(cmd("#GetPeakOffsets", "99").status != CommandCodec.Success)
      assert(cmd("#SetPeakOffsets", "3 2 450 1200").status
        != CommandCodec.Success) // count mismatch
      assert(cmd("#SetPeakOffsets", "3 1 450 70000").status
        != CommandCodec.Success) // boundary exceeds u16
      // conversions: f64 content, linear model, offset shifts the count
      val wl = CommandCodec.readF64le(
        cmd("#ConvertCountToWavelength", "2500").content)
      assert(wl == InstrumentConfig.countToWavelength(2500.0))
      val back = CommandCodec.readF64le(
        cmd("#ConvertWavelengthToCount", s"$wl 0").content)
      assert(math.abs(back - 2500.0) < 1e-9)
      val shifted = CommandCodec.readF64le(
        cmd("#ConvertWavelengthToCount", s"$wl 40").content)
      assert(math.abs(shifted - back -
        40.0 * InstrumentConfig.CountsPerNsDelay) < 1e-9)
      assert(cmd("#ConvertWavelengthToCount", "1500.0").status
        != CommandCodec.Success) // missing offset token
    } finally r.stop()
  }

  test("network / UTC clock / name / reboot complete the command tail") {
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      // network: boot mode DHCP; active follows the mode, static is
      // whatever was last set (12-byte inet_ntoa triple)
      assert(new String(cmd("#GetNetworkIpMode").content, US_ASCII) == "DHCP")
      assert(CommandCodec.decodeNetworkSettings(
        cmd("#GetActiveNetworkSettings").content)
        == InstrumentConfig.DhcpNetworkDefault)
      assert(cmd("#SetStaticNetworkSettings",
        "192.168.7.2 255.255.255.0 192.168.7.1").status
        == CommandCodec.Success)
      assert(cmd("#EnableStaticIpMode").status == CommandCodec.Success)
      assert(new String(cmd("#GetNetworkIpMode").content, US_ASCII)
        == "STATIC")
      val active = CommandCodec.decodeNetworkSettings(
        cmd("#GetActiveNetworkSettings").content)
      assert(active == CommandCodec.NetworkSettings("192.168.7.2",
        "255.255.255.0", "192.168.7.1"))
      assert(cmd("#EnableDynamicIpMode").status == CommandCodec.Success)
      assert(cmd("#SetStaticNetworkSettings", "bad input here").status
        != CommandCodec.Success)
      assert(cmd("#SetStaticNetworkSettings", "1.2.3.999 0.0.0.0 1.1.1.1")
        .status != CommandCodec.Success)
      // UTC clock: six u16s, '%Y %m %d %H %M %S' setter
      assert(CommandCodec.decodeUtcDateTime(
        cmd("#GetInstrumentUtcDateTime").content)
        == InstrumentConfig.BootUtc)
      assert(cmd("#SetInstrumentUtcDateTime", "2026 8 13 12 30 45").status
        == CommandCodec.Success)
      assert(CommandCodec.decodeUtcDateTime(
        cmd("#GetInstrumentUtcDateTime").content)
        == Seq(2026, 8, 13, 12, 30, 45))
      assert(cmd("#SetInstrumentUtcDateTime", "2026 13 1 0 0 0").status
        != CommandCodec.Success) // month 13
      assert(cmd("#SetInstrumentUtcDateTime", "2026 1 1").status
        != CommandCodec.Success)
      // instrument name is settable (hyperion.py:745-748)
      assert(cmd("#SetInstrumentName", "bench-rig-2").status
        == CommandCodec.Success)
      assert(new String(cmd("#GetInstrumentName").content, US_ASCII)
        == "bench-rig-2")
      assert(cmd("#SetInstrumentName", "  ").status != CommandCodec.Success)
      // reboot: acknowledged; unsaved sensor edits revert to the last
      // #saveSensors snapshot, saved ones survive
      assert(cmd("#AddSensor", "temp_9 os7520 2 20 1540.0 0.5").status
        == CommandCodec.Success)
      assert(cmd("#saveSensors").status == CommandCodec.Success)
      assert(cmd("#AddSensor", "temp_10 os7510 3 30 1560.0 0.75").status
        == CommandCodec.Success)
      assert(!r.sensorsPersisted)
      assert(cmd("#Reboot").status == CommandCodec.Success)
      assert(r.rebootsSeen == 1)
      val names = cmd("#GetSensorNames").message.split(" ").toSeq
      assert(names.contains("temp_9") && !names.contains("temp_10"))
      assert(r.sensorsPersisted)
    } finally r.stop()
  }

  test("detection-setting ids outside 0-127 are refused at add/update") {
    import graft.ingest.CommandCodec.DetectionSetting
    val r = new InstrumentResponder().start()
    try {
      def cmd(c: String, a: String = "") =
        InstrumentResponder.command("127.0.0.1", r.port, c, a)
      // 300 would round-trip as 300.toByte = 44 in the binary dump
      val big = DetectionSetting(300, "big", "id too big",
        250, 800, 1000, 9000, 2000, "Peak")
      assert(cmd("#AddDetectionSetting",
        CommandCodec.formatDetectionSetting(big)).status
        != CommandCodec.Success)
      assert(cmd("#UpdateDetectionSetting",
        CommandCodec.formatDetectionSetting(big)).status
        != CommandCodec.Success)
      // quote-bearing names are refused at FORMAT time (the reference's
      // pack() emits them unescaped and then cannot re-parse them)
      intercept[IllegalArgumentException] {
        CommandCodec.formatDetectionSetting(DetectionSetting(
          5, "bob's preset", "", 250, 800, 1000, 9000, 2000, "Peak"))
      }
    } finally r.stop()
  }

  test("q_command_format hex equals the real CommandCodec wire bytes") {
    val hex = "0123456789ABCDEF"
    def toHex(b: Array[Byte]): String =
      b.map(x => s"${hex((x >> 4) & 0xF)}${hex(x & 0xF)}").mkString
    val rows = graft.SparkEntry.queries("q_command_format")(spark, "")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getString(4))).toSeq
    assert(rows.size == PipelineQueries.CommandTable.size)
    for ((c, a, o, headerHex, packetMd5) <- rows) {
      val wire = CommandCodec.encodeRequest(Request(o, c, a))
      assert(toHex(wire) == headerHex + toHex(c.getBytes(US_ASCII)) +
        toHex(a.getBytes(US_ASCII)), s"$c header/packet hex mismatch")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(toHex(wire).getBytes(US_ASCII))
      assert(toHex(md).toLowerCase == packetMd5, s"$c md5 mismatch")
    }
  }
}
