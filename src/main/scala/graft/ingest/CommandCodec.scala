package graft.ingest

import java.io.{DataInputStream, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Wire codec for the instrument COMMAND channel (F10 + S14 transport):
  * the same 8-byte BBHI little-endian header family as the data frames.
  *
  * Request (ref: hyperion.py:153-163 `write_command` —
  * `pack('BBHI', request_options, 0, len(command), len(argument))` then
  * ascii command + ascii argument); response (ref: hyperion.py:129-150
  * `read_response` — `unpack('BBHI', ...)` = status, response_type,
  * message_length, content_length, then message + content; status 0 =
  * SUCCESS, hyperion.py:62).
  */
object CommandCodec {
  val Success: Int = 0

  final case class Request(requestOptions: Int, command: String,
                           argument: String)
  final case class Response(status: Int, responseType: Int,
                            message: String, content: Array[Byte])

  def encodeRequest(r: Request): Array[Byte] = {
    val cmd = r.command.getBytes(US_ASCII)
    val arg = r.argument.getBytes(US_ASCII)
    val out = ByteBuffer.allocate(8 + cmd.length + arg.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(r.requestOptions.toByte).put(0.toByte)
    out.putShort(cmd.length.toShort)
    out.putInt(arg.length)
    out.put(cmd).put(arg)
    out.array()
  }

  def encodeResponse(r: Response): Array[Byte] = {
    val msg = r.message.getBytes(US_ASCII)
    val out = ByteBuffer.allocate(8 + msg.length + r.content.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(r.status.toByte).put(r.responseType.toByte)
    out.putShort(msg.length.toShort)
    out.putInt(r.content.length)
    out.put(msg).put(r.content)
    out.array()
  }

  /** Blocking stream parse of one request; None on clean EOF before a
    * header byte (connection closed between commands).
    */
  def readRequest(in: InputStream): Option[Request] = {
    val d = new DataInputStream(in)
    val hdr = new Array[Byte](8)
    val first = in.read()
    if (first < 0) return None
    hdr(0) = first.toByte
    d.readFully(hdr, 1, 7)
    val b = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
    val opts = b.get() & 0xFF
    b.get()
    val cmdLen = b.getShort() & 0xFFFF
    val argLen = b.getInt()
    require(argLen >= 0 && argLen < (1 << 20), s"bad argument length $argLen")
    val cmd = new Array[Byte](cmdLen)
    d.readFully(cmd)
    val arg = new Array[Byte](argLen)
    d.readFully(arg)
    Some(Request(opts, new String(cmd, US_ASCII), new String(arg, US_ASCII)))
  }

  /** (message_length, content_length) from the first 8 bytes of a
    * BBHI read header — the ONE source of truth for the layout shared
    * by the response reader, the landing gateway's framing loop, and
    * the client streamer's fast path (content_length is u32, returned
    * widened so 2-4 GiB lengths surface as bounds errors, not as
    * negative Ints).
    */
  def readHeaderLengths(hdr: Array[Byte]): (Int, Long) = {
    val b = ByteBuffer.wrap(hdr, 0, 8).order(ByteOrder.LITTLE_ENDIAN)
    b.getShort() // status + response-type bytes
    val msgLen = b.getShort() & 0xFFFF
    val contentLen = b.getInt() & 0xFFFFFFFFL
    (msgLen, contentLen)
  }

  /** An 8-byte BBHI stream-record read header (status 0, type 0,
    * message_length 0) for `contentLen` content bytes — the write-side
    * counterpart of [[readHeaderLengths]], shared by every stream
    * producer (responder streaming ports, bridge pump).
    */
  def streamRecordHeader(contentLen: Int): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .put(0.toByte).put(0.toByte).putShort(0.toShort)
      .putInt(contentLen).array()

  /** Blocking stream parse of one response. */
  def readResponse(in: InputStream): Response = {
    val d = new DataInputStream(in)
    val hdr = new Array[Byte](8)
    d.readFully(hdr)
    val status = hdr(0) & 0xFF
    val rType = hdr(1) & 0xFF
    val (msgLen, contentLenL) = readHeaderLengths(hdr)
    require(contentLenL >= 0 && contentLenL < (1 << 26),
      s"bad content length $contentLenL")
    val contentLen = contentLenL.toInt
    val msg = new Array[Byte](msgLen)
    d.readFully(msg)
    val content = new Array[Byte](contentLen)
    d.readFully(content)
    Response(status, rType, new String(msg, US_ASCII), content)
  }

  def u32le(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  def readU32le(content: Array[Byte]): Long =
    ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN).getInt() & 0xFFFFFFFFL

  def u16le(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(v.toShort).array()

  def readU16le(content: Array[Byte]): Int =
    ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN).getShort() & 0xFFFF

  /** Per-channel power-calibration constant pair.
    * Ref: hyperion.py:679-697 — `#GetPowerCalibrationInfo` content is a
    * flat int32 array with offsets at even indices (`cal_info[::2]`) and
    * scales at odd indices (`cal_info[1::2]`); dBm conversion divides by
    * scale (`inverse_scales = 1.0/scales`), so scales are integral.
    */
  final case class PowerCal(offset: Int, scale: Int)

  def encodePowerCal(cal: Seq[PowerCal]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 * cal.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    cal.foreach { c => out.putInt(c.offset); out.putInt(c.scale) }
    out.array()
  }

  def decodePowerCal(content: Array[Byte]): Seq[PowerCal] = {
    require(content.length % 8 == 0,
      s"power-cal content not interleaved int32 pairs: ${content.length}B")
    val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(content.length / 8)(PowerCal(b.getInt(), b.getInt()))
  }

  /** One peak-detection preset as carried on the wire.
    * Ref: hyperion.py:593-637 `HPeakDetectionSettings.from_binary_data` —
    * records concatenate as: `BB` (setting_id, name_length), name bytes,
    * `B` description_length, description bytes, then `HHHHiB`
    * (boxcar_length, diff_filter_length, lockout, ntv_period,
    * threshold int32, mode byte; mode 0 = Valley, else Peak) — all
    * little-endian, no record framing beyond the embedded lengths.
    */
  final case class DetectionSetting(settingId: Int, name: String,
      description: String, boxcarLength: Int, diffFilterLength: Int,
      lockout: Int, ntvPeriod: Int, threshold: Int, mode: String)

  def encodeDetectionSettings(ss: Seq[DetectionSetting]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ss.foreach { s =>
      val name = s.name.getBytes(US_ASCII)
      val desc = s.description.getBytes(US_ASCII)
      require(name.length < 256 && desc.length < 256,
        "detection-setting name/description exceed 1-byte length prefix")
      val b = ByteBuffer.allocate(3 + name.length + desc.length + 13)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(s.settingId.toByte).put(name.length.toByte).put(name)
      b.put(desc.length.toByte).put(desc)
      b.putShort(s.boxcarLength.toShort)
      b.putShort(s.diffFilterLength.toShort)
      b.putShort(s.lockout.toShort)
      b.putShort(s.ntvPeriod.toShort)
      b.putInt(s.threshold)
      b.put((if (s.mode == "Valley") 0 else 1).toByte)
      out.write(b.array())
    }
    out.toByteArray
  }

  def decodeDetectionSettings(content: Array[Byte]): Seq[DetectionSetting] = {
    val out = Seq.newBuilder[DetectionSetting]
    var i = 0
    while (i < content.length) {
      val id = content(i) & 0xFF
      val nameLen = content(i + 1) & 0xFF
      val name = new String(content, i + 2, nameLen, US_ASCII)
      var j = i + 2 + nameLen
      val descLen = content(j) & 0xFF
      val desc = new String(content, j + 1, descLen, US_ASCII)
      j += 1 + descLen
      val b = ByteBuffer.wrap(content, j, 13).order(ByteOrder.LITTLE_ENDIAN)
      out += DetectionSetting(id, name, desc,
        b.getShort() & 0xFFFF, b.getShort() & 0xFFFF,
        b.getShort() & 0xFFFF, b.getShort() & 0xFFFF, b.getInt(),
        if ((b.get() & 0xFF) == 0) "Valley" else "Peak")
      i = j + 13
    }
    out.result()
  }

  /** One sensor's configuration as carried in the `#ExportSensors`
    * content. Ref: hyperion.py:1281-1331 `export_sensors` — header `HH`
    * (header_version, num_sensors), then per sensor: `H` version,
    * 16 raw id bytes, `H`-prefixed name, `H`-prefixed model, `H`
    * channel (wire stores 0-based; the client presents 1-based),
    * `d` distance, 2 reserved bytes, then `ddddd` (wavelength,
    * calibration_factor, rc_gain, rc_thresholdHigh, rc_thresholdLow) —
    * all little-endian. `channel` here is the 1-based client view.
    */
  final case class SensorExport(version: Int, id: Seq[Byte], name: String,
      model: String, channel: Int, distance: Double, wavelength: Double,
      calibrationFactor: Double, rcGain: Double, rcThresholdHigh: Double,
      rcThresholdLow: Double)

  def encodeSensorExport(headerVersion: Int,
      sensors: Seq[SensorExport]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(u16le(headerVersion)); out.write(u16le(sensors.length))
    sensors.foreach { s =>
      require(s.id.length == 16, s"sensor id must be 16 bytes: ${s.name}")
      val name = s.name.getBytes(US_ASCII)
      val model = s.model.getBytes(US_ASCII)
      val b = ByteBuffer
        .allocate(2 + 16 + 2 + name.length + 2 + model.length + 2 + 8 + 2 + 40)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(s.version.toShort).put(s.id.toArray)
      b.putShort(name.length.toShort).put(name)
      b.putShort(model.length.toShort).put(model)
      b.putShort((s.channel - 1).toShort)
      b.putDouble(s.distance)
      b.putShort(0) // reserved
      b.putDouble(s.wavelength).putDouble(s.calibrationFactor)
      b.putDouble(s.rcGain).putDouble(s.rcThresholdHigh)
      b.putDouble(s.rcThresholdLow)
      out.write(b.array())
    }
    out.toByteArray
  }

  def decodeSensorExport(content: Array[Byte]): Seq[SensorExport] = {
    val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    b.getShort() // header_version (unused by the reference parse, too)
    val n = b.getShort() & 0xFFFF
    Seq.fill(n) {
      val version = b.getShort() & 0xFFFF
      val id = new Array[Byte](16); b.get(id)
      val name = new Array[Byte](b.getShort() & 0xFFFF); b.get(name)
      val model = new Array[Byte](b.getShort() & 0xFFFF); b.get(model)
      val channel = (b.getShort() & 0xFFFF) + 1
      val distance = b.getDouble()
      b.getShort() // reserved
      SensorExport(version, id.toSeq, new String(name, US_ASCII),
        new String(model, US_ASCII), channel, distance, b.getDouble(),
        b.getDouble(), b.getDouble(), b.getDouble(), b.getDouble())
    }
  }

  /** Flat little-endian int32 array content — the shape of
    * `#GetAvailableLaserScanSpeeds` (hyperion.py:824-831,
    * `np.frombuffer(..., dtype=np.int32)`) and
    * `#getActiveFullSpectrumDutChannelNumbers` (hyperion.py:803-810).
    */
  def i32ArrayLe(vs: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putInt)
    b.array()
  }

  def readI32ArrayLe(content: Array[Byte]): Seq[Int] = {
    require(content.length % 4 == 0,
      s"content not an int32 array: ${content.length}B")
    val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(content.length / 4)(b.getInt())
  }

  /** One little-endian float64 — the conversion-command content shape
    * (`#ConvertCountToWavelength` / `#ConvertWavelengthToCount`,
    * hyperion.py:1196-1223, `unpack('d', result)`).
    */
  def f64le(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putDouble(v).array()

  def readF64le(content: Array[Byte]): Double =
    ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN).getDouble()

  /** Per-channel time-of-flight compensation regions.
    * Ref: hyperion.py:1101-1126 `get_peak_offsets` — content is `H`
    * num_regions then per region `I` delay (ns) + `H` boundary (counts);
    * the set argument is `'{ch} {n} ' + '{delay} {boundary} '*n`
    * (hyperion.py:1085-1099), delays first, boundaries second.
    */
  final case class PeakOffsets(boundaries: Seq[Int], delays: Seq[Long]) {
    require(boundaries.length == delays.length,
      "boundaries and delays must pair 1:1")
  }

  def encodePeakOffsets(o: PeakOffsets): Array[Byte] = {
    val b = ByteBuffer.allocate(2 + 6 * o.boundaries.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(o.boundaries.length.toShort)
    o.delays.zip(o.boundaries).foreach { case (d, bd) =>
      b.putInt(d.toInt); b.putShort(bd.toShort)
    }
    b.array()
  }

  def decodePeakOffsets(content: Array[Byte]): PeakOffsets = {
    require(content.length >= 2,
      s"peak-offsets content too short for the u16 count: " +
        s"${content.length}B")
    val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    val n = b.getShort() & 0xFFFF
    require(content.length == 2 + 6 * n,
      s"peak-offsets content length ${content.length} != 2+6*$n")
    val pairs = Seq.fill(n)((b.getInt() & 0xFFFFFFFFL, b.getShort() & 0xFFFF))
    PeakOffsets(pairs.map(_._2), pairs.map(_._1))
  }

  /** Network triple as carried by `#Get{Active,Static}NetworkSettings`
    * (hyperion.py:848-877): 12 raw bytes — address, netmask, gateway,
    * each 4 network-order IPv4 octets (`socket.inet_ntoa` slices).
    */
  final case class NetworkSettings(address: String, netmask: String,
                                   gateway: String)

  def ipv4Bytes(s: String): Option[Array[Byte]] = {
    val parts = s.trim.split("\\.")
    if (parts.length != 4) return None
    try {
      val o = parts.map(_.toInt)
      if (o.exists(x => x < 0 || x > 255)) None
      else Some(o.map(_.toByte))
    } catch { case _: NumberFormatException => None }
  }

  private def ipv4String(b: Array[Byte], off: Int): String =
    (0 until 4).map(i => b(off + i) & 0xFF).mkString(".")

  def encodeNetworkSettings(n: NetworkSettings): Array[Byte] =
    Seq(n.address, n.netmask, n.gateway).flatMap(s =>
      ipv4Bytes(s).getOrElse(
        throw new IllegalArgumentException(s"bad IPv4: $s")).toSeq).toArray

  def decodeNetworkSettings(content: Array[Byte]): NetworkSettings = {
    require(content.length == 12,
      s"network-settings content must be 12 bytes: ${content.length}")
    NetworkSettings(ipv4String(content, 0), ipv4String(content, 4),
      ipv4String(content, 8))
  }

  /** UTC datetime content — `#GetInstrumentUtcDateTime`
    * (hyperion.py:927-942): six little-endian u16s
    * (year month day hour minute second, `unpack('HHHHHH', ...)`);
    * the setter argument is `'%Y %m %d %H %M %S'`.
    */
  def encodeUtcDateTime(parts: Seq[Int]): Array[Byte] = {
    require(parts.length == 6, "UTC datetime needs 6 fields")
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    parts.foreach(p => b.putShort(p.toShort))
    b.array()
  }

  def decodeUtcDateTime(content: Array[Byte]): Seq[Int] = {
    require(content.length == 12,
      s"UTC datetime content must be 12 bytes: ${content.length}")
    val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(6)(b.getShort() & 0xFFFF)
  }

  /** The add/update argument format — the reference's
    * `HPeakDetectionSettings.pack` (hyperion.py:639-651):
    * `id 'name' 'description' boxcar diff lockout ntv threshold mode`
    * with mode 1 = Peak, 0 = Valley. Names/descriptions containing a
    * single quote are rejected here (the reference's pack() emits them
    * unescaped and its own parse then fails — we keep the two surfaces
    * mutually round-trippable by refusing at format time).
    */
  def formatDetectionSetting(s: DetectionSetting): String = {
    require(!s.name.contains('\'') && !s.description.contains('\''),
      "detection-setting name/description must not contain single quotes")
    s"${s.settingId} '${s.name}' '${s.description}' ${s.boxcarLength} " +
      s"${s.diffFilterLength} ${s.lockout} ${s.ntvPeriod} " +
      s"${s.threshold} ${if (s.mode == "Valley") 0 else 1}"
  }

  private val PackRe =
    """(\d+) '([^']*)' '([^']*)' (\d+) (\d+) (\d+) (\d+) (-?\d+) ([01])""".r

  def parseDetectionSetting(arg: String): Option[DetectionSetting] =
    arg.trim match {
      case PackRe(id, name, desc, box, diff, lock, ntv, thr, mode) =>
        Some(DetectionSetting(id.toInt, name, desc, box.toInt, diff.toInt,
          lock.toInt, ntv.toInt, thr.toInt,
          if (mode == "0") "Valley" else "Peak"))
      case _ => None
    }
}
