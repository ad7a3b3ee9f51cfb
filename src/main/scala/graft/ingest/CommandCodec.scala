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

  /** Blocking stream parse of one response. */
  def readResponse(in: InputStream): Response = {
    val d = new DataInputStream(in)
    val hdr = new Array[Byte](8)
    d.readFully(hdr)
    val b = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
    val status = b.get() & 0xFF
    val rType = b.get() & 0xFF
    val msgLen = b.getShort() & 0xFFFF
    val contentLen = b.getInt()
    require(contentLen >= 0 && contentLen < (1 << 26),
      s"bad content length $contentLen")
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
}
