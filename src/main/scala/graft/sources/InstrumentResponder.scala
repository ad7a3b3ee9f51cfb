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
  * `#GetMaximumPeakCountPerDutChannel` (u32 LE). Unknown commands
  * answer status≠SUCCESS with the error text in `message`, matching
  * the reference's error path (hyperion.py:141-146).
  *
  * This is a single-instrument control-plane endpoint (one per
  * device), not a data-plane component — the engine-scale story stays
  * with the landing gateway + MicroBatchStream; the responder exists
  * so the full client→socket→instrument→response loop is modeled and
  * spec-driven end to end.
  */
class InstrumentResponder {
  private val server = new ServerSocket(0)
  @volatile private var running = true
  private var acceptThread: Thread = _

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
    case other =>
      Response(1, 0, s"unknown command: $other", Array.emptyByteArray)
  }

  private def ok(content: Array[Byte]): Response =
    Response(CommandCodec.Success, 0, "", content)

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
