package graft.client

import java.net.Socket

import graft.ingest.CommandCodec
import graft.ingest.CommandCodec.{Request, Response}

/** How a client reaches the instrument's command port. The reference
  * ships two connection lifecycles over the identical wire protocol:
  * a throwaway socket per command (`hyperion_command`,
  * hyperion.py:188-223, used by the sync `Hyperion` class) and one
  * persistent connection reused across requests (`HCommTCPClient`
  * held by `AsyncHyperion`, hyperion.py:81-186, 1349). Both are
  * expressed here so [[Instrument]] speaks either.
  */
trait CommandTransport extends AutoCloseable {
  def execute(command: String, argument: String = "",
              requestOptions: Int = 0): Response
  def close(): Unit
}

/** One TCP connection per command — the sync client's lifecycle
  * (hyperion.py:188-223: connect, execute, close).
  */
final class PerCommandTransport(host: String, port: Int)
    extends CommandTransport {
  def execute(command: String, argument: String = "",
              requestOptions: Int = 0): Response =
    graft.sources.InstrumentResponder.command(
      host, port, command, argument, requestOptions)
  def close(): Unit = ()
}

/** ONE TCP connection reused across many requests — the persistent
  * lifecycle `AsyncHyperion` holds for its whole life
  * (hyperion.py:1349; `HCommTCPClient.execute_command` at 166-182).
  * Like the reference it connects lazily on the first command
  * (hyperion.py:177-178); unlike a raw socket it also reconnects
  * after [[close]] so a client survives an instrument reboot.
  *
  * Request/response pairs are serialized under the connection's own
  * lock, so concurrent callers never interleave bytes on the wire —
  * the role the asyncio event loop plays for the reference.
  */
final class PersistentConnection(host: String, port: Int)
    extends CommandTransport {
  private[this] var sock: Socket = null
  // guards ONLY socket creation/teardown and the closed flag — never
  // held across wire I/O, so close() can always interpose even while a
  // command is blocked mid-read under the main monitor (Socket.close
  // is thread-safe and aborts that read)
  private[this] val sockLock = new Object
  private[this] var closed = false

  def execute(command: String, argument: String = "",
              requestOptions: Int = 0): Response = synchronized {
    sockLock.synchronized {
      if (closed)
        throw new java.io.IOException("transport closed")
      if (sock == null || sock.isClosed) sock = new Socket(host, port)
    }
    try {
      val out = sock.getOutputStream
      out.write(CommandCodec.encodeRequest(
        Request(requestOptions, command, argument)))
      out.flush()
      CommandCodec.readResponse(sock.getInputStream)
    } catch {
      // a failed round-trip leaves the stream desynced (a half-read
      // response would be parsed as the NEXT response) or dead (peer
      // dropped TCP — sock.isClosed only reflects LOCAL close, so the
      // stale socket would be reused forever). Invalidate it either
      // way: the next command reconnects cleanly, which is what makes
      // the documented reboot-survival actually work against a peer
      // that drops connections.
      case e: Throwable =>
        sockLock.synchronized {
          if (sock != null) {
            try sock.close() catch { case _: java.io.IOException => () }
            sock = null
          }
        }
        throw e
    }
  }

  /** True while the underlying socket is open (i.e. at least one
    * command has run and [[close]] has not).
    */
  def isConnected: Boolean = sockLock.synchronized {
    sock != null && !sock.isClosed
  }

  /** Reopenable close (the pre-terminal lifecycle): drops the current
    * socket; the next command reconnects. Never blocks on an in-flight
    * command — closing the socket ABORTS a read stuck on a hung peer.
    */
  def close(): Unit = sockLock.synchronized {
    if (sock != null) {
      try sock.close()
      catch { case _: java.io.IOException => () }
      sock = null
    }
  }

  /** Terminal close: like [[close]], but every subsequent execute
    * fails fast instead of reconnecting — what lets an owner complete
    * still-queued commands exceptionally after ITS shutdown.
    */
  def closeTerminally(): Unit = {
    sockLock.synchronized { closed = true }
    close()
  }
}
