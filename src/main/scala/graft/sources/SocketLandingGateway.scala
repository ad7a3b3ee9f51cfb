package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

/** TCP → landing-dir gateway: the live transport in front of the
  * `graft-frames` MicroBatchStream, closing the loop with the
  * reference's socket producer (ref: hyperion.py:284-312 `stream_data`
  * loop, record framing hyperion.py:266-279 — an 8-byte BBHI header of
  * status/u16 message-length/u32 content-length, then message+content).
  *
  * An instrument pushes the framed byte stream over TCP; the gateway
  * re-frames it record-by-record and lands IMMUTABLE, lexicographically
  * increasing dump files (write-hidden-temp → atomic rename), which is
  * exactly the landing contract [[FrameMicroBatchStream]] tails. Spark
  * never talks to the socket: the gateway is the durability boundary
  * (frames on disk survive a Spark restart; offsets stay replayable),
  * the same split the reference has between its socket reader thread
  * and the SQLite writer (database_peak_streaming.py:109).
  *
  * Flush policy: a file rolls at `maxFramesPerFile` records, or at the
  * first record that arrives `flushMs` after the previous flush — a
  * trickling (10 Hz-style) producer lands small frequent files, a fast
  * bulk producer lands full ones. A connection's tail is flushed on
  * close/EOF. An idle-open connection can hold its last partial file
  * until the next record arrives; `flushMs` bounds staleness only while
  * records flow (no timer thread — record arrival drives the clock).
  *
  * Concurrency: any number of producer connections; each buffers its
  * own records, and file-sequence assignment happens INSIDE the rename
  * lock so visible names are strictly increasing even when connections
  * race (a later-named file can never appear before an earlier one).
  *
  * Scale: the gateway is a single-node transport adapter (one per
  * instrument/edge site), not a distributed component — the distributed
  * part is the landing dir + MicroBatchStream behind it. Per-record
  * work is two array copies; a corrupt header (unresyncable — records
  * carry no markers) terminates that connection after flushing its
  * buffered frames, mirroring the dump reader's stop-clean semantics.
  */
/** @param onContent optional live mirror invoked with each record's
  *   CONTENT bytes (the frame) as it arrives — how the one-shot
  *   snapshot surface ([[InstrumentResponder.setCurrentPeaksFrame]])
  *   tracks the current frame, exactly like the reference instrument
  *   where `#GetPeaks` serves whatever the stream last produced. The
  *   mirror is best-effort control-plane state: it runs BEFORE the
  *   durable land (latest-frame semantics want immediacy), and a
  *   throwing mirror is swallowed — it must never take down the
  *   data-plane connection.
  */
class SocketLandingGateway(landingDir: String,
                           maxFramesPerFile: Int = 10000,
                           flushMs: Long = 200L,
                           onContent: Array[Byte] => Unit =
                             SocketLandingGateway.NoMirror) {
  // skip the per-record content copy entirely when no mirror is wired —
  // the ingest loop is the hot path
  private val mirrorEnabled =
    onContent ne SocketLandingGateway.NoMirror
  require(maxFramesPerFile > 0)
  private val server = new ServerSocket(0) // ephemeral port
  @volatile private var running = true
  private val landed = new AtomicLong(0L)
  private val fileSeq = new AtomicLong(0L)
  private val renameLock = new Object
  private var acceptThread: Thread = _

  /** The bound (ephemeral) port producers connect to. */
  def port: Int = server.getLocalPort

  /** Total frames durably landed (files renamed visible). */
  def framesLanded: Long = landed.get

  def start(): SocketLandingGateway = {
    Files.createDirectories(Paths.get(landingDir))
    acceptThread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => handle(sock), "graft-gateway-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: SocketException => () // server closed by stop()
        }
      }
    }, "graft-gateway-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()
    this
  }

  def stop(): Unit = {
    running = false
    server.close()
    acceptThread.join(2000)
  }

  /** One producer connection: re-frame the byte stream into records,
    * roll landing files per the flush policy.
    */
  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val buf = ArrayBuffer.empty[Array[Byte]]
    var lastFlush = System.nanoTime()
    def flush(): Unit = if (buf.nonEmpty) {
      writeLanding(buf)
      landed.addAndGet(buf.size.toLong)
      buf.clear()
      lastFlush = System.nanoTime()
    }
    try {
      val hdr = new Array[Byte](8)
      var done = false
      while (!done && running) {
        try in.readFully(hdr)
        catch { case _: EOFException => done = true }
        if (!done) {
          val (messageLen, contentLen) =
            graft.ingest.CommandCodec.readHeaderLengths(hdr)
          if (contentLen < 0 || contentLen > FrameDumpReader.MaxRecordBytes)
            done = true // corrupt header: flush what we have, drop conn
          else {
            val rec = new Array[Byte](8 + messageLen + contentLen.toInt)
            System.arraycopy(hdr, 0, rec, 0, 8)
            in.readFully(rec, 8, rec.length - 8)
            if (mirrorEnabled)
              try onContent(java.util.Arrays.copyOfRange(rec,
                8 + messageLen, rec.length))
              catch { // mirror never kills data, but fatal errors and
                      // interruption must still propagate/register
                case _: InterruptedException =>
                  Thread.currentThread().interrupt()
                case scala.util.control.NonFatal(_) => ()
              }
            buf += rec
            if (buf.size >= maxFramesPerFile ||
                (System.nanoTime() - lastFlush) / 1000000 >= flushMs)
              flush()
          }
        }
      }
    } catch {
      case _: SocketException => () // producer vanished: land the tail
    } finally {
      flush()
      try sock.close() catch { case _: Throwable => () }
    }
  }

  // (companion holds the shared default so the hot loop can detect
  // "no mirror wired" by reference)

  /** Land one file: write a hidden temp (the source ignores `.`/`_`
    * prefixes), then assign the sequence number and atomically rename
    * INSIDE the lock — names become visible strictly in order.
    */
  private def writeLanding(records: Iterable[Array[Byte]]): Unit = {
    val tmp = Paths.get(landingDir,
      s".gw-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val os = Files.newOutputStream(tmp)
    try records.foreach(os.write)
    finally os.close()
    renameLock.synchronized {
      val seq = fileSeq.getAndIncrement()
      Files.move(tmp, Paths.get(landingDir, f"part-gw-$seq%010d.bin"),
        StandardCopyOption.ATOMIC_MOVE)
    }
  }
}

object SocketLandingGateway {
  /** Shared no-op default for `onContent` — reference-compared by the
    * ingest loop to skip the per-record content copy when unused.
    */
  val NoMirror: Array[Byte] => Unit = _ => ()
}
