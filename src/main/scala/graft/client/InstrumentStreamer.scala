package graft.client

import java.io.{BufferedInputStream, DataInputStream, IOException}
import java.net.Socket
import java.util.concurrent.BlockingQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.ingest.CommandCodec

/** Client-side stream consumer — the Scala equivalent of the
  * reference's `HCommTCPStreamer` family (hyperion.py:225-386): connect
  * to one of the instrument's streaming ports, read framed records in
  * a producer loop, parse each with the kind's data parser, and hand
  * the typed results to a consumer queue. `stopStreaming()` ends the
  * loop, which enqueues a final `None` sentinel — the reference's
  * `{'data': None}` end-of-stream marker (hyperion.py:308) — and
  * closes the connection.
  *
  * '''S8 — header-elision fast path''' (hyperion.py:267-272
  * `fast_streaming` / `_last_content_length`): records on a streaming
  * port are `8-byte BBHI read header + content`, and for a fixed-rate
  * kind every record has the SAME content length, so after the first
  * full header parse the client reads header+content in ONE buffered
  * read and skips re-parsing the header — `headerParses` stays at 1
  * for the remainder of the stream. The reference wires
  * `fast_streaming=True` for sensors and spectra (fixed-length
  * frames) and `False` for peaks, whose length moves with the
  * per-channel peak counts (hyperion.py:324-386); the typed factories
  * on the companion mirror that wiring.
  *
  * Threading: `streamData` runs the producer loop on the CALLER's
  * thread (the role `loop.create_task(streamer.stream_data())` plays
  * for the reference) — run it on a dedicated thread and consume the
  * queue elsewhere. `stopStreaming` may be called from any thread; the
  * loop notices at the next record boundary (the reference semantics:
  * data must flow for the stop flag to be observed, which it always
  * does on a live streaming port).
  */
final class InstrumentStreamer[T](host: String, port: Int,
    parser: Array[Byte] => T, fastStreaming: Boolean = false)
    extends AutoCloseable {

  @volatile private var streamActive = false
  private var socket: Socket = _
  private var in: DataInputStream = _
  // -1 = unknown; set after the first parsed header in fast mode
  private var lastContentLength = -1
  // over-read bytes pushed back by a fast-path resync (see below):
  // consumed before the socket by fill()
  private var pending: Array[Byte] = Array.emptyByteArray
  private var pendingOff = 0
  private val headerCount = new AtomicInteger
  private val frameCount = new AtomicLong

  /** How many read headers were PARSED (not skipped) — 1 for an entire
    * fast stream, one per record on the slow path.
    */
  def headerParses: Int = headerCount.get

  /** Records delivered to the queue so far. */
  def framesStreamed: Long = frameCount.get

  /** True while the producer loop runs. */
  def isStreaming: Boolean = streamActive

  private def connect(): Unit = synchronized {
    if (socket == null) {
      socket = new Socket(host, port)
      in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    }
  }

  /** Fill `buf[off, off+len)` from the pushback buffer first, then the
    * socket — how resync'd over-read bytes re-enter the stream.
    */
  private def fill(buf: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var remaining = len
    val avail = pending.length - pendingOff
    if (avail > 0) {
      val take = math.min(avail, remaining)
      System.arraycopy(pending, pendingOff, buf, o, take)
      pendingOff += take
      o += take
      remaining -= take
      if (pendingOff == pending.length) {
        pending = Array.emptyByteArray
        pendingOff = 0
      }
    }
    if (remaining > 0) in.readFully(buf, o, remaining)
  }

  private def boundsCheck(msgLen: Int, contentLen: Long): Int = {
    if (contentLen < 0 || msgLen < 0 ||
        contentLen > graft.sources.FrameDumpReader.MaxRecordBytes)
      throw new IOException(
        s"corrupt stream header: msg=$msgLen content=$contentLen")
    contentLen.toInt
  }

  /** Read and parse ONE record (`get_data`, hyperion.py:256-282): fast
    * path = one combined read with the 8 header bytes dropped
    * unparsed; slow path = parse the BBHI header, then read content.
    *
    * Unlike the reference, the fast path VALIDATES the length field of
    * the combined read (4 byte comparisons, not a parse): a stream
    * whose record length changes mid-flight — e.g. the spectrum
    * stream after `#setActiveFullSpectrumDutChannelNumbers` shrinks or
    * grows the channel set over the command port — would otherwise be
    * silently misframed from that record on. On a mismatch the record
    * is re-framed from the already-read bytes (reading more or pushing
    * back the surplus) and the fast length re-latches.
    */
  def getData(): T = {
    connect()
    if (lastContentLength >= 0) {
      val rec = new Array[Byte](8 + lastContentLength)
      fill(rec, 0, rec.length)
      val (msgLen, contentLenL) = CommandCodec.readHeaderLengths(rec)
      if (msgLen == 0 && contentLenL == lastContentLength.toLong)
        parser(java.util.Arrays.copyOfRange(rec, 8, rec.length))
      else resync(rec, msgLen, boundsCheck(msgLen, contentLenL))
    } else {
      val hdr = new Array[Byte](8)
      fill(hdr, 0, 8)
      headerCount.incrementAndGet()
      val (msgLen, contentLenL) = CommandCodec.readHeaderLengths(hdr)
      val contentLen = boundsCheck(msgLen, contentLenL)
      if (msgLen > 0) {
        val skip = new Array[Byte](msgLen)
        fill(skip, 0, msgLen) // streams carry no message; drop if present
      }
      val content = new Array[Byte](contentLen)
      fill(content, 0, contentLen)
      // the combined fast read assumes message_length == 0 (true on
      // streaming ports; the reference's single-read path makes the
      // same assumption, hyperion.py:268-270)
      if (fastStreaming && msgLen == 0) lastContentLength = contentLen
      parser(content)
    }
  }

  /** The stream's record shape changed under an elided read: re-frame
    * the record whose real lengths are (msgLen, contentLen) from the
    * `8 + old` bytes already in `rec`, then re-latch the fast length.
    */
  private def resync(rec: Array[Byte], msgLen: Int, contentLen: Int): T = {
    headerCount.incrementAndGet() // a genuine re-parse
    val total = 8 + msgLen + contentLen
    val full =
      if (total <= rec.length) rec
      else {
        val b = java.util.Arrays.copyOf(rec, total)
        fill(b, rec.length, total - rec.length)
        b
      }
    if (total < rec.length) {
      // over-read into the next record: push the surplus back. fill()
      // drained `pending` FIRST, so any unconsumed pending remainder
      // holds bytes that come AFTER `rec` on the stream — the surplus
      // must be PREPENDED to it, not replace it (two shrinks in quick
      // succession would otherwise drop the buffered tail and desync)
      val surplus = java.util.Arrays.copyOfRange(rec, total, rec.length)
      val remaining = pending.length - pendingOff
      if (remaining == 0) {
        pending = surplus
      } else {
        val merged = new Array[Byte](surplus.length + remaining)
        System.arraycopy(surplus, 0, merged, 0, surplus.length)
        System.arraycopy(pending, pendingOff, merged, surplus.length,
          remaining)
        pending = merged
      }
      pendingOff = 0
    }
    lastContentLength = if (msgLen == 0) contentLen else -1
    parser(java.util.Arrays.copyOfRange(full, 8 + msgLen, total))
  }

  /** Producer loop (`stream_data`, hyperion.py:284-312): `Some(data)`
    * per record until `stopStreaming()`, then the `None` sentinel.
    * A connection loss also ends the stream (sentinel still sent).
    */
  def streamData(queue: BlockingQueue[Option[T]]): Unit = {
    try {
      connect()
      streamActive = true
      while (streamActive) {
        val d = getData()
        queue.put(Some(d))
        frameCount.incrementAndGet()
      }
    } catch {
      // connection loss, a desynced read, a close() racing getData,
      // AND parser failures (CommandError on undecodable content) all
      // end the stream the same way — the sentinel in the finally must
      // land regardless, or a blocked consumer hangs forever
      case scala.util.control.NonFatal(_) => ()
    } finally {
      streamActive = false
      close() // release the socket FIRST — the sentinel can wait, fds can't
      // bounded: an ABANDONED bounded queue (consumer gone, queue
      // full) must not pin this thread forever; any live consumer
      // drains well within the bound
      queue.offer(None, 10, java.util.concurrent.TimeUnit.SECONDS)
      ()
    }
  }

  /** Flag the producer loop to stop at the next record boundary
    * (hyperion.py:314-320).
    */
  def stopStreaming(): Unit = streamActive = false

  override def close(): Unit = synchronized {
    streamActive = false
    if (socket != null) {
      try socket.close() catch { case _: IOException => () }
      socket = null
      in = null
    }
    // a reused instance must not carry a stale fast length or
    // pushback bytes into a NEW connection's stream
    lastContentLength = -1
    pending = Array.emptyByteArray
    pendingOff = 0
  }
}

object InstrumentStreamer {
  import graft.client.Instrument.{PeaksSnapshot, SensorsSnapshot, SpectrumSnapshot}

  /** `HCommTCPPeaksStreamer` (hyperion.py:344-361): peaks parser,
    * `fast_streaming=False` — peaks frame length moves with the
    * per-channel peak counts, so every header must be parsed.
    */
  def peaks(host: String, port: Int): InstrumentStreamer[PeaksSnapshot] =
    new InstrumentStreamer(host, port, Instrument.parsePeaks _,
      fastStreaming = false)

  /** `HCommTCPSensorStreamer` (hyperion.py:324-341): sensor parser,
    * `fast_streaming=True` (fixed-length frames).
    */
  def sensors(host: String, port: Int): InstrumentStreamer[SensorsSnapshot] =
    new InstrumentStreamer(host, port, Instrument.parseSensors _,
      fastStreaming = true)

  /** `HCommTCPSpectrumStreamer` (hyperion.py:364-386): spectrum parser
    * bound to the instrument's power calibration — the reference's
    * `partial(HACQSpectrumData.data_parser, powercal=powercal)` line —
    * `fast_streaming=True`.
    */
  def spectra(host: String, port: Int, powerCal: Seq[CommandCodec.PowerCal])
      : InstrumentStreamer[SpectrumSnapshot] =
    new InstrumentStreamer(host, port,
      (c: Array[Byte]) => Instrument.parseSpectrum(c, powerCal),
      fastStreaming = true)
}
