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

  /** Read and parse ONE record (`get_data`, hyperion.py:256-282): fast
    * path = one combined read with the 8 header bytes dropped
    * unparsed; slow path = parse the BBHI header, then read content.
    */
  def getData(): T = {
    connect()
    if (lastContentLength >= 0) {
      val rec = new Array[Byte](8 + lastContentLength)
      in.readFully(rec)
      parser(java.util.Arrays.copyOfRange(rec, 8, rec.length))
    } else {
      val hdr = new Array[Byte](8)
      in.readFully(hdr)
      headerCount.incrementAndGet()
      val messageLen = (hdr(2) & 0xFF) | ((hdr(3) & 0xFF) << 8)
      val contentLen = (hdr(4) & 0xFF) | ((hdr(5) & 0xFF) << 8) |
        ((hdr(6) & 0xFF) << 16) | ((hdr(7) & 0xFF) << 24)
      if (contentLen < 0)
        throw new IOException(s"corrupt stream header: length $contentLen")
      if (messageLen > 0) in.skipNBytes(messageLen.toLong)
      val content = new Array[Byte](contentLen)
      in.readFully(content)
      // the combined fast read assumes message_length == 0 (true on
      // streaming ports; the reference's single-read path makes the
      // same assumption, hyperion.py:268-270)
      if (fastStreaming && messageLen == 0) lastContentLength = contentLen
      parser(content)
    }
  }

  /** Producer loop (`stream_data`, hyperion.py:284-312): `Some(data)`
    * per record until `stopStreaming()`, then the `None` sentinel.
    * A connection loss also ends the stream (sentinel still sent).
    */
  def streamData(queue: BlockingQueue[Option[T]]): Unit = {
    connect()
    streamActive = true
    try {
      while (streamActive) {
        val d = getData()
        queue.put(Some(d))
        frameCount.incrementAndGet()
      }
    } catch {
      case _: IOException => () // connection lost or closed under us
    }
    streamActive = false
    queue.put(None)
    close()
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
