package graft.client

import java.io.{BufferedOutputStream, IOException}
import java.net.Socket
import java.util.concurrent.ArrayBlockingQueue

/** The reference main loop's topology with the engine as the sink:
  * `database_peak_streaming.py` runs an `HCommTCPPeaksStreamer` into a
  * bounded asyncio queue consumed by a writer that lands batches in
  * SQLite (database_peak_streaming.py:108-117, queue `maxsize=5` at
  * line 109). This bridge is that reader→queue→writer pump with the
  * [[graft.sources.SocketLandingGateway]] as the durability boundary
  * instead of SQLite: a producer thread runs
  * [[InstrumentStreamer.streamData]] into the same bounded queue
  * shape, and the caller's thread re-frames each record to the
  * gateway, where the landing files feed the `graft-frames`
  * MicroBatchStream and the windowed pipeline — so every reference
  * component (client streamer, bounded hand-off, durable writer) has a
  * 1:1 counterpart wired end to end.
  *
  * The streamer parses nothing here (identity parser): the bridge
  * moves CONTENT bytes verbatim, and the gateway's own framing wraps
  * them for the landing files — what the frame stream decodes is
  * byte-identical to what the instrument pushed.
  */
final class StreamBridge(streamer: InstrumentStreamer[Array[Byte]],
    gatewayHost: String, gatewayPort: Int) {

  /** Pump until the stream ends or `maxFrames` records moved; returns
    * the count landed. Blocking — run on a thread of your own for the
    * reference's concurrent shape. The queue bound matches the
    * reference's `maxsize=5`, so a slow writer back-pressures the
    * reader exactly like the asyncio queue does.
    */
  def pump(maxFrames: Long = Long.MaxValue): Long = {
    require(maxFrames > 0)
    val queue = new ArrayBlockingQueue[Option[Array[Byte]]](5)
    val producer = new Thread(() => streamer.streamData(queue),
      "graft-bridge-reader")
    producer.setDaemon(true)
    producer.start()
    val sock = new Socket(gatewayHost, gatewayPort)
    val out = new BufferedOutputStream(sock.getOutputStream)
    var n = 0L
    var done = false
    try {
      while (!done) {
        queue.take() match {
          case Some(content) if n < maxFrames =>
            out.write(graft.ingest.CommandCodec
              .streamRecordHeader(content.length))
            out.write(content)
            n += 1
            if (n >= maxFrames) {
              streamer.stopStreaming()
              out.flush()
            }
          case Some(_) => () // past the cap: drain to the sentinel only
          case None => done = true
        }
      }
    } finally {
      try { out.flush(); sock.close() }
      catch { case _: IOException => () }
      streamer.stopStreaming()
      // a producer blocked in put on the full bounded queue cannot see
      // the stop flag — consume through to its sentinel so streamData
      // reaches its own finally (socket close); bounded in case the
      // producer already died
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var sentinel = done
      while (!sentinel && System.nanoTime() < deadline) {
        val e = queue.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (e != null && e.isEmpty) sentinel = true
      }
      producer.join(10000)
    }
    n
  }

  /** Stop an in-flight pump from another thread (the reference's
    * `loop.call_later(streaming_time, streamer.stop_streaming)`).
    */
  def stop(): Unit = streamer.stopStreaming()
}

object StreamBridge {
  /** A raw (identity-parser) streamer for bridging: `fast = true`
    * elides headers on fixed-length kinds (sensors/spectra), `false`
    * for peaks, whose record length follows the peak counts.
    */
  def raw(host: String, port: Int, fast: Boolean)
      : InstrumentStreamer[Array[Byte]] =
    new InstrumentStreamer[Array[Byte]](host, port, identity,
      fastStreaming = fast)
}
