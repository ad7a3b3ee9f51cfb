package graft.client

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.InstrumentConfig
import graft.sources.InstrumentResponder

/** S8 — the reference's client-side streamers (`HCommTCPStreamer`
  * family, hyperion.py:225-386) against the responder's live streaming
  * ports: slow-path and fast-path (`fast_streaming` header-elision,
  * hyperion.py:267-272) reads must yield identical typed frames, the
  * fast path must parse exactly ONE header for the whole stream, the
  * stop flag must land the `None` sentinel, and the command port's
  * snapshot must cohere with the last streamed frame. Pure socket
  * work, no Spark.
  */
class InstrumentStreamerSpec extends AnyFunSuite {

  private def drain[T](s: InstrumentStreamer[T], n: Int): Seq[T] = {
    val q = new LinkedBlockingQueue[Option[T]]()
    val t = new Thread(() => s.streamData(q), "spec-streamer")
    t.setDaemon(true)
    t.start()
    val out = Seq.fill(n) {
      val e = q.poll(10, TimeUnit.SECONDS)
      assert(e != null, "timed out waiting for a streamed frame")
      assert(e.isDefined, "premature end-of-stream sentinel")
      e.get
    }
    s.stopStreaming()
    // frames keep flowing, so the loop notices the flag and lands the
    // sentinel (possibly after a few more Some frames already queued)
    var sentinel = false
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!sentinel && System.nanoTime() < deadline) {
      val e = q.poll(10, TimeUnit.SECONDS)
      if (e != null && e.isEmpty) sentinel = true
    }
    assert(sentinel, "stopStreaming never produced the None sentinel")
    t.join(10000)
    assert(!t.isAlive)
    out
  }

  test("peaks streamer: successive frames follow the synth recipe and " +
      "every header is parsed (fast_streaming=False, hyperion.py:360)") {
    val r = new InstrumentResponder().start()
    try {
      val s = InstrumentStreamer.peaks("127.0.0.1", r.streamPeaksPort)
      val frames = drain(s, 8)
      // serials strictly consecutive from the connection's base
      val base = frames.head.serialNumber
      assert(frames.map(_.serialNumber) == (base until base + 8))
      // each frame is the FrameSource peaks recipe for its ordinal:
      // 1 peak per port, values cents+i·100 split 1 per channel slice
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(f.channelSlices.length == 8)
        assert(f.channelSlices.forall(_.length == 1))
        val cents = f.channelSlices.head.head
        assert(f.channelSlices.flatten ==
          (0 until 8).map(cents + _ * 100.0))
        assert(f.apply(2) == Seq(cents + 100.0)) // 1-based getitem
        ()
      }
      // slow path: one parsed header per record (8 drained + however
      // many more were read before the stop flag landed)
      assert(s.headerParses >= 8)
      assert(s.headerParses >= s.framesStreamed)
    } finally r.stop()
  }

  test("sensor streamer fast path: ONE parsed header for the whole " +
      "stream, frames identical to a slow-path read (S8)") {
    val r = new InstrumentResponder().start()
    try {
      val fast = InstrumentStreamer.sensors("127.0.0.1", r.streamSensorsPort)
      val fastFrames = drain(fast, 10)
      assert(fast.framesStreamed >= 10)
      assert(fast.headerParses == 1,
        s"fast path parsed ${fast.headerParses} headers for " +
          s"${fast.framesStreamed} frames")

      // a slow-path consumer of the same port sees the same typed
      // stream shape (fresh connection restarts the per-connection
      // ordinal, so align on the recipe, not the absolute serial)
      val slow = new InstrumentStreamer("127.0.0.1", r.streamSensorsPort,
        Instrument.parseSensors _, fastStreaming = false)
      val slowFrames = drain(slow, 10)
      assert(slow.headerParses >= 10)
      def shape(f: Instrument.SensorsSnapshot) =
        (f.status, f.bufferPct, f.values.map(_ - f.values.head))
      assert(fastFrames.map(shape) == slowFrames.map(shape))
      // per-frame values follow the sensor recipe: cents+k·1000
      fastFrames.foreach { f =>
        assert(f.values.length == 4)
        assert(f.values.map(_ - f.values.head) ==
          (0 until 4).map(_ * 1000.0))
        ()
      }
    } finally r.stop()
  }

  test("spectrum streamer applies the power calibration like the " +
      "snapshot facade, and the snapshot mirrors the live stream") {
    val r = new InstrumentResponder().start()
    try {
      val h = new Instrument("127.0.0.1", r.port)
      // calibration fetched over the command port and bound into the
      // parser — the reference's partial(powercal=...) wiring
      val s = InstrumentStreamer.spectra("127.0.0.1", r.streamSpectraPort,
        h.powerCal)
      val frames = drain(s, 6)
      assert(s.headerParses == 1) // fast_streaming=True
      val cal = InstrumentConfig.PowerCalibration
      frames.foreach { f =>
        assert(f.spectra.keySet ==
          InstrumentConfig.ActiveFullSpectrumChannelsDefault.toSet)
        assert(f.numPoints == 16)
        assert(f.wavelengths.head == 1500.0)
        // dBm = raw·(1/scale)+offset for the frame's own channels
        f.spectra.foreach { case (ch, dbm) =>
          val c = cal(ch - 1)
          dbm.foreach { v =>
            val raw = math.rint((v - c.offset) * c.scale)
            assert(raw >= 0 && raw < 65536,
              s"value $v does not invert to a u16 raw under cal $c")
          }
        }
        ()
      }
      // live coherence: the command port's #GetSpectrum snapshot is
      // the LAST streamed frame (the responder mirrors every pushed
      // frame, like the reference instrument)
      val snap = h.spectra
      assert(snap.serialNumber >= frames.last.serialNumber)
      assert(snap.spectra.keySet == frames.last.spectra.keySet)
    } finally r.stop()
  }

  test("fast-path resync: a record-length change mid-stream (channel " +
      "set edited over the command port) re-frames instead of " +
      "misparsing — both shrink (pushback) and grow (read-more)") {
    val r = new InstrumentResponder().start()
    try {
      val h = new Instrument("127.0.0.1", r.port)
      val s = InstrumentStreamer.spectra("127.0.0.1", r.streamSpectraPort,
        h.powerCal)
      val q = new LinkedBlockingQueue[Option[Instrument.SpectrumSnapshot]]()
      val t = new Thread(() => s.streamData(q), "spec-resync-streamer")
      t.setDaemon(true)
      t.start()
      def take(): Instrument.SpectrumSnapshot = {
        val e = q.poll(10, TimeUnit.SECONDS)
        assert(e != null && e.isDefined, "stream ended early")
        e.get
      }
      def drainUntil(nCh: Int): Instrument.SpectrumSnapshot = {
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        var f = take()
        while (f.spectra.size != nCh && System.nanoTime() < deadline)
          f = take()
        assert(f.spectra.size == nCh,
          s"never saw a $nCh-channel frame after the channel-set edit")
        f
      }
      val full = InstrumentConfig.ActiveFullSpectrumChannelsDefault
      assert(take().spectra.keySet == full.toSet)
      assert(s.headerParses == 1)
      // SHRINK the channel set: records get smaller, so the elided
      // read over-reads into the next record — the pushback path
      h.setActiveFullSpectrumChannelNumbers(Seq(1, 2))
      val small = drainUntil(2)
      assert(small.spectra.keySet == Set(1, 2))
      // GROW back: records get bigger — the read-more path
      h.setActiveFullSpectrumChannelNumbers(full)
      val big = drainUntil(full.size)
      assert(big.spectra.keySet == full.toSet)
      // frames on both sides of each resync decoded cleanly, and the
      // re-latched fast path went back to eliding headers: exactly one
      // extra parse per shape change
      assert(s.headerParses == 3, s"parsed ${s.headerParses} headers")
      s.stopStreaming()
      t.join(10000)
    } finally r.stop()
  }

  test("two shape-shrinks in quick succession: the second resync " +
      "PREPENDS its surplus to the unconsumed pushback (byte-exact " +
      "drain, no drops)") {
    // deterministic wire: one 64-byte record, two 8-byte records, six
    // 4-byte records — the first elided read (latched at 64) spans the
    // whole first transition AND part of the second, so the second
    // resync fires while the pushback buffer still holds bytes
    import graft.ingest.CommandCodec
    def rec(id: Int, len: Int): Array[Byte] =
      CommandCodec.streamRecordHeader(len) ++
        Array.tabulate[Byte](len)(j => (id * 16 + j).toByte)
    val expected =
      Seq(rec(1, 64), rec(2, 8), rec(3, 8)) ++
        (4 to 9).map(rec(_, 4))
    val srv = new java.net.ServerSocket(0)
    val pusher = new Thread(() => {
      val sock = srv.accept()
      val out = sock.getOutputStream
      expected.foreach(out.write)
      out.flush() // keep the socket open: the client drains at will
      Thread.sleep(60000)
    }, "spec-shrink-pusher")
    pusher.setDaemon(true)
    pusher.start()
    try {
      val s = new InstrumentStreamer[Array[Byte]]("127.0.0.1",
        srv.getLocalPort, identity, fastStreaming = true)
      val got = (1 to expected.size).map(_ => s.getData().toSeq)
      assert(got == expected.map(_.drop(8).toSeq),
        "stream bytes dropped or misframed across the double shrink")
      // slow first parse + one genuine re-parse per shape change
      assert(s.headerParses == 3, s"parsed ${s.headerParses} headers")
      s.close()
    } finally srv.close()
  }

  test("a parser failure ends the stream WITH the end-of-stream " +
      "sentinel (consumer never hangs)") {
    // a raw server that frames one undecodable record: valid BBHI
    // header, garbage content the spectrum parser rejects
    val srv = new java.net.ServerSocket(0)
    val pusher = new Thread(() => {
      val sock = srv.accept()
      val out = sock.getOutputStream
      val content = Array.fill[Byte](5)(0x7F)
      out.write(graft.ingest.CommandCodec.streamRecordHeader(content.length))
      out.write(content); out.flush()
    }, "spec-garbage-pusher")
    pusher.setDaemon(true)
    pusher.start()
    try {
      val s = InstrumentStreamer.spectra("127.0.0.1", srv.getLocalPort,
        InstrumentConfig.PowerCalibration)
      val q = new LinkedBlockingQueue[Option[Instrument.SpectrumSnapshot]]()
      val t = new Thread(() => s.streamData(q), "spec-garbage-streamer")
      t.setDaemon(true)
      t.start()
      val e = q.poll(10, TimeUnit.SECONDS)
      assert(e != null, "no sentinel after a parser failure")
      assert(e.isEmpty, "garbage content must not produce a frame")
      t.join(10000)
      assert(!t.isAlive)
      assert(!s.isStreaming)
    } finally srv.close()
  }

  test("streamers run concurrently with the persistent command client " +
      "on one instrument (the AsyncHyperion use-case)") {
    val r = new InstrumentResponder().start()
    val a = new AsyncInstrument("127.0.0.1", r.port)
    try {
      val s = InstrumentStreamer.peaks("127.0.0.1", r.streamPeaksPort)
      val q = new LinkedBlockingQueue[Option[Instrument.PeaksSnapshot]]()
      val t = new Thread(() => s.streamData(q), "spec-concurrent-streamer")
      t.setDaemon(true)
      t.start()
      import scala.concurrent.Await
      import scala.concurrent.duration._
      // commands answer while frames flow
      assert(Await.result(a.getSerialNumber, 30.seconds) ==
        InstrumentConfig.Serial)
      assert(Await.result(a.getIsReady, 30.seconds))
      val f = q.poll(10, TimeUnit.SECONDS)
      assert(f != null && f.isDefined)
      assert(Await.result(a.getChannelCount, 30.seconds) ==
        InstrumentConfig.ChannelCount)
      s.stopStreaming()
      t.join(10000)
    } finally { a.close(); r.stop() }
  }
}
