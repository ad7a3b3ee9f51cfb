package graft.client

import java.net.Socket
import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.CommandCodec.PeakOffsets
import graft.model.InstrumentConfig
import graft.sources.{FrameDump, InstrumentResponder, SocketLandingGateway}

/** The reference's `AsyncHyperion` lifecycle (hyperion.py:1333-1955):
  * ONE persistent command connection serving many requests, usable
  * while data streams concurrently — against the same live responder
  * the per-command client talks to, with identical typed results.
  * Pure socket work, no Spark.
  */
class AsyncInstrumentSpec extends AnyFunSuite {

  private def await[T](f: Future[T]): T = Await.result(f, 30.seconds)

  test("≥10 mixed commands share ONE connection and match the " +
      "per-command client result for result") {
    val r = new InstrumentResponder().start()
    val a = new AsyncInstrument("127.0.0.1", r.port)
    try {
      assert(!a.isConnected) // lazy connect, like hyperion.py:177-178
      // 14 mixed get/set/compute commands down the one connection
      assert(await(a.getSerialNumber) == InstrumentConfig.Serial)
      assert(await(a.getFirmwareVersion) == InstrumentConfig.FirmwareVersion)
      assert(await(a.getFpgaVersion) == InstrumentConfig.FpgaVersion)
      assert(await(a.getIsReady))
      assert(await(a.getChannelCount) == InstrumentConfig.ChannelCount)
      assert(await(a.getPowerCal) == InstrumentConfig.PowerCalibration)
      await(a.setInstrumentName("async-rig"))
      assert(await(a.getInstrumentName) == "async-rig")
      await(a.setLaserScanSpeed(1000))
      assert(await(a.getLaserScanSpeed) == 1000)
      await(a.setPeakOffsetsInCounts(3, PeakOffsets(Seq(2000), Seq(55L))))
      assert(await(a.getPeakOffsets(3)) ==
        PeakOffsets(Seq(2000), Seq(55L)))
      val wls = Seq(1501.5, 1503.0)
      assert(await(a.convertCountsToWavelengths(
        await(a.convertWavelengthsToCounts(wls))))
        .zip(wls).forall { case (x, y) => math.abs(x - y) < 1e-9 })
      assert(a.isConnected)
      assert(r.connectionsSeen == 1, s"saw ${r.connectionsSeen} connections")

      // the sync client opens a fresh socket per command and decodes
      // to the same typed results over the same dispatch surface
      val h = new Instrument("127.0.0.1", r.port)
      val before = r.connectionsSeen
      assert(h.serialNumber == InstrumentConfig.Serial)
      assert(h.instrumentName == "async-rig")
      assert(h.getPeakOffsets(3) == await(a.getPeakOffsets(3)))
      assert(r.connectionsSeen == before + 3) // 1 socket per command
      assert(r.connectionsSeen >= 4)
      // still the async client's single connection throughout
      assert(await(a.getInstrumentName) == "async-rig")
    } finally { a.close(); r.stop() }
  }

  test("concurrent callers serialize on the wire in submission order") {
    val r = new InstrumentResponder().start()
    val a = new AsyncInstrument("127.0.0.1", r.port)
    try {
      // 32 futures issued without awaiting in between: request/response
      // pairs must never interleave, and all land on one connection
      val names = (0 until 16).map(i => s"rig-$i")
      val sets = names.map(n => a.setInstrumentName(n))
      val readback = a.getInstrumentName
      sets.foreach(await(_))
      // last set wins — proves submission-order execution
      assert(await(a.getInstrumentName) == "rig-15")
      await(readback) // issued before the final reads, still valid ascii
      assert(r.connectionsSeen == 1)
    } finally { a.close(); r.stop() }
  }

  test("commands flow while peaks stream through the gateway " +
      "concurrently, and the snapshot tracks the live stream") {
    val dir = Files.createTempDirectory("graft_async_stream").toString
    val resp = new InstrumentResponder().start()
    val gw = new SocketLandingGateway(dir,
      onContent = b => { resp.setCurrentPeaksFrame(b); () }).start()
    val a = new AsyncInstrument("127.0.0.1", resp.port)
    try {
      val sock = new Socket("127.0.0.1", gw.port)
      val os = sock.getOutputStream
      def push(serial: Long, ts: Long): Unit = {
        val arr = (a: Array[Int]) =>
          new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
        os.write(FrameDump.record(graft.ingest.FrameCodec.encodePeaksBytes(
          serial, ts, 0L, arr(Array(1, 1)),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            Array(serial.toDouble, serial.toDouble + 10)))))
        os.flush()
      }
      // interleave: stream a frame, command, stream, command, ...
      for (i <- 0 until 10) {
        push(500L + i, 1700001000L + i)
        val deadline = System.nanoTime() + 10L * 1000000000L
        while (gw.framesLanded < i + 1 && System.nanoTime() < deadline)
          Thread.sleep(10)
        // a command round-trips on the persistent connection while the
        // stream socket is open and mid-flight
        assert(await(a.getIsReady))
        assert(await(a.getPeaks).serialNumber == 500L + i)
      }
      sock.close()
      assert(resp.connectionsSeen == 1)
    } finally { a.close(); gw.stop(); resp.stop() }
  }

  test("the persistent connection reconnects after close and survives " +
      "an instrument reboot") {
    val r = new InstrumentResponder().start()
    val a = new AsyncInstrument("127.0.0.1", r.port)
    try {
      assert(await(a.getIsReady))
      await(a.addSensor("tmp_a", "os7510", 1, 1510.0, 0.25))
      await(a.addSensor("tmp_b", "os7520", 2, 1520.0, 0.5))
      assert(await(a.getSensorNames).count(_.startsWith("tmp_")) == 2)
      // remove_sensors(None) removes ALL sensors (hyperion.py:1933-1948)
      await(a.removeSensors())
      assert(await(a.getSensorNames).isEmpty)
      await(a.reboot())
      assert(r.rebootsSeen == 1)
      // reboot restored the saved snapshot; same client keeps working
      assert(await(a.getSensorNames).nonEmpty)
    } finally { a.close(); r.stop() }
  }

  test("close() against a HUNG peer is bounded, aborts the stuck " +
      "read, and completes every queued Future exceptionally") {
    // a server that accepts and reads but never responds — the
    // half-open shape interrupt-insensitive socket reads cannot escape
    val srv = new java.net.ServerSocket(0)
    val acceptor = new Thread(() => {
      try {
        val sock = srv.accept()
        while (sock.getInputStream.read() >= 0) () // consume forever
      } catch { case _: java.io.IOException => () }
    }, "spec-hung-server")
    acceptor.setDaemon(true)
    acceptor.start()
    val a = new AsyncInstrument("127.0.0.1", srv.getLocalPort)
    try {
      val inflight = a.getSerialNumber   // blocks in readResponse
      val queued = a.getFirmwareVersion  // waits behind it forever
      Thread.sleep(300) // let the first command reach the wire
      val t0 = System.nanoTime()
      a.close()
      val closeSec = (System.nanoTime() - t0) / 1e9
      assert(closeSec < 20, f"close took $closeSec%.1f s")
      // both Futures COMPLETE (exceptionally) — nothing hangs a waiter
      import scala.concurrent.Await
      import scala.concurrent.duration._
      assert(scala.util.Try(Await.result(inflight, 10.seconds)).isFailure)
      assert(scala.util.Try(Await.result(queued, 10.seconds)).isFailure)
      assert(!a.isConnected)
    } finally srv.close()
  }

  test("the persistent connection invalidates a peer-dropped socket " +
      "and reconnects on the next command") {
    import graft.ingest.CommandCodec
    // a server that answers ONE command per connection then drops TCP
    // — the real-reboot/network-blip shape the sim responder (which
    // keeps connections open) never exercises
    val srv = new java.net.ServerSocket(0)
    val accepted = new java.util.concurrent.atomic.AtomicInteger
    val acceptor = new Thread(() => {
      while (!srv.isClosed) {
        try {
          val sock = srv.accept()
          accepted.incrementAndGet()
          CommandCodec.readRequest(sock.getInputStream).foreach { req =>
            sock.getOutputStream.write(CommandCodec.encodeResponse(
              CommandCodec.Response(CommandCodec.Success, 0, "",
                req.command.getBytes("US-ASCII"))))
            sock.getOutputStream.flush()
          }
          sock.close() // drop after one round-trip
        } catch { case _: java.io.IOException => () }
      }
    }, "spec-dropping-server")
    acceptor.setDaemon(true)
    acceptor.start()
    val c = new PersistentConnection("127.0.0.1", srv.getLocalPort)
    try {
      assert(new String(c.execute("#one").content, "US-ASCII") == "#one")
      // the peer has closed its side; isClosed is still false locally,
      // so without invalidation this second command would write into
      // the dead stream and fail forever — the transport must notice
      // the failure, drop the stale socket, and reconnect cleanly
      val second =
        try new String(c.execute("#two").content, "US-ASCII")
        catch { case _: Throwable =>
          new String(c.execute("#two").content, "US-ASCII")
        }
      assert(second == "#two")
      assert(accepted.get >= 2, "never reconnected")
      // and the connection keeps working afterwards
      val third =
        try new String(c.execute("#three").content, "US-ASCII")
        catch { case _: Throwable =>
          new String(c.execute("#three").content, "US-ASCII")
        }
      assert(third == "#three")
    } finally { c.close(); srv.close() }
  }
}
