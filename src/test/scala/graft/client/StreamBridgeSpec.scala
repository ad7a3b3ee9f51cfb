package graft.client

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{InstrumentResponder, SocketLandingGateway}

/** The reference's whole main-loop topology, component for component
  * (database_peak_streaming.py:108-117): instrument streaming port →
  * client streamer → bounded queue → durable writer — with the landing
  * gateway as the writer and the `graft-frames` source reading the
  * result. Byte fidelity end to end: what the instrument pushed is
  * what the engine decodes.
  */
class StreamBridgeSpec extends SparkSpec {

  test("instrument stream → client streamer → bounded queue → gateway " +
      "→ graft-frames scan: bytes land verbatim, serials consecutive") {
    val r = new InstrumentResponder().start()
    val dir = Files.createTempDirectory("graft-bridge").toString
    val gw = new SocketLandingGateway(dir, maxFramesPerFile = 10).start()
    try {
      val bridge = new StreamBridge(
        StreamBridge.raw("127.0.0.1", r.streamPeaksPort, fast = false),
        "127.0.0.1", gw.port)
      val pumped = bridge.pump(maxFrames = 25)
      assert(pumped == 25)
      // the pump closed its gateway connection, which flushes the tail
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (gw.framesLanded < 25 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(gw.framesLanded == 25, s"landed ${gw.framesLanded}")

      // engine-side read of the landed stream: every pushed frame
      // decodes, serials are the responder's consecutive per-connection
      // ordinals, and the peak values follow the synth recipe
      val df = spark.read.format("graft-frames")
        .option("kind", "peaks").load(dir)
        .select(col("serial_number").cast("long").as("sn"),
          col("peaks"))
      assert(df.count() == 25)
      val sns = df.select(col("sn")).collect().map(_.getLong(0)).sorted
      assert(sns.head + 24 == sns.last)
      assert(sns.distinct.length == 25)
      val row = df.orderBy(col("sn")).head()
      val peaks = row.getSeq[Double](1)
      assert(peaks.length == 8)
      assert(peaks.zipWithIndex.forall { case (p, i) =>
        p == peaks.head + i * 100.0
      })
    } finally {
      gw.stop()
      r.stop()
    }
  }

  test("a dying gateway connection ends the pump cleanly: producer " +
      "thread exits, streamer socket released, error surfaced") {
    val r = new InstrumentResponder().start()
    // a "gateway" that accepts and immediately drops the connection —
    // the pump's writes fail once the RST lands
    val srv = new java.net.ServerSocket(0)
    val dropper = new Thread(() => {
      try srv.accept().close() catch { case _: java.io.IOException => () }
    }, "spec-dropping-gateway")
    dropper.setDaemon(true)
    dropper.start()
    try {
      val streamer =
        StreamBridge.raw("127.0.0.1", r.streamSensorsPort, fast = true)
      val bridge = new StreamBridge(streamer, "127.0.0.1", srv.getLocalPort)
      @volatile var err: Throwable = null
      val t = new Thread(() => {
        try { bridge.pump(); () } catch { case e: Throwable => err = e }
      }, "spec-failing-pump")
      t.setDaemon(true)
      t.start()
      t.join(30000)
      assert(!t.isAlive, "pump never terminated after the sink died")
      assert(err != null, "pump swallowed the sink failure")
      // the producer was unblocked and ran to ITS cleanup: the
      // instrument-side socket is released, not leaked
      assert(!streamer.isStreaming)
    } finally {
      srv.close()
      r.stop()
    }
  }

  test("stop() from another thread ends an unbounded pump with the " +
      "tail landed (the reference's call_later shutdown)") {
    val r = new InstrumentResponder().start()
    val dir = Files.createTempDirectory("graft-bridge2").toString
    val gw = new SocketLandingGateway(dir).start()
    try {
      val bridge = new StreamBridge(
        StreamBridge.raw("127.0.0.1", r.streamSensorsPort, fast = true),
        "127.0.0.1", gw.port)
      @volatile var pumped = -1L
      val t = new Thread(() => pumped = bridge.pump(), "spec-pump")
      t.setDaemon(true)
      t.start()
      // let some frames flow, then stop like call_later would
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (gw.framesLanded < 5 && System.nanoTime() < deadline)
        Thread.sleep(10)
      bridge.stop()
      t.join(10000)
      assert(!t.isAlive, "pump never stopped")
      assert(pumped >= 5)
      val landedDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (gw.framesLanded < pumped && System.nanoTime() < landedDeadline)
        Thread.sleep(20)
      assert(gw.framesLanded == pumped,
        s"landed ${gw.framesLanded} of $pumped pumped")
    } finally {
      gw.stop()
      r.stop()
    }
  }
}
