package graft.sources

import java.net.Socket
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.ingest.FrameCodec

/** End-to-end live transport: frames pushed over a REAL TCP socket land
  * as immutable dump files via [[SocketLandingGateway]] and flow through
  * the `graft-frames` MicroBatchStream into the full PeakStreaming
  * pipeline — the reference's socket producer loop
  * (hyperion.py:284-312) closed end to end.
  */
class SocketGatewaySpec extends SparkSpec {
  import spark.implicits._

  private def encodedPeaks(id: Long, tsSec: Long): Array[Byte] =
    Seq(id).toDF("s")
      .select(FrameCodec.encodePeaks(col("s"), lit(tsSec), col("s"),
        array(lit(1), lit(1)),
        array(col("s").cast("double"), col("s").cast("double") + 10)))
      .as[Array[Byte]].head()

  private def awaitLanded(gw: SocketLandingGateway, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (gw.framesLanded < n && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(gw.framesLanded == n, s"landed ${gw.framesLanded}, want $n")
  }

  test("gateway mirrors the current frame to the snapshot surface: " +
      "#GetPeaks serves the last streamed frame") {
    val dir = Files.createTempDirectory("graft_gateway_snap").toString
    val resp = new InstrumentResponder().start()
    val gw = new SocketLandingGateway(dir,
      onContent = b => { resp.setCurrentPeaksFrame(b); () }).start()
    try {
      val sock = new Socket("127.0.0.1", gw.port)
      val os = sock.getOutputStream
      for (i <- 0 until 5)
        os.write(FrameDump.record(encodedPeaks(100L + i, 1700000000L + i)))
      os.flush(); sock.close()
      awaitLanded(gw, 5)
      // the command port now answers with frame 104 — decoded by the
      // same client parser, byte-identical to the streamed frame
      val h = new graft.client.Instrument("127.0.0.1", resp.port)
      val p = h.peaks
      assert(p.serialNumber == 104L)
      assert(p.timestampInt == 1700000004L)
      assert(p.channelSlices == Seq(Seq(104.0), Seq(114.0)))
      // a poison frame is refused and the snapshot stays intact
      assert(!resp.setCurrentPeaksFrame(Array[Byte](1, 2, 3)))
      assert(h.peaks.serialNumber == 104L)
    } finally { gw.stop(); resp.stop() }
  }

  test("gateway mirrors the sensor stream to the snapshot surface: " +
      "#GetSensors serves the last streamed sensor frame") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def encodedSensor(id: Long, tsSec: Long): Array[Byte] =
      FrameCodec.encodeSensorBytes(0, 50, id, tsSec, 0,
        new GenericArrayData(Array(id.toDouble, id + 1000.0)))
    val dir = Files.createTempDirectory("graft_gateway_sens").toString
    val resp = new InstrumentResponder().start()
    val gw = new SocketLandingGateway(dir,
      onContent = b => { resp.setCurrentSensorFrame(b); () }).start()
    try {
      val h = new graft.client.Instrument("127.0.0.1", resp.port)
      // before anything streams, the synthetic default answers (the
      // FrameSource recipe: cents + k*1000 per sensor slot)
      val d0 = h.sensors
      assert(d0.values.length == graft.ingest.FrameSource.NumSensors)
      val sock = new java.net.Socket("127.0.0.1", gw.port)
      val os = sock.getOutputStream
      for (i <- 0 until 5)
        os.write(FrameDump.record(encodedSensor(200L + i, 1700000000L + i)))
      os.flush(); sock.close()
      awaitLanded(gw, 5)
      // the command port now answers with frame 204 — same decode path
      // as the stream, values verbatim
      val sn = h.sensors
      assert(sn.serialNumber == 204L)
      assert(sn.timestampInt == 1700000004L)
      assert(sn.bufferPct == 50)
      assert(sn.values == Seq(204.0, 1204.0))
      // poison bytes and a WRONG-KIND frame (a peaks frame: 40-byte
      // header, structurally sensor-decodable) are both refused
      assert(!resp.setCurrentSensorFrame(Array[Byte](1, 2, 3)))
      assert(!resp.setCurrentSensorFrame(encodedPeaks(7L, 1700000000L)))
      assert(h.sensors.serialNumber == 204L)
      // the async client reads the same snapshot down its one
      // persistent connection
      val a = new graft.client.AsyncInstrument("127.0.0.1", resp.port)
      try {
        val av = scala.concurrent.Await.result(a.getSensors,
          scala.concurrent.duration.Duration(10, "s"))
        assert(av == sn)
      } finally a.close()
    } finally { gw.stop(); resp.stop() }
  }

  test("socket → gateway → MicroBatchStream → PeakStreaming: every " +
      "frame of a misaligned byte stream arrives exactly once") {
    val dir = Files.createTempDirectory("graft_gateway").toString
    val out = Files.createTempDirectory("graft_gateway_out").toString
    val gw = new SocketLandingGateway(dir, maxFramesPerFile = 12).start()
    try {
      // producer 1: 30 frames as ONE byte blob, written in 7-byte
      // chunks so record boundaries never align with socket writes —
      // the gateway must re-frame from the header walk alone
      val blob = (0 until 30).toArray.flatMap(i =>
        FrameDump.record(encodedPeaks(i.toLong, 1700000000L + i)))
      val s1 = new Socket("127.0.0.1", gw.port)
      val os = s1.getOutputStream
      blob.grouped(7).foreach(c => { os.write(c); os.flush() })
      s1.close()
      awaitLanded(gw, 30)
      // 12-frame cap → 3 files, lexicographically increasing
      val files = new java.io.File(dir).listFiles().map(_.getName).sorted
      assert(files.length == 3 && files.forall(_.startsWith("part-gw-")),
        files.mkString(","))

      def drain(): Unit = {
        val decoded = spark.readStream.format("graft-frames")
          .option("kind", "peaks").option("maxFramesPerTrigger", "10")
          .load(dir)
          .select(col("timestamp_frac").as("frame_id"),
            timestamp_seconds(col("timestamp_int")).as("ts"),
            col("serial_number"), col("peak_counts"), col("peaks"))
        val q = graft.pipeline.PeakStreaming.stream(
            decoded, s"$out/st", s"$out/lt", s"$out/ck",
            windowMs = 10 * 1000)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      // frames span ts 000-029 in 10 s windows under a 10 s watermark:
      // after the drain the watermark sits at 019, so only the first
      // window has CLOSED — append-mode semantics, not data loss
      val st = spark.read.parquet(s"$out/st")
      assert(st.agg(sum($"n_frames")).as[Long].head() == 10L)

      // producer 2 (same landing dir, later connection): 10 more frames
      // 100 s later; they must land in later-sorting files, the SAME
      // checkpoint picks them up (growing-dir semantics through a real
      // socket), and their event times push the watermark past every
      // producer-1 window
      val s2 = new Socket("127.0.0.1", gw.port)
      val blob2 = (30 until 40).toArray.flatMap(i =>
        FrameDump.record(encodedPeaks(i.toLong, 1700000100L + i)))
      s2.getOutputStream.write(blob2)
      s2.close()
      awaitLanded(gw, 40)
      drain()
      assert(spark.read.parquet(s"$out/st")
        .agg(sum($"n_frames")).as[Long].head() == 30L)

      // termination sentinel (P6): one far-future frame closes the
      // producer-2 window; all 40 real frames are now in the sink
      val s3 = new Socket("127.0.0.1", gw.port)
      s3.getOutputStream.write(
        FrameDump.record(encodedPeaks(999L, 1700009999L)))
      s3.close()
      awaitLanded(gw, 41)
      drain()
      val total = spark.read.parquet(s"$out/st")
        .filter($"win_start" < timestamp_seconds(lit(1700009000L)))
        .agg(sum($"n_frames")).as[Long].head()
      assert(total == 40L, s"after sentinel drain: $total frames")
    } finally gw.stop()
  }
}
