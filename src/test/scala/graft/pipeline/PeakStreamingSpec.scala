package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Schemas.PeaksFrame

class PeakStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def frame(k: Int, t0: Long): PeaksFrame =
    PeaksFrame(k.toLong, new Timestamp(t0 + k * 50L), 7L,
      Seq(1, 1), Seq(k.toDouble, k + 10.0))

  test("streaming pipeline: event-time windows, dual sinks, stride") {
    val t0 = 1700000000000L
    val dir = Files.createTempDirectory("graft-stream").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[PeaksFrame]
    val frames = mem.toDF()
      .select($"frameId".as("frame_id"), $"ts",
        $"serialNumber".as("serial_number"),
        $"peakCounts".as("peak_counts"), $"peaks")

    val query = PeakStreaming.stream(frames,
      s"$dir/st", s"$dir/lt", s"$dir/ckpt").start()
    try {
      // 10 frames, 50 ms apart -> five 100 ms windows, 2 frames each
      mem.addData((0 until 10).map(frame(_, t0)))
      query.processAllAvailable()
      // watermark pusher: a frame 60 s later closes all real windows
      mem.addData(frame(1200, t0))
      query.processAllAvailable()
      mem.addData(frame(2400, t0)) // second push so the 1200 batch's windows close too
      query.processAllAvailable()
    } finally query.stop()

    // cast to double: the five 100 ms windows share the same epoch SECOND,
    // so a long cast would make the sort unstable
    val st = spark.read.parquet(s"$dir/st")
      .select($"win_start".cast("double").as("w"), $"n_frames", $"mean_peaks")
      .as[(Double, Long, Seq[Double])].collect().sortBy(_._1)
    assert(st.length >= 5)
    val first5 = st.take(5)
    assert(first5.forall(_._2 == 2L)) // 2 frames per window
    // window k holds frames 2k, 2k+1 -> element-wise means (2k+0.5, 2k+10.5)
    for ((row, k) <- first5.zipWithIndex)
      assert(row._3 == Seq(2 * k + 0.5, 2 * k + 10.5), s"window $k")

    // long-term sink: 1-in-10 stride per flush batch -> strictly fewer rows
    val lt = spark.read.parquet(s"$dir/lt").count()
    assert(lt >= 1 && lt < st.length)
  }

  test("batch form matches streaming semantics on the same frames") {
    val t0 = 1700000000000L
    val frames = (0 until 10).map(frame(_, t0)).toDF()
      .select($"frameId".as("frame_id"), $"ts",
        $"serialNumber".as("serial_number"),
        $"peakCounts".as("peak_counts"), $"peaks")
    val out = PeakStreaming.windowed(frames, windowMs = 100)
      .select($"win_start".cast("long").as("w"), $"n_frames", $"mean_peaks",
        $"port_counts")
      .as[(Long, Long, Seq[Double], Seq[Int])].collect().sortBy(_._1)
    assert(out.length == 5)
    assert(out.forall(_._2 == 2L))
    assert(out.forall(_._4 == Seq(1, 1))) // last frame's counts
    for ((row, k) <- out.zipWithIndex)
      assert(row._3 == Seq(2 * k + 0.5, 2 * k + 10.5))
  }
}
