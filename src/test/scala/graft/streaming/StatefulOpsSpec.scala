package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StatefulOps.{FrameEvent, SerialUpdate}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("serialMonitor: running count/mean per serial via custom state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FrameEvent]
    val q = StatefulOps.serialMonitor(in.toDS())
      .writeStream.format("memory").queryName("monitor")
      .outputMode("append").start()
    try {
      in.addData(
        FrameEvent(1L, ts(10), 100.0), FrameEvent(1L, ts(11), 200.0),
        FrameEvent(2L, ts(10), 50.0))
      q.processAllAvailable()
      in.addData(FrameEvent(1L, ts(12), 300.0))
      q.processAllAvailable()
      val rows = spark.table("monitor").as[SerialUpdate].collect()
      // batch 1: serial 1 -> n=2 mean=150; serial 2 -> n=1 mean=50
      assert(rows.exists(u => u.serial == 1 && u.n_frames == 2 &&
        u.mean_first_peak == 150.0 && u.last_ts_ms == 11000))
      assert(rows.exists(u => u.serial == 2 && u.n_frames == 1 &&
        u.mean_first_peak == 50.0))
      // batch 2: serial 1 state carried -> n=3 mean=200
      assert(rows.exists(u => u.serial == 1 && u.n_frames == 3 &&
        u.mean_first_peak == 200.0 && u.last_ts_ms == 12000))
    } finally q.stop()
  }

  test("dedupByDigest: duplicate digests within watermark emit once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val docs = in.toDF().toDF("ts", "digest", "text")
    val q = StatefulOps.dedupByDigest(docs, "ts", "digest")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      in.addData(
        (ts(10), "d1", "a"), (ts(10), "d1", "a-dup"), (ts(11), "d2", "b"))
      q.processAllAvailable()
      in.addData((ts(12), "d1", "a-again"), (ts(12), "d3", "c"))
      q.processAllAvailable()
      val digests = spark.table("dedup_stream")
        .select("digest").as[String].collect().sorted
      // d1's second arrival at ts=12 is still within the 10 s watermark
      // horizon of its first -> suppressed
      assert(digests.toSeq == Seq("d1", "d2", "d3"))
    } finally q.stop()
  }
}
