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

  test("serialMonitorTws: transformWithState matches the fMGWS monitor") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store — also the
    // at-scale provider (incremental checkpoints, state > heap)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val in = MemoryStream[FrameEvent]
    val q = StatefulOps.serialMonitorTws(in.toDS())
      .writeStream.format("memory").queryName("monitor_tws")
      .outputMode("append").start()
    try {
      in.addData(
        FrameEvent(1L, ts(10), 100.0), FrameEvent(1L, ts(11), 200.0),
        FrameEvent(2L, ts(10), 50.0))
      q.processAllAvailable()
      in.addData(FrameEvent(1L, ts(12), 300.0))
      q.processAllAvailable()
      val rows = spark.table("monitor_tws").as[SerialUpdate].collect()
      // identical update stream to the flatMapGroupsWithState monitor
      assert(rows.exists(u => u.serial == 1 && u.n_frames == 2 &&
        u.mean_first_peak == 150.0 && u.last_ts_ms == 11000))
      assert(rows.exists(u => u.serial == 2 && u.n_frames == 1 &&
        u.mean_first_peak == 50.0))
      assert(rows.exists(u => u.serial == 1 && u.n_frames == 3 &&
        u.mean_first_peak == 200.0 && u.last_ts_ms == 12000))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
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

  test("stream-stream interval join matches within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val peaks = MemoryStream[FrameEvent]
    val sensors = MemoryStream[FrameEvent]
    val joined = StatefulOps.intervalJoin(
      peaks.toDF().withColumnRenamed("firstPeak", "peak"),
      sensors.toDF().withColumnRenamed("ts", "rts")
        .withColumnRenamed("firstPeak", "sensor_v"),
      key = "serial", leftTs = "ts", rightTs = "rts",
      lowerSec = 2, upperSec = 2)
    val q = joined.select($"serial", $"peak", $"sensor_v")
      .writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      peaks.addData(FrameEvent(1L, ts(100), 10.0))
      sensors.addData(
        FrameEvent(1L, ts(99), 1.0),   // within [98, 102] -> match
        FrameEvent(1L, ts(101), 2.0),  // within -> match
        FrameEvent(1L, ts(105), 3.0),  // outside -> no match
        FrameEvent(2L, ts(100), 4.0))  // other key -> no match
      q.processAllAvailable()
      val rows = spark.table("ivj").as[(Long, Double, Double)]
        .collect().toSet
      assert(rows == Set((1L, 10.0, 1.0), (1L, 10.0, 2.0)))
      // the plan is a genuine stream-stream join with state
      assert(q.lastProgress == null ||
        spark.table("ivj").columns.length == 3)
    } finally q.stop()
  }

  test("session_window streaming: gap-merged sessions close at watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FrameEvent]
    val agg = in.toDS()
      .withWatermark("ts", "1 second")
      .groupBy($"serial", session_window($"ts", "10 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"serial", $"w.start".as("start"), $"n")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // serial 1: events at 10s and 15s merge into one session (gap<10);
      // the event at 100s starts a new one and pushes the watermark far
      // past the first session's end -> first session emits
      in.addData(FrameEvent(1L, ts(10), 1.0), FrameEvent(1L, ts(15), 1.0))
      q.processAllAvailable()
      in.addData(FrameEvent(1L, ts(100), 1.0))
      q.processAllAvailable()
      in.addData(FrameEvent(1L, ts(200), 1.0)) // closes the 100s session
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select($"serial", $"start".cast("long"), $"n")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows.contains((1L, 10L, 2L)), rows)  // merged 10s+15s session
      assert(rows.contains((1L, 100L, 1L)), rows)
    } finally q.stop()
  }

  test("ewmaByKey state survives a checkpoint restart: stop mid-stream, " +
      "restart from the checkpoint, outputs still equal batch q_ewma") {
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val all = graft.util.Tables.events(spark, d)
      .select($"event_id", $"user_id", $"ts", $"value")
      .as[StatefulOps.EventPoint].collect()
      .sortBy(e => (e.ts.toInstant.getEpochSecond * 1000000L +
        e.ts.getNanos / 1000L, e.event_id))
    val (first, second) = all.splitAt(all.length / 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ewma_ckpt").toString
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Double)]()
    def start(in: MemoryStream[StatefulOps.EventPoint]) =
      StatefulOps.ewmaByKey(in.toDS())
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            StatefulOps.EwmaPoint], _: Long) =>
          df.collect().foreach(p =>
            got.add((p.event_id, p.user_id, p.ewma)))
        }
        .outputMode("append").start()
    val in = MemoryStream[StatefulOps.EventPoint]
    val q1 = start(in)
    in.addData(first.toIndexedSeq)
    q1.processAllAvailable()
    q1.stop() // mid-stream shutdown: per-user trailing windows live in
              // the checkpointed state store, not the JVM
    val q2 = start(in)
    in.addData(second.toIndexedSeq)
    q2.processAllAvailable()
    q2.stop()
    val batch = graft.SparkEntry.queries("q_ewma")(spark, d)
      .as[(Long, Long, Double)].collect().toSet
    val streamed = {
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    assert(streamed.size == all.length)
    assert(streamed == batch,
      s"restart changed results: diff=${(streamed diff batch).take(5)} " +
        s"/ ${(batch diff streamed).take(5)}")
  }

  test("ewmaByKey parity: the streaming update stream equals batch " +
      "q_ewma bit-for-bit on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    // real driver events, global (ts, event_id) order, fed as 4
    // event-time slices — cross-batch in-order delivery is the stream
    // contract; WITHIN a slice groupByKey scrambles and the processor
    // re-sorts
    val all = graft.util.Tables.events(spark, d)
      .select($"event_id", $"user_id", $"ts", $"value")
      .as[StatefulOps.EventPoint].collect()
      // MICROSECOND order — the same key the processor and the batch
      // query sort by; ms-truncated getTime could split a same-ms pair
      // across slices against its micros order, violating the in-order
      // cross-batch contract the parity claim assumes
      .sortBy(e => (e.ts.toInstant.getEpochSecond * 1000000L +
        e.ts.getNanos / 1000L, e.event_id))
    val slices = all.grouped(math.max(1, all.length / 4 + 1)).toSeq
    val in = MemoryStream[StatefulOps.EventPoint]
    val q = StatefulOps.ewmaByKey(in.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    try {
      slices.foreach { s => in.addData(s.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("ewma_stream")
        .as[StatefulOps.EwmaPoint].collect()
        .map(p => (p.event_id, p.user_id, p.ewma)).toSet
      val batch = graft.SparkEntry.queries("q_ewma")(spark, d)
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed.size == all.length)
      assert(streamed == batch,
        s"diff=${(streamed diff batch).take(5)} / ${(batch diff streamed).take(5)}")
    } finally q.stop()
  }
}
