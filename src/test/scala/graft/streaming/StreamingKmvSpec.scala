package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.KmvSketchExpr

/** The KMV distinct sketch as a STREAMING aggregate: a
  * TypedImperativeAggregate's buffer serializes into the state store,
  * so windowed cardinality monitoring (distinct spans/tokens per
  * event-time window) needs no custom stateful operator — and because
  * the sketch is deterministic bottom-k, the streamed result must
  * EQUAL the batch sketch over the same data, which this spec pins
  * across multi-batch arrival with out-of-order rows.
  */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("windowed streaming kmv == batch kmv over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDF().toDF("ts", "h")
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "60 seconds").as("win"))
      .agg(KmvSketchExpr.kmv($"h", k).as("mins"),
        count(lit(1)).as("n_rows"))
      .select($"win.start".as("win_start"), $"mins", $"n_rows")
    val q = agg.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      // 40 values over a 13-distinct domain, split across batches and
      // arriving out of order within the window
      val rows = (0 until 40).map(i => (ts(10 + (i * 7) % 50), ((i * 31) % 13) * 1000L + 5))
      in.addData(rows.take(15))
      q.processAllAvailable()
      in.addData(rows.drop(15))
      q.processAllAvailable()
      val got = spark.table("kmv_stream")
        .as[(Timestamp, Seq[Long], Long)].collect()
        .map(r => r._1.getTime -> ((r._2, r._3))).toMap
      // batch reference: same windows, same sketch
      val expected = rows.toDF("ts", "h")
        .groupBy(window($"ts", "60 seconds").as("win"))
        .agg(KmvSketchExpr.kmv($"h", k).as("mins"),
          count(lit(1)).as("n_rows"))
        .select($"win.start".as("win_start"), $"mins", $"n_rows")
        .as[(Timestamp, Seq[Long], Long)].collect()
        .map(r => r._1.getTime -> ((r._2, r._3))).toMap
      assert(got == expected)
      assert(got.values.map(_._2).sum == 40L)
    } finally q.stop()
  }

  test("windowed streaming hash_sample == batch sample over the same " +
      "rows") {
    implicit val sqlCtx = spark.sqlContext
    val k = 5
    val in = MemoryStream[(Timestamp, Long, Long)]
    def sampled(df: org.apache.spark.sql.DataFrame) = df
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "60 seconds").as("win"))
      .agg(graft.functions.HashSampleExpr.sample($"h", $"v", k).as("vs"))
      .select($"win.start".as("win_start"), $"vs")
    val q = sampled(in.toDF().toDF("ts", "h", "v"))
      .writeStream.format("memory").queryName("hs_stream")
      .outputMode("complete").start()
    try {
      val rows = (0 until 30).map(i =>
        (ts(10 + (i * 7) % 50), ((i * 37) % 17) * 100L, i * 11L))
      in.addData(rows.take(12))
      q.processAllAvailable()
      in.addData(rows.drop(12))
      q.processAllAvailable()
      val got = spark.table("hs_stream")
        .as[(Timestamp, Seq[Long])].collect()
        .map(r => r._1.getTime -> r._2).toMap
      val expected = rows.toDF("ts", "h", "v")
        .withWatermark("ts", "10 seconds")
        .groupBy(window($"ts", "60 seconds").as("win"))
        .agg(graft.functions.HashSampleExpr.sample($"h", $"v", k).as("vs"))
        .select($"win.start".as("win_start"), $"vs")
        .as[(Timestamp, Seq[Long])].collect()
        .map(r => r._1.getTime -> r._2).toMap
      assert(got == expected)
      assert(got.values.forall(_.size <= k))
    } finally q.stop()
  }
}
