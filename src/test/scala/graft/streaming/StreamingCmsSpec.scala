package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.CmsSketchExpr

/** Count-Min Sketch as a STREAMING aggregate: the counter grid
  * serializes into the state store and merges by element-wise add, so
  * windowed heavy-hitter monitoring (token frequencies per event-time
  * window) needs no custom stateful operator. Adds commute, so the
  * streamed grid must EQUAL the batch grid over the same rows — pinned
  * here across multi-batch, out-of-order arrival — and point estimates
  * read from the streamed grid keep the one-sided guarantee.
  */
class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)
  private val depth = 4
  private val width = 32

  test("windowed streaming cms == batch cms; estimates stay one-sided") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "tok")
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "60 seconds").as("win"))
      .agg(CmsSketchExpr.cms($"tok", depth, width).as("grid"),
        count(lit(1)).as("n_rows"))
      .select($"win.start".as("win_start"), $"grid", $"n_rows")
    val q = agg.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      // skewed token stream over two windows, out-of-order arrival
      val toks = (0 until 60).map { i =>
        val t = if (i % 3 == 0) "hot" else s"cold${i % 11}"
        (ts(10 + (i * 7) % 100), t)
      }
      in.addData(toks.take(25))
      q.processAllAvailable()
      in.addData(toks.drop(25))
      q.processAllAvailable()
      val got = spark.table("cms_stream")
        .as[(Timestamp, Seq[Long], Long)].collect()
        .map(r => r._1.getTime -> ((r._2, r._3))).toMap
      val expected = toks.toDF("ts", "tok")
        .groupBy(window($"ts", "60 seconds").as("win"))
        .agg(CmsSketchExpr.cms($"tok", depth, width).as("grid"),
          count(lit(1)).as("n_rows"))
        .select($"win.start".as("win_start"), $"grid", $"n_rows")
        .as[(Timestamp, Seq[Long], Long)].collect()
        .map(r => r._1.getTime -> ((r._2, r._3))).toMap
      assert(got == expected)
      assert(got.values.map(_._2).sum == 60L)
      // estimates off the STREAMED grids: est >= exact per window
      val exact = toks.groupBy(t => (t._1.getTime / 60000) * 60000)
        .map { case (w, rows) =>
          w -> rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        }
      for ((w, (grid, _)) <- got; (tok, cnt) <- exact(w)) {
        val est = (0 until depth).map { j =>
          val dg = java.security.MessageDigest.getInstance("MD5")
            .digest(tok.getBytes("UTF-8"))
          val v = ((dg(4 * j) & 0xffL) << 24) |
            ((dg(4 * j + 1) & 0xffL) << 16) |
            ((dg(4 * j + 2) & 0xffL) << 8) | (dg(4 * j + 3) & 0xffL)
          grid(j * width + (v % width).toInt)
        }.min
        assert(est >= cnt, s"window $w token $tok: est=$est < exact=$cnt")
      }
    } finally q.stop()
  }
}
