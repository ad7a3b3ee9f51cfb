package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextAnalysis

/** Curation as a STREAMING pipeline: documents arriving as a stream go
  * through the same normalize → quality-gate → exact-dedup chain the
  * batch path runs — normalization and the gate are stateless per-row
  * expressions so they lift into streaming unchanged, and exact dedup
  * becomes `dropDuplicatesWithinWatermark` on the text digest (bounded
  * state: digests expire with the watermark). The streamed survivors
  * must equal the batch curation of the same rows, dedup across
  * micro-batches included.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("streamed normalize→quality→dedup == batch curation of same rows") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(10), 1L, "the quick brown fox jumps over a lazy dog"),
      (ts(11), 2L, "the  quick brown fox\tjumps over a lazy dog"), // dup after normalize
      (ts(12), 3L, "xs"),                                   // fails gate (too short)
      (ts(13), 4L, "completely different text about the spark engine"),
      (ts(40), 5L, "the quick brown fox jumps over a lazy dog"),  // dup, later batch
      (ts(41), 6L, "zebra words without stop list hits here today"), // fails gate (no stopwords)
      (ts(42), 7L, "and another keeper document in the stream today"))

    def curate(df: org.apache.spark.sql.DataFrame) = {
      val t = TextAnalysis.normalizeText(col("text"))
      val nTok = size(split(t, " "))
      val stop = graft.functions.TextExprs
        .tokenSetCount(t, TextAnalysis.Stopwords)
      df.select(col("ts"), col("doc_id"), t.as("t"))
        .filter(nTok >= 4 && stop >= 1)
        .withColumn("dg", md5(col("t")))
    }

    val in = MemoryStream[(Timestamp, Long, String)]
    val q = curate(in.toDF().toDF("ts", "doc_id", "text")
        .withWatermark("ts", "10 minutes"))
      .dropDuplicatesWithinWatermark("dg")
      .writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    try {
      in.addData(rows.take(4))
      q.processAllAvailable()
      in.addData(rows.drop(4))
      q.processAllAvailable()
      val streamed = spark.table("cur_stream")
        .select($"dg", $"doc_id").as[(String, Long)].collect()

      val batch = curate(rows.toDF("ts", "doc_id", "text"))
        .select($"dg").distinct().as[String].collect().toSet

      // same surviving digest set, exactly one row per digest, and
      // the cross-batch duplicate (doc 5) was dropped by state
      assert(streamed.map(_._1).toSet == batch)
      assert(streamed.length == batch.size)
      assert(!streamed.map(_._2).contains(5L))
      assert(streamed.map(_._2).toSet.subsetOf(Set(1L, 2L, 4L, 7L)))
    } finally q.stop()
  }

  test("streaming CDC chunk occurrence == sequential replay; a block " +
      "repeated across micro-batches is flagged from digest state") {
    implicit val sqlCtx = spark.sqlContext
    // the seeded fixture shared with StreamClusterProbe/LocalClusterSpec
    import graft.tools.CdcStreamFixture.{Batch1, Batch2, Rows}

    def chunked(df: org.apache.spark.sql.DataFrame) = df
      .select(col("ts"), col("doc_id"),
        posexplode(graft.functions.CdcExprs
          .cdcChunks(col("text"), graft.tools.CdcStreamFixture.W,
            graft.tools.CdcStreamFixture.Base,
            graft.tools.CdcStreamFixture.ModP)))
      .select(col("ts"), col("doc_id"), col("pos").cast("int").as("ord"),
        md5(col("col.chunk")).as("digest"))
      .as[StatefulOps.ChunkInstance]

    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StatefulOps.chunkOccurrence(
        chunked(in.toDF().toDF("ts", "doc_id", "text")))
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("append").start()
    try {
      in.addData(Batch1); q.processAllAvailable()
      in.addData(Batch2); q.processAllAvailable()
      val got = spark.table("cdc_stream")
        .select($"doc_id", $"ord", $"digest", $"occurrence")
        .as[(Long, Int, String, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

      // sequential replay over the same (ts, doc_id, ord) order
      val seen = scala.collection.mutable.Map[String, Long]()
      val expect = chunked(Rows.toDF("ts", "doc_id", "text"))
        .collect().sortBy(c => (c.ts.getTime, c.doc_id, c.ord))
        .map { c =>
          val n = seen.getOrElse(c.digest, 0L) + 1
          seen(c.digest) = n
          (c.doc_id, c.ord) -> (c.digest, n)
        }.toMap
      assert(got == expect)
      // doc 3's block-interior chunks repeat doc 1's across the batch
      // boundary: digest state flagged them occurrence 2
      val repeats = got.collect {
        case ((3L, _), (dg, occ)) if occ >= 2L => dg }.toSet
      assert(repeats.nonEmpty, "no cross-batch repeat flagged")
      val doc1 = got.collect { case ((1L, _), (dg, _)) => dg }.toSet
      assert(repeats.subsetOf(doc1))
      // novel content stays occurrence 1
      assert(got.collect { case ((2L, _), v) => v }.forall(_._2 == 1L))
    } finally q.stop()
  }
}
