package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StatefulOps

/** Child-JVM probe for LocalClusterSpec's streaming test: the stateful
  * CDC chunk-occurrence operator runs on `local-cluster[2,2,2048]`, so
  * the flatMapGroupsWithState STATE STORE lives inside real executor
  * processes — per-digest state lives in ROCKSDB instances opened
  * inside the executor JVMs (rocksdbjni loaded per-process) and
  * survives across micro-batches in a different JVM than the driver
  * that feeds the stream. `local[N]` keeps all of that in the driver's
  * heap; a 1000-executor streaming job never does.
  *
  * Streams [[CdcStreamFixture.Rows]] in its two batches and prints the
  * `verdict|…` lines LocalClusterSpec diffs against the fixture's
  * pure-JVM sequential replay.
  */
object StreamClusterProbe {

  def main(args: Array[String]): Unit = {
    // the at-scale provider: RocksDB instances open INSIDE the
    // executor processes, state checkpoints under executor-local paths
    val spark = ProbeHarness.clusterSession(Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")))
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[(Timestamp, Long, String)]
    val chunked = in.toDF().toDF("ts", "doc_id", "text")
      .select(col("ts"), col("doc_id"),
        posexplode(graft.functions.CdcExprs.cdcChunks(col("text"),
          CdcStreamFixture.W, CdcStreamFixture.Base, CdcStreamFixture.ModP)))
      .select(col("ts"), col("doc_id"), col("pos").cast("int").as("ord"),
        md5(col("col.chunk")).as("digest"))
      .as[StatefulOps.ChunkInstance]
    val q = StatefulOps.chunkOccurrence(chunked)
      .writeStream.format("memory").queryName("cdc_cluster")
      .outputMode("append").start()
    in.addData(CdcStreamFixture.Batch1); q.processAllAvailable()
    in.addData(CdcStreamFixture.Batch2); q.processAllAvailable()
    spark.table("cdc_cluster")
      .select($"doc_id", $"ord", $"digest", $"occurrence")
      .as[(Long, Int, String, Long)].collect()
      .map(r => s"verdict|${r._1}|${r._2}|${r._3}|${r._4}")
      .sorted.foreach(println)
    q.stop()
    spark.stop()
  }
}
