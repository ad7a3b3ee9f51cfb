package graft.tools

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StatefulOps

/** Child-JVM probe for LocalClusterSpec's streaming-fault test: an
  * executor PROCESS dies while a stateful micro-batch is executing —
  * the chunk-explode stage halts its JVM mid-stream (marker-gated,
  * once) — and the streaming query must retry the dead tasks on the
  * surviving / relaunched executor, recover the per-digest state the
  * lost process had been updating, and finish BOTH batches with
  * verdicts identical to the sequential replay. This is the streaming
  * face of ExecutorLossSpec: state-store recovery plus task retry
  * inside a micro-batch, the fault a long-running ingest pipeline on
  * a real fleet absorbs routinely.
  */
object StreamFaultProbe {

  def main(args: Array[String]): Unit = {
    val marker = args.headOption.getOrElse("/tmp/graft_streamfault_marker")
    val spark = ProbeHarness.clusterSession()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lost = new AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        if (lost.compareAndSet(false, true)) println("executor_lost|fired")
    })

    val in = MemoryStream[(Timestamp, Long, String)]
    val chunked = in.toDF().toDF("ts", "doc_id", "text")
      .select(col("ts"), col("doc_id"),
        posexplode(graft.functions.CdcExprs.cdcChunks(col("text"),
          CdcStreamFixture.W, CdcStreamFixture.Base, CdcStreamFixture.ModP)))
      .select(col("ts"), col("doc_id"), col("pos").cast("int").as("ord"),
        md5(col("col.chunk")).as("digest"))
      .as[StatefulOps.ChunkInstance]
      // the injection hop: the first task that claims the marker halts
      // its whole executor AFTER its first row reached the consumer
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.attemptNumber() == 0 &&
            new java.io.File(marker).createNewFile()) {
          it.zipWithIndex.map { case (r, i) =>
            if (i == 1) Runtime.getRuntime.halt(137)
            r
          }
        } else it
      }
    val q = StatefulOps.chunkOccurrence(chunked)
      .writeStream.format("memory").queryName("cdc_fault")
      .outputMode("append").start()
    in.addData(CdcStreamFixture.Batch1); q.processAllAvailable()
    in.addData(CdcStreamFixture.Batch2); q.processAllAvailable()
    spark.table("cdc_fault")
      .select($"doc_id", $"ord", $"digest", $"occurrence")
      .as[(Long, Int, String, Long)].collect()
      .map(r => s"verdict|${r._1}|${r._2}|${r._3}|${r._4}")
      .sorted.foreach(println)
    q.stop()
    spark.stop()
  }
}
