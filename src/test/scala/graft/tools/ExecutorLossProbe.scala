package graft.tools

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Child-JVM probe for ExecutorLossSpec: a WHOLE EXECUTOR PROCESS dies
  * mid-task (partition 0's first attempt halts its JVM after streaming
  * three rows toward the shuffle writer — taking its sibling task, its
  * written shuffle blocks, and the in-flight partial output with it)
  * on `local-cluster[2,2,2048]`, and the results must be bit-identical
  * to the clean run. This is the real cluster failure
  * BlockLossRecoverySpec approximates in-JVM (it wipes cached blocks;
  * here the process, its memory, its disk-spilled shuffle files and
  * its task slots all vanish at once) — the hourly event on a
  * 1000-executor fleet that determinism discipline exists for.
  *
  * The halt fires once per probe run (marker file): the replacement
  * executor the standalone worker relaunches must NOT re-kill itself
  * on fresh attempt-0 tasks. Prints `executor_lost|fired` from the
  * driver-side listener when the removal is observed, then the
  * `name|row` result lines ExecutorLossSpec diffs.
  */
object ExecutorLossProbe {

  def input(spark: SparkSession, d: String, marker: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
      .repartition(4)
      .as[(Long, String, String, Long)]
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0 &&
            new java.io.File(marker).createNewFile()) {
          // LAZY prefix: three rows really flow into the consumer (the
          // shuffle writer) before the JVM halts, so the dying process
          // leaves genuine partial output behind — the RetryProbe
          // construction, escalated from a task failure to process loss
          it.zipWithIndex.map { case (r, i) =>
            if (i == 3) Runtime.getRuntime.halt(137)
            r
          }
        } else it
      }
      .toDF("doc_id", "text", "lang", "n_chars")
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val marker = args.lift(1).getOrElse("/tmp/graft_execloss_marker")
    val spark = ProbeHarness.clusterSession()
    val lost = new AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        if (lost.compareAndSet(false, true)) println("executor_lost|fired")
    })
    val docs = input(spark, d, marker)
    RetryProbe.probes(docs).foreach { case (n, df) =>
      RetryProbe.render(n, df).foreach(println)
    }
    spark.stop()
  }
}
