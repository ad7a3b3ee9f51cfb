package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StatefulOps

/** Child-JVM probe for LocalClusterSpec's streaming test: the stateful
  * CDC chunk-occurrence operator runs on `local-cluster[2,2,2048]`, so
  * the flatMapGroupsWithState STATE STORE lives inside real executor
  * processes — per-digest state lives in ROCKSDB
  * instances opened inside the executor JVMs (rocksdbjni loaded
  * per-process) and survives across micro-batches in a different JVM
  * than the driver that feeds the stream. `local[N]`
  * keeps all of that in the driver's heap; a 1000-executor streaming
  * job never does.
  *
  * Prints `verdict|doc|ord|digest|occurrence` lines for the same
  * two-batch fixture StreamingCurationSpec replays sequentially.
  */
object StreamClusterProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the at-scale provider: RocksDB instances open INSIDE the
      // executor processes (rocksdbjni loads per-executor-JVM), state
      // checkpoints under the executor-local store paths
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var waited = 0L
    while (spark.sparkContext.getExecutorMemoryStatus.size < 3 &&
        waited < 60000L) {
      Thread.sleep(250L); waited += 250L
    }
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(sec: Long) = new Timestamp(sec * 1000)
    val rnd = new scala.util.Random(5)
    def txt(n: Int) = Seq.fill(n)((32 + rnd.nextInt(90)).toChar).mkString
    val block = txt(240)
    val rows = Seq(
      (ts(10), 1L, txt(40) + block + txt(30)),
      (ts(11), 2L, txt(300)),
      (ts(40), 3L, txt(90) + block + txt(10)),
      (ts(41), 4L, txt(250)))

    val in = MemoryStream[(Timestamp, Long, String)]
    val chunked = in.toDF().toDF("ts", "doc_id", "text")
      .select(col("ts"), col("doc_id"),
        posexplode(graft.functions.CdcExprs
          .cdcChunks(col("text"), 8, 131L, 32L)))
      .select(col("ts"), col("doc_id"), col("pos").cast("int").as("ord"),
        md5(col("col.chunk")).as("digest"))
      .as[StatefulOps.ChunkInstance]
    val q = StatefulOps.chunkOccurrence(chunked)
      .writeStream.format("memory").queryName("cdc_cluster")
      .outputMode("append").start()
    in.addData(rows.take(2)); q.processAllAvailable()
    in.addData(rows.drop(2)); q.processAllAvailable()
    spark.table("cdc_cluster")
      .select($"doc_id", $"ord", $"digest", $"occurrence")
      .as[(Long, Int, String, Long)].collect()
      .map(r => s"verdict|${r._1}|${r._2}|${r._3}|${r._4}")
      .sorted.foreach(println)
    q.stop()
    println(s"executors|${spark.sparkContext.getExecutorMemoryStatus.size}")
    spark.stop()
  }
}
