package graft.tools

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Child-JVM probe for TaskRetrySpec: runs representative query shapes
  * with a FIRST-ATTEMPT task failure injected mid-stream into the input
  * stage, on a `local[4, 2]` master — two task attempts, which the
  * suite's shared `local[N]` session cannot express (local mode pins
  * maxFailures to 1 unless given in the master string, and a JVM holds
  * one SparkContext). The probe prints `name|row` lines; TaskRetrySpec
  * diffs them against the clean in-process results — task retry on a
  * 1000-executor cluster must leave results bit-identical, including
  * through the custom TopKPerKey physical operator and digest-keyed
  * shuffles.
  */
object RetryProbe {
  /** The probed input: 4 round-robin partitions of documents through one
    * typed hop. With `inject`, the first attempt of partition 0 dies
    * AFTER emitting 3 rows (a mid-task loss whose partial shuffle output
    * must be discarded), exercising Spark's deterministic-replay
    * contract: round-robin repartition locally sorts before dealing
    * (SPARK-23207), so the retried attempt sees identical rows.
    */
  def input(spark: SparkSession, d: String, inject: Boolean): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
      .repartition(4)
      .as[(Long, String, String, Long)]
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (inject && tc.partitionId() == 0 && tc.attemptNumber() == 0)
          it.zipWithIndex.map { case (r, i) =>
            if (i == 3) {
              // marker proves to TaskRetrySpec the fault FIRED (a probe
              // that never injected would trivially match the clean run)
              println("injected|fired")
              throw new RuntimeException("injected task failure")
            }
            r
          }
        else it
      }
      .toDF("doc_id", "text", "lang", "n_chars")
  }

  /** Representative shapes: a digest-keyed shuffle aggregate and the
    * custom TopKPerKey LogicalPlan/Strategy/exec path.
    */
  def probes(docs: DataFrame): Seq[(String, DataFrame)] = Seq(
    "dedup" -> docs.select(md5(col("text")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("groups"),
        coalesce(sum(col("n")), lit(0L)).as("members")),
    "topk" -> graft.plans.TopKPerKey(docs.drop("text"), Seq("lang"),
      Seq(("n_chars", true), ("doc_id", false)), 3))

  def render(name: String, df: DataFrame): Seq[String] =
    df.collect().map(r => s"$name|${r.toString}").toSeq.sorted

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = input(spark, d, inject = true)
    probes(docs).foreach { case (n, df) =>
      render(n, df).foreach(println)
    }
    spark.stop()
  }
}
