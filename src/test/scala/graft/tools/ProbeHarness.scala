package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared machinery for the child-JVM probes (TaskRetrySpec,
  * ExecutorLossSpec, LocalClusterSpec): one place for the forked-JVM
  * launch command (add-opens list, classpath, spark.local.dir) and for
  * the `local-cluster[2,2,2048]` session the multi-process probes
  * open — including the executor-registration wait that FAILS FAST
  * (exit 3) when the two executor JVMs don't come up, so a probe can
  * never "pass" by silently running everything on one process.
  */
object ProbeHarness {

  private val AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Env the `local-cluster` executor launcher needs on a binary Spark
    * dist when the driver isn't started via spark-class.
    */
  val ClusterEnv: Map[String, String] = Map(
    "SPARK_HOME" -> "/opt/spark",
    "SPARK_SCALA_VERSION" -> "2.13")

  /** Fork `mainClass` with the suite's classpath; returns (rc, output).
    * stderr is dropped (Spark INFO noise); probes print contract lines
    * to stdout.
    */
  def launch(mainClass: String, args: Seq[String], localDir: String,
      env: Map[String, String] = Map.empty): (Int, String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ AddOpens ++ Seq("-Xmx4g",
      s"-Dspark.local.dir=$localDir", "-cp", cp, mainClass) ++ args
    val out = new StringBuilder
    val rc = scala.sys.process.Process(cmd, None, env.toSeq: _*)
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        _ => ()))
    (rc, out.toString)
  }

  /** Open the two-executor local-cluster session, wait for BOTH
    * executor JVMs to register, print the `executors|N` proof line
    * BEFORE any query runs, and exit nonzero on timeout — a late
    * second executor must fail the probe, not let a single-process
    * run pass as multi-process evidence.
    */
  def clusterSession(extraConfs: Map[String, String] = Map.empty)
      : SparkSession = {
    val b = SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var waited = 0L
    while (spark.sparkContext.getExecutorMemoryStatus.size < 3 &&
        waited < 60000L) {
      Thread.sleep(250L); waited += 250L
    }
    val n = spark.sparkContext.getExecutorMemoryStatus.size
    println(s"executors|$n")
    if (n < 3) {
      System.err.println(s"only $n of 3 processes registered in 60 s")
      spark.stop()
      sys.exit(3)
    }
    spark
  }
}
