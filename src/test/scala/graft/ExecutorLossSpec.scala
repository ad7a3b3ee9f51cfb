package graft

/** Whole-executor-process loss, end to end: ExecutorLossProbe halts one
  * of two REAL executor JVMs mid-job (its tasks, memory, and written
  * shuffle blocks all vanish), Spark reschedules onto the survivor /
  * the relaunched replacement, and the results must be BIT-IDENTICAL
  * to the clean run — through the digest-keyed shuffle and the custom
  * TopKPerKey exec. The process-level complement to TaskRetrySpec
  * (single task attempt fails) and BlockLossRecoverySpec (cached
  * blocks wiped in-JVM).
  */
class ExecutorLossSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("a killed executor JVM mid-job leaves results bit-identical " +
      "(digest shuffle + custom TopKPerKey exec)") {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val marker = java.nio.file.Files
      .createTempDirectory("graft_execloss").toString + "/fired"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx4g",
      "-Dspark.local.dir=/dev/shm/graft-spark-execloss", "-cp", cp,
      "graft.tools.ExecutorLossProbe", d, marker)
    val out = new StringBuilder
    val rc = scala.sys.process.Process(cmd, None,
        "SPARK_HOME" -> "/opt/spark",
        "SPARK_SCALA_VERSION" -> "2.13")
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        _ => ()))
    assert(rc == 0, s"probe JVM failed (rc=$rc):\n${out.toString.takeRight(4000)}")
    assert(new java.io.File(marker).exists() &&
      out.toString.linesIterator.exists(_.startsWith("executor_lost|")),
      s"no executor died — the probe proved nothing:\n" +
        out.toString.takeRight(2000))
    val probed = out.toString.linesIterator
      .filter(l => l.startsWith("dedup|") || l.startsWith("topk|"))
      .toVector.sorted
    val docs = graft.tools.RetryProbe.input(spark, d, inject = false)
    val expected = graft.tools.RetryProbe.probes(docs)
      .flatMap { case (n, df) => graft.tools.RetryProbe.render(n, df) }
      .toVector.sorted
    assert(probed.nonEmpty && expected.nonEmpty)
    assert(probed == expected,
      s"executor loss changed results:\nprobe=${probed.take(5)}\nclean=${expected.take(5)}")
  }
}
