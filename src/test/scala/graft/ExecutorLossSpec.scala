package graft

import graft.tools.ProbeHarness

/** Whole-executor-process loss, end to end: ExecutorLossProbe halts one
  * of two REAL executor JVMs mid-task — after three rows have streamed
  * into the shuffle writer, so genuine partial output dies with the
  * process — Spark reschedules onto the survivor / the relaunched
  * replacement, and the results must be BIT-IDENTICAL to the clean
  * run, through the digest-keyed shuffle and the custom TopKPerKey
  * exec. The process-level complement to TaskRetrySpec (single task
  * attempt fails) and BlockLossRecoverySpec (cached blocks wiped
  * in-JVM).
  */
class ExecutorLossSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("a killed executor JVM mid-job leaves results bit-identical " +
      "(digest shuffle + custom TopKPerKey exec)") {
    val marker = java.nio.file.Files
      .createTempDirectory("graft_execloss").toString + "/fired"
    val (rc, out) = ProbeHarness.launch("graft.tools.ExecutorLossProbe",
      Seq(d, marker), "/dev/shm/graft-spark-execloss",
      ProbeHarness.ClusterEnv)
    assert(rc == 0, s"probe JVM failed (rc=$rc):\n${out.takeRight(4000)}")
    assert(new java.io.File(marker).exists() &&
      out.linesIterator.exists(_.startsWith("executor_lost|")),
      s"no executor died — the probe proved nothing:\n${out.takeRight(2000)}")
    val probed = out.linesIterator
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
