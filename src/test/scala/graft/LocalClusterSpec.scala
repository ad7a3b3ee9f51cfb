package graft

import graft.tools.{CdcStreamFixture, ClusterProbe, ProbeHarness}

/** Multi-process execution parity: representative queries (one per
  * custom-machinery class — native codegen expressions, the typed
  * vec-mean aggregate, the TopKPerKey physical operator, broadcast
  * Bloom probes, digest shuffle funnels, broadcast batched ANN, window
  * functions) run on `local-cluster` with two REAL executor JVMs
  * (ClusterProbe) and must return row sets identical to the shared
  * single-JVM session. This is the boundary `local[N]` never crosses:
  * closure/broadcast serialization, remote shuffle-block fetches
  * between processes, and executor-side class-loading of generated
  * code and expression reference objects. The probes print their
  * `executors|3` proof line BEFORE running queries and exit nonzero if
  * both executors don't register, so a single-process run can't pass.
  */
class LocalClusterSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def assertMultiProcess(out: String): Unit =
    assert(out.linesIterator.find(_.startsWith("executors|"))
      .exists(_.split('|')(1).toInt >= 3),
      s"probe did not prove multi-process execution:\n${out.takeRight(2000)}")

  test("representative queries return identical rows on real forked " +
      "executors (local-cluster) vs the in-process session") {
    val (rc, out) = ProbeHarness.launch("graft.tools.ClusterProbe",
      Seq(d), "/dev/shm/graft-spark-cluster", ProbeHarness.ClusterEnv)
    assert(rc == 0, s"probe JVM failed (rc=$rc):\n${out.takeRight(4000)}")
    assertMultiProcess(out)
    ClusterProbe.Probes.foreach { name =>
      val probed = out.linesIterator
        .filter(_.startsWith(s"$name|")).toVector.sorted
      val expected = SparkEntry.queries(name)(spark, d).collect()
        .map(r => s"$name|${r.toString}").toVector.sorted
      assert(probed.nonEmpty, s"$name returned nothing from the cluster")
      assert(probed == expected,
        s"$name diverged across the process boundary:\n" +
          s"probe=${probed.take(3)}\nlocal=${expected.take(3)}")
    }
  }

  test("an executor killed MID-MICRO-BATCH leaves the stateful stream's " +
      "verdicts identical to the replay (state recovery + task retry)") {
    val marker = java.nio.file.Files
      .createTempDirectory("graft_streamfault").toString + "/fired"
    val (rc, out) = ProbeHarness.launch("graft.tools.StreamFaultProbe",
      Seq(marker), "/dev/shm/graft-spark-sfault", ProbeHarness.ClusterEnv)
    assert(rc == 0, s"probe JVM failed (rc=$rc):\n${out.takeRight(4000)}")
    assertMultiProcess(out)
    assert(new java.io.File(marker).exists() &&
      out.linesIterator.exists(_.startsWith("executor_lost|")),
      s"no executor died mid-batch — the probe proved nothing:\n" +
        out.takeRight(2000))
    val probed = out.linesIterator
      .filter(_.startsWith("verdict|")).toVector.sorted
    assert(probed.nonEmpty && probed == CdcStreamFixture.ReplayLines,
      s"stream diverged after executor loss:\nprobe=${probed.take(3)}\n" +
        s"replay=${CdcStreamFixture.ReplayLines.take(3)}")
  }

  test("stateful streaming (chunkOccurrence) runs with executor-side " +
      "RocksDB state stores and matches the sequential replay") {
    val (rc, out) = ProbeHarness.launch("graft.tools.StreamClusterProbe",
      Seq.empty, "/dev/shm/graft-spark-scluster", ProbeHarness.ClusterEnv)
    assert(rc == 0, s"probe JVM failed (rc=$rc):\n${out.takeRight(4000)}")
    assertMultiProcess(out)
    val probed = out.linesIterator
      .filter(_.startsWith("verdict|")).toVector.sorted
    assert(probed.nonEmpty && probed == CdcStreamFixture.ReplayLines,
      s"cluster stream diverged:\nprobe=${probed.take(3)}\n" +
        s"replay=${CdcStreamFixture.ReplayLines.take(3)}")
  }
}
